"""Worker for the multi-process jax.distributed test (spawned by
tests/test_multiprocess.py, one instance per process).

Brings up the jax.distributed runtime across 2 CPU processes (2 local
virtual devices each -> 4 global), builds the pod mesh, runs the FULL
sharded intersection over the 4-device global mesh, allgathers the shards,
and (on process 0) asserts exact equality with the single-device fused
program.  argv: coordinator_port process_id num_processes
"""

import os
import sys

port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from krisp_tpu.parallel.multihost import init_runtime, pod_mesh  # noqa: E402
from krisp_tpu.parallel.distributed import (  # noqa: E402
    sharded_intersect_step, assemble_compacted)

assert init_runtime(coordinator_address=f"localhost:{port}",
                    num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs
assert len(jax.devices()) == 2 * nprocs

mesh2d = pod_mesh()                       # (host, chip)
assert mesh2d.devices.shape == (nprocs, 2)
# sequence axis rides the flattened (host, chip) grid: the one halo
# ppermute per step crosses the host boundary once (DCN in production)
mesh = Mesh(mesh2d.devices.reshape(-1), ("shard",))
n_shards = mesh.devices.size

left, mid, right, bits, n_files = 4, 1, 3, 2, 2
chunk = 64
total = n_shards * chunk
rng = np.random.default_rng(0)
buffers = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                     size=(n_files, total))
buffers[1, : total // 2] = buffers[0, : total // 2]

cap, exch_cap = 1 << 12, 1 << 12
step = sharded_intersect_step(mesh, left, mid, right, bits, n_files,
                              cap, exch_cap)
sharding = NamedSharding(mesh, P(None, "shard"))
global_in = multihost_utils.host_local_array_to_global_array(
    buffers[:, pid * 2 * chunk:(pid + 1) * 2 * chunk], mesh, P(None, "shard"))
packed = np.asarray(multihost_utils.process_allgather(step(global_in),
                                                      tiled=True))
tails = packed[-1].reshape(n_shards, cap)
assert int(tails[0, 1]) == 0  # no exchange overflow

if pid == 0:
    from krisp_tpu import dna
    from krisp_tpu.ops.encode import KeyLayout
    from krisp_tpu.ops.intersect import fused_pipeline_bits

    W = KeyLayout(left, mid, right, bits, n_files).n_words
    got_w, got_c, got_g = assemble_compacted(
        packed[:W], packed[W], packed[W + 1].astype(np.int64),
        tails[:, 0].astype(np.int64), cap, n_shards)

    code = np.asarray(dna.CODE2_TABLE)
    comp = np.asarray(dna.COMP2_TABLE)
    valid = np.asarray(dna.base_validity_table(bits, disallow="Nn"))
    w, c, g, nkf = fused_pipeline_bits(buffers, code, valid, comp,
                                       left=left, mid=mid, right=right,
                                       bits=bits, n_files=n_files,
                                       cap=1 << 14)
    nkf = int(nkf)
    assert got_w.shape[0] == nkf > 0, (got_w.shape, nkf)
    assert (got_w == np.asarray(w)[:, :nkf].T).all()
    assert (got_c == np.asarray(c)[:nkf]).all()
    print("MULTIPROCESS_OK", nkf)
