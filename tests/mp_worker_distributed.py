"""Worker for the multi-process jax.distributed test (spawned by
tests/test_multiprocess.py, one instance per process).

Brings up the jax.distributed runtime across 2 CPU processes (2 local
virtual devices each -> 4 global), builds the pod mesh, and runs ALL
THREE verticals over the 4-device global mesh — the full sharded
intersection, the sharded kstream table, and the sharded VCF
classification — asserting exact equality with their single-device
programs (process 0 checks).  argv: coordinator_port process_id
num_processes
"""

import os
import sys

# Run as a script: sys.path[0] is tests/, so make the repo root (the
# parent, which holds krisp_tpu/) importable regardless of install state.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
# axis placement: the leading (DCN) axis enumerates hosts — every device
# in row h belongs to process h, so "chip"-axis collectives stay
# intra-host (ICI in production) and only the "host" axis crosses DCN
for h in range(nprocs):
    for c in range(2):
        assert mesh2d.devices[h, c].process_index == h, mesh2d.devices
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

# ---- kstream vertical across the same 2-process mesh --------------------
from krisp_tpu.parallel.kstream_shard import _kstream_step  # noqa: E402

k = 6
ks_step = _kstream_step(mesh, k, "canonicals", 2, False, chunk, 256)
ks_in = multihost_utils.host_local_array_to_global_array(
    buffers[0, pid * 2 * chunk:(pid + 1) * 2 * chunk], mesh, P("shard"))
kw_d, kc_d, knu_d, kover_d = ks_step(ks_in)
kw = np.asarray(multihost_utils.process_allgather(kw_d, tiled=True))
kc = np.asarray(multihost_utils.process_allgather(kc_d, tiled=True))
knu = np.asarray(multihost_utils.process_allgather(knu_d, tiled=True))
assert int(np.asarray(kover_d)) == 0

if pid == 0:
    from collections import Counter

    from krisp_tpu.kstream_device import _decode_chars

    rows = kw.shape[1] // n_shards
    lines = []
    for d in range(n_shards):
        u = int(knu[d])
        part = [w[d * rows:d * rows + u] for w in kw]
        chars = _decode_chars(part, u, k, 2, newline=False)
        reps = kc[d * rows:d * rows + u]
        lines += [chars[i].tobytes().decode()
                  for i in range(u) for _ in range(reps[i])]
    seq = buffers[0].tobytes().decode()
    want = Counter()
    for i in range(len(seq) - k + 1):
        fwd = seq[i:i + k]
        rc = fwd[::-1].translate(str.maketrans("ACGT", "TGCA"))
        want[min(fwd, rc)] += 1
    assert lines == sorted(want.elements()), "kstream mesh table mismatch"

# ---- krisp_vcf classification across the same 2-process mesh ------------
from krisp_tpu.parallel.vcf_shard import _sharded_fn, _THR_KEYS  # noqa: E402
from krisp_tpu.ops.vcfclass import classify_batch_packed  # noqa: E402

V, S, A, G = 4 * n_shards, 7, 3, 2
cr = np.random.default_rng(1)
dp = cr.integers(0, 60, (V, S)).astype(np.int32)
gq = cr.integers(0, 99, (V, S)).astype(np.int32)
ad = cr.integers(0, 40, (V, S, A)).astype(np.int32)
n_alleles = cr.integers(1, A + 1, V).astype(np.int32)
mq = cr.uniform(0, 60, V).astype(np.float32)
qual = cr.uniform(0, 100, V).astype(np.float32)
group_id = (np.arange(S, dtype=np.int32) % (G + 1)) - 1
group_sizes = np.array([(group_id == g).sum() for g in range(G)], np.int32)
thr = (1, 5, 40, 0.1, 30, 10, 0.9)

cls = _sharded_fn(mesh, G, "variants", thr)
half = V // nprocs
sl = slice(pid * half, (pid + 1) * half)
g_args = [multihost_utils.host_local_array_to_global_array(a[sl], mesh,
                                                           P("shard"))
          for a in (dp, gq, ad, n_alleles, mq, qual)]
g_rep = [multihost_utils.host_local_array_to_global_array(a, mesh, P())
         for a in (group_id, group_sizes)]
packed_cls = np.asarray(multihost_utils.process_allgather(
    cls(*g_args, *g_rep), tiled=True))

if pid == 0:
    ref_cls = np.asarray(classify_batch_packed(
        dp, gq, ad, n_alleles, mq, qual, group_id, group_sizes,
        n_groups=G, **dict(zip(_THR_KEYS, thr))))
    assert (packed_cls == ref_cls).all(), "sharded classify mismatch"
    print("MULTIPROCESS_OK", nkf)
