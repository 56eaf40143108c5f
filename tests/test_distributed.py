"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Checks that the sharded pipeline produces exactly the same global sorted
unique table as the single-chip path (determinism across device counts is the
property the reference could not achieve for its parallel merge,
intersectAmplicons.py:216-218)."""

import numpy as np
import pytest

import jax

from krisp_tpu import dna
from krisp_tpu.ops.encode import kmer_keys
from krisp_tpu.ops.sort import build_sorted_unique
from krisp_tpu.parallel.distributed import make_mesh, sharded_kmer_step


def reference_table(buffers, left, mid, right, bits):
    """Single-chip unique tables, merged and sorted on host."""
    rows = []
    for f, buf in enumerate(buffers):
        invalid, words = kmer_keys(
            buf, dna.CODE2_TABLE, dna.base_validity_table(2, disallow="Nn"),
            dna.COMP2_TABLE, left, mid, right, bits)
        u_inv, u_words, u_cnt, nu = build_sorted_unique(invalid, words, bits)
        nu = int(nu)
        ws = np.stack([np.asarray(w)[:nu] for w in u_words], 1)
        for i in range(nu):
            rows.append((tuple(ws[i]), f, int(np.asarray(u_cnt)[i])))
    return sorted(rows)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_matches_single_chip(n_dev):
    assert len(jax.devices()) >= n_dev
    rng = np.random.default_rng(0)
    left, mid, right = 4, 1, 3
    L = left + mid + right
    n_files, chunk = 2, 64
    total = n_dev * chunk
    seqs = ["".join(rng.choice(list("ACGTN"), size=total - 1)) for _ in range(n_files)]
    buffers = np.zeros((n_files, total), np.uint8)
    for f, s in enumerate(seqs):
        buffers[f, :len(s)] = np.frombuffer(s.encode(), np.uint8)

    mesh = make_mesh(n_dev)
    step = sharded_kmer_step(mesh, left, mid, right, 2, n_files)
    l_inv, l_words, l_fids, l_cnts, total_valid, overflow = step(buffers)
    assert int(overflow) == 0

    inv = np.asarray(l_inv)
    ws = np.asarray(l_words)
    fids = np.asarray(l_fids)
    cnts = np.asarray(l_cnts)
    keep = inv == 0
    got = sorted((tuple(ws[:, i]), int(fids[i]), int(cnts[i]))
                 for i in np.nonzero(keep)[0])

    want = reference_table([buffers[f] for f in range(n_files)],
                           left, mid, right, 2)
    assert int(total_valid) == len(want)
    assert got == want


def test_shard_ownership_is_partition():
    """Every valid key is owned by exactly one shard (no dupes, no drops)."""
    # covered by the equality in test_sharded_matches_single_chip; this is a
    # cheap standalone sanity check on the bucket function
    n_shards = 8
    shift = 32 - max((n_shards - 1).bit_length(), 1)
    keys = np.random.default_rng(1).integers(0, 2**32, 1000, dtype=np.uint64)
    buckets = (keys >> shift).astype(int)
    assert buckets.min() >= 0 and buckets.max() < n_shards


def test_pod_mesh_structure():
    from krisp_tpu.parallel.multihost import pod_mesh, init_runtime
    assert init_runtime() in (True, False)  # no-op on single process
    mesh = pod_mesh()
    assert set(mesh.axis_names) == {"host", "chip"}
    assert mesh.devices.size == len(jax.devices())
