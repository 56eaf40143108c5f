"""Correctness of the merge-path Pallas kernel (ops/pallas_merge.py)
against numpy's sort oracle, in interpreter mode on CPU.

On-chip bit-parity and the A/B timing against the single big sort run
via tools/ab_merge_path.py (BASELINE.md "Sort A/B coverage")."""

import numpy as np
import pytest

from krisp_tpu.ops.pallas_merge import merge_sorted_words


def _to_words(x64):
    return np.stack([(x64 >> 32).astype(np.uint32), x64.astype(np.uint32)])


def _to_u64(words):
    return (words[0].astype(np.uint64) << 32) | words[1].astype(np.uint64)


@pytest.mark.parametrize("na,nb", [
    (1024, 1024),    # exactly one block each
    (3000, 500),     # unaligned sizes
    (1, 2048), (999, 1),  # degenerate runs
    (0, 1024), (1024, 0), (0, 0),  # empty runs
    (5000, 7000), (40960, 8192),   # multi-block, uneven
])
def test_merge_matches_numpy(na, nb):
    rng = np.random.default_rng(na * 31 + nb)
    A = np.sort(rng.integers(0, 2**63, na, dtype=np.uint64))
    B = np.sort(rng.integers(0, 2**63, nb, dtype=np.uint64))
    out = np.asarray(merge_sorted_words(_to_words(A), _to_words(B),
                                        interpret=True))
    assert np.array_equal(_to_u64(out), np.sort(np.concatenate([A, B])))


def test_merge_with_cross_run_duplicates():
    rng = np.random.default_rng(7)
    A = np.sort(rng.integers(0, 2**40, 4096, dtype=np.uint64))
    B = A.copy()                       # every key duplicated across runs
    out = np.asarray(merge_sorted_words(_to_words(A), _to_words(B),
                                        interpret=True))
    assert np.array_equal(_to_u64(out), np.sort(np.concatenate([A, B])))


def test_merge_heavy_ties_within_and_across():
    rng = np.random.default_rng(11)
    # tiny key space: long runs of equal keys spanning block boundaries
    A = np.sort(rng.integers(0, 7, 6000, dtype=np.uint64))
    B = np.sort(rng.integers(0, 7, 3000, dtype=np.uint64))
    out = np.asarray(merge_sorted_words(_to_words(A), _to_words(B),
                                        interpret=True))
    assert np.array_equal(_to_u64(out), np.sort(np.concatenate([A, B])))


import os


@pytest.mark.skipif(os.environ.get("KRISP_TPU_PERF_TEST") != "1",
                    reason="needs the real TPU; set KRISP_TPU_PERF_TEST=1")
def test_merge_tpu_bit_parity():
    """On-chip Mosaic lowering must agree bit-for-bit with the big sort
    (tools/ab_merge_path.py's parity check, pytest-visible gate).
    Subprocess with a cleaned env because conftest forces the CPU
    backend in-process (same pattern as test_perf_floor)."""
    import json
    import subprocess
    import sys
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "tools/ab_merge_path.py", "--n", "500000",
         "--reps", "1"], cwd="/root/repo", capture_output=True,
        text=True, timeout=3000, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["backend"] == "tpu"
    assert out["bit_parity"] is True


def test_merge_single_word_keys():
    rng = np.random.default_rng(3)
    A = np.sort(rng.integers(0, 2**32, 2500, dtype=np.uint64))
    B = np.sort(rng.integers(0, 2**32, 1500, dtype=np.uint64))
    Aw = A.astype(np.uint32)[None]
    Bw = B.astype(np.uint32)[None]
    out = np.asarray(merge_sorted_words(Aw, Bw, interpret=True))
    want = np.sort(np.concatenate([A, B])).astype(np.uint32)
    assert np.array_equal(out[0], want)
