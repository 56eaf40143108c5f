"""Interpret-mode pins for the Pallas bitonic comparator sort.

The compiled-TPU twin is tools/pallas_sort_check.py (run on the real
chip); these tests run the identical kernel code in interpret mode on CPU
and pin it element-exact against numpy's lexicographic order.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from krisp_tpu.ops.pallas_sort import bitonic_sort_words


def _ref(w):
    return w[:, np.lexsort(w[::-1])]


@pytest.mark.parametrize("V,n,block_rows", [
    (1, 5000, 8),
    (2, 70000, 8),
    (3, 1 << 14, 16),
    (4, 999, 8),
    (2, 8 * 128, 8),        # exactly one block
    (2, 8 * 128 * 4, 8),    # power-of-two block count
])
def test_matches_lexicographic(V, n, block_rows):
    rng = np.random.default_rng(V * 1000 + n)
    w = rng.integers(0, 2**32, (V, n), dtype=np.uint64).astype(np.uint32)
    w[:, (w[0] % 5 == 0)] = 7  # duplicate-heavy stripe
    out = np.asarray(bitonic_sort_words(jnp.asarray(w), interpret=True,
                                        block_rows=block_rows))
    np.testing.assert_array_equal(out, _ref(w))


def test_sentinel_padding_rows_sort_last():
    rng = np.random.default_rng(0)
    n = 3000
    w = rng.integers(0, 2**31, (2, n), dtype=np.uint64).astype(np.uint32)
    w[:, 100:200] = 0xFFFFFFFF  # sentinel rows mixed in
    out = np.asarray(bitonic_sort_words(jnp.asarray(w), interpret=True,
                                        block_rows=8))
    np.testing.assert_array_equal(out, _ref(w))
    assert (out[:, -100:] == 0xFFFFFFFF).all()


def test_unique_tiebreak_word_gives_total_order():
    """Appending a unique row id as the last word makes the (unstable)
    network reproduce the stable sort's exact permutation."""
    rng = np.random.default_rng(1)
    n = 5000
    k = rng.integers(0, 50, n).astype(np.uint32)  # heavy duplicates
    iota = np.arange(n, dtype=np.uint32)
    w = np.stack([k, iota])
    out = np.asarray(bitonic_sort_words(jnp.asarray(w), interpret=True,
                                        block_rows=8))
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(out[0], k[order])
    np.testing.assert_array_equal(out[1], iota[order])
