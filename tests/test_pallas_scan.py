"""Fused survivor-scan kernel vs. the XLA scan path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from krisp_tpu.ops import intersect as I
from krisp_tpu.ops.encode import KeyLayout
from krisp_tpu.ops.pallas_scan import pallas_survivor_scan, TILE


def xla_reference(words, valid, flank_bits, ff_bits, n_files):
    keys = [jnp.asarray(w) for w in words]
    n = keys[0].shape[0]
    head_full = I._run_heads(keys)
    head_ff = I._masked_head(keys, ff_bits)
    head_flank = I._masked_head(keys, flank_bits)
    valid_b = jnp.asarray(valid) != 0
    idx = jnp.arange(n, dtype=jnp.int32)
    rh = jnp.where(head_full, idx, n)
    nxt = I._reverse_cummin(jnp.concatenate([rh[1:],
                                             jnp.full(1, n, jnp.int32)]))
    counts = jnp.where(head_full & valid_b, nxt - idx, 0)
    import jax
    x = (head_ff & valid_b).astype(jnp.int32)
    c = jnp.cumsum(x)
    base = jax.lax.cummax(jnp.where(head_flank, c - x, -1))
    is_last = jnp.concatenate([head_flank[1:], jnp.ones(1, bool)])
    endc = I._reverse_cummin(jnp.where(is_last, c, I.BIG_I32))
    survive = ((endc - base) == n_files) & valid_b
    gid = jnp.cumsum(head_flank.astype(jnp.int32)) - 1
    return (np.asarray(survive & head_full), np.asarray(counts),
            np.asarray(gid))


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_scan_matches_xla(seed):
    rng = np.random.default_rng(seed)
    n = 2 * TILE
    n_files = 3
    layout = KeyLayout(5, 1, 3, 2, n_files)
    W = layout.n_words
    # few distinct values -> long runs at every granularity
    words = np.stack([rng.integers(0, 6, n).astype(np.uint32) << 28
                      for _ in range(W)])
    fw, fsh = layout.file_word_shift()
    file_vals = rng.integers(0, n_files + 1, n).astype(np.uint32)
    words[fw] |= np.minimum(file_vals, layout.file_sentinel) << fsh
    order = np.lexsort(tuple(words[::-1]))
    words = words[:, order]
    valid = (((words[fw] >> np.uint32(fsh))
              & np.uint32(layout.file_sentinel))
             != layout.file_sentinel).astype(np.uint32)

    ff_bits = layout.file_off + layout.file_bits
    keep_p, cnt_p, gid_p = pallas_survivor_scan(
        words, valid, layout.flank_bits, ff_bits, n_files, interpret=True)
    keep_x, cnt_x, gid_x = xla_reference(words, valid, layout.flank_bits,
                                         ff_bits, n_files)
    np.testing.assert_array_equal(np.asarray(keep_p), keep_x)
    np.testing.assert_array_equal(np.asarray(cnt_p), cnt_x.astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(gid_p), gid_x)
