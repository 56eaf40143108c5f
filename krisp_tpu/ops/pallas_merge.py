"""Pallas TPU kernel: merge-path merge of two sorted multi-word runs.

The round-3 sort study (BASELINE.md "Sort A/B coverage") modeled a
sorted-runs + merge-path recombination as cost-parity with the single
big XLA sort but never built it; this is the smallest honest prototype —
a 2-run merge at one size — so the stop-decision can rest on an on-chip
measurement (tools/ab_merge_path.py) instead of only the cost model.

Algorithm (classic GPU merge-path, re-cut for the TPU memory system):

  - XLA side: for every output block boundary g*BLK, a vectorized
    binary search finds the diagonal split (how many of the first g*BLK
    merged elements come from A).  G ~ n/BLK searches of log n steps —
    negligible next to the data pass.
  - Pallas side: block g reads a 2-block window of A starting at the
    block containing its split (same for B) via scalar-prefetched block
    indices, aligns the window to the split with a dynamic flat roll
    (sublane roll + lane rotate with carry, the dynamic version of
    ops/pallas_pack._shifted_full), masks the tail beyond its count
    with sentinel 0xFFFFFFFF rows, and merges A-slice + reversed
    B-slice — a bitonic sequence — with one log2(2*BLK)-stage bitonic
    merge (ops/pallas_sort._stage).  The merge-path invariant
    (a_cnt + b_cnt == BLK) makes the first BLK lanes of the result the
    output block.

Like the block sort, the merge is NOT stable: equal keys may permute
(the partition breaks ties arbitrarily), which every caller here
tolerates (ops/pallas_sort docstring).

HBM traffic per output element: 2 reads (window overlap) + 1 write,
vs the ~W^2-pass LSD sort and the log-depth cross-block passes of the
bitonic sort — the measurable question is whether the partitioned
2-block windows beat the big sort's operand traffic at real sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sort import LANES, _cmp_gt_lt, _scalar_masks, _stage

_INF = jnp.uint32(0xFFFFFFFF)


def _lex_lt(a_words, b_words):
    """Lexicographic a < b over per-word uint32 arrays (the sort
    kernel's comparator, so search and merge can never diverge)."""
    _, lt = _cmp_gt_lt(a_words, b_words)
    return lt


def _take(words, idx, n):
    """words[:, idx] with +inf beyond [0, n) (idx may be out of range)."""
    safe = jnp.clip(idx, 0, n - 1)
    oob = (idx < 0) | (idx >= n)
    return [jnp.where(oob, _INF, jnp.take(w, safe, axis=0))
            for w in words]


def _merge_splits(A, B, n_a, n_b, blk, G):
    """a_split[g] for diagonals g*blk, g in [0, G]: how many of the
    first g*blk merged elements come from A.  Vectorized binary search,
    ties sent to B first (any valid split yields a sorted merge)."""
    Aw = [A[w] for w in range(A.shape[0])]
    Bw = [B[w] for w in range(B.shape[0])]
    diag = jnp.arange(G + 1, dtype=jnp.int32) * blk
    lo = jnp.maximum(diag - n_b, 0)
    hi = jnp.minimum(diag, n_a)
    steps = max((n_a + 1).bit_length(), 1)

    def body(_, lohi):
        lo, hi = lohi
        open_ = lo < hi          # fixed step count: freeze closed searches
        mid = (lo + hi) // 2
        a_mid = _take(Aw, mid, n_a)
        b_prev = _take(Bw, diag - 1 - mid, n_b)
        # split mid is too small iff the next A element still precedes
        # the last B element taken: A[mid] < B[diag-1-mid].  Equal keys
        # stop the search (ties go to the B side) — any valid split
        # yields a sorted (unstable) merge.
        too_small = open_ & _lex_lt(a_mid, b_prev)
        lo = jnp.where(too_small, mid + 1, lo)
        hi = jnp.where(open_ & ~too_small, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _rolled_front(win, off, rows):
    """First ``rows`` rows of flat(win) shifted left by ``off`` (traced):
    out flat[p] = win flat[p + off], for p < rows*LANES.  ``win`` has
    2*rows rows; off in [0, rows*LANES)."""
    R2 = win.shape[0]
    o1 = off // LANES
    o2 = off % LANES
    a = pltpu.roll(win, (R2 - o1) % R2, 0)
    b = pltpu.roll(win, (R2 - o1 - 1) % R2, 0)
    rot_a = pltpu.roll(a, (LANES - o2) % LANES, 1)
    rot_b = pltpu.roll(b, (LANES - o2) % LANES, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    full = jnp.where(lane < LANES - o2, rot_a, rot_b)
    return full[:rows]


def _merge_kernel(splits_ref, *refs, V, rows, n_pad_b):
    """One output block: align the A window to its split (ascending,
    tail inf-masked) and the PRE-REVERSED B window so its descending
    values sit right-aligned (front inf-masked) — Mosaic has no ``rev``
    lowering, so B arrives flipped from XLA.  The concatenation is
    bitonic; one log2(2*blk)-stage bitonic merge yields the block."""
    g = pl.program_id(0)
    blk = rows * LANES
    a_lo = splits_ref[g]
    a_hi = splits_ref[g + 1]
    # diagonal g covers merged positions [g*blk, (g+1)*blk)
    b_lo = g * blk - a_lo
    b_hi = (g + 1) * blk - a_hi
    a_main = refs[:V]
    a_halo = refs[V:2 * V]
    b_main = refs[2 * V:3 * V]
    b_halo = refs[3 * V:4 * V]
    o_refs = refs[4 * V:5 * V]

    flat = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES \
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

    def slice_of(main, halo, off_in_blk, keep):
        out = []
        for w in range(V):
            win = jnp.concatenate([main[w][0], halo[w][0]], axis=0)
            front = _rolled_front(win, off_in_blk, rows)
            out.append(jnp.where(keep, front, jnp.uint32(0xFFFFFFFF)))
        return out

    a_words = slice_of(a_main, a_halo, a_lo % blk, flat < a_hi - a_lo)
    # reversed-B window: flat offset n_pad_b - b_lo - blk in the flipped
    # array puts B[b_lo:b_hi] descending at positions [blk-cnt, blk)
    b_off = (n_pad_b - b_lo) % blk
    b_words = slice_of(b_main, b_halo, b_off,
                       flat >= blk - (b_hi - b_lo))

    # (A ascending with inf tail, B descending with inf head) is bitonic
    words = [jnp.concatenate([aw, bw], axis=0)
             for aw, bw in zip(a_words, b_words)]
    asc, nasc = _scalar_masks(jnp.int32(1), 2 * rows)
    j = blk
    while j >= 1:
        words = _stage(words, j, asc, nasc, 2 * rows)
        j //= 2
    for w in range(V):
        o_refs[w][0] = words[w][:rows]


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def merge_sorted_words(A, B, interpret: bool = False, block_rows: int = 8):
    """Merge two lexicographically sorted uint32[V, n] tables into one
    sorted uint32[V, nA+nB] table (unstable among equal keys)."""
    V, n_a = A.shape
    Vb, n_b = B.shape
    assert V == Vb
    rows = block_rows
    blk = rows * LANES

    def pad_to_blocks(X, n):
        nblk = -(-max(n, 1) // blk)
        # +1 halo block so the 2-block window always exists
        padded = jnp.full((V, (nblk + 1) * blk), _INF, jnp.uint32)
        return padded.at[:, :n].set(X), nblk

    Ap, nblk_a = pad_to_blocks(A, n_a)
    Bp, nblk_b = pad_to_blocks(B, n_b)
    G = nblk_a + nblk_b
    splits = _merge_splits(Ap, Bp, nblk_a * blk, nblk_b * blk, blk, G)

    A3 = Ap.reshape(V, (nblk_a + 1) * rows, LANES)
    # B ships pre-reversed: Mosaic has no rev lowering, and the flipped
    # layout lets each block read its descending slice with the same
    # rolled-window machinery as A (one XLA pass over B, done once)
    n_pad_b = (nblk_b + 1) * blk
    B3 = Bp[:, ::-1].reshape(V, (nblk_b + 1) * rows, LANES)

    def a_map(which):
        def f(g, splits_ref):
            # clamp: when a run is fully consumed its split sits at the
            # last real block boundary and the halo index would run one
            # past the padded array — an OOB block DMA on TPU (the
            # fetched data is fully masked either way)
            return (0, jnp.minimum(splits_ref[g] // blk + which, nblk_a),
                    0)
        return f

    def b_map(which):
        def f(g, splits_ref):
            b_lo = g * blk - splits_ref[g]
            return (0, jnp.minimum((n_pad_b - b_lo - blk) // blk + which,
                                   nblk_b), 0)
        return f

    word_spec_a = [pl.BlockSpec((1, rows, LANES), a_map(w))
                   for w in (0, 1)]
    word_spec_b = [pl.BlockSpec((1, rows, LANES), b_map(w))
                   for w in (0, 1)]
    in_specs = ([word_spec_a[0]] * V + [word_spec_a[1]] * V
                + [word_spec_b[0]] * V + [word_spec_b[1]] * V)
    out_specs = [pl.BlockSpec((1, rows, LANES), lambda g, s: (0, g, 0))
                 for _ in range(V)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        partial(_merge_kernel, V=V, rows=rows, n_pad_b=n_pad_b),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, G * rows, LANES), jnp.uint32)
                   for _ in range(V)],
        interpret=interpret,
    )(splits, *([A3[w:w + 1] for w in range(V)] * 2
                + [B3[w:w + 1] for w in range(V)] * 2))
    merged = jnp.concatenate([o.reshape(1, G * blk) for o in outs], axis=0)
    return merged[:, :n_a + n_b]
