"""Pallas TPU kernel: blocked bitonic comparator sort for multi-word keys.

The LSD path (ops/sort.py) expresses a W-word lexicographic sort as W
stable single-key XLA sorts, each carrying the other W-1 words as operands
— O(W^2) HBM traffic, and each pass pays XLA's general sort machinery.
This kernel sorts the full multi-word key in ONE comparator network:

  - phase A: every (ROWS x 128) VMEM block is fully sorted by an in-block
    bitonic network (lane-axis stages via pltpu.roll xor-shuffles, then
    sublane-axis stages), ascending/descending by block parity;
  - phase B: for each merge level k, the cross-block stages (distance >=
    one block) are elementwise min/max passes over aligned block pairs —
    the partner block is addressed by XOR on the BlockSpec index map —
    and the remaining intra-block stages fuse into one VMEM pass.

Every pass is sequential-grid, gather-free, and 2-D (Mosaic on v5e
supports pltpu.roll only on 32-bit 2-D data; see ops/pallas_pack.py).

The network is NOT stable: rows with equal full keys may permute.  Every
user in this engine is insensitive to that (duplicate rows are
indistinguishable, and within-run count order is summed out); where a
total order matters a caller appends a unique tiebreaker word (row id) —
see ops/sort.py:sort_rows.

Replaces the sort at the heart of the reference's stream engine
(/root/reference/src/krisp/kstream/kstream.py:45-119, GNU sort
subprocesses) at TPU VPU rate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _cmp_gt_lt(a, b):
    """Elementwise lexicographic (a > b, a < b) over word lists."""
    V = len(a)
    gt = a[0] > b[0]
    lt = a[0] < b[0]
    eq = a[0] == b[0]
    for w in range(1, V):
        gt = gt | (eq & (a[w] > b[w]))
        lt = lt | (eq & (a[w] < b[w]))
        if w + 1 < V:
            eq = eq & (a[w] == b[w])
    return gt, lt


def _stage(words, j, asc, nasc, rows):
    """One bitonic compare-exchange stage at flat distance ``j`` within a
    (rows, LANES) row-major tile.  ``asc``/``nasc`` are complementary bool
    masks (ascending / not ascending) — both are passed explicitly because
    Mosaic on v5e only lowers compares, ``&`` and ``|`` on bool vectors
    cleanly; ``~``, ``^`` and ``==`` emit an unsupported i8->i1 truncation."""
    if j < LANES:
        axis, d, size = 1, j, LANES
        pos = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    else:
        axis, d, size = 0, j // LANES, rows
        pos = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    low = (pos & d) == 0
    nlow = (pos & d) != 0
    partner = [jnp.where(low, pltpu.roll(w, size - d, axis),
                         pltpu.roll(w, d, axis)) for w in words]
    gt, lt = _cmp_gt_lt(words, partner)
    # want the smaller element where low == asc; expressed purely with
    # &,| on masks — select *between* bool vectors also hits the i8->i1
    # truncation
    want_small = (low & asc) | (nlow & nasc)
    want_large = (low & nasc) | (nlow & asc)
    take = (want_small & gt) | (want_large & lt)
    return [jnp.where(take, p, w) for w, p in zip(words, partner)]


def _asc_masks(k, rows):
    """(ascending, not-ascending) masks for merge size ``k`` (< block) at
    tile shape (rows, LANES): ascending where (flat_index & k) == 0."""
    if k < LANES:
        pos = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    else:
        pos = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        k = k // LANES
    return (pos & k) == 0, (pos & k) != 0


def _scalar_masks(pred_i32, rows):
    """Broadcast a traced 0/1 int32 scalar to complementary bool masks
    (broadcasting a scalar *bool* makes Mosaic emit an unsupported i8->i1
    truncation; int32 broadcast + compare lowers cleanly)."""
    v = jnp.full((rows, LANES), pred_i32, jnp.int32)
    return v == 1, v != 1


def _local_sort_kernel(x_ref, o_ref, *, V, rows):
    """Phase A: full bitonic sort of one block; direction by block parity
    (even blocks ascending) so adjacent blocks form bitonic sequences."""
    blk = pl.program_id(0)
    bs = rows * LANES
    words = [x_ref[w] for w in range(V)]
    k = 2
    while k <= bs:
        if k < bs:
            asc, nasc = _asc_masks(k, rows)
        else:
            asc, nasc = _scalar_masks(1 - (blk & 1), rows)
        j = k // 2
        while j >= 1:
            words = _stage(words, j, asc, nasc, rows)
            j //= 2
        k *= 2
    for w in range(V):
        o_ref[w] = words[w]


def _cross_kernel(x_ref, p_ref, o_ref, *, V, rows, j_blocks, k_blocks):
    """Phase B cross-block stage: elementwise compare-exchange between
    aligned positions of block ``b`` and block ``b ^ j_blocks``."""
    blk = pl.program_id(0)
    low = ((blk & j_blocks) == 0).astype(jnp.int32)
    asc = ((blk & k_blocks) == 0).astype(jnp.int32)
    # scalar xor is fine — only *vector* bool xor/not mis-lowers
    want_small, want_large = _scalar_masks(1 - (low ^ asc), rows)
    a = [x_ref[w] for w in range(V)]
    b = [p_ref[w] for w in range(V)]
    gt, lt = _cmp_gt_lt(a, b)
    take = (want_small & gt) | (want_large & lt)
    for w in range(V):
        o_ref[w] = jnp.where(take, b[w], a[w])


def _local_merge_kernel(x_ref, o_ref, *, V, rows, k_blocks):
    """Phase B tail: all intra-block stages of one merge level fused into
    a single VMEM pass; direction is constant per block."""
    blk = pl.program_id(0)
    asc, nasc = _scalar_masks(((blk & k_blocks) == 0).astype(jnp.int32),
                              rows)
    words = [x_ref[w] for w in range(V)]
    j = rows * LANES // 2
    while j >= 1:
        words = _stage(words, j, asc, nasc, rows)
        j //= 2
    for w in range(V):
        o_ref[w] = words[w]


def _block_rows(V: int) -> int:
    """Block height: the largest power-of-two row count whose VMEM
    working set fits.  Measured on v5e: the compiled local-sort kernel's
    scoped stack is ~5.1 KB per word-row (in+out grid buffers plus the
    network's live temporaries), so V * rows must stay under ~2.8k."""
    r = 2816 // V
    rows = 1
    while rows * 2 <= r:
        rows *= 2
    return max(8, min(rows, 2048))


def _pow2_above(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def bitonic_sort_words(stacked, interpret: bool = False,
                       block_rows: int | None = None):
    """Sort uint32[V, n] rows ascending by lexicographic word order.

    Pads to a power-of-two row count with all-ones rows (they sort to the
    tail, matching the engine's sentinel convention) and returns the
    leading n rows.  Not stable (see module docstring).
    """
    V, n = stacked.shape
    rows = block_rows or _block_rows(V)
    bs = rows * LANES
    N = max(_pow2_above(n), bs)
    if N != n:
        stacked = jnp.concatenate(
            [stacked, jnp.full((V, N - n), jnp.uint32(0xFFFFFFFF))], axis=1)
    B = N // bs
    x = stacked.reshape(V, B * rows, LANES)

    spec = pl.BlockSpec((V, rows, LANES), lambda t: (0, t, 0),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(x.shape, jnp.uint32)

    x = pl.pallas_call(
        partial(_local_sort_kernel, V=V, rows=rows),
        grid=(B,), in_specs=[spec], out_specs=spec, out_shape=out_shape,
        interpret=interpret,
    )(x)

    k_blocks = 2
    while k_blocks <= B:
        j_blocks = k_blocks // 2
        while j_blocks >= 1:
            pspec = pl.BlockSpec(
                (V, rows, LANES),
                lambda t, j_blocks=j_blocks: (0, t ^ j_blocks, 0),
                memory_space=pltpu.VMEM)
            x = pl.pallas_call(
                partial(_cross_kernel, V=V, rows=rows, j_blocks=j_blocks,
                        k_blocks=k_blocks),
                grid=(B,), in_specs=[spec, pspec], out_specs=spec,
                out_shape=out_shape, interpret=interpret,
            )(x, x)
            j_blocks //= 2
        x = pl.pallas_call(
            partial(_local_merge_kernel, V=V, rows=rows, k_blocks=k_blocks),
            grid=(B,), in_specs=[spec], out_specs=spec, out_shape=out_shape,
            interpret=interpret,
        )(x)
        k_blocks *= 2

    return x.reshape(V, N)[:, :n]
