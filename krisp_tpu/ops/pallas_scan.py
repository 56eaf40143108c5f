"""Pallas TPU kernels: fused segmented scans for the intersection survivor
test.

The XLA path (ops/intersect.mark_survivors + run-length counts) issues ~6
separate full-array scans (cumsum/cummax/reverse-cummin) plus adjacent-
compare passes — each a round trip through HBM.  These kernels fuse all
forward-direction quantities into one sweep and all backward-direction
quantities into a second, using the sequential-grid carry pattern: the TPU
grid executes tiles in order on one core, so scalar carries live in SMEM
scratch across grid steps.

In-tile prefix ops use the 2-D discipline from pallas_pack.py: lane-axis
log-step rolls with lane-index masks, then a row-offset fixup via a
sublane-axis prefix over per-row totals.

Everything is validated element-exact against the XLA path by
tests/test_pallas_scan.py (interpret mode) and tools/pallas_tpu_check.py
(compiled).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 256
TILE = ROWS * LANES

NEG = -(2**31 - 1)   # python ints: jnp scalars would be captured consts
POS = 2**31 - 1


def _lane_prefix(x, op, identity):
    """Inclusive prefix along the lane axis (within each row)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for d in (1, 2, 4, 8, 16, 32, 64):
        shifted = pltpu.roll(x, d, 1)
        x = op(x, jnp.where(lane >= d, shifted, identity))
    return x


def _row_prefix(x, op, identity):
    """Inclusive prefix along the sublane axis (down the rows)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < x.shape[0]:
        shifted = pltpu.roll(x, d, 0)
        x = op(x, jnp.where(row >= d, shifted, identity))
        d *= 2
    return x


def _flat_prefix(x, op, identity):
    """Inclusive prefix over the row-major flat order of a (ROWS, LANES)
    tile: lane prefix + per-row offset from the previous rows' totals."""
    lanewise = _lane_prefix(x, op, identity)
    row_last = lanewise[:, LANES - 1:LANES]          # total per row
    row_off = _row_prefix(jnp.broadcast_to(row_last, x.shape), op, identity)
    # offset for row r = combined totals of rows < r
    prev_off = pltpu.roll(row_off, 1, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    prev_off = jnp.where(row >= 1, prev_off, identity)
    return op(lanewise, prev_off)


def _lane_suffix(x, op, identity):
    """Inclusive suffix along the lane axis (within each row)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for d in (1, 2, 4, 8, 16, 32, 64):
        shifted = pltpu.roll(x, LANES - d, 1)   # value from lane l + d
        x = op(x, jnp.where(lane < LANES - d, shifted, identity))
    return x


def _row_suffix(x, op, identity):
    """Inclusive suffix along the sublane axis (up the rows)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    R = x.shape[0]
    d = 1
    while d < R:
        shifted = pltpu.roll(x, R - d, 0)       # value from row r + d
        x = op(x, jnp.where(row < R - d, shifted, identity))
        d *= 2
    return x


def _flat_suffix(x, op, identity):
    """Inclusive suffix over the row-major flat order of a tile (Mosaic has
    no `rev`, so the reverse scan runs directly in suffix form)."""
    lanewise = _lane_suffix(x, op, identity)
    row_first = lanewise[:, 0:1]                 # suffix total per row
    row_off = _row_suffix(jnp.broadcast_to(row_first, x.shape), op, identity)
    R = x.shape[0]
    nxt_off = pltpu.roll(row_off, R - 1, 0)      # totals of rows > r
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    nxt_off = jnp.where(row < R - 1, nxt_off, identity)
    return op(lanewise, nxt_off)


def _shift_one(arr, carry_scalar):
    """prev[i] = flat(arr)[i-1], with ``carry_scalar`` entering at i=0."""
    rolled = pltpu.roll(arr, 1, 1)                  # lane shift within rows
    from_prev_row = pltpu.roll(rolled, 1, 0)        # row above, lane 127
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    prev = jnp.where(lane >= 1, rolled, from_prev_row)
    return jnp.where((lane == 0) & (row == 0), carry_scalar, prev)


def _forward_kernel(words_ref, valid_ref, head_flank_ref, head_full_ref,
                    head_ff_ref, c_ref, base_ref, gid_ref, carry, *,
                    W, flank_words, flank_mask, ff_words, ff_mask):
    """One forward sweep: run heads at three granularities + prefix sums.

    carry (SMEM int32[W + 4]): last element of each word array, then
    running c total, running base max, running gid total, first-tile flag.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for w in range(W):
            carry[w] = -1  # sentinel "no previous element"
        carry[W] = 0       # c total
        carry[W + 1] = -1  # base running max
        carry[W + 2] = 0   # gid total
        carry[W + 3] = 0   # unused

    words = [words_ref[w] for w in range(W)]
    prev = [_shift_one(words[w].astype(jnp.int32),
                       carry[w]).astype(jnp.uint32) for w in range(W)]
    first = (t == 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    is_origin = (row == 0) & (lane == 0) & first

    def heads(idxs, masks):
        neq = jnp.zeros((ROWS, LANES), bool)
        for w, m in zip(idxs, masks):
            a = words[w] & jnp.uint32(m)
            b = prev[w] & jnp.uint32(m)
            neq = neq | (a != b)
        return neq | is_origin

    head_full = heads(range(W), [0xFFFFFFFF] * W)
    head_ff = heads(ff_words, ff_mask)
    head_flank = heads(flank_words, flank_mask)
    valid = valid_ref[:] != 0

    x = (head_ff & valid).astype(jnp.int32)
    c_local = _flat_prefix(x, jnp.add, jnp.int32(0))
    c = c_local + carry[W]

    gid_local = _flat_prefix(head_flank.astype(jnp.int32), jnp.add,
                             jnp.int32(0))
    gid = gid_local + carry[W + 2] - 1

    base_in = jnp.where(head_flank, c - x, jnp.int32(NEG))
    base_local = _flat_prefix(base_in, jnp.maximum, jnp.int32(NEG))
    base = jnp.maximum(base_local, carry[W + 1])

    head_flank_ref[:] = head_flank
    head_full_ref[:] = head_full
    head_ff_ref[:] = head_ff
    c_ref[:] = c
    base_ref[:] = base
    gid_ref[:] = gid

    for w in range(W):
        carry[w] = words[w][ROWS - 1, LANES - 1].astype(jnp.int32)
    carry[W] = c[ROWS - 1, LANES - 1]
    carry[W + 1] = base[ROWS - 1, LANES - 1]
    carry[W + 2] = gid[ROWS - 1, LANES - 1] + 1


def _reverse_kernel(a_ref, b_ref, out_a_ref, out_b_ref, carry):
    """Two reverse (suffix) cummins in one sweep; the grid iterates tiles
    from the end via the index_map, and the in-tile part is a direct suffix
    scan (Mosaic has no `rev`)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry[0] = jnp.int32(POS)
        carry[1] = jnp.int32(POS)

    ma = jnp.minimum(_flat_suffix(a_ref[:], jnp.minimum, jnp.int32(POS)),
                     carry[0])
    mb = jnp.minimum(_flat_suffix(b_ref[:], jnp.minimum, jnp.int32(POS)),
                     carry[1])
    out_a_ref[:] = ma
    out_b_ref[:] = mb
    carry[0] = ma[0, 0]
    carry[1] = mb[0, 0]


def _masks_for_bits(n_bits: int, W: int):
    """(word indices, bit masks) covering the leading n_bits of the key."""
    idxs, masks = [], []
    full = n_bits // 32
    rem = n_bits % 32
    for w in range(full):
        idxs.append(w)
        masks.append(0xFFFFFFFF)
    if rem:
        idxs.append(full)
        masks.append(((1 << rem) - 1) << (32 - rem))
    return tuple(idxs), tuple(masks)


@partial(jax.jit, static_argnames=("flank_bits", "ff_bits", "n_files",
                                   "interpret"))
def pallas_survivor_scan(words, valid, flank_bits: int, ff_bits: int,
                         n_files: int, interpret: bool = False):
    """Fused replacement for mark_survivors + run-length counts.

    words: uint32[W, n] sorted keys (n a multiple of TILE); valid:
    uint32[n] (nonzero = valid row).  Returns (keep, counts, gid) matching
    the XLA path element-exactly.
    """
    W, n = words.shape
    assert n % TILE == 0
    n_tiles = n // TILE
    flank_words, flank_mask = _masks_for_bits(flank_bits, W)
    ff_words, ff_mask = _masks_for_bits(ff_bits, W)

    shape2 = (n_tiles * ROWS, LANES)
    words2 = words.reshape(W, n_tiles * ROWS, LANES)
    valid2 = valid.reshape(shape2)

    fwd = pl.pallas_call(
        partial(_forward_kernel, W=W, flank_words=flank_words,
                flank_mask=flank_mask, ff_words=ff_words, ff_mask=ff_mask),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((W, ROWS, LANES), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.bool_)] * 3
        + [jax.ShapeDtypeStruct(shape2, jnp.int32)] * 3,
        out_specs=[pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)] * 6,
        scratch_shapes=[pltpu.SMEM((W + 4,), jnp.int32)],
        interpret=interpret,
    )(words2, valid2)
    head_flank, head_full, head_ff, c, base, gid = fwd

    def reverse_cummin2(arr_a, arr_b):
        rev = lambda t, n_tiles=n_tiles: (n_tiles - 1 - t, 0)
        return pl.pallas_call(
            _reverse_kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((ROWS, LANES), rev,
                                   memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct(shape2, jnp.int32)] * 2,
            out_specs=[pl.BlockSpec((ROWS, LANES), rev,
                                    memory_space=pltpu.VMEM)] * 2,
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
            interpret=interpret,
        )(arr_a, arr_b)

    flat = lambda a: a.reshape(n)
    head_flank_f = flat(head_flank)
    head_full_f = flat(head_full)
    c_f = flat(c)
    base_f = flat(base)
    gid_f = flat(gid)
    valid_f = valid != 0

    idx = jnp.arange(n, dtype=jnp.int32)
    # is_last = next row starts a new flank group
    is_last = jnp.concatenate([head_flank_f[1:], jnp.ones(1, bool)])
    rh = jnp.where(head_full_f, idx, n)
    nxt_src = jnp.concatenate([rh[1:], jnp.full(1, n, jnp.int32)])
    endc2, nxt2 = reverse_cummin2(
        jnp.where(is_last, c_f, jnp.int32(POS)).reshape(shape2),
        nxt_src.reshape(shape2))
    endc = flat(endc2)
    nxt = flat(nxt2)
    survive = ((endc - base_f) == n_files) & valid_f
    counts = jnp.where(head_full_f & valid_f, nxt - idx, 0).astype(jnp.uint32)

    keep = survive & head_full_f
    return keep, counts, gid_f
