"""Pallas TPU kernel: fused ASCII -> packed k-mer window keys.

The XLA path (ops/encode.py) expresses window packing as ~L shifted slices
that XLA must fuse; this kernel does the whole encode+window+pack explicitly
per VMEM tile: DMA an overlapping buffer block, derive 2-bit codes
arithmetically (no gather tables), and OR lane-rotated copies into the key
words — the [flank | genome | mid] bit placement of ops/encode.KeyLayout.

Both strands come out of ONE kernel: the tile DMA, the code derivation and
the validity stencil are shared, and the packing uses the same log-tree
chunk ladders as encode.window_keys_tree (chunk_a(i) = a bases from i in
one u32; a reverse-complement ladder rc_a(i) = revcomp of bases [i, i+a))
so each layout word composes from O(log L) shifted pieces instead of L
per-base shifts — ~4x fewer VPU passes per tile at spacer geometry.

TPU shape discipline (learned against Mosaic on v5e): all window data lives
in (rows, 128) 2-D tiles of 32-bit values; a shift by ``off`` becomes a
sublane roll by off//128 plus a lane rotate by off%128 with cross-row carry
(two rotated copies selected by lane index).  1-D values, unaligned value
slices, and non-32-bit rotates all fail or miscompile in Mosaic.

Equality with the XLA path is pinned by tests/test_pallas_pack.py in
interpret mode and on the real TPU by tools/pallas_tpu_check.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 128               # rows per output tile
TILE = ROWS * LANES       # windows per grid step
HALO_ROWS = 8             # overlap rows for the window stencil (L <= 1024)


def _codes_and_valid(chunk_u32, omit_soft: bool):
    """uint32 ASCII -> (2-bit code, validity as uint32), arithmetic only.

    Code order A<C<G<T matches ASCII rank: y = (c>>1)&3 gives A0 C1 T2 G3;
    y ^ (y>>1) swaps 2<->3.
    """
    upper = chunk_u32 & jnp.uint32(0xDF)   # fold a..z onto A..Z
    y = (upper >> 1) & jnp.uint32(3)
    code = y ^ (y >> 1)
    is_acgt = ((upper == ord("A")) | (upper == ord("C"))
               | (upper == ord("G")) | (upper == ord("T")))
    if omit_soft:
        is_lower = (chunk_u32 & jnp.uint32(0x20)) != 0
        is_acgt = is_acgt & ~is_lower
    return code, is_acgt.astype(jnp.uint32)


def _shifted_full(arr2d, off: int):
    """out[r, l] = flat(arr2d)[r*LANES + l + off], full height.

    Sublane roll + lane rotate with carry between adjacent rows.  The last
    ``off`` flat positions wrap circularly and carry garbage — callers keep
    cumulative offsets below the halo so the first ROWS rows stay exact.
    """
    if off == 0:
        return arr2d
    R = arr2d.shape[0]
    o1, o2 = divmod(off, LANES)

    def row_shift(k):
        return arr2d if k == 0 else pltpu.roll(arr2d, R - k, 0)

    a = row_shift(o1)
    if o2 == 0:
        return a
    b = row_shift(o1 + 1)
    rot_a = pltpu.roll(a, LANES - o2, 1)
    rot_b = pltpu.roll(b, LANES - o2, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, arr2d.shape, 1)
    return jnp.where(lane < LANES - o2, rot_a, rot_b)


def _ladder(first, combine, top: int):
    """Doubling chunk ladder up to chunk size ``top`` (a power of two,
    at most 16 = one full u32): arrs[a] covers ``a`` flat positions
    starting at i."""
    arrs = {1: first}
    a = 1
    while 2 * a <= top:
        arrs[2 * a] = combine(arrs[a], _shifted_full(arrs[a], a), a)
        a *= 2
    return arrs


def _tree_kernel(main_ref, halo_ref, ok_ref, *rest, runs, L, bits, n_win,
                 omit_soft, W):
    """Both strands of one genome tile: shared input + codes + validity,
    log-tree packing per layout word (see module docstring).  The input
    arrives as two pipelined VMEM blocks (the tile and its halo) so the
    grid's DMAs double-buffer automatically instead of stalling per step."""
    fwd_refs, rc_refs = rest[:W], rest[W:2 * W]
    t = pl.program_id(0)

    tile = jnp.concatenate([main_ref[:], halo_ref[:]], axis=0)
    codes, valid = _codes_and_valid(tile.astype(jnp.uint32), omit_soft)

    max_m = max((r[2] for rs in runs.values() for r in rs), default=1)
    top = 1
    while 2 * top <= min(max(max_m, L), 16):
        top *= 2
    c = _ladder(codes,
                lambda lo, hi, a: (lo << jnp.uint32(bits * a)) | hi, top)
    rc = _ladder(jnp.uint32(3) - codes,
                 lambda lo, hi, a: (hi << jnp.uint32(bits * a)) | lo, top)
    v = _ladder(valid, lambda lo, hi, a: lo & hi, top)

    # window validity: AND the binary decomposition of the L-wide stencil
    ok = None
    consumed, a = 0, 16
    while consumed < L:
        if a <= L - consumed:
            piece = _shifted_full(v[a], consumed)
            ok = piece if ok is None else ok & piece
            consumed += a
        else:
            a //= 2
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    base = (t * ROWS + row) * LANES + lane
    ok_ref[:] = (ok[:ROWS] != 0) & (base < n_win)

    def compose_fwd(p0, bit0, m):
        acc, consumed, a = None, 0, 16
        while consumed < m:
            if a <= m - consumed:
                sh = jnp.uint32(32 - bit0 - bits * (consumed + a))
                part = _shifted_full(c[a], p0 + consumed) << sh
                acc = part if acc is None else acc | part
                consumed += a
            else:
                a //= 2
        return acc

    def compose_rc(p0, bit0, m):
        # key slots p0..p0+m-1 hold sources L-1-p0 descending == the
        # revcomp chunk of source span [L-p0-m, L-p0), decomposed from
        # its most-significant (largest-source) end
        acc, consumed, a = None, 0, 16
        while consumed < m:
            if a <= m - consumed:
                sh = jnp.uint32(32 - bit0 - bits * (consumed + a))
                part = _shifted_full(rc[a], L - p0 - consumed - a) << sh
                acc = part if acc is None else acc | part
                consumed += a
            else:
                a //= 2
        return acc

    for refs, compose in ((fwd_refs, compose_fwd), (rc_refs, compose_rc)):
        for w in range(W):
            acc = jnp.zeros((ROWS, LANES), jnp.uint32)
            for p0, bit0, m in runs.get(w, []):
                acc = acc | compose(p0, bit0, m)[:ROWS]
            refs[w][:] = acc


@partial(jax.jit, static_argnames=("left", "mid", "right", "bits", "n_files",
                                   "omit_soft", "interpret"))
def pallas_window_keys_both(buffer, left: int, mid: int, right: int,
                            bits: int, n_files: int, omit_soft: bool = False,
                            interpret: bool = False):
    """Both strands of bit-packed window keys in one fused kernel.

    buffer: uint8[P].  Returns (ok bool[n_pad], fwd words, rc words) where
    n_pad rounds the window count up to TILE; ok applies to both strands.
    2-bit encoding only.
    """
    from .encode import KeyLayout, _word_runs

    assert bits == 2, "pallas pack kernel covers the 2-bit fast path"
    L = left + mid + right
    assert L <= HALO_ROWS * LANES
    layout = KeyLayout(left, mid, right, bits, n_files)
    P = buffer.shape[0]
    n_win = P - L + 1
    n_tiles = pl.cdiv(n_win, TILE)
    padded = n_tiles * TILE

    buf = jnp.concatenate(
        [buffer, jnp.zeros(padded + HALO_ROWS * LANES - P, jnp.uint8)])
    buf2d = buf.reshape(-1, LANES)

    perm_flank = tuple(range(left)) + tuple(range(left + mid, L))
    perm_mid = tuple(range(left, left + mid))
    off_flank, off_mid = layout.base_offsets()
    runs = dict(_word_runs(perm_flank + perm_mid,
                           tuple(off_flank) + tuple(off_mid), bits))

    W = layout.n_words
    kernel = partial(_tree_kernel, runs=runs, L=L, bits=bits, n_win=n_win,
                     omit_soft=omit_soft, W=W)

    # main tile block + halo block over the SAME buffer: the halo block
    # index advances ROWS//HALO_ROWS halo-sized steps per tile, landing at
    # the rows just past the tile
    step = ROWS // HALO_ROWS
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((HALO_ROWS, LANES),
                               lambda t: (step * t + step, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.bool_)]
        + [jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.uint32)] * (2 * W),
        out_specs=[pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)] * (2 * W + 1),
        interpret=interpret,
    )(buf2d, buf2d)
    ok = out[0].reshape(-1)
    words = [w.reshape(-1) for w in out[1:]]
    return ok, words[:W], words[W:]


def pallas_window_keys(buffer, left: int, mid: int, right: int, bits: int,
                       n_files: int, revcomp: bool = False,
                       omit_soft: bool = False, interpret: bool = False):
    """One strand of bit-packed window keys (thin view over the fused
    both-strands kernel; the product pipeline calls
    pallas_window_keys_both directly).

    buffer: uint8[P].  Returns (ok bool[n_pad], words list of uint32[n_pad])
    where n_pad rounds the window count up to TILE.  2-bit encoding only.
    """
    ok, fwd, rc = pallas_window_keys_both(buffer, left, mid, right, bits,
                                          n_files, omit_soft=omit_soft,
                                          interpret=interpret)
    return ok, (rc if revcomp else fwd)
