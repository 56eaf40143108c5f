"""Pallas TPU kernel: fused ASCII -> packed k-mer window keys.

The XLA path (ops/encode.py) expresses window packing as ~L shifted slices
that XLA must fuse; this kernel does the whole encode+window+pack explicitly
per VMEM tile: DMA an overlapping buffer block, derive 2-bit codes
arithmetically (no gather tables), and OR lane-rotated copies into the key
words — the [flank | genome | mid] bit placement of ops/encode.KeyLayout.

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
ROWS = 32                 # rows per output tile
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


def _shifted(arr2d, off: int):
    """out[r, l] = flat(arr2d)[r*LANES + l + off], for the first ROWS rows.

    Sublane roll + lane rotate with carry between adjacent rows.
    """
    if off == 0:
        return arr2d[:ROWS]
    R = arr2d.shape[0]
    o1, o2 = divmod(off, LANES)

    def row_shift(k):
        return arr2d if k == 0 else pltpu.roll(arr2d, R - k, 0)

    a = row_shift(o1)
    if o2 == 0:
        return a[:ROWS]
    b = row_shift(o1 + 1)
    rot_a = pltpu.roll(a, LANES - o2, 1)
    rot_b = pltpu.roll(b, LANES - o2, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, arr2d.shape, 1)
    return jnp.where(lane < LANES - o2, rot_a, rot_b)[:ROWS]


def _pack_kernel(buf_hbm, ok_ref, *rest, perm, offsets, L, bits, n_win,
                 revcomp, omit_soft):
    scratch, sem = rest[-2], rest[-1]
    word_refs = rest[:-2]
    t = pl.program_id(0)

    copy = pltpu.make_async_copy(
        buf_hbm.at[pl.ds(t * ROWS, ROWS + HALO_ROWS), :], scratch, sem)
    copy.start()
    copy.wait()

    codes, valid = _codes_and_valid(scratch[:].astype(jnp.uint32), omit_soft)
    if revcomp:
        codes = jnp.uint32(3) - codes

    ok = jnp.ones((ROWS, LANES), bool)
    for j in range(L):
        ok = ok & (_shifted(valid, j) != 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    base = (t * ROWS + row) * LANES + lane
    ok_ref[:] = ok & (base < n_win)

    for w, word_ref in enumerate(word_refs):
        acc = jnp.zeros((ROWS, LANES), jnp.uint32)
        for p, off in zip(perm, offsets):
            if off // 32 != w:
                continue
            sh = jnp.uint32(32 - (off % 32) - bits)
            src = L - 1 - p if revcomp else p
            acc = acc | (_shifted(codes, src) << sh)
        word_ref[:] = acc


@partial(jax.jit, static_argnames=("left", "mid", "right", "bits", "n_files",
                                   "revcomp", "omit_soft", "interpret"))
def pallas_window_keys(buffer, left: int, mid: int, right: int, bits: int,
                       n_files: int, revcomp: bool = False,
                       omit_soft: bool = False, interpret: bool = False):
    """One strand of bit-packed window keys via the Pallas kernel.

    buffer: uint8[P].  Returns (ok bool[n_pad], words list of uint32[n_pad])
    where n_pad rounds the window count up to TILE.  2-bit encoding only.
    """
    from .encode import KeyLayout

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
    perm = perm_flank + perm_mid
    offsets = tuple(off_flank) + tuple(off_mid)

    W = layout.n_words
    kernel = partial(_pack_kernel, perm=perm, offsets=offsets, L=L,
                     bits=bits, n_win=n_win, revcomp=revcomp,
                     omit_soft=omit_soft)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.bool_)]
        + [jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.uint32)] * W,
        out_specs=[pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)] * (W + 1),
        scratch_shapes=[pltpu.VMEM((ROWS + HALO_ROWS, LANES), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(buf2d)
    return out[0].reshape(-1), [w.reshape(-1) for w in out[1:]]
