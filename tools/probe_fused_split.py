#!/usr/bin/env python3
"""Per-stage device timing of the fused spacer pipeline at bench scale.

Separately jits + times, with device-resident inputs and forced-sync pulls:
  1. unpack_genomes (2-bit packed -> ASCII)
  2. window-key extraction (pallas pack on/off)
  3. the global LSD sort over the extracted keys
  4. survivor scans + compaction
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krisp_tpu.runtime import setup
setup()

import jax
import jax.numpy as jnp

N_FILES = int(os.environ.get("KRISP_BENCH_FILES", 5))
SIZE = int(os.environ.get("KRISP_BENCH_GENOME_SIZE", 4_000_000))
LEFT, MID, RIGHT, BITS = 25, 1, 2, 2
REPS = 5


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(name, fn, *args):
    out = fn(*args)
    sync(out)  # compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms  (all: "
          + " ".join(f"{t*1e3:.0f}" for t in ts) + ")")
    return out


def main():
    from krisp_tpu import dna
    from krisp_tpu.engine.pipeline import _pack_genomes_host, _encoding_tables
    from krisp_tpu.ops import intersect as I
    from krisp_tpu.ops.sort import sort_rows
    from krisp_tpu.ops.encode import KeyLayout

    rng = np.random.default_rng(7)
    stacked = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                         size=(N_FILES, SIZE))
    pk, vb = _pack_genomes_host(stacked, omit_soft=False)
    tables = _encoding_tables(BITS, False)
    dtables = tuple(jax.device_put(t) for t in tables)
    dpk, dvb = jax.device_put(pk), jax.device_put(vb)
    dstacked = jax.device_put(stacked)
    sync((dpk, dvb, dstacked, dtables))

    layout = KeyLayout(LEFT, MID, RIGHT, BITS, N_FILES)

    unpack = jax.jit(I.unpack_genomes)
    buffers = timeit("1. unpack_genomes", unpack, dpk, dvb)

    @partial(jax.jit, static_argnames=("use_pallas",))
    def extract(bufs, use_pallas):
        flat, _ = I._all_window_keys(bufs, *dtables, LEFT, MID, RIGHT,
                                     BITS, N_FILES, use_pallas, False)
        return jnp.stack(flat)

    flat_x = timeit("2a. window keys (XLA pack)", partial(extract, use_pallas=False), buffers)
    flat_p = timeit("2b. window keys (pallas pack)", partial(extract, use_pallas=True), buffers)

    @jax.jit
    def do_sort(flat):
        ks, _ = sort_rows([flat[0], flat[1]])
        return jnp.stack(ks)

    sorted_k = timeit("3. global LSD sort", do_sort, flat_p)

    @jax.jit
    def scans(sk):
        keep, counts, gid = I.survivor_mark_bits([sk[0], sk[1]], layout,
                                                 N_FILES)
        (w, c, g), nk = I.compact_rows([sk, counts, gid], keep, 1 << 14)
        return w, c, g, nk

    timeit("4. survivor scans + compact", scans, sorted_k)

    @jax.jit
    def scans_pallas(sk):
        from krisp_tpu.ops.pallas_scan import pallas_survivor_scan, TILE
        n = sk.shape[1]
        fw, fsh = layout.file_word_shift()
        file_field = ((sk[fw] >> jnp.uint32(fsh))
                      & jnp.uint32(layout.file_sentinel))
        valid = (file_field != layout.file_sentinel).astype(jnp.uint32)
        keep, counts, gid = pallas_survivor_scan(
            sk, valid, layout.flank_bits,
            layout.file_off + layout.file_bits, N_FILES)
        (w, c, g), nk = I.compact_rows([sk, counts, gid], keep, 1 << 14)
        return w, c, g, nk

    n = int(flat_p.shape[1])
    from krisp_tpu.ops.pallas_scan import TILE
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        pad = jnp.full((sorted_k.shape[0], n_pad - n), 0xFFFFFFFF, jnp.uint32)
        sorted_pad = jnp.concatenate([sorted_k, pad], axis=1)
    else:
        sorted_pad = sorted_k
    sync(sorted_pad)
    timeit("4b. pallas scans + compact", scans_pallas, sorted_pad)

    # end-to-end fused for reference, both pallas-scan settings
    kw = dict(left=LEFT, mid=MID, right=RIGHT, bits=BITS, n_files=N_FILES,
              cap=1 << 14)
    f1 = partial(I.fused_pipeline_packed_in, use_pallas=True,
                 use_pallas_scan=True, **kw)
    timeit("E2E packed_in (pallas+pscan)", f1, dpk, dvb, *dtables)
    f3 = partial(I.fused_pipeline_packed, omit_soft=False, use_pallas=True,
                 use_pallas_scan=True, **kw)
    timeit("E2E ascii-in (pallas+pscan)", f3, dstacked, *dtables)


if __name__ == "__main__":
    main()
