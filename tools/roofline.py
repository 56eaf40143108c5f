#!/usr/bin/env python3
"""Roofline accounting for the fused spacer pipeline (VERDICT r4 ask #6).

For each device stage at bench scale (5 x 4 Mb genomes, spacer 25/1/2,
~40M window keys), measures the forced-sync wall time and compares it
against two memory models:

- ESSENTIAL bytes: the stage's inputs read once + outputs written once
  (the algorithm-independent floor).
- ALGORITHM bytes: the memory passes the chosen algorithm class cannot
  avoid — for the sort, a bitonic/comparator network's
  log2(N)*(log2(N)+1)/2 compare-exchange rounds, each a full read+write
  (XLA's TPU sort is a comparator network; TPU has no efficient random
  scatter, which rules out Theta(passes)=4-5 LSD radix alternatives —
  the same reason the r2 Pallas bitonic and r4 merge-path A/Bs lost to
  XLA's own sort).

The achieved fraction against the ALGORITHM bound says whether a kernel
is done (near the wall for its class) or still has headroom; the gap
between the two models says what an algorithm-class change could buy IF
the hardware allowed it.  HBM bound: v5e ~819 GB/s.

Results recorded in BASELINE.md next to the sort A/B table.
"""

import os
import sys
import time
from functools import partial
from math import ceil, log2

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krisp_tpu.runtime import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N_FILES = int(os.environ.get("KRISP_BENCH_FILES", 5))
SIZE = int(os.environ.get("KRISP_BENCH_GENOME_SIZE", 4_000_000))
LEFT, MID, RIGHT, BITS = 25, 1, 2, 2
REPS = 7
HBM_GBPS = float(os.environ.get("KRISP_TPU_HBM_GBPS", 819.0))


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args):
    """Chip-resident stage time: run the stage 1 vs 3 times INSIDE one
    jit (XOR-folded, optimization_barrier-severed — the
    measure_device_rate protocol) and divide the extra executions by the
    extra time, so the ~25-30 ms tunnel dispatch+sync floor cancels."""

    def repeated(n_calls):
        @jax.jit
        def run(args_in):
            accs = None
            cur = args_in
            for _ in range(n_calls):
                outs = jax.tree_util.tree_leaves(fn(*cur))
                accs = (outs if accs is None
                        else [a ^ o if o.dtype != jnp.float32 else a + o
                              for a, o in zip(accs, outs)])
                cur = jax.tree_util.tree_leaves(
                    jax.lax.optimization_barrier((accs, args_in)))[
                        len(accs):]
                cur = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(args_in), cur)
            return accs
        return run

    run1, run3 = repeated(1), repeated(3)
    sync(run3(args))                     # compile both
    sync(run1(args))

    def best(run):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            sync(run(args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t3 = best(run1), best(run3)
    return max((t3 - t1) / 2, 1e-9), fn(*args)


def row(name, secs, essential, algorithm=None, note=""):
    eff_e = essential / secs / 1e9 / HBM_GBPS
    line = (f"{name:30s} {secs * 1e3:8.1f} ms  "
            f"ess {essential / 1e6:8.0f} MB -> {100 * eff_e:5.1f}%")
    if algorithm is not None:
        eff_a = algorithm / secs / 1e9 / HBM_GBPS
        line += (f"   alg {algorithm / 1e9:6.1f} GB -> "
                 f"{100 * eff_a:5.1f}%")
    print(line + ("   " + note if note else ""))


def main():
    from krisp_tpu.engine.pipeline import (_encoding_tables,
                                           _pack_genomes_host)
    from krisp_tpu.ops import intersect as I
    from krisp_tpu.ops.encode import KeyLayout
    from krisp_tpu.ops.sort import sort_rows

    rng = np.random.default_rng(7)
    stacked = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                         size=(N_FILES, SIZE))
    pk, vb = _pack_genomes_host(stacked, omit_soft=False)
    tables = _encoding_tables(BITS, False)
    dtables = tuple(jax.device_put(t) for t in tables)
    dpk, dvb = jax.device_put(pk), jax.device_put(vb)
    sync((dpk, dvb, dtables))

    layout = KeyLayout(LEFT, MID, RIGHT, BITS, N_FILES)
    print(f"workload: {N_FILES} x {SIZE / 1e6:.0f} Mb, spacer "
          f"{LEFT}/{MID}/{RIGHT}; HBM bound {HBM_GBPS:.0f} GB/s\n")
    print(f"{'stage':30s} {'best':>8s}     {'essential':>12s} "
          f"{'frac':>6s}   {'algorithm':>10s} {'frac':>7s}")

    # 1. unpack: read 2-bit pack + validity bitmap, write ASCII
    unpack = jax.jit(I.unpack_genomes)
    t, buffers = timeit(unpack, dpk, dvb)
    ess = pk.nbytes + vb.nbytes + N_FILES * SIZE
    row("unpack 2bit->ASCII", t, ess)

    # 2. window keys: read ASCII, write both-strand key words
    @jax.jit
    def extract(bufs):
        flat, _ = I._all_window_keys(bufs, *dtables, LEFT, MID, RIGHT,
                                     BITS, N_FILES, True, False)
        return jnp.stack(flat)

    t, flat = timeit(extract, buffers)
    n_keys = int(flat.shape[1])
    key_bytes = int(flat.shape[0]) * 4          # u32 words per key
    ess = N_FILES * SIZE + n_keys * key_bytes
    row("window keys (pallas pack)", t, ess,
        note=f"({n_keys / 1e6:.0f}M keys x {key_bytes} B)")

    # 3. global sort (u64-fused single pass over the 60-bit key)
    @jax.jit
    def do_sort(f):
        ks, _ = sort_rows([f[0], f[1]])
        return jnp.stack(ks)

    t, sorted_k = timeit(do_sort, flat)
    ess = 2 * n_keys * key_bytes                 # one read + one write
    rounds = ceil(log2(n_keys)) * (ceil(log2(n_keys)) + 1) // 2
    alg = rounds * 2 * n_keys * 8                # u64 rows per round
    row("global sort", t, ess, alg,
        note=f"(bitonic model: {rounds} rounds)")

    # 4. survivor scans + compaction (pallas)
    from krisp_tpu.ops.pallas_scan import TILE, pallas_survivor_scan

    n_pad = -(-n_keys // TILE) * TILE
    if n_pad != n_keys:
        pad = jnp.full((sorted_k.shape[0], n_pad - n_keys), 0xFFFFFFFF,
                       jnp.uint32)
        sorted_pad = jnp.concatenate([sorted_k, pad], axis=1)
    else:
        sorted_pad = sorted_k
    sync(sorted_pad)

    @jax.jit
    def scans(sk):
        fw, fsh = layout.file_word_shift()
        file_field = ((sk[fw] >> jnp.uint32(fsh))
                      & jnp.uint32(layout.file_sentinel))
        valid = (file_field != layout.file_sentinel).astype(jnp.uint32)
        keep, counts, gid = pallas_survivor_scan(
            sk, valid, layout.flank_bits,
            layout.file_off + layout.file_bits, N_FILES)
        (w, c, g), nk = I.compact_rows([sk, counts, gid], keep, 1 << 14)
        return w, c, g, nk

    t, _ = timeit(scans, sorted_pad)
    # scan reads keys once, writes keep/counts/gid; compaction re-reads
    # keys + the masks and writes the (capped, tiny) survivor table
    ess = 2 * n_pad * key_bytes + 3 * n_pad * 4
    row("survivor scans + compact", t, ess)


if __name__ == "__main__":
    main()
