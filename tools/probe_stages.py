#!/usr/bin/env python3
"""Stage-level wall breakdown of the fused spacer pipeline at bench scale.

Times, separately: host FASTA synth/pack, host->device upload, device
compute (forced-sync via a 1-element pull), and the survivor pull. The axon
tunnel makes ordinary timing lie (block_until_ready does not flush it), so
every sync is a real device->host pull and compute is min over reps.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krisp_tpu.runtime import setup
setup()

import jax

N_FILES = int(os.environ.get("KRISP_BENCH_FILES", 5))
SIZE = int(os.environ.get("KRISP_BENCH_GENOME_SIZE", 4_000_000))
LEFT, MID, RIGHT, BITS = 25, 1, 2, 2
L = LEFT + MID + RIGHT
REPS = int(os.environ.get("REPS", 5))


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    from krisp_tpu import dna
    from krisp_tpu.engine.pipeline import _pack_genomes_host, _encoding_tables
    from krisp_tpu.ops.intersect import fused_pipeline_packed_in

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    stacked = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                         size=(N_FILES, SIZE))
    stacked[1:, 1000:1000 + L] = stacked[0, 1000:1000 + L]
    t_synth = time.perf_counter() - t0

    t0 = time.perf_counter()
    pk, vb = _pack_genomes_host(stacked, omit_soft=False)
    t_pack = time.perf_counter() - t0

    tables = _encoding_tables(BITS, False)
    dtables = tuple(jax.device_put(t) for t in tables)
    sync(dtables)

    # upload (timed, reps)
    ups = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        dpk = jax.device_put(pk)
        dvb = jax.device_put(vb)
        sync(dpk); sync(dvb)
        ups.append(time.perf_counter() - t0)

    kw = dict(left=LEFT, mid=MID, right=RIGHT, bits=BITS, n_files=N_FILES,
              cap=1 << 14, use_pallas=True, use_pallas_scan=True)
    t0 = time.perf_counter()
    out = fused_pipeline_packed_in(dpk, dvb, *dtables, **kw)
    sync(out)
    t_compile = time.perf_counter() - t0

    comps = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fused_pipeline_packed_in(dpk, dvb, *dtables, **kw)
        sync(out)
        comps.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    host = np.asarray(out)
    t_pull = time.perf_counter() - t0

    nk = int(host[-1, 0])
    n_keys = N_FILES * 2 * (SIZE - L + 1)
    print(f"genomes: {N_FILES} x {SIZE} = {n_keys / 1e6:.1f}M keys, "
          f"n_keep={nk}")
    print(f"synth      {t_synth * 1e3:8.1f} ms")
    print(f"host pack  {t_pack * 1e3:8.1f} ms   "
          f"({pk.nbytes + vb.nbytes} bytes up)")
    print(f"upload     {min(ups) * 1e3:8.1f} ms  (all: "
          + " ".join(f"{u * 1e3:.0f}" for u in ups) + ")")
    print(f"compile    {t_compile * 1e3:8.1f} ms")
    print(f"compute    {min(comps) * 1e3:8.1f} ms  (all: "
          + " ".join(f"{c * 1e3:.0f}" for c in comps) + ")")
    print(f"pull       {t_pull * 1e3:8.1f} ms   ({host.nbytes} bytes)")
    tot = t_pack + min(ups) + min(comps) + t_pull
    print(f"steady total {tot * 1e3:8.1f} ms -> {n_keys / tot / 1e6:.1f}M "
          f"kmers/s")


if __name__ == "__main__":
    main()
