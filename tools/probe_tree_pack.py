"""A/B: log-tree window packing vs the per-base XLA pack and the Pallas
pack kernel — correctness vs window_keys_bits, then fused-pipeline E2E."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krisp_tpu.runtime import setup
setup()

import jax
import numpy as np

from krisp_tpu import dna
from krisp_tpu.ops.encode import window_keys_bits, window_keys_tree

rng = np.random.default_rng(3)


def check(left, mid, right, n=4096, n_files=5):
    buf = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=n,
                     p=[0.24, 0.24, 0.24, 0.24, 0.04])
    code, valid, comp = (dna.CODE2_TABLE,
                         dna.base_validity_table(2, disallow="Nn"),
                         dna.COMP2_TABLE)
    ok_a, w_a = window_keys_bits(buf, code, valid, comp, left, mid, right,
                                 2, n_files)
    ok_b, w_b = window_keys_tree(buf, code, valid, comp, left, mid, right,
                                 n_files)
    assert np.array_equal(np.asarray(ok_a), np.asarray(ok_b))
    for a, b in zip(w_a, w_b):
        ax, bx = np.asarray(a), np.asarray(b)
        okm = np.asarray(ok_a)
        assert np.array_equal(ax[okm], bx[okm]), (left, mid, right)
    print(f"ok {left}/{mid}/{right}")


import os as _os
if _os.environ.get("KRISP_PROBE_CHECKS", "1") == "1":
    for geom in [(25, 1, 2), (30, 40, 30), (3, 0, 2), (1, 1, 1),
                 (16, 5, 16), (12, 100, 7)]:
        check(*geom)

# E2E timing at bench scale through the per-genome extraction entry
SIZE = int(os.environ.get("KRISP_BENCH_GENOME_SIZE", 4_000_000))
N_FILES = 5
from krisp_tpu.engine.pipeline import _pack_genomes_host, _encoding_tables
from krisp_tpu.ops import intersect as I

stacked = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(N_FILES, SIZE))
pk, vb = _pack_genomes_host(stacked, omit_soft=False)
tables = tuple(jax.device_put(t) for t in _encoding_tables(2, False))
pk_d, vb_d = jax.device_put(pk), jax.device_put(vb)
L, M, R = 25, 1, 2


def run(mode):
    os.environ["KRISP_TPU_PACK_MODE"] = mode
    keys = tuple(
        I.extract_keys_packed_in(pk_d[f:f + 1], vb_d[f:f + 1], *tables,
                                 np.uint32(f), left=L, mid=M, right=R,
                                 bits=2, n_files=N_FILES,
                                 use_pallas=mode == "pallas")
        for f in range(N_FILES))
    out = I.fused_global_packed(keys, left=L, mid=M, right=R, bits=2,
                                n_files=N_FILES, cap=1 << 16,
                                use_pallas_scan=True)
    return out


def timed(mode):
    np.asarray(run(mode)[-1, :1])     # compile+sync
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(mode)
        np.asarray(out[-1, :1])
        t3 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(mode)[-1, :1])
        t1 = time.perf_counter() - t0
        if t3 > t1:
            best = min(best, (t3 - t1) / 2)
    n_keys = 2 * N_FILES * (pk.shape[1] * 16 - (L + M + R) + 1)
    print(f"{mode:8s}: {best*1e3:7.1f} ms  = {n_keys/best/1e6:6.1f} M keys/s")


a = np.asarray(run("pallas"))
b = np.asarray(run("tree"))
nk = int(a[-1, 0])
assert np.array_equal(a[:, :nk], b[:, :nk]), "pallas vs tree survivor mismatch"
print("survivors equal:", nk)
timed("pallas")
timed("tree")
