import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax
from krisp_tpu.runtime import setup
setup()
from krisp_tpu.ops.pallas_pack import pallas_window_keys
from krisp_tpu import dna
from krisp_tpu.ops.encode import window_keys_bits

rng = np.random.default_rng(0)
buf = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(1<<14) + 100)
left, mid, right = 25, 1, 2
L = left + mid + right
ok, words = pallas_window_keys(buf, left, mid, right, 2, 5)
ok_x, wx = window_keys_bits(buf, dna.CODE2_TABLE, dna.base_validity_table(2, disallow="Nn"), dna.COMP2_TABLE, left, mid, right, 2, 5)
n_win = buf.size - L + 1
okp = np.asarray(ok)[:n_win]
for wi, (a, b) in enumerate(zip(words, wx)):
    av = np.asarray(a)[:n_win]; bv = np.asarray(b)[:n_win]
    bad = np.nonzero((av != bv) & okp)[0]
    print(f"word {wi}: mismatches {bad.size}", flush=True)
    if bad.size:
        i = bad[0]
        print("  first at", i, hex(av[i]), hex(bv[i]), flush=True)
        print("  bad idx mod 4096 dist:", np.unique(bad % 4096)[:10], np.unique(bad % 4096)[-10:], flush=True)
        print("  xor:", hex(av[i] ^ bv[i]), flush=True)
