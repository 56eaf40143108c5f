#!/usr/bin/env python3
"""How does XLA TPU sort scale with length and batching?

Times jax.lax.sort (unstable, key-only u64) over equal total element count
(40M) arranged as (B, n) with the sort along the last axis.  If batched
small sorts are much faster per element than one big sort, a
sorted-runs + merge design beats the single global sort.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krisp_tpu.runtime import setup
setup()

import jax
import jax.numpy as jnp

TOTAL = 1 << 25  # 32M, power of two so every split is exact
REPS = 5


def main():
    rng = np.random.default_rng(0)
    with jax.enable_x64(True):
        base = jnp.asarray(rng.integers(0, 1 << 60, TOTAL, dtype=np.uint64))
        base = jax.device_put(base)

        @jax.jit
        def sort2d(x):
            return jax.lax.sort((x,), dimension=1, num_keys=1,
                                is_stable=False)[0]

        for b_log in range(0, 13, 2):
            B = 1 << b_log
            n = TOTAL // B
            x = base.reshape(B, n)
            def sync(o):
                # a 1-element pull forces real completion (block_until_ready
                # has been seen returning early through the axon tunnel)
                return np.asarray(o.ravel()[:1])

            out = sort2d(x)
            sync(out)
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                out = sort2d(x)
                sync(out)
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            if B == 1:
                full = np.asarray(out).ravel()
                assert np.all(full[1:] >= full[:-1]), "not sorted!"
            print(f"B={B:5d} n={n:9d}  {t*1e3:8.1f} ms   "
                  f"{TOTAL/t/1e6:7.1f} Mkeys/s")


if __name__ == "__main__":
    main()
