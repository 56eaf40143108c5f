#!/usr/bin/env python3
"""Direct A/B of sort formulations at pipeline scale on the live chip."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krisp_tpu.runtime import setup
setup()

import jax
import jax.numpy as jnp

from krisp_tpu.ops.sort import sort_rows, _pack64

N = 40_000_000
REPS = 5


def sync(o):
    return np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])


def timeit(name, fn, *args):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name:40s} {t*1e3:8.1f} ms   {N/t/1e6:7.1f} Mkeys/s")
    return out


def main():
    rng = np.random.default_rng(7)
    hi = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 28, N, dtype=np.uint32)))
    lo = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, N, dtype=np.uint32)))
    sync((hi, lo))

    @jax.jit
    def pipeline_sort(a, b):
        ks, _ = sort_rows([a, b])
        return jnp.stack(ks)

    timeit("pipeline sort_rows (2xu32 -> u64)", pipeline_sort, hi, lo)

    @jax.jit
    def u64_1d(a, b):
        k = _pack64(a, b)
        return jax.lax.sort((k,), num_keys=1, is_stable=False)[0]

    timeit("u64 1D unstable", u64_1d, hi, lo)

    @jax.jit
    def u64_2d(a, b):
        k = _pack64(a, b).reshape(1, -1)
        return jax.lax.sort((k,), dimension=1, num_keys=1,
                            is_stable=False)[0]

    timeit("u64 2D (1,n) unstable", u64_2d, hi, lo)


if __name__ == "__main__":
    main()
