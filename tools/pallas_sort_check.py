"""Compiled-TPU check + timing for ops/pallas_sort vs the LSD XLA path.

Usage: python tools/pallas_sort_check.py [n_elems] [V]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from krisp_tpu import runtime
from krisp_tpu.ops.pallas_sort import bitonic_sort_words
from krisp_tpu.ops.sort import lsd_sort

runtime.setup()


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[:1])
    return out


def timed_ab(labels, fns, args, n, reps=8):
    """Interleaved A/B timing: tunnel stalls hit both candidates alike;
    per-candidate min over ``reps`` alternating repetitions."""
    best = [float("inf")] * len(fns)
    for f in fns:
        _sync(f(*args))
    for _ in range(reps):
        for i, f in enumerate(fns):
            t0 = time.perf_counter()
            _sync(f(*args))
            best[i] = min(best[i], time.perf_counter() - t0)
    for lab, b in zip(labels, best):
        print(f"{lab:40s} {b*1e3:9.2f} ms   {n/b/1e6:8.1f} Mkeys/s",
              flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8 * 1024 * 1024
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    print("devices:", jax.devices(), " n:", n, " V:", V)
    rng = np.random.default_rng(0)
    w = rng.integers(0, 2**32, (V, n), dtype=np.uint64).astype(np.uint32)
    w[:, (w[0] % 5 == 0)] = 7  # duplicate-heavy stripe
    wd = jax.device_put(jnp.asarray(w))

    lsd = jax.jit(lambda s: jnp.stack(
        lsd_sort([s[i] for i in range(V)])[0]))

    t0 = time.perf_counter()
    out_b = _sync(bitonic_sort_words(wd))
    print(f"bitonic first call (compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    out_l = _sync(lsd(wd))
    ok = bool(jnp.all(out_b == out_l))
    print("bitonic == LSD:", ok, flush=True)
    if not ok:
        d = np.nonzero(np.asarray((out_b != out_l).any(axis=0)))[0]
        print("first diffs at", d[:5])
        sys.exit(1)

    timed_ab(["pallas bitonic", "XLA LSD multi-word"],
             [bitonic_sort_words, lsd], (wd,), n)


if __name__ == "__main__":
    main()
