"""Probe: XLA TPU sort cost vs stability, width, and batching.

Informs the round-3 attack on the global-sort stage (VERDICT r2 ask #2):
a single-operand key-only sort needs no stability (equal keys are
indistinguishable), and XLA implements stable sorts with an extra iota
tiebreaker operand.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from krisp_tpu.runtime import setup

setup()
print("backend:", jax.devices())

N = 40_000_000


def _sync(out):
    """block_until_ready does NOT flush the axon tunnel; a 1-element pull
    does (engine/pipeline.measure_device_rate uses the same trick)."""
    while isinstance(out, tuple):
        out = out[0]
    np.asarray(out.reshape(-1)[:1])


def timed(fn, *args, reps=5):
    _sync(fn(*args))   # compile
    best = 1e9
    for _ in range(reps):
        # 3 calls vs 1 call, difference cancels dispatch+pull latency
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        _sync(out)
        t3 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(fn(*args))
        t1 = time.perf_counter() - t0
        if t3 > t1:
            best = min(best, (t3 - t1) / 2)
    return best


with jax.enable_x64(True):
    rng = np.random.default_rng(0)
    k64 = jnp.asarray(rng.integers(0, 1 << 60, size=N, dtype=np.uint64))
    k32 = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64)
                      .astype(np.uint32))

    s_stable = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1,
                                              is_stable=True)[0])
    s_unstable = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1,
                                                is_stable=False)[0])
    print(f"u64 stable   : {timed(s_stable, k64)*1e3:8.1f} ms")
    print(f"u64 unstable : {timed(s_unstable, k64)*1e3:8.1f} ms")
    print(f"u32 stable   : {timed(s_stable, k32)*1e3:8.1f} ms")
    print(f"u32 unstable : {timed(s_unstable, k32)*1e3:8.1f} ms")

    # batched row sorts (segment + merge designs)
    for R in (8, 32, 128):
        kb = k64.reshape(R, N // R)
        sb = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1,
                                            is_stable=False,
                                            dimension=1)[0])
        print(f"u64 unstable {R}x{N//R:>8}: {timed(sb, kb)*1e3:8.1f} ms")

    # stable emulation: unstable sort of (key, iota) packed? n/a for u64.
    # carried-operand cost: one payload under stable sort
    pay = jnp.arange(N, dtype=jnp.uint32)
    s_pay = jax.jit(lambda x, p: jax.lax.sort((x, p), num_keys=1,
                                              is_stable=True))
    print(f"u64 stable + 1 payload: {timed(s_pay, k64, pay)*1e3:8.1f} ms")
    s_pay_u = jax.jit(lambda x, p: jax.lax.sort((x, p), num_keys=1,
                                                is_stable=False))
    print(f"u64 unstable + 1 payload: {timed(s_pay_u, k64, pay)*1e3:8.1f} ms")
