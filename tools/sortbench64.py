"""Microbenchmark: is XLA's TPU sort fast for single-key u64?

Round-1 measurements (PARITY.md) only covered u32: single-key stable sort
~390 Mkeys/s, +37ms per carried operand per pass, multi-key comparator
sorts catastrophic.  If the u64 single-key path is comparably fast, the
59-bit spacer keys fit ONE word and the whole LSD carry traffic vanishes.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from krisp_tpu import runtime

runtime.setup()

N = 8 * 1024 * 1024


def _sync(out):
    """block_until_ready does not flush the axon tunnel — force a real
    device->host pull of one element."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[:1])
    return out


def timed(label, fn, *args):
    out = _sync(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:44s} {best*1e3:9.2f} ms   {N/best/1e6:8.1f} Mkeys/s")
    return out


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    a32 = jax.device_put(rng.integers(0, 2**32, N, dtype=np.uint64)
                         .astype(np.uint32))
    b32 = jax.device_put(rng.integers(0, 2**32, N, dtype=np.uint64)
                         .astype(np.uint32))
    a64 = jax.device_put(rng.integers(0, 2**64, N, dtype=np.uint64))

    s1_32 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=True))
    s1_64 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=True))
    s1_64u = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1,
                                            is_stable=False))
    s1c_64 = jax.jit(lambda x, c: jax.lax.sort((x, c), num_keys=1,
                                               is_stable=True))
    s1c_32 = jax.jit(lambda x, c: jax.lax.sort((x, c), num_keys=1,
                                               is_stable=True))
    pack = jax.jit(lambda hi, lo: (hi.astype(jnp.uint64) << 32)
                   | lo.astype(jnp.uint64))

    timed("u32 single-key stable", s1_32, a32)
    timed("u64 single-key stable", s1_64, a64)
    timed("u64 single-key unstable", s1_64u, a64)
    timed("u64 key + u32 carry (stable)", s1c_64, a64, b32)
    timed("u32 key + u32 carry (stable)", s1c_32, a32, b32)
    timed("pack 2xu32 -> u64", pack, a32, b32)

    # LSD 2-pass u32 (current spacer-path shape) for comparison
    def lsd2(hi, lo):
        lo2, hi2 = jax.lax.sort((lo, hi), num_keys=1, is_stable=True)
        hi3, lo3 = jax.lax.sort((hi2, lo2), num_keys=1, is_stable=True)
        return hi3, lo3
    lsd2j = jax.jit(lsd2)
    timed("LSD 2-pass u32+carry (current)", lsd2j, a32, b32)

    # correctness: u64 sort == lexicographic (hi, lo)
    hi3, lo3 = jax.jit(lsd2)(a32, b32)
    p = jax.block_until_ready(s1_64(pack(a32, b32)))[0]
    ref_hi = (p >> 32).astype(jnp.uint32)
    ref_lo = (p & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ok = bool(jnp.all(ref_hi == hi3) & jnp.all(ref_lo == lo3))
    print("u64-sort == LSD lexicographic:", ok)


if __name__ == "__main__":
    main()
