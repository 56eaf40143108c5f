#!/usr/bin/env python3
"""Does the axon tunnel overlap host->device transfer with device compute?

Times, separately and together: a device-resident u64 sort (~hundreds of ms)
and a 7.5 MB host->device upload. If the combined time is ~max of the two,
transfers ride a separate stream and a pipelined run_pipeline pays for free;
if it is ~the sum, the tunnel serializes and only host-side pack time can be
hidden. All syncs are real 1-element pulls (block_until_ready does not flush
the tunnel).
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

N = int(os.environ.get("N", 40_000_000))
UP_BYTES = int(os.environ.get("UP_BYTES", 7_500_000))
REPS = 6


def sync(x):
    return np.asarray(x.ravel()[:1])


@jax.jit
def work(x):
    with jax.enable_x64(True):
        return jax.lax.sort((x,), num_keys=1, is_stable=True)[0]


def main():
    rng = np.random.default_rng(0)
    with jax.enable_x64(True):
        host64 = rng.integers(0, 2**63, size=N, dtype=np.uint64)
    x = jax.device_put(host64)
    sync(x)
    up_host = rng.integers(0, 255, size=UP_BYTES, dtype=np.uint8)

    out = work(x)
    sync(out)  # compile

    t_c, t_u, t_b, t_h = [], [], [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = work(x)
        sync(out)
        t_c.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        up = jax.device_put(up_host)
        sync(up)
        t_u.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        out = work(x)          # dispatch compute first (async)
        up = jax.device_put(up_host)
        sync(out)
        sync(up)
        t_b.append(time.perf_counter() - t0)

        # host work under an in-flight dispatch (should fully overlap)
        t0 = time.perf_counter()
        out = work(x)
        _ = np.sort(rng.integers(0, 2**31, size=4_000_000, dtype=np.int32))
        sync(out)
        t_h.append(time.perf_counter() - t0)

    def s(v):
        return f"min {min(v)*1e3:7.1f} ms  (all: " + \
            " ".join(f"{t*1e3:.0f}" for t in v) + ")"

    print(f"compute (sort {N} u64):  {s(t_c)}")
    print(f"upload  ({UP_BYTES} B):  {s(t_u)}")
    print(f"both (dispatch+upload):  {s(t_b)}")
    print(f"compute+host np.sort:    {s(t_h)}")
    print(f"-> overlap ratio: both/min-sum = "
          f"{min(t_b) / (min(t_c) + min(t_u)):.2f} "
          f"(1.0 = fully serialized, {max(min(t_c), min(t_u)) / (min(t_c) + min(t_u)):.2f} = perfect overlap)")


if __name__ == "__main__":
    main()
