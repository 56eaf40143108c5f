#!/usr/bin/env python3
"""Reproduce the XLA-CPU dispatch-rate collapse observed on this VM.

On this machine (Firecracker microVM, 4 vCPUs, jax 0.9.0), a loop of
identical jitted CPU dispatches runs at full speed for the first ~2-4 GB
of cumulative buffer traffic and then collapses 10-100x, partially
recovering to a 2-4x-degraded steady state.  The trigger is cumulative
device-buffer churn, not dispatch count, data values, THP (prctl
PR_SET_THP_DISABLE makes no difference), glibc malloc tuning
(MALLOC_MMAP_THRESHOLD_/TRIM only soften it), or host throttling (pure
numpy/BLAS loops hold steady indefinitely at any churn volume).

Consequences for this repo's numbers (see BASELINE.md):
  - warm-loop CPU-backend measurements (e.g. repeated krisp_vcf scans in
    one process) degrade after the first iterations; single cold runs -
    the production shape - stay on the fast side of the cliff;
  - run-to-run variance in CPU-backend benches is dominated by where in
    the degradation cycle the process happens to be.

Usage: python tools/probe_cpu_dispatch_degradation.py [reps]
Prints per-rep wall time for 24 identical classify-shaped dispatches
(~200 MB buffer traffic per rep).  Degradation reproduces when later
reps take >5x rep 1.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@jax.jit
def _kern(dp, gq, ad):
    # the same masked-reduction shape as ops/vcfclass._accumulate
    gate = (dp >= 10) & (gq >= 40)
    keep = (ad > 0) & (ad.astype(jnp.float32)
                       >= ad.sum(2, keepdims=True).astype(jnp.float32) * 0.1)
    return (keep & gate[:, :, None]).astype(jnp.int32).sum(1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.default_rng(0)
    batches = [(rng.integers(0, 60, (4096, 100)).astype(np.int32),
                rng.integers(0, 99, (4096, 100)).astype(np.int32),
                rng.integers(0, 40, (4096, 100, 3)).astype(np.int32))
               for _ in range(24)]
    jax.block_until_ready(_kern(*batches[0]))
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        outs = [_kern(*b) for b in batches]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
        print(f"rep {rep}: {times[-1]:.2f}s", flush=True)
    if len(times) > 2 and max(times[2:]) > 5 * times[1]:
        print(f"DEGRADED: worst rep {max(times[2:]):.2f}s vs "
              f"rep1 {times[1]:.2f}s")
    else:
        print("no degradation observed")


if __name__ == "__main__":
    main()
