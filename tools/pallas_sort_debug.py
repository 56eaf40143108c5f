"""Bisect the Mosaic i8->i1 trunci failure in pallas_sort kernels."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from krisp_tpu import runtime
from krisp_tpu.ops.pallas_sort import bitonic_sort_words

runtime.setup()


def main():
    rng = np.random.default_rng(0)
    for rows in (256, 512, 1024, 2048):
        for V in (2,):
            n = rows * 128  # single block: local_sort kernel only
            w = rng.integers(0, 2**32, (V, n), dtype=np.uint64) \
                .astype(np.uint32)
            try:
                out = np.asarray(bitonic_sort_words(jnp.asarray(w),
                                                    block_rows=rows))
                ref = w[:, np.lexsort(w[::-1])]
                ok = np.array_equal(out, ref)
                print(f"rows={rows} V={V} single-block: compile ok, "
                      f"correct={ok}", flush=True)
            except Exception as e:
                print(f"rows={rows} V={V} FAILED: {str(e)[:200]}",
                      flush=True)
    # multi-block at the largest rows that worked
    for rows in (256, 1024):
        n = rows * 128 * 4
        w = rng.integers(0, 2**32, (2, n), dtype=np.uint64).astype(np.uint32)
        try:
            out = np.asarray(bitonic_sort_words(jnp.asarray(w),
                                                block_rows=rows))
            ref = w[:, np.lexsort(w[::-1])]
            print(f"rows={rows} 4-block: compile ok, "
                  f"correct={np.array_equal(out, ref)}", flush=True)
        except Exception as e:
            print(f"rows={rows} 4-block FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
