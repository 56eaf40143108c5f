"""A/B: sorted-runs + merge-path recombination vs the single big sort.

The round-3 sort study modeled this alternative at cost parity without
building it (BASELINE.md "Sort A/B coverage"); this measures the real
thing at one size on the chip:

  A) sort one u64 array of 2N keys with the production formulation
     (ops/sort.sort_rows' LSD path over 2 words);
  B) sort two N-key halves independently (same formulation), then
     recombine with the merge-path Pallas kernel (ops/pallas_merge).

B's sort stages are embarrassingly parallel across runs in a multi-chip
setting; single-chip, the interesting number is whether the merge costs
less than the sort work it displaces (sorting 2N vs 2x sorting N).

    python tools/ab_merge_path.py [--n 20000000] [--reps 5]

Prints one JSON line with best-of-reps times and bit-parity checks.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000,
                    help="keys per run; total = 2n")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    from krisp_tpu.runtime import setup
    setup()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from krisp_tpu.ops.pallas_merge import merge_sorted_words
    from krisp_tpu.ops.sort import sort_rows

    rng = np.random.default_rng(5)
    n = args.n
    keys = rng.integers(0, 2**63, 2 * n, dtype=np.uint64)
    words = np.stack([(keys >> 32).astype(np.uint32),
                      keys.astype(np.uint32)])

    dev_all = jax.device_put(jnp.asarray(words))
    dev_a = jax.device_put(jnp.asarray(words[:, :n]))
    dev_b = jax.device_put(jnp.asarray(words[:, n:]))

    @jax.jit
    def sort_j(stacked):
        ws, _ = sort_rows([stacked[0], stacked[1]])
        return jnp.stack(ws)

    interpret = jax.devices()[0].platform != "tpu"  # CPU smoke path
    merge_j = jax.jit(lambda a, b: merge_sorted_words(
        a, b, interpret=interpret))

    def force(out):
        # block_until_ready resolves without executing under the axon
        # relay; pulling one element forces the computation (and charges
        # both arms the same ~26 ms dispatch round-trip)
        np.asarray(jax.tree.leaves(out)[0][..., :1])

    def timed(f, *xs):
        out = f(*xs)                      # compile + warm
        force(out)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*xs)
            force(out)
            best = min(best or 1e9, time.perf_counter() - t0)
        return out, best

    sorted_all, t_big = timed(sort_j, dev_all)
    sorted_a, t_a = timed(sort_j, dev_a)
    sorted_b, t_b = timed(sort_j, dev_b)
    merged, t_merge = timed(merge_j, sorted_a, sorted_b)

    # bit parity: merge of the two sorted halves == the big sort
    big = np.asarray(sorted_all)
    got = np.asarray(merged)
    parity = bool(np.array_equal(big, got))

    out = {
        "metric": "merge_path_ab",
        "n_total": 2 * n,
        "unit": "seconds",
        "sort_2n_s": round(t_big, 4),
        "sort_n_s": round(t_a, 4),
        "sort_n2_s": round(t_b, 4),
        "merge_s": round(t_merge, 4),
        "b_total_s": round(t_a + t_b + t_merge, 4),
        "b_vs_a": round((t_a + t_b + t_merge) / t_big, 3),
        "merge_mkeys_per_s": round(2 * n / t_merge / 1e6, 1),
        "bit_parity": parity,
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
