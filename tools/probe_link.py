"""Measure the host<->device link through the axon tunnel.

BASELINE.md's engine-routing decisions (kstream's host-engine split, the
bigscale transfer budget) rest on measured link rates that drift by
round; this records h2d and d2h at several buffer sizes plus the
dispatch round-trip floor, so each round's numbers carry their window.

    python tools/probe_link.py [--sizes 1 8 64] [--reps 3]

Prints one JSON line.  Uses only cached-compile-friendly programs (a
device_put and a single-element pull) so it stays usable when the remote
compile service is degraded.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1, 8, 64],
                    help="buffer sizes in MiB")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from krisp_tpu.runtime import setup
    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    init_s = time.perf_counter() - t0

    out = {"metric": "axon_link", "backend": dev.platform,
           "init_s": round(init_s, 1), "h2d_mb_s": {}, "d2h_mb_s": {}}

    # dispatch round-trip floor: tiny transfer, best of reps
    tiny = np.zeros(8, np.uint32)
    best = 1e9
    for _ in range(args.reps + 2):
        t0 = time.perf_counter()
        np.asarray(jax.device_put(tiny, dev))
        best = min(best, time.perf_counter() - t0)
    out["roundtrip_ms"] = round(best * 1e3, 1)

    for mib in args.sizes:
        buf = np.random.default_rng(0).integers(
            0, 2**32, (mib << 20) // 4, dtype=np.uint64).astype(np.uint32)
        up = down = 1e9
        dbuf = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            dbuf = jax.device_put(buf, dev)
            jax.block_until_ready(dbuf)
            up = min(up, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(dbuf)
            down = min(down, time.perf_counter() - t0)
        out["h2d_mb_s"][str(mib)] = round(mib / up, 1)
        out["d2h_mb_s"][str(mib)] = round(mib / down, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
