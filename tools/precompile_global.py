"""Pre-compile the partitioned global-stage program at a pinned pad size.

Today's axon remote compile service wedges (server-side) on large fresh
compiles while staying healthy for everything else, so the GB-scale run
can starve at "global pass 1/N" forever.  This tool compiles the exact
program `engine/bigscale.partitioned_global_intersect` dispatches —
`ops/intersect.global_intersect_bits` at geometry 25/1/2, 5 genomes,
cap 1<<16 — at a given pad, under a hard alarm, writing the result into
the persistent compile cache.  The bench then runs with
KRISP_TPU_GLOBAL_PAD=<pad> KRISP_TPU_GLOBAL_ROWS=<pad> and hits the
cache instead of compiling.

    python tools/precompile_global.py --pad $((1<<22)) --timeout 900
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pad", type=int, required=True)
    ap.add_argument("--timeout", type=int, default=1200,
                    help="hard exit if the compile exceeds this (s)")
    ap.add_argument("--left", type=int, default=25)
    ap.add_argument("--mid", type=int, default=1)
    ap.add_argument("--right", type=int, default=2)
    ap.add_argument("--files", type=int, default=5)
    ap.add_argument("--cap", type=int, default=1 << 16)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from krisp_tpu.runtime import setup
    setup()

    import numpy as np
    from krisp_tpu.ops.encode import KeyLayout
    from krisp_tpu.ops.intersect import global_intersect_bits

    layout = KeyLayout(args.left, args.mid, args.right, 2, args.files)
    W = layout.n_words
    rng = np.random.default_rng(0)
    words = tuple(np.ascontiguousarray(
        rng.integers(0, 2**32, args.pad, dtype=np.uint64)
        .astype(np.uint32)) for _ in range(W))
    counts = np.ones(args.pad, np.uint32)

    import threading
    done = threading.Event()

    def watchdog():
        if not done.wait(args.timeout):
            print(json.dumps({"pad": args.pad, "ok": False,
                              "error": f"compile exceeded {args.timeout}s"}))
            sys.stdout.flush()
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    t0 = time.perf_counter()
    out = global_intersect_bits(words, counts, layout,
                                n_files=args.files, cap=args.cap)
    n_keep = int(out[3])
    dt = time.perf_counter() - t0
    done.set()
    print(json.dumps({"pad": args.pad, "ok": True,
                      "compile_plus_run_s": round(dt, 1),
                      "n_keep": n_keep}))


if __name__ == "__main__":
    main()
