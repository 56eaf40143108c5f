#!/usr/bin/env python3
"""On-device A/B of the fused-pipeline sort backend (LSD vs Pallas bitonic).

The backend is chosen at trace time from KRISP_TPU_PALLAS_SORT, so each arm
runs in its own process:

    python tools/ab_sort_device.py                         # u64-fused LSD
    KRISP_TPU_PALLAS_SORT=1 python tools/ab_sort_device.py # bitonic kernel

Rates come from engine.pipeline.measure_device_rate (inputs resident in
HBM, 1-vs-3 queued executions cancel dispatch/pull overhead), so the
number reflects chip compute, not the axon tunnel.
"""

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench  # noqa: E402  (synth_genomes, sizes)


def main():
    from krisp_tpu.runtime import setup
    from krisp_tpu.engine.pipeline import KmerGeometry, measure_device_rate

    setup()
    geom = (KmerGeometry(bench.AMP_LEFT, bench.AMP_MID, bench.AMP_RIGHT)
            if "--amplicon" in sys.argv else
            KmerGeometry(bench.LEFT, bench.MID, bench.RIGHT))
    with tempfile.TemporaryDirectory() as td:
        paths = bench.synth_genomes(Path(td), bench.GENOME_SIZE)
        rate = measure_device_rate(paths[:2], paths[2:], geom)
    print(json.dumps({
        "sort_backend": os.environ.get("KRISP_TPU_PALLAS_SORT") or "lsd",
        "geometry": f"{geom.left}/{geom.mid}/{geom.right}",
        "device_kmers_per_s": round(rate),
    }))


if __name__ == "__main__":
    main()
