#!/usr/bin/env python3
"""GB-scale krisp_vcf vertical (VERDICT r4 ask #5): 1M variants x 500
samples with planted diagnostic sites, scanned end-to-end through the
native parser + device classification + fastscan, with memory bounded by
the per-contig columnar slices (the corpus spans many contigs, like a
real draft assembly).

Verifies the planted sites: every result row's diagnostic span must
contain a planted (contig, pos, group) candidate, and a healthy number
of planted sites must survive the full cascade.  Reports variants/s and
peak RSS for the BASELINE.md row.

Usage: python tools/bench_vcf_giant.py [--records 1000000]
       [--samples 500] [--contigs 50] [--engine device]
"""

from __future__ import annotations

import argparse
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=1_000_000)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--contigs", type=int, default=50)
    ap.add_argument("--engine", default="device",
                    choices=("device", "host"))
    args = ap.parse_args()

    from krisp_tpu.runtime import setup
    setup()          # persistent compile cache: repeat runs skip compiles

    from bench_vcf_scaled import CACHE, synth_scaled
    from krisp_tpu.cli.krisp_vcf import parse_reference
    from krisp_tpu.vcf.classify import parse_group_data
    from krisp_tpu.vcf.parser import VcfOffsetIndex
    from krisp_tpu.vcf.report import report_diag_region

    t0 = time.perf_counter()
    meta, ref_fa, vcf = synth_scaled(args.records, args.samples,
                                     n_contigs=args.contigs)
    gen_s = time.perf_counter() - t0
    tag = Path(vcf).parent
    pl = np.load(tag / "planted.npz")
    planted = {(f"ctg{int(c) + 1}" if args.contigs > 1 else "ctg1",
                int(p), f"G{int(g) + 1}")
               for c, p, g in zip(pl["contig"], pl["pos"], pl["group"])}
    planted_pos = {}
    for ctg, p, g in planted:
        planted_pos.setdefault((ctg, g), set()).add(p)
    print(f"corpus ready in {gen_s:.1f}s: {args.records:,} records x "
          f"{args.samples} samples over {args.contigs} contigs, "
          f"{len(planted):,} planted diagnostic candidates")

    groups = parse_group_data(meta)
    reference = parse_reference(ref_fa)
    t0 = time.perf_counter()
    idx = VcfOffsetIndex(vcf)
    index_s = time.perf_counter() - t0
    print(f"native index: {index_s:.1f}s")

    t0 = time.perf_counter()
    rows = []
    for res in report_diag_region(idx, None, groups, reference, False,
                                  engine=args.engine, min_samples=3):
        if res.get("result"):
            rows.append(res["result"])
    scan_s = time.perf_counter() - t0
    idx.cleanup()
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20

    # ---- planted-site verification ------------------------------------
    verified = 0
    hit_sites = set()
    for r in rows:
        ctg = r["chrom"]
        g = r["group"]
        lo, hi = int(r["diag_from"]), int(r["diag_to"])
        sites = planted_pos.get((ctg, g), set())
        inside = [p for p in sites if lo <= p <= hi + 1]
        assert inside, (ctg, g, lo, hi)
        verified += 1
        hit_sites.update((ctg, p, g) for p in inside)

    print(f"\nscan: {scan_s:.1f}s = "
          f"{args.records / scan_s:,.0f} variants/s "
          f"({args.engine} engine)")
    print(f"result rows: {len(rows):,}; every diagnostic span contains a "
          f"planted site ({verified:,} verified); {len(hit_sites):,} "
          f"distinct planted sites survived the full cascade")
    print(f"peak RSS: {peak_gb:.1f} GB "
          f"(per-contig columnar slices bound the working set)")


if __name__ == "__main__":
    main()
