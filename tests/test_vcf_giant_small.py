"""CI-scale exercise of the GB-scale VCF vertical's machinery
(tools/bench_vcf_giant.py): the multi-contig synthetic corpus with
recorded planted diagnostic candidates, the per-contig bounded scan, and
the planted-site verification of every result row.

The full 1M x 500 measurement is a bench artifact (BASELINE.md); this
test runs the identical logic at 6k x 24 over 3 contigs on the host
engine so the verification chain itself cannot rot.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def giant_small(tmp_path_factory):
    import shutil

    import bench_vcf_scaled as B

    tag = B.CACHE / "r6000_s24_v3_0_c3"
    shutil.rmtree(tag, ignore_errors=True)
    meta, ref_fa, vcf = B.synth_scaled(6000, 24, n_contigs=3)
    yield meta, ref_fa, vcf, tag
    shutil.rmtree(tag, ignore_errors=True)


def test_multi_contig_corpus_shape(giant_small):
    meta, ref_fa, vcf, tag = giant_small
    # three contigs in the reference FASTA, planted sites recorded
    names = [ln[1:].strip() for ln in open(ref_fa) if ln.startswith(">")]
    assert names == ["ctg1", "ctg2", "ctg3"]
    pl = np.load(tag / "planted.npz")
    assert pl["pos"].size > 0
    assert set(np.unique(pl["contig"])) <= {0, 1, 2}


def test_scan_results_verify_against_planted(giant_small):
    from krisp_tpu.cli.krisp_vcf import parse_reference
    from krisp_tpu.vcf.classify import parse_group_data
    from krisp_tpu.vcf.parser import VcfOffsetIndex
    from krisp_tpu.vcf.report import report_diag_region

    meta, ref_fa, vcf, tag = giant_small
    pl = np.load(tag / "planted.npz")
    planted_pos = {}
    for c, p, g in zip(pl["contig"], pl["pos"], pl["group"]):
        planted_pos.setdefault(
            (f"ctg{int(c) + 1}", f"G{int(g) + 1}"), set()).add(int(p))

    groups = parse_group_data(meta)
    reference = parse_reference(ref_fa)
    idx = VcfOffsetIndex(vcf)
    try:
        rows = [r["result"] for r in report_diag_region(
            idx, None, groups, reference, False, engine="host",
            min_samples=3) if r.get("result")]
    finally:
        idx.cleanup()
    assert rows, "no diagnostic regions found on the planted corpus"
    hit = set()
    for r in rows:
        sites = planted_pos.get((r["chrom"], r["group"]), set())
        inside = [p for p in sites
                  if int(r["diag_from"]) <= p <= int(r["diag_to"]) + 1]
        assert inside, (r["chrom"], r["group"], r["diag_from"],
                        r["diag_to"])
        hit.update(inside)
    assert len(hit) >= 3      # several distinct planted sites survive
    # results span more than one contig (the per-contig slice path)
    assert len({r["chrom"] for r in rows}) >= 2
