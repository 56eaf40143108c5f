"""Unit tests for VCF parsing and per-group variant classification against
hand-computed expectations (semantics: find_diag_var.py:128-438)."""

import gzip

import pytest

from krisp_tpu.vcf.parser import VcfReader, read_contigs
from krisp_tpu.vcf.classify import (ClassifiedVariant, count_genotypes,
                                    parse_group_data)

VCF_TEXT = """\
##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3\ts4
chr1\t100\t.\tA\tT\t500\tPASS\tMQ=60\tGT:AD:DP:GQ\t0/0:20,0:20:99\t0/0:18,0:18:99\t1/1:0,25:25:99\t1/1:0,30:30:99
chr1\t200\t.\tC\tG,CT\t300\tPASS\tMQ=60\tGT:AD:DP:GQ\t0/1:10,10,0:20:99\t0/0:15,0,0:15:99\t2/2:0,0,22:22:99\t./.:.:.:.
chr1\t300\t.\tG\tA\t5\tPASS\tMQ=60\tGT:AD:DP:GQ\t0/0:20,0:20:99\t0/0:18,0:18:99\t1/1:0,25:25:99\t1/1:0,30:30:99
chr1\t400\t.\tT\tC\t500\tPASS\tMQ=10\tGT:AD:DP:GQ\t0/0:20,0:20:99\t0/0:18,0:18:99\t1/1:0,25:25:99\t1/1:0,30:30:99
"""

GROUPS = {"g1": ["s1", "s2"], "g2": ["s3", "s4"]}


@pytest.fixture
def vcf_path(tmp_path):
    p = tmp_path / "test.vcf.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(VCF_TEXT)
    return str(p)


def classify(var, **kw):
    args = dict(min_samples=2, min_reads=10, min_geno_qual=40, min_freq=0.1,
                min_map_qual=30, min_var_qual=10, min_samp_prop=0.9)
    args.update(kw)
    return ClassifiedVariant(var, GROUPS, **args)


def test_parser_basics(vcf_path):
    reader = VcfReader(vcf_path)
    assert reader.samples == ["s1", "s2", "s3", "s4"]
    recs = list(reader)
    assert len(recs) == 4
    v = recs[0]
    assert (v.chrom, v.pos, v.ref, v.alts) == ("chr1", 100, "A", ("T",))
    assert v.alleles == ("A", "T")
    assert v.qual == 500.0
    assert v.info["MQ"] == 60
    assert v.samples["s1"]["DP"] == 20
    assert v.samples["s4"]["AD"] == (0, 30)
    # missing sample data parses as None
    v2 = recs[1]
    assert v2.samples["s4"]["DP"] is None
    assert v2.samples["s4"]["AD"] == (None, None, None)


def test_fetch_overlap_semantics(vcf_path):
    # [150,300) 0-based includes 1-based pos 300 (0-based start 299)
    got = [v.pos for v in VcfReader(vcf_path).fetch("chr1", 150, 300)]
    assert got == [200, 300]
    got = [v.pos for v in VcfReader(vcf_path).fetch("chr1", 99, 100)]
    assert got == [100]


def test_diagnostic_classification(vcf_path):
    recs = list(VcfReader(vcf_path))
    cv = classify(recs[0])
    assert cv.sample_counts == {"g1": 2, "g2": 2}
    assert cv.allele_counts == {"g1": {"A": 2}, "g2": {"T": 2}}
    assert cv.conserved == {"g1": "A", "g2": "T"}
    assert cv.diagnostic == {"g1": "A", "g2": "T"}


def test_multiallelic_and_missing(vcf_path):
    recs = list(VcfReader(vcf_path))
    cv = classify(recs[1])
    # s1 het C/G by AD frequency; s4 has no data -> fails DP gate
    assert cv.allele_counts["g1"] == {"C": 2, "G": 1}
    assert cv.allele_counts["g2"] == {"CT": 1}
    assert cv.sample_counts == {"g1": 2, "g2": 1}
    assert cv.conserved["g1"] is None          # two alleles
    assert cv.conserved["g2"] is None          # too few samples
    # g2 fails min_samples -> diagnostic None for all groups
    assert cv.diagnostic == {"g1": None, "g2": None}
    assert cv.missing_samp_ids["g2"] == {"s4"}


def test_quality_gates(vcf_path):
    recs = list(VcfReader(vcf_path))
    low_qual = classify(recs[2])     # QUAL=5 < min_var_qual=10
    assert low_qual.conserved == {"g1": None, "g2": None}
    assert low_qual.diagnostic == {"g1": None, "g2": None}
    low_mq = classify(recs[3])       # MQ=10 < min_map_qual=30
    assert low_mq.conserved == {"g1": None, "g2": None}


def test_min_freq_filters_noise(vcf_path):
    recs = list(VcfReader(vcf_path))
    # with min_freq=0.6, s1's 50/50 het at pos 200 keeps neither allele
    cv = classify(recs[1], min_freq=0.6)
    assert cv.allele_counts["g1"] == {"C": 1}


def test_allele_lens(vcf_path):
    recs = list(VcfReader(vcf_path))
    cv = classify(recs[1])
    assert cv.allele_lens("g2") == {"CT": 2}
    assert cv.max_allele_len("g2") == 2
    # group with no alleles falls back to ref length
    cv0 = classify(recs[1], min_reads=1000)
    assert cv0.max_allele_len("g1") == 1


def test_count_genotypes_unknown_char(vcf_path):
    recs = list(VcfReader(vcf_path))
    v = recs[1]
    # with min_reads=0, the no-coverage sample s4 (DP None) still fails the
    # DP gate (None), so no '?' appears
    counts = count_genotypes(v, ["s4"], hetero=False, min_reads=0)
    assert counts == {}


def test_parse_group_data(tmp_path):
    meta = tmp_path / "meta.csv"
    meta.write_text("sample_id,group\ns1,A\ns2,A\ns3,B\n")
    assert parse_group_data(str(meta)) == {"A": ["s1", "s2"], "B": ["s3"]}
    assert parse_group_data(str(meta), groups=["A"]) == {"A": ["s1", "s2"]}
    with pytest.raises(ValueError):
        parse_group_data(str(meta), groups=["C"])
    with pytest.raises(ValueError):
        parse_group_data(str(meta), groups=["B"], min_samples=2)


def test_read_contigs(vcf_path):
    assert read_contigs(vcf_path) == [("chr1", 400)]


def test_sample_mismatch_raises_and_force(tmp_path, vcf_path):
    """Metadata samples missing from the VCF: hard error, or proceed with
    the intersection under --force (parity: find_diag_var.py:141-149)."""
    groups = {"g1": ["s1", "ghost"], "g2": ["s3", "s4"]}
    recs = list(VcfReader(vcf_path))
    with pytest.raises(ValueError, match="cannot be found in the VCF"):
        ClassifiedVariant(recs[0], groups, check_groups=True)
    cv = ClassifiedVariant(recs[0], groups, check_groups=True, force=True)
    assert cv.groups["g1"] == ["s1"]
