"""Native VCF tokenizer vs. the Python parser — identical columnar data."""

import pytest

from krisp_tpu.io.native_vcf import read_columnar, get_lib
from krisp_tpu.vcf.parser import VcfReader

VCF = "/root/reference/test_data/krisp_vcf/variants.vcf.gz"


def test_native_vcf_matches_python_parser():
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    col = read_columnar(VCF, max_alleles=8)
    assert col is not None
    reader = VcfReader(VCF)
    assert col.samples == reader.samples
    n_checked = 0
    for v, var in enumerate(reader):
        if v >= 500:
            break
        assert col.chroms[col.chrom_id[v]] == var.chrom
        assert col.pos[v] == var.pos
        assert col.alleles[v] == var.alleles
        assert col.qual[v] == pytest.approx(var.qual)
        assert col.mq[v] == pytest.approx(var.mq)
        for si, name in enumerate(reader.samples):
            data = var.samples[name]
            assert col.dp[v, si] == (-1 if data.dp is None else data.dp)
            assert col.gq[v, si] == (-1 if data.gq is None else data.gq)
            want_ad = [0 if x is None else x for x in data.ad[:8]]
            want_ad += [0] * (8 - len(want_ad))
            assert col.ad[v, si].tolist() == want_ad
        n_checked += 1
    assert n_checked == 500
    assert col.n_records == 10000
