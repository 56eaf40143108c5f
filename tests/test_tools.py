"""Tests for the auxiliary CLI tools (misc_scripts parity, SURVEY C43)."""

from krisp_tpu.cli.tools import find_in_fasta, annotate_main


def test_find_in_fasta_both_strands(tmp_path):
    fa = tmp_path / "g.fasta"
    fa.write_text(">chr1\nAACCGGTTACGT\n")
    hits = list(find_in_fasta(str(fa), "CCGG", padding=1))
    # forward hit at 0-based 2; CCGG is its own revcomp -> also a minus hit
    assert hits[0] == ("chr1", 2, 8, "ACCGGT")
    assert hits[1] == ("chr1", 2, 8, "accggt")
    hits = list(find_in_fasta(str(fa), "TTAC", padding=0))
    assert hits == [("chr1", 7, 11, "TTAC")]


def test_annotate_roundtrip(tmp_path, capsys):
    fa = tmp_path / "genome0.fasta"
    fa.write_text(">c1\nAAAACGACAAGATTTT\n")
    align = tmp_path / "a.txt"
    align.write_text("ACGACAAGAT : genome0\n")
    out = tmp_path / "out.txt"
    annotate_main([str(align), "-r", str(fa), "-o", str(out)])
    text = out.read_text()
    assert "# Alignment 1" in text
    assert "chrom=c1" in text
    assert "start=4" in text and "strand=forward" in text
