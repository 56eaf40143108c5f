#!/usr/bin/env python3
"""Regenerate the krisp_vcf golden parity fixtures.

The goldens are produced by running the REFERENCE implementation
(grunwaldlab/krisp at /root/reference) with its missing C dependencies
replaced by stub modules (tools/refstubs: pysam -> our VCF parser,
primer3 -> our thermodynamic engine, Bio/prettytable shims).  Both the
reference-run and our CLI therefore share the parser and thermo engine, so
these fixtures pin exact parity of classification, windowing, the filter
cascade, coordinate math, CSV schema, and the alignment renderer — re-run
this after any change to the thermo engine's structure model.

PYTHONHASHSEED=0: the reference's missing_samp_ids column is
set-iteration-order nondeterministic.

Usage: python tools/regen_goldens.py
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GOLD = REPO / "tests" / "golden"
META = "/root/reference/test_data/krisp_vcf/metadata.csv"
VCF = "/root/reference/test_data/krisp_vcf/variants.vcf.gz"
REF_FASTA = str(REPO / "tests/data/test_reference.fasta.gz")


def _writable_vcf(tmpdir):
    """The reference writes a tabix marker next to its VCF; /root/reference
    is read-only, so run it against a temp copy."""
    import shutil
    dst = Path(tmpdir) / "variants.vcf.gz"
    shutil.copyfile(VCF, dst)
    return str(dst)

RUNS = [
    ("vcf_pos150k_260k", ["--pos", "150000", "260000"]),
    # knob plumbing golden: non-default geometry/gates chosen to still
    # yield result rows under the thal-gated hairpin screen (r3)
    ("vcf_custom_knobs", ["--pos", "150000", "260000",
                          "--amp_size", "50", "120", "--gc_clamp", "2",
                          "--min_samples", "4", "--crrna_len", "30",
                          "--var_location", "5", "16"]),
    ("vcf_full", []),
    ("vcf_chroms_260k_400k", ["--chroms", "Phyram_PR-102_s0001",
                              "--pos", "260000", "400000"]),
]


def main():
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        vcf = _writable_vcf(td)
        _run_all(vcf)


def _run_all(vcf):
    for tag, extra in RUNS:
        csv = GOLD / f"{tag}.csv"
        align = GOLD / f"{tag}.align.txt"
        proc = subprocess.run(
            [sys.executable, "-m", "krisp.krisp_vcf.krisp_vcf", META,
             REF_FASTA, "--vcf", vcf, "--groups", "NA1", "NA2", "EU1",
             "--out_csv", str(csv), "--out_align", str(align)] + extra,
            capture_output=True, text=True, timeout=1800,
            env={"PYTHONHASHSEED": "0", "COLUMNS": "80",
                 "PATH": "/usr/bin:/bin",
                 "PYTHONPATH":
                 f"{REPO}/tools/refstubs:/root/reference/src:{REPO}"})
        assert proc.returncode == 0, proc.stderr[-3000:]
        print(f"regenerated {tag}: {len(csv.read_text().splitlines())} csv "
              f"lines")


if __name__ == "__main__":
    main()
