#!/usr/bin/env python3
"""Synthesize a reference FASTA consistent with the bundled test VCF.

The reference repo's test_data/krisp_vcf/reference.fasta is listed in
.MISSING_LARGE_BLOBS (too big for its git), so full krisp_vcf runs need a
substitute: every VCF REF allele is placed at its 1-based POS and the gaps
are filled with deterministic pseudo-random bases.  Overlapping REF alleles
are checked for consistency.

Usage: python tools/make_test_reference.py [vcf.gz] [out.fasta.gz]
"""

import gzip
import sys

import numpy as np

DEFAULT_VCF = "/root/reference/test_data/krisp_vcf/variants.vcf.gz"
DEFAULT_OUT = "tests/data/test_reference.fasta.gz"
PAD = 2000  # breathing room past the last variant


def main():
    vcf = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_VCF
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT

    contigs = {}
    with gzip.open(vcf, "rt") as handle:
        for line in handle:
            if line.startswith("#"):
                continue
            chrom, pos, _vid, ref = line.split("\t")[:4]
            pos = int(pos)
            contigs.setdefault(chrom, []).append((pos, ref))

    rng = np.random.default_rng(42)
    with gzip.open(out, "wt") as fh:
        for chrom, entries in contigs.items():
            length = max(p + len(r) for p, r in entries) + PAD
            seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=length)
            placed = np.zeros(length, bool)
            for pos, ref in sorted(entries):
                arr = np.frombuffer(ref.encode(), np.uint8)
                s = pos - 1
                overlap = placed[s:s + len(arr)]
                if overlap.any() and not (seq[s:s + len(arr)][overlap]
                                          == arr[overlap]).all():
                    raise SystemExit(
                        f"inconsistent REF overlap at {chrom}:{pos}")
                seq[s:s + len(arr)] = arr
                placed[s:s + len(arr)] = True
            fh.write(f">{chrom}\n")
            text = seq.tobytes().decode()
            for i in range(0, length, 80):
                fh.write(text[i:i + 80] + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
