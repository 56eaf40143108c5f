"""Auxiliary command-line utilities.

Capability parity with the reference's misc_scripts
(/root/reference/misc_scripts/grepFastaSequence.py and annotate.py —
SURVEY.md component C43): locating sequences (and their reverse
complements) in FASTA files, and re-anchoring krisp alignment output onto
the source genomes with optional padding.
"""

from __future__ import annotations

import argparse
import sys

from ..dna import revcomp
from ..io.fasta import iter_fasta_records, simple_name

from ._pipe import pipe_safe


def find_all(haystack: str, needle: str):
    pos = haystack.find(needle)
    while pos != -1:
        yield pos
        pos = haystack.find(needle, pos + 1)


def find_in_fasta(fasta_path, seq, padding=0):
    """Yield (record, start, end, slice) for every forward occurrence, then
    every reverse-complement occurrence (lowercased to mark the minus
    strand).  Coordinates are 1-based like the reference script."""
    records = [(name, body.decode()) for name, body in
               iter_fasta_records(fasta_path)]
    for name, sequence in records:
        for pos in find_all(sequence, seq):
            start = max(0, pos - padding)
            end = pos + len(seq) + padding
            yield name, start + 1, end + 1, sequence[start:end]
    rc = revcomp(seq)
    for name, sequence in records:
        for pos in find_all(sequence, rc):
            start = max(0, pos - padding)
            end = pos + len(rc) + padding
            yield name, start + 1, end + 1, revcomp(sequence[start:end]).lower()


@pipe_safe
def grep_fasta_main(argv=None):
    p = argparse.ArgumentParser(
        prog="krisp_grep_fasta",
        description="Find a sequence (and its reverse complement) in FASTA")
    p.add_argument("fasta")
    p.add_argument("seq")
    p.add_argument("padding", type=int, nargs="?", default=0)
    args = p.parse_args(sys.argv[1:] if argv is None else argv)
    for name, start, end, sequence in find_in_fasta(args.fasta, args.seq,
                                                    args.padding):
        print(f"> {name} | start = {start} | end = {end}")
        print(sequence)
    return 0


def _dots_to_seq(ref, seq):
    return "".join(r if s == "." else s for r, s in zip(ref, seq))


def _seq_to_dots(ref, seq):
    return "".join("." if r == s else s for r, s in zip(ref, seq))


@pipe_safe
def annotate_main(argv=None):
    p = argparse.ArgumentParser(
        prog="krisp_annotate",
        description="Annotate alignments from krisp output with their "
                    "genomic coordinates")
    p.add_argument("alignment", type=str)
    p.add_argument("-r", "--ref", nargs="+", type=str, required=True,
                   help="Reference fasta files used to generate the alignment")
    p.add_argument("-p", "--padding", type=int, default=0)
    p.add_argument("-o", "--output", type=str)
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    out = sys.stdout if args.output is None else open(args.output, "w")
    base_to_file = {simple_name(f): f for f in args.ref}

    ref_seq = None
    ref_anchor = None
    count = 0
    for line in open(args.alignment):
        line = line.strip()
        if not line or line.startswith("{") or set(line) <= set(" {}-*#└┘─"):
            if not line:  # blank line separates alignments
                ref_seq = None
                ref_anchor = None
            continue
        if ":" not in line:
            continue
        count_new = ref_seq is None
        if count_new:
            count += 1
            print(f"# Alignment {count}", file=out)
        seq, tags = line.split(":", 1)
        seq = seq.strip()
        if ref_seq is None:
            ref_seq = seq
        else:
            seq = _dots_to_seq(ref_seq, seq)
        tag_names = [t.split("(")[0].strip() for t in tags.split(";")]
        for tag in tag_names:
            path = base_to_file.get(tag)
            if path is None:
                continue
            for name, start, end, sequence in find_in_fasta(
                    path, seq, args.padding):
                short = path.split("/")[-1]
                strand = "reverse" if sequence.islower() else "forward"
                label = (f"{short} | chrom={name} | start={start} | "
                         f"end={end} | strand={strand}")
                sequence = sequence.upper()
                if ref_anchor is None:
                    print(f"{sequence} | {label}", file=out)
                    ref_anchor = sequence
                else:
                    print(f"{_seq_to_dots(ref_anchor, sequence)} | {label}",
                          file=out)
    if out is not sys.stdout:
        out.close()
    return 0
