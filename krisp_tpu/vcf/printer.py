"""Column-model multi-group alignment renderer for krisp_vcf output.

Byte-format parity with the reference's print_align module
(/root/reference/src/krisp/krisp_vcf/print_align.py): one variable-width
column per reference position/variant, dot-masking of ref-equal cells,
center-padding (dashes for indels, spaces around annotated cells),
``└─ Left primer ─┘`` oligo brackets, terminal-width wrapping, and the
primer-statistics tables.
"""

from __future__ import annotations

import math
import shutil
from collections import defaultdict

from ..engine.render import simple_table


class Annotation:
    def __init__(self, name, seq, start):
        self.name = name
        self.seq = seq
        self.start = start


def _cumulative(lens):
    out = []
    total = 0
    for x in lens:
        total += x
        out.append(total)
    return out


def mask_same(seqs, ref):
    """Cells equal to the reference cell become dots (print_align.py:23-45)."""
    for group in seqs:
        for i in range(len(seqs[group])):
            if seqs[group][i] == ref[i]:
                seqs[group][i] = "." * len(ref[i])
    return seqs


def pos_to_chunk_index(pos, ref):
    """Base position -> (chunk index, offset) (print_align.py:48-52)."""
    ends = _cumulative([len(c.strip()) for c in ref])
    for i, p in enumerate(ends):
        if p - 1 >= pos:
            return {"chunk": i, "offset": abs(p - 1 - pos)}
    return None


def format_seq_annot(annots, ref):
    """Overlay oligo sequences on a blank row (print_align.py:178-196)."""
    ref_len = sum(len(x) for x in ref)
    output = [" "] * ref_len
    for annot in annots:
        start = pos_to_chunk_index(annot.start, ref)
        for index, nucleotide in enumerate(annot.seq):
            output[start["chunk"] + index] = nucleotide
    return output


def pad_sequences(seqs, ref, annots):
    """Equalize column widths; build the oligo-name bracket row
    (print_align.py:55-109)."""
    for col in range(len(ref)):
        column = [ref[col]] + [seq[col] for seq in seqs.values()]
        width = max(len(x) for x in column)
        pad = " " if any(">" in x or "/" in x for x in column) else "-"
        ref[col] = ref[col].center(width, pad)
        for name in seqs:
            if seqs[name][col] == " ":
                seqs[name][col] = seqs[name][col].center(width, " ")
            else:
                seqs[name][col] = seqs[name][col].center(width, pad)

    col_widths = [len(c) for c in ref]
    annot_out = [" " * len(c) for c in ref]
    for annot in annots:
        start = pos_to_chunk_index(annot.start, ref)
        end = pos_to_chunk_index(annot.start + len(annot.seq) - 1, ref)
        widths = [col_widths[i] for i in range(start["chunk"], end["chunk"] + 1)]
        text = "└" + (" " + annot.name + " ").center(sum(widths) - 2, "─") + "┘"
        it = iter(text)
        cols = ["".join(next(it) for _ in range(w)) for w in widths]
        for t_i, r_i in enumerate(range(start["chunk"], end["chunk"] + 1)):
            annot_out[r_i] = cols[t_i]
    return seqs, ref, annot_out


def print_align(seqs, ref, annot_text, groups, ref_name="Reference"):
    """Wrap to terminal width and emit labeled rows (print_align.py:112-175)."""

    def one_block(row_seqs, row_ref):
        group_counts = {g: str(len(v)) for g, v in groups.items()}
        labels = {k: f"{k} ({group_counts[k]})" if k in group_counts else f"{k}"
                  for k in seqs.keys()}
        max_len = max(len(x) for x in list(labels.values()) + [ref_name])
        out = [f"{ref_name.rjust(max_len)}: " + "".join(row_ref)]
        for name, seq in row_seqs.items():
            out.append(f"{labels[name].rjust(max_len)}: " + "".join(seq))
        out.append(" " * (max_len + 2) + "".join(annot_text))
        return out

    def split(xs, keys):
        res = defaultdict(list)
        for v, k in zip(xs, keys):
            res[k].append(v)
        return res

    term_width = shutil.get_terminal_size().columns
    label_width = max(len(s) for s in list(seqs.keys()) + [ref_name])
    align_width = term_width - label_width - 5
    row_index = [math.floor(x / align_width)
                 for x in _cumulative([len(x) for x in ref])]
    chunked_ref = split(ref, row_index)
    chunked_seqs = {k: split(v, row_index) for k, v in seqs.items()}
    output = []
    for index in range(len(chunked_ref)):
        row_seqs = {k: v[index] for k, v in chunked_seqs.items()}
        output.extend(one_block(row_seqs, chunked_ref[index]))
    return output


def render_primer3_stats(p3):
    left = {k[14:]: v for k, v in p3.items() if "PRIMER_LEFT_0_" in k}
    right = {k[15:]: v for k, v in p3.items() if "PRIMER_RIGHT_0_" in k}
    pair = {k[14:]: v for k, v in p3.items() if "PRIMER_PAIR_0_" in k}

    def names(keys):
        return [x.title().replace("_", " ") for x in keys]

    def vals(values):
        return [str(round(x, 5)) if isinstance(x, float) else x
                for x in values]

    primer_tbl = simple_table(["Direction"] + names(left.keys()),
                              [["Forward"] + vals(left.values()),
                               ["Reverse"] + vals(right.values())])
    pair_tbl = simple_table(names(pair.keys()), [vals(pair.values())])
    return ("\nPrimer statistics:\n" + primer_tbl +
            "\n\nPair statistics:\n" + pair_tbl)


def render_variant(seqs, ref, p3, groups, annots=None):
    """Full alignment rendering (print_align.py:226-257)."""
    seqs = mask_same(seqs, ref)
    if annots is not None:
        seqs["oligos"] = format_seq_annot(annots, ref)
    seqs, ref, annot_text = pad_sequences(seqs, ref, annots)
    output = print_align(seqs, ref, annot_text, groups)
    output += [render_primer3_stats(p3)]
    return output
