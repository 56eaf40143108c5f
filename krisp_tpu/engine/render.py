"""Output renderers for the k-mer engine: alignment text and CSV rows.

Byte-format parity targets:
  - alignment text + diagnostic bracket:
    /root/reference/src/krisp/krisp_fasta/Amplicon.py:523-661
  - CSV rows/header: Amplicon.py:663-671,
    outputAlignments.py:26-31 (header), README.md:118-124 (expected output)
  - primer statistics tables: Amplicon.py:566-595 (PrettyTable border=False,
    left-aligned — reproduced by ``simple_table`` below).
"""

from __future__ import annotations

from .groups import FlankGroup

PRIMER3_COL_NAMES = [
    'PRIMER_PAIR_0_PRODUCT_SIZE',
    'PRIMER_PAIR_0_PENALTY',
    'PRIMER_LEFT_0_SEQUENCE', 'PRIMER_RIGHT_0_SEQUENCE',
    'PRIMER_LEFT_0_PENALTY', 'PRIMER_RIGHT_0_PENALTY',
    'PRIMER_LEFT_0_TM', 'PRIMER_RIGHT_0_TM',
    'PRIMER_LEFT_0_GC_PERCENT', 'PRIMER_RIGHT_0_GC_PERCENT',
    'PRIMER_LEFT_0_SELF_ANY_TH', 'PRIMER_RIGHT_0_SELF_ANY_TH',
    'PRIMER_LEFT_0_SELF_END_TH', 'PRIMER_RIGHT_0_SELF_END_TH',
    'PRIMER_LEFT_0_HAIRPIN_TH', 'PRIMER_RIGHT_0_HAIRPIN_TH',
    'PRIMER_LEFT_0_END_STABILITY', 'PRIMER_RIGHT_0_END_STABILITY',
    'PRIMER_PAIR_0_COMPL_ANY_TH', 'PRIMER_PAIR_0_COMPL_END_TH',
]
PRIMER3_COL_KEY = {n: n.replace("PRIMER_", "").replace("_0", "").lower()
                   for n in PRIMER3_COL_NAMES}


def format_p3_output(p3_out: dict) -> dict:
    """Best-pair stats keyed for CSV (parity: Amplicon.py:99-101)."""
    return {PRIMER3_COL_KEY[n]: p3_out[n] for n in PRIMER3_COL_NAMES}


def csv_header(primer3: bool = False, sep: str = ",") -> str:
    names = ["left_seq", "diag_seq", "right_seq"]
    if primer3:
        names += [PRIMER3_COL_KEY[n] for n in PRIMER3_COL_NAMES]
    return sep.join(names)


def render_csv(group: FlankGroup, sep: str = ",") -> str:
    if len(group.amplicons) == 1:
        values = list(group.consensus().values())
    else:
        values = list(group.ingroup_consensus().values())
    if group.p3 is not None:
        values.extend(format_p3_output(group.p3).values())
    return sep.join(str(v) for v in values)


def simple_table(field_names, rows, align="l") -> str:
    """PrettyTable ``get_string(border=False)`` work-alike: one space of
    padding each side of every left-aligned cell, trailing spaces kept."""
    widths = [len(str(f)) for f in field_names]
    for row in rows:
        for i, v in enumerate(row):
            widths[i] = max(widths[i], len(str(v)))
    def fmt(row):
        return "".join(" " + str(v).ljust(w) + " " for v, w in zip(row, widths))
    lines = [fmt(field_names)]
    lines += [fmt(r) for r in rows]
    return "\n".join(lines)


def render_primer3_stats(p3: dict) -> str:
    """Primer/pair statistics tables (parity: Amplicon.py:566-595)."""
    left = {k[14:]: v for k, v in p3.items() if 'PRIMER_LEFT_0_' in k}
    right = {k[15:]: v for k, v in p3.items() if 'PRIMER_RIGHT_0_' in k}
    pair = {k[14:]: v for k, v in p3.items() if 'PRIMER_PAIR_0_' in k}

    def names(keys):
        return [x.title().replace('_', ' ') for x in keys]

    def vals(values):
        return [str(round(x, 5)) if isinstance(x, float) else x for x in values]

    primer_tbl = simple_table(['Direction'] + names(left.keys()),
                              [['Forward'] + vals(left.values()),
                               ['Reverse'] + vals(right.values())])
    pair_tbl = simple_table(names(pair.keys()), [vals(pair.values())])
    return ('\nPrimer statistics:\n' + primer_tbl +
            '\n\nPair statistics:\n' + pair_tbl)


def make_bracket(group: FlankGroup) -> str:
    """`{--*--#}` diagnostic bracket under the alignment
    (parity: Amplicon.py:523-540)."""
    start = len(group.left)
    end = start + len(group.amplicons[0].mid)
    bracket = list(" " * (start - 1) + "{" + "-" * (end - start) + "}")
    for d in group.diagnostic_columns():
        bracket[start + d] = "*"
    for d in group.ingroup_unique_columns():
        bracket[start + d] = "#"
    return "".join(bracket)


def render_alignment(group: FlankGroup, enable_dot: bool = False) -> str:
    """Human-readable alignment for one flank group
    (parity: Amplicon.py:598-661)."""
    rows = []
    amps = sorted(group.amplicons, key=lambda a: a.labels)
    if group.ingroup is not None:
        in_rows = [str(a) for a in amps if set(a.labels) & set(group.ingroup)]
        out_rows = [str(a) for a in amps if not (set(a.labels) & set(group.ingroup))]
        rows = in_rows + out_rows
    else:
        rows = [str(a) for a in amps]

    amp_len = len(group.amplicons[0].sequence)
    if enable_dot:
        top = rows[0]
        masked = [top]
        for row in rows[1:]:
            chars = list(row)
            for i in range(amp_len):
                if top[i] == chars[i]:
                    chars[i] = "."
            masked.append("".join(chars))
        rows = masked
    else:
        rows.append(make_bracket(group))

    if group.p3 is not None:
        fwd_seq = group.p3['PRIMER_LEFT_0_SEQUENCE']
        rev_seq = group.p3['PRIMER_RIGHT_0_SEQUENCE']
        fwd_start = group.p3['PRIMER_LEFT_0'][0]
        rev_start = group.p3['PRIMER_RIGHT_0'][0] - group.p3['PRIMER_RIGHT_0'][1]
        fwd_annot = '└' + 'Forward'.center(len(fwd_seq) - 2, '─') + '┘'
        rev_annot = '└' + 'Reverse'.center(len(rev_seq) - 2, '─') + '┘'
        text = (' ' * fwd_start + fwd_annot +
                ' ' * (rev_start - fwd_start - len(fwd_seq) + 1) + rev_annot)
        if enable_dot:
            rows.append(text)
        else:
            base = rows[-1].ljust(len(text))
            rows[-1] = "".join(a if b == ' ' else b for b, a in zip(base, text))
        rows.append(render_primer3_stats(group.p3))

    rows[-1] += "\n"
    return "\n".join(rows)
