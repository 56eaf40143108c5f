"""Unit tests for the alignment renderer (krisp_tpu.engine.render).

The golden fasta tests pin the CLI output bytes; here the row-model
builder is pinned against an oracle that states the reference's rendering
semantics directly (/root/reference/src/krisp/krisp_fasta/
Amplicon.py:523-661), across randomized groups and every branch combo
(ingroup split x dot mode x primer annotations) — including the
bracket+lane merge the goldens only reach in dot mode.
"""

import random

from krisp_tpu.engine.render import (make_bracket, render_alignment,
                                     render_primer3_stats)


class FakeAmplicon:
    def __init__(self, left, mid, right, labels):
        self.mid = mid
        self.sequence = left + mid + right
        self.labels = labels

    def __str__(self):
        return self.sequence + " [" + ";".join(self.labels) + "]"


class FakeGroup:
    def __init__(self, left, mids, right, labels, ingroup=None, p3=None,
                 diag_cols=(), uniq_cols=()):
        self.left = left
        self.amplicons = [FakeAmplicon(left, m, right, l)
                          for m, l in zip(mids, labels)]
        self.ingroup = ingroup
        self.p3 = p3
        self._diag = list(diag_cols)
        self._uniq = list(uniq_cols)

    def diagnostic_columns(self):
        return self._diag

    def ingroup_unique_columns(self):
        return self._uniq


# ------------------------------------------------------------- oracles --

def oracle_bracket(group):
    start = len(group.left)
    end = start + len(group.amplicons[0].mid)
    bracket = list(" " * (start - 1) + "{" + "-" * (end - start) + "}")
    for d in group.diagnostic_columns():
        bracket[start + d] = "*"
    for d in group.ingroup_unique_columns():
        bracket[start + d] = "#"
    return "".join(bracket)


def oracle_alignment(group, enable_dot, stats_renderer):
    amps = sorted(group.amplicons, key=lambda a: a.labels)
    if group.ingroup is not None:
        rows = [str(a) for a in amps
                if set(a.labels) & set(group.ingroup)]
        rows += [str(a) for a in amps
                 if not (set(a.labels) & set(group.ingroup))]
    else:
        rows = [str(a) for a in amps]
    if enable_dot:
        top = rows[0]
        masked = [top]
        for row in rows[1:]:
            chars = list(row)
            for i in range(len(group.amplicons[0].sequence)):
                if top[i] == chars[i]:
                    chars[i] = "."
            masked.append("".join(chars))
        rows = masked
    else:
        rows.append(oracle_bracket(group))
    if group.p3 is not None:
        fwd_seq = group.p3["PRIMER_LEFT_0_SEQUENCE"]
        rev_seq = group.p3["PRIMER_RIGHT_0_SEQUENCE"]
        fwd_start = group.p3["PRIMER_LEFT_0"][0]
        rev_start = (group.p3["PRIMER_RIGHT_0"][0]
                     - group.p3["PRIMER_RIGHT_0"][1])
        text = (" " * fwd_start
                + "└" + "Forward".center(len(fwd_seq) - 2, "─") + "┘"
                + " " * (rev_start - fwd_start - len(fwd_seq) + 1)
                + "└" + "Reverse".center(len(rev_seq) - 2, "─") + "┘")
        if enable_dot:
            rows.append(text)
        else:
            base = rows[-1].ljust(len(text))
            rows[-1] = "".join(a if b == " " else b
                               for b, a in zip(base, text))
        rows.append(stats_renderer(group.p3))
    rows[-1] += "\n"
    return "\n".join(rows)


def oracle_stats(p3):
    left = {k[14:]: v for k, v in p3.items() if "PRIMER_LEFT_0_" in k}
    right = {k[15:]: v for k, v in p3.items() if "PRIMER_RIGHT_0_" in k}
    pair = {k[14:]: v for k, v in p3.items() if "PRIMER_PAIR_0_" in k}

    def names(keys):
        return [x.title().replace("_", " ") for x in keys]

    def vals(values):
        return [str(round(x, 5)) if isinstance(x, float) else x
                for x in values]

    from krisp_tpu.engine.render import simple_table
    primer_tbl = simple_table(["Direction"] + names(left.keys()),
                              [["Forward"] + vals(left.values()),
                               ["Reverse"] + vals(right.values())])
    pair_tbl = simple_table(names(pair.keys()), [vals(pair.values())])
    return ("\nPrimer statistics:\n" + primer_tbl
            + "\n\nPair statistics:\n" + pair_tbl)


# --------------------------------------------------------------- tests --

def random_group(rng, with_ingroup, with_p3):
    left = "".join(rng.choice("ACGT") for _ in range(rng.randrange(3, 8)))
    right = "".join(rng.choice("ACGT") for _ in range(rng.randrange(3, 8)))
    width = rng.randrange(4, 10)
    n = rng.randrange(1, 5)
    mids = ["".join(rng.choice("ACGT") for _ in range(width))
            for _ in range(n)]
    labels = [tuple(sorted(rng.sample(["a", "b", "c", "d"],
                                      rng.randrange(1, 3))))
              for _ in range(n)]
    ingroup = frozenset(rng.sample(["a", "b", "c", "d"], 2)) \
        if with_ingroup else None
    p3 = None
    if with_p3:
        total = len(left) + width + len(right)
        fl = rng.randrange(3, 6)
        rl = rng.randrange(3, 6)
        fwd_at = rng.randrange(0, 2)
        rev_end = total - 1 - rng.randrange(0, 2)
        p3 = {
            "PRIMER_LEFT_0": (fwd_at, fl),
            "PRIMER_RIGHT_0": (rev_end, rl),
            "PRIMER_LEFT_0_SEQUENCE": "A" * fl,
            "PRIMER_RIGHT_0_SEQUENCE": "T" * rl,
            "PRIMER_LEFT_0_TM": rng.random() * 10 + 55.0,
            "PRIMER_RIGHT_0_TM": rng.random() * 10 + 55.0,
            "PRIMER_PAIR_0_PENALTY": rng.random() * 5,
            "PRIMER_PAIR_0_PRODUCT_SIZE": total,
        }
    k = rng.randrange(0, width)
    diag = sorted(rng.sample(range(width), k))
    uniq = sorted(rng.sample(range(width), rng.randrange(0, width - k + 1)))
    return FakeGroup(left, mids, right, labels, ingroup=ingroup, p3=p3,
                     diag_cols=diag, uniq_cols=uniq)


def test_bracket_matches_oracle():
    rng = random.Random(3)
    for _ in range(100):
        g = random_group(rng, with_ingroup=False, with_p3=False)
        assert make_bracket(g) == oracle_bracket(g)


def test_alignment_matches_oracle_all_branches():
    rng = random.Random(5)
    for with_ingroup in (False, True):
        for with_p3 in (False, True):
            for enable_dot in (False, True):
                for _ in range(40):
                    g = random_group(rng, with_ingroup, with_p3)
                    got = render_alignment(g, enable_dot=enable_dot)
                    want = oracle_alignment(g, enable_dot, oracle_stats)
                    assert got == want, (with_ingroup, with_p3, enable_dot)


def test_stats_tables_match_oracle():
    rng = random.Random(9)
    for _ in range(50):
        g = random_group(rng, with_ingroup=False, with_p3=True)
        assert render_primer3_stats(g.p3) == oracle_stats(g.p3)
