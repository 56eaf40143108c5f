"""Unit tests for the splice-plan sequence assembly and the array-form
coordinate/border helpers in krisp_tpu.vcf.region.

The golden scan tests pin these against the reference byte-for-byte on
real workloads; here each helper is pinned against a scalar oracle that
states the documented semantics directly (reference:
/root/reference/src/krisp/krisp_vcf/krisp_vcf.py:359-609), including the
overlapping-locus corner the goldens never reach.
"""

import random

import pytest

from krisp_tpu.vcf.region import (VariantWindow, _apply_splices,
                                  _consensus_tokens, consv_border_n)


# ---------------------------------------------------------------- fakes --

class FakeRecord:
    def __init__(self, pos, ref, chrom="chr1"):
        self.pos = pos            # 1-based
        self.ref = ref
        self.rlen = len(ref)
        self.chrom = chrom


class FakeVar:
    """Just enough of ClassifiedVariant for the region helpers."""

    def __init__(self, pos, ref, alleles=None, diagnostic=None,
                 conserved=None, group="G", chrom="chr1"):
        self.variant = FakeRecord(pos, ref, chrom)
        self.allele_counts = {group: dict(alleles or {})}
        self.diagnostic = {group: diagnostic}
        self.conserved = {group: conserved}
        self._group = group

    def max_allele_len(self, group):
        counts = self.allele_counts[group]
        if not counts:
            return len(self.variant.ref)
        return max(len(a) for a in counts)


def window(vars_, group="G", upstream=(), downstream=()):
    w = VariantWindow(variants=list(vars_), group=group, reference=None,
                      upstream=list(upstream), downstream=list(downstream))
    return w


# ------------------------------------------------------- splice assembly --

def fold_splices(base, cuts):
    """Oracle: the reference's reverse-order list surgery."""
    out = list(base)
    for rs, re_, tokens in reversed(cuts):
        out = out[:rs] + list(tokens) + out[re_:]
    return out


def test_apply_splices_disjoint_equals_fold():
    rng = random.Random(7)
    for _ in range(200):
        base = [rng.choice("acgt") for _ in range(rng.randrange(1, 40))]
        cuts, cursor = [], 0
        while cursor < len(base) and rng.random() < 0.7:
            rs = rng.randrange(cursor, len(base))
            re_ = rng.randrange(rs, min(rs + 4, len(base)) + 1)
            tokens = [rng.choice("ACGT") for _ in range(rng.randrange(0, 4))]
            cuts.append((rs, re_, tokens))
            cursor = re_
        assert _apply_splices(list(base), cuts) == fold_splices(base, cuts)


def test_apply_splices_overlap_keeps_fold_semantics():
    # two cuts whose reference loci overlap (a deletion spanning a SNP):
    # the result must be the right-fold's, not naive left-to-right
    base = list("aaccggtt")
    cuts = [(2, 4, ["X"]), (3, 7, ["Y", "Z"])]  # sorted by end, overlapping
    assert _apply_splices(list(base), cuts) == fold_splices(base, cuts)
    # and the fold output here genuinely differs from disjoint assembly
    naive = ["a", "a", "X", "Y", "Z", "t"]
    assert _apply_splices(list(base), cuts) != naive


def test_apply_splices_empty_plan_is_identity():
    base = list("acgt")
    assert _apply_splices(list(base), []) == base


# -------------------------------------------------------- token spelling --

def test_consensus_tokens_cases():
    g = "G"
    # diagnostic for the group: uppercase IUPAC collapse
    v = FakeVar(10, "A", alleles={"A": 3, "G": 2}, diagnostic="A")
    assert _consensus_tokens(v, g, annotate=False) == ["R"]
    # not diagnostic: lowercase
    v = FakeVar(10, "A", alleles={"A": 3, "G": 2}, diagnostic=None)
    assert _consensus_tokens(v, g, annotate=False) == ["r"]
    # no data: N per reference base
    v = FakeVar(10, "AT", alleles={}, diagnostic=None)
    assert _consensus_tokens(v, g, annotate=False) == ["n", "n"]
    # annotate at a diagnostic site: one <allele+count> token
    v = FakeVar(10, "A", alleles={"A": 3, "G": 2}, diagnostic="A")
    assert _consensus_tokens(v, g, annotate=True) == ["<A3;G2>"]
    # annotate at a non-diagnostic site: one uppercase consensus token
    v = FakeVar(10, "A", alleles={"A": 5}, diagnostic=None)
    assert _consensus_tokens(v, g, annotate=True) == ["A"]
    # group None: reference bases verbatim
    v = FakeVar(10, "AT", alleles={"A": 1}, diagnostic="A")
    assert _consensus_tokens(v, None, annotate=False) == ["A", "T"]
    assert _consensus_tokens(v, None, annotate=True) == ["AT"]


# --------------------------------------------------- coordinate transform --

def oracle_ref_pos_from_group_offset(ctx_vars, group, ref_pos, offset):
    """Oracle: walk context variants in ascending order, accumulating
    allele-length drift until the group offset is reached."""
    drift = 0
    for v in ctx_vars:
        d = v.variant.pos - 1 - ref_pos
        if d + drift >= offset:
            break
        if d >= 0:
            drift += v.max_allele_len(group) - len(v.variant.ref)
    return ref_pos + offset - drift


def random_vars(rng, n, group="G", start=1, conserved_p=1.0):
    out, pos = [], start
    for _ in range(n):
        pos += rng.randrange(1, 9)
        ref = "A" * rng.randrange(1, 4)
        alleles = {}
        for _ in range(rng.randrange(0, 3)):
            alleles["ACGT"[rng.randrange(4)] * rng.randrange(1, 5)] = 1
        out.append(FakeVar(
            pos, ref, alleles=alleles,
            conserved="A" if rng.random() < conserved_p else None,
            group=group))
    return out

def test_ref_pos_from_group_offset_matches_oracle():
    rng = random.Random(11)
    for _ in range(100):
        ctx = random_vars(rng, rng.randrange(0, 8))
        k = len(ctx)
        cut1 = rng.randrange(0, k + 1)
        cut2 = rng.randrange(cut1, k + 1)
        w = window(ctx[cut1:cut2] or ctx[:1] or [FakeVar(5, "A")],
                   downstream=list(reversed(ctx[:cut1])),
                   upstream=ctx[cut2:])
        ctx_order = (list(reversed(w.downstream)) + list(w.variants)
                     + list(w.upstream))
        ref_pos = rng.randrange(1, 40)
        offset = rng.randrange(0, 60)
        assert w.ref_pos_from_group_offset(ref_pos, offset) == \
            oracle_ref_pos_from_group_offset(ctx_order, "G", ref_pos, offset)


# --------------------------------------------------------- border search --

def oracle_consv_border_n(group, border_var, nearby, max_offset):
    """Oracle: scan outward from the border, stopping at the cap (group
    coordinates) or the first non-conserved variant."""
    drift = (border_var.max_allele_len(group) - len(border_var.variant.ref)
             if nearby and border_var.variant.pos < nearby[0].variant.pos
             else 0)
    gap = 0
    for nv in nearby:
        if border_var.variant.pos <= nv.variant.pos:
            gap = nv.variant.pos - border_var.variant.pos
        else:
            gap = border_var.variant.pos - (nv.variant.pos
                                            + len(nv.variant.ref) - 1)
        if gap + drift >= max_offset:
            return {"ref": max_offset - drift, "group": max_offset}
        if nv.conserved[group] is None:
            return {"ref": gap - 1, "group": gap + drift - 1}
        drift += nv.max_allele_len(group) - len(nv.variant.ref)
    return {"ref": gap - drift, "group": gap}


@pytest.mark.parametrize("conserved_p", [1.0, 0.6, 0.0])
def test_consv_border_n_matches_oracle(conserved_p):
    rng = random.Random(int(conserved_p * 100) + 3)
    for _ in range(150):
        border = FakeVar(rng.randrange(1, 60), "A" * rng.randrange(1, 3),
                         alleles={"AC"[rng.randrange(2)]: 1})
        nearby = random_vars(rng, rng.randrange(0, 8),
                             start=rng.randrange(1, 80),
                             conserved_p=conserved_p)
        if rng.random() < 0.5:
            nearby = list(reversed(nearby))
        max_offset = rng.randrange(1, 50)
        got = consv_border_n("G", border, nearby, max_offset)
        want = oracle_consv_border_n("G", border, nearby, max_offset)
        assert got == want


def test_consv_border_n_empty():
    border = FakeVar(10, "A")
    assert consv_border_n("G", border, [], 25) == {"ref": 0, "group": 0}


# ------------------------------------------------------------- sequence --

class FakeRef(dict):
    pass


def test_sequence_splice_plan_end_to_end():
    ref = {"chr1": "ACGTACGTACGTACGTACGT"}
    g = "G"
    vs = [FakeVar(5, "A", alleles={"G": 4}, diagnostic="G"),     # SNP @4
          FakeVar(9, "AC", alleles={"A": 2, "T": 1},             # del @8-9
                  diagnostic=None)]
    w = window(vs, group=g)
    # group consensus, diagnostic site uppercased, non-diag lowercased
    out = w.sequence(ref, 2, 12, group=g)
    assert out == list("gt") + ["G"] + list("cgt") + ["w"] + list("gta")
    # annotate mode: diagnostic sites render <allele+count>; sites not
    # diagnostic for any group render one uppercase consensus token
    out = w.sequence(ref, 2, 12, group=g, annotate=True)
    assert out == list("gt") + ["<G4>"] + list("cgt") + ["W"] + list("gta")
    # group=None: reference alleles verbatim (uppercase), rest lowercase
    out = w.sequence(ref, 2, 12, group=None)
    assert out == list("gt") + ["A"] + list("cgt") + list("AC") + list("gta")
    # window trimming: a variant straddling the start pads the slice, and
    # the head trim then cuts into the shortened replacement (reference
    # quirk — the trim counts tokens, not reference bases)
    out = w.sequence(ref, 9, 12, group=g)
    assert out == list("gta")
