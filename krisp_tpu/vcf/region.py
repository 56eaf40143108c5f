"""Sliding-window regions over classified variants + group consensus
sequence inference.

Semantics parity with the reference's ``GroupedRegion``
(/root/reference/src/krisp/krisp_vcf/krisp_vcf.py:143-479):

  - sliding_window: per group, a deque of in-window variants whose group-
    coordinate span stays <= ``span``, flanked by bounded upstream/downstream
    deques (window state is O(flank), the streaming analog of blockwise
    scanning).
  - region_length: reference span adjusted by each variant's max allele
    length delta (indel-aware).
  - sequence(): apply variants to the lowercased reference slice in reverse
    sorted order, with diagnostic-site uppercasing or ``<allele,count>``
    annotation (the alignment renderer's input).
  - ref_pos_from_group_offset: reference<->group coordinate transform
    accumulating allele-length deltas.
"""

from __future__ import annotations

from collections import deque

from ..dna import collapse_to_iupac


class VariantWindow:
    """A window of consecutive variants for one group (GroupedRegion parity)."""

    def __init__(self, variants, group, reference, upstream=None,
                 downstream=None):
        self.variants = deque(variants)
        self.group = group
        self.reference = reference  # dict chrom -> str sequence
        self.upstream = upstream if upstream is not None else deque()
        self.downstream = downstream if downstream is not None else deque()
        self.type = "Undetermined"

    # -- windowing (parity: krisp_vcf.py:171-218) ---------------------------

    @classmethod
    def sliding_window(cls, variants, groups, reference, span, flank=1000):
        def increment(win):
            win.variants.append(win.upstream.popleft())
            while win.region_length() > span:
                win.downstream.appendleft(win.variants.popleft())
            while len(win.downstream) > flank:
                win.downstream.pop()

        windows = {g: cls(variants=[], group=g, reference=reference)
                   for g in groups}
        for index, variant in enumerate(variants):
            for g in groups:
                windows[g].upstream.append(variant)
                if index + 1 >= flank:
                    increment(windows[g])
                    if len(windows[g].variants) > 0:
                        yield cls(variants=windows[g].variants, group=g,
                                  reference=reference,
                                  upstream=windows[g].upstream,
                                  downstream=windows[g].downstream)
        for _ in range(len(next(iter(windows.values())).upstream)):
            for g in groups:
                increment(windows[g])
                if len(windows[g].variants) > 0:
                    yield cls(variants=windows[g].variants, group=g,
                              reference=reference,
                              upstream=windows[g].upstream,
                              downstream=windows[g].downstream)

    # -- geometry (parity: krisp_vcf.py:236-264) ----------------------------

    def region_length(self):
        if len(self.variants) == 0:
            return 0
        starts = [v.variant.pos - 1 for v in self.variants]
        ends = [s + v.variant.rlen - 1 for s, v in zip(starts, self.variants)]
        out = max(ends) - min(starts) + 1
        for var in self.variants:
            lens = var.allele_lens(self.group)
            if not lens:
                continue
            out += max(lens.values()) - len(var.variant.ref)
        return out

    def conserved(self):
        return [v.conserved[self.group] for v in self.variants]

    def diagnostic(self):
        return [v.diagnostic[self.group] for v in self.variants]

    # -- sequence inference (parity: krisp_vcf.py:359-443) ------------------

    def freeze(self):
        """Mark this window's deques as immutable-after-construction,
        enabling cached position arrays in ``sequence()``.

        Only for windows whose upstream/downstream deques are NOT the
        live sliding-window state: ``sliding_window`` yields windows that
        share its mutating deques (reference semantics — a later
        ``sequence()`` call sees the moved window), so those must never
        freeze.  The vectorized prefilter (fastscan.py) builds each
        candidate window fresh and never mutates it."""
        self._frozen = True
        return self

    def _frozen_arrays(self):
        cache = getattr(self, "_frozen", None)
        if cache is None or cache is False:
            return None
        if cache is True:
            import numpy as np
            all_vars = (list(self.downstream) + list(self.variants)
                        + list(self.upstream))
            n = len(all_vars)
            starts = np.fromiter((v.variant.pos for v in all_vars),
                                 np.int64, n) - 1
            ends = starts + np.fromiter((v.variant.rlen for v in all_vars),
                                        np.int64, n) - 1
            self._frozen = cache = (all_vars, starts, ends)
        return cache

    def sequence(self, reference, start, end, group=None, annotate=False):
        """Infer the group consensus over reference coords [start, end]
        (0-based inclusive), applying variants in reverse sorted order."""
        frozen = self._frozen_arrays()
        if frozen is not None:
            # identical selection predicate, vectorized over the cached
            # position arrays (the cascade tail calls sequence() several
            # times per candidate window with the same variant set)
            all_vars, starts_a, ends_a = frozen
            mask = (((start <= ends_a) & (ends_a <= end))
                    | ((start <= starts_a) & (starts_a <= end)))
            in_range = [all_vars[i] for i in mask.nonzero()[0]]
        else:
            all_vars = (list(self.downstream) + list(self.variants)
                        + list(self.upstream))
            v_starts = [v.variant.pos - 1 for v in all_vars]
            v_ends = [v.variant.pos + v.variant.rlen - 2 for v in all_vars]
            in_range = [v for v, vs, ve in zip(all_vars, v_starts, v_ends)
                        if start <= ve <= end or start <= vs <= end]

        if len({v.variant.chrom for v in in_range}) > 1:
            raise ValueError("Variants cannot span multiple chromosomes")
        chrom = self.variants[-1].variant.chrom

        if not in_range:
            return list(self._ref_slice(reference, chrom, start, end + 1).lower())

        v_starts = [v.variant.pos - 1 for v in in_range]
        v_ends = [s + v.variant.rlen - 1 for v, s in zip(in_range, v_starts)]
        in_range = [x for _, x in sorted(zip(v_ends, in_range),
                                         key=lambda p: p[0])]

        seq_start = min(v_starts + [start])
        seq_end = max(v_ends + [end])
        out = list(self._ref_slice(reference, chrom, seq_start, seq_end + 1).lower())

        for var in reversed(in_range):
            rep_start = var.variant.pos - 1 - seq_start
            rep_end = rep_start + len(var.variant.ref)
            is_diag_site = any(x is not None for x in var.diagnostic.values())
            if group is None:
                replacement = var.variant.ref
            else:
                is_diag_for_group = var.diagnostic[group] is not None
                alleles = var.allele_counts[group]
                if len(alleles) == 0:
                    consensus = "N" * var.variant.rlen
                else:
                    consensus = collapse_to_iupac(alleles.keys())
                if annotate:
                    if is_diag_site:
                        replacement = ";".join(k + str(v)
                                               for k, v in alleles.items())
                        if is_diag_for_group:
                            replacement = "<" + replacement + ">"
                    else:
                        replacement = consensus.upper()
                else:
                    replacement = (consensus.upper() if is_diag_for_group
                                   else consensus.lower())
            if annotate:
                out = out[:rep_start] + [replacement] + out[rep_end:]
            else:
                out = out[:rep_start] + list(replacement) + out[rep_end:]

        if seq_end > end:
            out = out[:len(out) - (seq_end - end)]
        if seq_start < start:
            out = out[start - seq_start:]
        return out

    @staticmethod
    def _ref_slice(reference, chrom, start, stop):
        return str(reference[chrom][start:stop])

    # -- coordinate transform (parity: krisp_vcf.py:467-479) ----------------

    def ref_pos_from_group_offset(self, ref_pos, offset):
        ref_diff_offset = 0
        for v in (list(reversed(self.downstream)) + list(self.variants)
                  + list(self.upstream)):
            var_pos_diff = v.variant.pos - 1 - ref_pos
            if var_pos_diff + ref_diff_offset >= offset:
                break
            if var_pos_diff >= 0:
                group_len = v.max_allele_len(self.group)
                ref_diff_offset += group_len - len(v.variant.ref)
        return ref_pos + offset - ref_diff_offset


def consv_border_n(group, border_var, nearby_vars, max_offset):
    """Max adjacent conserved run in ref and group coordinates
    (parity: krisp_vcf.py:579-609)."""
    # deques index and iterate directly; only materialize other iterables
    nearby = (nearby_vars if hasattr(nearby_vars, "__getitem__")
              else list(nearby_vars))
    if nearby and border_var.variant.pos < nearby[0].variant.pos:
        ref_diff_offset = (border_var.max_allele_len(group)
                           - len(border_var.variant.ref))
    else:
        ref_diff_offset = 0
    ref_diff = 0
    for nv in nearby:
        group_len = nv.max_allele_len(group)
        ref_len = len(nv.variant.ref)
        ref_start = nv.variant.pos
        ref_end = ref_start + ref_len - 1
        if border_var.variant.pos <= ref_start:
            ref_diff = ref_start - border_var.variant.pos
        else:
            ref_diff = border_var.variant.pos - ref_end
        if ref_diff + ref_diff_offset >= max_offset:
            return {"ref": max_offset - ref_diff_offset, "group": max_offset}
        if nv.conserved[group] is None:
            return {"ref": ref_diff - 1,
                    "group": ref_diff + ref_diff_offset - 1}
        ref_diff_offset += group_len - ref_len
    return {"ref": ref_diff - ref_diff_offset, "group": ref_diff}


class DiagnosticRegion(VariantWindow):
    """A window that survived the filter cascade, with primer results
    (parity: ``DiagosticRegion`` [sic], krisp_vcf.py:625-670)."""

    def __init__(self, variants, group, reference, upstream, downstream, p3,
                 crrna_seq, downstream_seq, upstream_seq, temp_range,
                 crrna_range, min_bases):
        super().__init__(variants, group, reference, upstream, downstream)
        self.p3 = p3
        self.downstream_seq = downstream_seq
        self.crrna_seq = crrna_seq
        self.upstream_seq = upstream_seq
        self.temp_range = temp_range
        self.crrna_range = crrna_range
        self.type = "Diagnostic"
        self.min_bases = min_bases

    @staticmethod
    def from_window(region, p3, crrna_seq, downstream_seq, upstream_seq,
                    temp_range, crrna_range, min_bases):
        out = DiagnosticRegion(
            variants=region.variants, group=region.group,
            reference=region.reference, upstream=region.upstream,
            downstream=region.downstream, p3=p3, crrna_seq=crrna_seq,
            downstream_seq=downstream_seq, upstream_seq=upstream_seq,
            temp_range=temp_range, crrna_range=crrna_range,
            min_bases=min_bases)
        if getattr(region, "_frozen", None):
            # frozen (prefilter-built) windows share immutable deques;
            # live sliding windows must stay unfrozen (shared mutating
            # deques are the reference's own semantics)
            out.freeze()
        return out

    def left_range(self):
        start = self.ref_pos_from_group_offset(
            ref_pos=self.temp_range[0], offset=self.p3["PRIMER_LEFT_0"][0])
        end = self.ref_pos_from_group_offset(
            ref_pos=self.temp_range[0],
            offset=sum(self.p3["PRIMER_LEFT_0"]) - 1)
        return [start, end]

    def right_range(self):
        start = self.ref_pos_from_group_offset(
            ref_pos=self.temp_range[0],
            offset=self.p3["PRIMER_RIGHT_0"][0] - self.p3["PRIMER_RIGHT_0"][1] + 1)
        end = self.ref_pos_from_group_offset(
            ref_pos=self.temp_range[0], offset=self.p3["PRIMER_RIGHT_0"][0])
        return [start, end]

    def missing_samples(self):
        diag_vars = [v for v in self.variants
                     if v.diagnostic[self.group] is not None]
        return {sid for v in diag_vars
                for ids in v.missing_samp_ids.values() for sid in ids}
