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


class _Ring:
    """Append-only variant buffer addressed by absolute stream index, with
    O(context) retained memory: ``trim`` drops everything below a bound
    once no live window can reference it."""

    __slots__ = ("_items", "_base")

    def __init__(self):
        self._items: list = []
        self._base = 0

    def append(self, item):
        self._items.append(item)

    def trim(self, upto: int):
        if upto > self._base:
            del self._items[: upto - self._base]
            self._base = upto

    def __getitem__(self, abs_index: int):
        return self._items[abs_index - self._base]

    @property
    def end(self) -> int:
        return self._base + len(self._items)


class _Span:
    """Immutable sequence view over a _Ring index range.  ``reverse=True``
    gives the nearest-first orientation of the downstream context.  Views
    are what sliding_window hands to each yielded window — no per-yield
    copying, no shared mutable state."""

    __slots__ = ("_ring", "_rng")

    def __init__(self, ring: _Ring, start: int, stop: int,
                 reverse: bool = False):
        self._ring = ring
        self._rng = (range(stop - 1, start - 1, -1) if reverse
                     else range(start, stop))

    def __len__(self):
        return len(self._rng)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self._ring[j] for j in self._rng[i]]
        return self._ring[self._rng[i]]

    def __iter__(self):
        for j in self._rng:
            yield self._ring[j]

    def __reversed__(self):
        for j in reversed(self._rng):
            yield self._ring[j]


def group_span(variants, group) -> int:
    """Group-coordinate length of the reference interval covered by
    ``variants``: the span of the union of their reference loci, plus each
    variant's max observed allele-length delta for ``group`` (indel-aware;
    behavior target: the reference's ``region_length``,
    /root/reference/src/krisp/krisp_vcf/krisp_vcf.py:236-264)."""
    n = len(variants)
    if n == 0:
        return 0
    lo = hi = None
    length = 0
    for v in variants:
        start = v.variant.pos - 1
        end = start + v.variant.rlen - 1
        lo = start if lo is None else min(lo, start)
        hi = end if hi is None else max(hi, end)
        lens = v.allele_lens(group)
        if lens:
            length += max(lens.values()) - len(v.variant.ref)
    return length + hi - lo + 1


class VariantWindow:
    """A window of consecutive variants for one group (GroupedRegion parity)."""

    def __init__(self, variants, group, reference, upstream=None,
                 downstream=None):
        # any sequence-protocol container works (deque, list, _Span view);
        # plain iterables are materialized once
        self.variants = (variants if hasattr(variants, "__getitem__")
                         else deque(variants))
        self.group = group
        self.reference = reference  # dict chrom -> str sequence
        self.upstream = upstream if upstream is not None else ()
        self.downstream = downstream if downstream is not None else ()
        self.type = "Undetermined"

    # -- windowing -----------------------------------------------------------

    @classmethod
    def sliding_window(cls, variants, groups, reference, span, flank=1000):
        """Stream windows over classified variants, one per (variant, group).

        Own-idiom design (the same two-pointer formulation as the
        vectorized scan, fastscan._window_types): variants accumulate in a
        ring buffer; every stream index ``e`` becomes a window end once
        ``flank`` further variants are buffered (or the stream is
        exhausted), and each group's window start ``j`` advances
        monotonically until the group-coordinate span fits.  Yielded
        windows carry immutable views: in-window [j, e], lookahead
        (e, e+flank) exclusive of e, look-behind [j-flank, j) nearest
        first — the exact window sequence of the reference's deque
        machinery (krisp_vcf.py:171-218), pinned by the golden scan tests.
        """
        ring = _Ring()
        js = dict.fromkeys(groups, 0)

        def emit(e):
            for g in groups:
                j = js[g]
                while j <= e and group_span(_Span(ring, j, e + 1), g) > span:
                    j += 1
                js[g] = j
                if j <= e:
                    yield cls(variants=_Span(ring, j, e + 1), group=g,
                              reference=reference,
                              upstream=_Span(ring, e + 1, ring.end),
                              downstream=_Span(ring, max(j - flank, 0), j,
                                               reverse=True))

        n_read = 0
        for variant in variants:
            ring.append(variant)
            n_read += 1
            if n_read >= flank:
                e = n_read - flank
                yield from emit(e)
                ring.trim(max(min(js.values()) - flank, 0))
        for e in range(max(n_read - flank + 1, 0), n_read):
            yield from emit(e)
            ring.trim(max(min(js.values()) - flank, 0))

    # -- geometry ------------------------------------------------------------

    def region_length(self):
        return group_span(self.variants, self.group)

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

    #: optional (pos 1-based, group delta) arrays over the window's context
    #: rows in ascending order — injected by the vectorized scan so the
    #: coordinate transform never touches variant objects
    _coords = None

    def ref_pos_from_group_offset(self, ref_pos, offset):
        if self._coords is not None:
            import numpy as np
            pos_arr, delta_arr = self._coords
            d = (pos_arr - 1) - ref_pos
            add = np.where(d >= 0, delta_arr, 0)
            off_before = np.cumsum(add) - add
            stop = d + off_before >= offset
            if stop.any():
                off = off_before[np.argmax(stop)]
            else:
                off = off_before[-1] + add[-1] if add.size else 0
            return int(ref_pos + offset - off)
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
        frozen = getattr(region, "_frozen", None)
        if frozen:
            # frozen (prefilter-built) windows share immutable contexts;
            # adopt the source's cache as-is (a built position-array tuple
            # carries over without recomputation)
            out._frozen = frozen
        if region._coords is not None:
            out._coords = region._coords
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
