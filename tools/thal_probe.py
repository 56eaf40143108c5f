#!/usr/bin/env python3
"""Extended-grammar thal-style probe for bounding the thermo carve-out.

The production engine (krisp_tpu/thermo) scores structures as chains of
perfectly-complementary helices joined by bulges/internal loops — the
grammar whose published-value pins are exact (PARITY.md).  libprimer3's
thal additionally represents (a) single internal mismatches scored as
nearest-neighbor mismatch stacks (Allawi & SantaLucia 1997-1998 series,
Peyret 1999) and (b) dangling-end/terminal-mismatch stabilization at the
duplex termini (Bommarito 2000) — tables whose exact values are NOT on
disk in this environment and are not bit-reconstructible from the papers
(VERDICT r4 / PARITY.md).

This probe therefore scores those extra terms PARAMETRICALLY: every
single-mismatch join contributes ``mm_dg37`` per flanking stack (two per
mismatch) and every structure terminus with >=1 unpaired base beyond it
contributes ``dangle_dg37`` — both treated entropically, like the
engine's loop terms.  Running the corpus at the strongest published
magnitudes gives an ADVERSARIAL BOUND on how far thal's unpublished
tables could move each screen; running at mid-range magnitudes gives the
typical picture.  Published ranges (kcal/mol, dG37): single-mismatch
stacks span roughly +1.5 (destabilizing A·A/C·C contexts) down to -1.1
(the strongest G·T stacks); dangling ends span roughly +0.5 down to
-0.96.

Used by tools/thermo_corpus.py (the measured disagreement distribution
recorded in PARITY.md) and tests/test_thermo_corpus.py (a pinned
small-corpus bound).
"""

from __future__ import annotations

import math

from krisp_tpu.thermo import nn
from krisp_tpu.thermo.oracle import (
    _Run,
    _codes,
    _duplex_runs,
    _hairpin_runs,
    _join_ds,
    _pareto,
)

#: strongest published magnitudes (adversarial bound)
ADVERSARIAL = dict(mm_dg37=-1.1, dangle_dg37=-0.96)
#: optimistic mid-range magnitudes (every mismatch mildly stabilizing)
TYPICAL = dict(mm_dg37=-0.1, dangle_dg37=-0.3)
#: literature-mean magnitudes: the published single-mismatch stack
#: tables average mildly DEstabilizing (~+0.4 kcal/mol per stack; only
#: the strongest G.T/G.A contexts go negative), dangles mid-range
LITERATURE_MEAN = dict(mm_dg37=+0.4, dangle_dg37=-0.3)


def _ds_of(dg37: float) -> float:
    """Entropic encoding of a dG37 term (the engine's convention for
    loop/closure terms): stabilizing dG37 < 0 -> positive dS."""
    return -dg37 * 1000.0 / nn._T37


def _chain_entries_ext(runs, inner_desc, mm_ds, start_dangle_ds):
    """Pareto sets per run over chains that may additionally join across
    single mismatches (gap 1+1, scored as two mismatch stacks) and whose
    outermost run earns a dangle term when unpaired bases precede it."""
    runs = [r for r in runs if r.length >= 2]
    runs.sort(key=lambda r: r.i0)
    sets: list[list] = []
    for ri, r in enumerate(runs):
        dangle = start_dangle_ds(r)
        entries = [(r.dh, r.ds + dangle, r.length >= 3)]
        for rj in range(ri):
            outer = runs[rj]
            ds_join = _join_ds(outer, r, inner_desc)
            if ds_join is None:
                # the engine's tables disallow 1-2 nt internal loops; a
                # 1+1 gap is thal's single internal mismatch — score it
                # as two flanking mismatch stacks instead
                gap1 = r.i0 - outer.i1 - 1
                gap2 = (outer.k1 - r.k0 - 1) if inner_desc \
                    else (r.k0 - outer.k1 - 1)
                if gap1 == 1 and gap2 == 1:
                    ds_join = 2.0 * mm_ds
                else:
                    continue
            for dh_p, ds_p, _elig in sets[rj]:
                entries.append((dh_p + r.dh, ds_p + r.ds + ds_join, True))
        sets.append(_pareto(entries))
    return runs, sets


def probe_duplex(runs, n1, n2, mm_dg37, dangle_dg37, end_i=None):
    """Best duplex (dh, ds) under the extended grammar.  ``n1``/``n2``
    are the sequence lengths (second already reversed); dangles apply at
    both termini when unpaired bases extend beyond the outer/inner
    helix ends."""
    mm_ds = _ds_of(mm_dg37)
    d_ds = _ds_of(dangle_dg37)

    def start_dangle(r):
        # outer terminus: any unpaired base before the helix on either
        # strand earns the (single) dangle/terminal-stack term
        return d_ds if (r.i0 > 0 or r.k0 > 0) else 0.0

    runs2, sets = _chain_entries_ext(runs, False, mm_ds, start_dangle)
    best_tm = -math.inf
    best = (0.0, 0.0)
    for r, entries in zip(runs2, sets):
        if end_i is not None and r.i1 != end_i:
            continue
        end_dangle = d_ds if (r.i1 < n1 - 1 or r.k1 < n2 - 1) else 0.0
        for dh, ds, elig in entries:
            if not elig or dh >= 0:
                continue
            ds_tot = ds + end_dangle
            if ds_tot >= 0:
                continue
            tm = float(nn._tm_of(dh, ds_tot))
            if tm > best_tm:
                best_tm = tm
                best = (dh, ds_tot)
    return best


def probe_hairpin(runs, mm_dg37, dangle_dg37):
    """Best hairpin (dh, ds) under the extended grammar (terminal loop +
    closure terms as in the engine, plus mismatch joins and the open-end
    dangle on BOTH flanks)."""
    mm_ds = _ds_of(mm_dg37)
    d_ds = _ds_of(dangle_dg37)

    def start_dangle(r):
        return d_ds if r.i0 > 0 else 0.0

    runs2, sets = _chain_entries_ext(runs, True, mm_ds, start_dangle)
    best_rank = -math.inf
    best = (0.0, 0.0)
    for r, entries in zip(runs2, sets):
        tloop = min(max(r.k1 - r.i1 - 1, 3), nn._MAX_LOOP)
        ds_term = nn._HAIRPIN_DS[tloop] + (nn.TMM_DS if tloop > 3 else 0.0)
        for dh, ds, elig in entries:
            if not elig or dh >= 0:
                continue
            rank = float(nn._neg_dg37(dh, ds + ds_term))
            if rank > best_rank:
                best_rank = rank
                best = (dh, ds + ds_term)
    return best


def probe_self_screens(seq: str, mm_dg37: float, dangle_dg37: float):
    """(self_any_th, self_end_th, hairpin_th) under the extended
    grammar — the probe counterpart of nn.batch_self_screens."""
    codes = _codes(seq)
    n = codes.size
    if n < 2:
        return (0.0, 0.0, 0.0)
    druns = _duplex_runs(codes, codes[::-1])
    any_dh, any_ds = probe_duplex(druns, n, n, mm_dg37, dangle_dg37)
    end_dh, end_ds = probe_duplex(druns, n, n, mm_dg37, dangle_dg37,
                                  end_i=n - 1)
    hp_dh, hp_ds = probe_hairpin(_hairpin_runs(codes), mm_dg37,
                                 dangle_dg37)
    return (round(nn.duplex_tm(any_dh, any_ds), 5),
            round(nn.duplex_tm(end_dh, end_ds), 5),
            round(nn.hairpin_gate_tm(hp_dh, hp_ds), 5))
