"""Pinned small-corpus bound on the thermo carve-out's blast radius.

The full corpus run (tools/thermo_corpus.py, 1,406 candidates) is
recorded in PARITY.md; this test pins a fast subset so the bound cannot
silently rot: under the literature-mean extended-grammar probe
(single-mismatch joins at +0.4 kcal/mol per stack, terminal dangles at
-0.3 — tools/thal_probe.py), the 40 degC gate decisions of the
production engine stay within the recorded flip-rate envelope.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from thal_probe import LITERATURE_MEAN  # noqa: E402
from thermo_corpus import GATE, build_corpus, measure  # noqa: E402


def test_small_corpus_gate_flip_bound():
    corpus = build_corpus(n_templates=6, seed=11)
    assert len(corpus) >= 150
    flips, deltas = measure(corpus, LITERATURE_MEAN)
    n = len(corpus)
    # recorded full-corpus rates (PARITY.md): ANY 1.35%, END 0.36%,
    # HAIRPIN 2.20%; allow small-sample slack but catch regressions that
    # would change the story (an order-of-magnitude drift)
    assert flips["SELF_ANY"] / n <= 0.05, flips
    assert flips["SELF_END"] / n <= 0.03, flips
    assert flips["HAIRPIN"] / n <= 0.06, flips
    # the probe only ADDS structures: duplex screens rank by Tm, so the
    # superset's best is monotone.  Hairpins rank by min-dG37 but REPORT
    # Tm (thal's behavior), so the probe's argmax may shift to an
    # equal-or-better dG structure with a slightly different Tm — allow
    # a small negative there.
    assert min(deltas["SELF_ANY"]) >= -1e-6
    assert min(deltas["SELF_END"]) >= -1e-6
    assert min(deltas["HAIRPIN"]) >= -2.0


def test_probe_matches_engine_with_extensions_neutralized():
    """With mismatch joins made absurdly destabilizing (dG37 = +50, so
    they are never favored) and dangles zeroed, the probe reduces to the
    engine's grammar — pin the two published anchors (both of whose best
    structures carry no 5'-flank dangle term in the engine either)."""
    from krisp_tpu.thermo import nn
    from thal_probe import probe_self_screens

    for seq in ("TCGTTCCCATCGACAAGATACTCTC",      # flush hairpin 37.5163
                "CACAAGGACAAGTGCCACTAAACCAG"):    # published LEFT
        eng = nn.batch_self_screens([seq])[0]
        prb = probe_self_screens(seq, mm_dg37=+50.0, dangle_dg37=0.0)
        for e, p in zip(eng, prb):
            assert abs(e - p) < 1e-6, (seq, eng, prb)
