#!/usr/bin/env python3
"""Bound the thermo carve-out's blast radius with a corpus, not one anchor.

Generates a corpus of realistic primer candidates (every oligo the design
enumerator's static screens admit over random templates, plus random
primers across the length/GC range), computes SELF_ANY/SELF_END/HAIRPIN
under the production engine and under the extended-grammar probe
(tools/thal_probe.py: single-mismatch joins + terminal dangles at
parametric strengths), and reports how often the disagreement could flip
the reference's 40 degC PRIMER_MAX_* gates (Amplicon.py:143-151).

Results are recorded in PARITY.md; tests/test_thermo_corpus.py pins a
small-corpus version of the bound.

Usage: python tools/thermo_corpus.py [n_templates] [seed]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from krisp_tpu.thermo import nn  # noqa: E402
from thal_probe import (  # noqa: E402
    ADVERSARIAL,
    LITERATURE_MEAN,
    TYPICAL,
    probe_self_screens,
)

GATE = 40.0


def build_corpus(n_templates=40, seed=11, max_per_template=30):
    """Primer candidates the reference pipeline would actually screen:
    for each random 120-nt template, every right/left primer (length
    25..35, the krisp default range) passing the static Tm/GC/clamp
    screens — plus random primers spanning 18..35 nt for breadth."""
    rng = np.random.default_rng(seed)
    rc = str.maketrans("ACGT", "TGCA")
    corpus = []
    for _ in range(n_templates):
        t = "".join(rng.choice(list("ACGT"), size=120))
        picked = 0
        for length in range(25, 36):
            for a in range(0, len(t) - length + 1, 7):
                for seq in (t[a:a + length],
                            t[a:a + length].translate(rc)[::-1]):
                    tm = nn.tm_santalucia(seq)
                    if not (53 <= tm <= 68
                            and 40 <= nn.gc_percent(seq) <= 70
                            and seq[-1] in "GC"):
                        continue
                    corpus.append(seq)
                    picked += 1
                if picked >= max_per_template:
                    break
            if picked >= max_per_template:
                break
    for _ in range(n_templates * 5):
        length = int(rng.integers(18, 36))
        corpus.append("".join(rng.choice(list("ACGT"), size=length)))
    return sorted(set(corpus))


def measure(corpus, settings):
    """Per-screen disagreement stats: (engine, probe) values and whether
    the 40 degC gate decision differs."""
    names = ("SELF_ANY", "SELF_END", "HAIRPIN")
    flips = {n: 0 for n in names}
    deltas = {n: [] for n in names}
    engine = nn.batch_self_screens(corpus)
    for seq, eng in zip(corpus, engine):
        prb = probe_self_screens(seq, **settings)
        for name, e, p in zip(names, eng, prb):
            deltas[name].append(p - e)
            if (e > GATE) != (p > GATE):
                flips[name] += 1
    return flips, deltas


def main():
    n_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    corpus = build_corpus(n_templates, seed)
    print(f"corpus: {len(corpus)} candidates "
          f"(templates={n_templates}, seed={seed})")
    for label, settings in (("literature-mean", LITERATURE_MEAN),
                            ("typical-optimistic", TYPICAL),
                            ("adversarial", ADVERSARIAL)):
        flips, deltas = measure(corpus, settings)
        print(f"\nprobe settings [{label}]: {settings}")
        for name in ("SELF_ANY", "SELF_END", "HAIRPIN"):
            d = np.array(deltas[name])
            nz = d[np.abs(d) > 1e-9]
            print(f"  {name:9s}: gate flips {flips[name]}/{len(corpus)} "
                  f"({100.0 * flips[name] / len(corpus):.2f}%)  "
                  f"delta mean {d.mean():+.2f} degC, p95 "
                  f"{np.percentile(d, 95):+.2f}, max {d.max():+.2f}; "
                  f"{nz.size} candidates moved")


if __name__ == "__main__":
    main()
