"""The vectorized Levenshtein (vcf/scan.py) is integer-exact vs the
scalar DP (the reference's nltk.edit_distance metric: unit costs, no
transpositions)."""

import numpy as np
import pytest

from krisp_tpu.vcf.scan import edit_distance


def scalar_oracle(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_vs_scalar(seed):
    rng = np.random.default_rng(seed)
    for _ in range(400):
        la, lb = rng.integers(0, 45, 2)
        a = "".join(rng.choice(list("ACGT"), la))
        b = "".join(rng.choice(list("ACGT"), lb))
        assert edit_distance(a, b) == scalar_oracle(a, b), (a, b)


def test_known_values():
    assert edit_distance("", "") == 0
    assert edit_distance("A", "") == 1
    assert edit_distance("", "ACGT") == 4
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("ACGT", "ACGT") == 0
    assert edit_distance("ACGT", "AGGT") == 1
    assert edit_distance("ACGT", "CGTA") == 2


def test_matches_nltk_reference_oracle():
    """nltk.metrics.distance.edit_distance is the exact function the
    reference calls at cascade step 6 (krisp_vcf.py:19,864) — use it as a
    live oracle for both our scalar DP and the batched stacked DP."""
    import random

    from nltk.metrics.distance import edit_distance as nltk_ed

    from krisp_tpu.vcf.scan import edit_distance, edit_distance_batch

    rng = random.Random(7)
    for trial in range(60):
        la = rng.randint(0, 34)
        lb = rng.randint(0, 34)
        a = "".join(rng.choice("ACGT-N") for _ in range(la))
        b = "".join(rng.choice("ACGT-N") for _ in range(lb))
        assert edit_distance(a, b) == nltk_ed(a, b)
    a = "".join(rng.choice("ACGT") for _ in range(28))
    bs = ["".join(rng.choice("ACGT") for _ in range(rng.randint(0, 33)))
          for _ in range(17)]
    assert edit_distance_batch(a, bs) == [nltk_ed(a, b) for b in bs]
