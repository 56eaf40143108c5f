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
