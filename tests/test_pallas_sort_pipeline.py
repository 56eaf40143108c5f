"""The fused pipeline under the Pallas comparator-sort backend must be
bit-identical to the LSD backend (interpret mode on CPU; the compiled twin
runs in tools/pallas_sort_check.py on the real chip)."""

import numpy as np
import pytest

from krisp_tpu.engine.pipeline import KmerGeometry, run_pipeline


def _write_genomes(tmp_path, seed, n_files, L):
    rng = np.random.default_rng(seed)
    paths = []
    shared = "".join(rng.choice(list("ACGT"), size=L))
    for f in range(n_files):
        seqs = ["".join(rng.choice(list("ACGTN"), size=rng.integers(40, 90),
                                   p=[0.24] * 4 + [0.04]))
                for _ in range(3)]
        seqs.append(shared)
        path = tmp_path / f"g{f}.fasta"
        path.write_text("".join(f">s{i}\n{s}\n"
                                for i, s in enumerate(seqs)))
        paths.append(str(path))
    return paths


def _snapshot(groups):
    return [(g.left, g.right,
             tuple(sorted((a.mid, tuple(sorted(a.label_counts.items())))
                          for a in g.amplicons)))
            for g in groups]


@pytest.mark.parametrize("geom", [(4, 2, 3), (17, 3, 2)])
def test_backends_bit_identical(tmp_path, geom, monkeypatch):
    import jax

    from krisp_tpu.ops import pallas_sort

    left, mid, right = geom
    paths = _write_genomes(tmp_path, seed=left, n_files=3,
                           L=left + mid + right)
    base = run_pipeline(paths[:2], paths[2:], KmerGeometry(left, mid, right))

    calls = []
    real = pallas_sort.bitonic_sort_words

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(pallas_sort, "bitonic_sort_words", counting)
    monkeypatch.setenv("KRISP_TPU_PALLAS_SORT", "interpret")
    # the backend flag is read at trace time; drop cached executables so
    # the pipeline retraces under the new backend
    jax.clear_caches()
    alt = run_pipeline(paths[:2], paths[2:], KmerGeometry(left, mid, right))
    assert calls, "pallas sort backend was not exercised"
    assert _snapshot(alt) == _snapshot(base)
    jax.clear_caches()
