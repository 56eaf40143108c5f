"""Property tests: device pipeline vs an independent pure-Python oracle on
randomized genomes (the test strategy SURVEY.md §4 calls for — the reference
has no equivalent)."""

import numpy as np
import pytest

from krisp_tpu.dna import revcomp
from krisp_tpu.engine.pipeline import KmerGeometry, run_pipeline


def oracle_pipeline(seqs_per_file, left, mid, right, ingroup_count):
    """Straight-line re-implementation of the krisp_fasta semantics:
    kmer tables (both strands, no N), flank-pair intersection across all
    files, ingroup-unique-column filter."""
    L = left + mid + right
    tables = []
    for seqs in seqs_per_file:
        kmers = {}
        for seq in seqs:
            for i in range(len(seq) - L + 1):
                for k in (seq[i:i + L], revcomp(seq[i:i + L])):
                    if "N" in k or "n" in k:
                        continue
                    k = k.upper()
                    kmers[k] = kmers.get(k, 0) + 1
        tables.append(kmers)

    def flank(k):
        return (k[:left], k[-right:] if right else "")

    flank_sets = [{flank(k) for k in t} for t in tables]
    common = set.intersection(*flank_sets)
    groups = {}
    for fp in common:
        members = {}
        for fi, t in enumerate(tables):
            for k, c in t.items():
                if flank(k) == fp:
                    members.setdefault(k[left:left + mid], {})[fi] = \
                        members.get(k[left:left + mid], {}).get(fi, 0) + c
        groups[fp] = members

    if mid > 0 and ingroup_count < len(seqs_per_file):
        kept = {}
        for fp, members in groups.items():
            in_mids = [m for m, files in members.items()
                       if any(fi < ingroup_count for fi in files)]
            out_mids = [m for m, files in members.items()
                        if any(fi >= ingroup_count for fi in files)]
            ok = False
            for p in range(mid):
                in_bases = {m[p] for m in in_mids}
                out_bases = {m[p] for m in out_mids}
                if in_bases.isdisjoint(out_bases):
                    ok = True
                    break
            if ok:
                kept[fp] = members
        groups = kept
    return groups


@pytest.mark.parametrize("seed,geom,alphabet", [
    (0, (4, 2, 3), "ACGTN"), (1, (5, 0, 5), "ACGTN"),
    (2, (3, 1, 3), "ACGTN"), (3, (17, 3, 2), "ACGTN"),
    # IUPAC letters force the 4-bit encoding path (reference keeps non-N
    # ambiguity codes in k-mers: disallow is only "Nn", kstream.py:715-732)
    (4, (4, 1, 3), "ACGTRYN"), (5, (9, 2, 6), "ACGTWSN")])
def test_pipeline_matches_oracle(tmp_path, seed, geom, alphabet):
    rng = np.random.default_rng(seed)
    left, mid, right = geom
    n_files, in_count = 3, 2
    paths, seqs_per_file = [], []
    probs = [0.04] * (len(alphabet) - 4)
    p_main = (1 - sum(probs)) / 4
    for f in range(n_files):
        seqs = ["".join(rng.choice(list(alphabet),
                                   size=rng.integers(30, 90),
                                   p=[p_main] * 4 + probs))
                for _ in range(3)]
        # plant a couple of shared regions so the intersection is non-empty
        shared = "".join(rng.choice(list("ACGT"), size=left + mid + right))
        rng2 = np.random.default_rng(99)
        shared2 = "".join(rng2.choice(list("ACGT"), size=left + mid + right))
        seqs.append(shared + "AC" + shared2)
        path = tmp_path / f"g{f}.fasta"
        path.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
        paths.append(str(path))
        seqs_per_file.append(seqs)

    got = run_pipeline(paths[:in_count], paths[in_count:],
                       KmerGeometry(left, mid, right))
    want = oracle_pipeline(seqs_per_file, left, mid, right, in_count)

    got_map = {}
    for g in got:
        members = {}
        for a in g.amplicons:
            for tag, c in a.label_counts.items():
                fi = int(tag[1:])  # g0, g1, ...
                members.setdefault(a.mid, {})[fi] = c
        got_map[(g.left, g.right)] = members
    assert got_map == want
