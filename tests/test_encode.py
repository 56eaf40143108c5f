"""Unit tests for the encode/pack kernels against a pure-Python oracle."""

import numpy as np
import pytest

from krisp_tpu import dna
from krisp_tpu.ops.encode import kmer_keys, sort_perm, num_words


def oracle_kmers(seq: str, left: int, mid: int, right: int,
                 omit_soft=False, disallow="Nn"):
    """Reference-semantics k-mer extraction in plain Python
    (mirrors kstream parser chain order: kmerize -> softmask -> complements
    -> disallow, kstream.py:203-235)."""
    L = left + mid + right
    out = []
    kmers = [seq[i:i + L] for i in range(len(seq) - L + 1)]
    if omit_soft:
        kmers = [k for k in kmers if k.isupper()]
    else:
        kmers = [k.upper() for k in kmers]
    with_rc = []
    for k in kmers:
        with_rc.append(k)
        with_rc.append(dna.revcomp(k))
    kmers = [k for k in with_rc if set(k).isdisjoint(set(disallow))]
    return kmers


def keys_to_strings(invalid, words, L, bits):
    inv = np.asarray(invalid)
    ws = np.stack([np.asarray(w) for w in words], axis=1)
    rows = ws[inv == 0]
    return dna.decode_words(rows, L, bits)


def packed_to_plain(s, left, mid, right):
    """Undo the [left|right|mid] layout back to the linear k-mer."""
    return s[:left] + s[left + right:] + s[left:left + right]


@pytest.mark.parametrize("bits", [2, 4])
@pytest.mark.parametrize("geom", [(3, 1, 2), (5, 0, 3), (10, 4, 10)])
def test_kmer_keys_match_oracle(bits, geom):
    rng = np.random.default_rng(0)
    left, mid, right = geom
    L = left + mid + right
    alphabet = "ACGT" if bits == 2 else "ACGTRYN"
    seq = "".join(rng.choice(list(alphabet + "N"), size=200))
    buf = np.frombuffer(seq.encode(), np.uint8)

    code_table = dna.CODE2_TABLE if bits == 2 else dna.CODE4_TABLE
    comp_table = dna.COMP2_TABLE if bits == 2 else dna.COMP4_TABLE
    valid_table = dna.base_validity_table(bits, disallow="Nn")

    invalid, words = kmer_keys(buf, code_table, valid_table, comp_table,
                               left, mid, right, bits)
    got = sorted(packed_to_plain(s, left, mid, right)
                 for s in keys_to_strings(invalid, words, L, bits))
    want = sorted(oracle_kmers(seq, left, mid, right))
    assert got == want


def test_softmask_omit():
    seq = "ACGTacgTACGTT"
    left, mid, right = 2, 1, 1
    buf = np.frombuffer(seq.encode(), np.uint8)
    valid_omit = dna.base_validity_table(2, disallow="Nn", omit_soft=True)
    invalid, words = kmer_keys(buf, dna.CODE2_TABLE, valid_omit,
                               dna.COMP2_TABLE, left, mid, right, 2)
    got = sorted(packed_to_plain(s, left, mid, right)
                 for s in keys_to_strings(invalid, words, 4, 2))
    want = sorted(oracle_kmers(seq, left, mid, right, omit_soft=True))
    assert got == want


def test_record_boundary_sentinel():
    # NUL sentinel between records must kill windows spanning it
    seq = b"ACGTACGT\x00ACGTACGT"
    buf = np.frombuffer(seq, np.uint8)
    invalid, words = kmer_keys(buf, dna.CODE2_TABLE,
                               dna.base_validity_table(2, disallow="Nn"),
                               dna.COMP2_TABLE, 2, 1, 2, 2)
    got = keys_to_strings(invalid, words, 5, 2)
    # 4 windows per record, x2 strands, x2 records
    assert len(got) == 16


def test_sort_perm():
    assert sort_perm(2, 3, 2) == (0, 1, 5, 6, 2, 3, 4)
    assert num_words(28, 2) == 2
    assert num_words(100, 2) == 7
    assert num_words(28, 4) == 4


def test_collapse_to_iupac():
    assert dna.collapse_to_iupac(["ACG", "ACG"]) == "ACG"
    assert dna.collapse_to_iupac(["A", "G"]) == "R"
    assert dna.collapse_to_iupac(["AC", "AG", "AT"]) == "AB"
    assert dna.collapse_to_iupac(["A", "AG"]) == "--"
    assert dna.collapse_to_iupac(["AN", "AC"]) == "AN"
    assert dna.collapse_to_iupac(["A?", "AC"]) == "AN"


def test_revcomp():
    assert dna.revcomp("ACGT") == "ACGT"
    assert dna.revcomp("AAGC") == "GCTT"
    assert dna.revcomp("aRn") == "nYt"


def test_packed_upload_roundtrip():
    """Host 2-bit pack + validity bitmap -> device unpack reconstructs a
    buffer with identical per-base (code, validity) for every policy."""
    import numpy as np
    from krisp_tpu import dna
    from krisp_tpu.engine.pipeline import _pack_genomes_host
    from krisp_tpu.ops.intersect import unpack_genomes

    rng = np.random.default_rng(0)
    raw = rng.choice(np.frombuffer(b"ACGTNacgtn\0X", np.uint8),
                     size=(3, 1 << 16))
    for omit_soft in (False, True):
        packed, vbits = _pack_genomes_host(raw, omit_soft)
        recon = np.asarray(unpack_genomes(packed, vbits))
        code = np.asarray(dna.CODE2_TABLE, np.uint8)
        valid = np.asarray(dna.base_validity_table(2, disallow="Nn",
                                                   omit_soft=omit_soft))
        np.testing.assert_array_equal(valid[recon], valid[raw])
        # codes must agree wherever the base is valid
        m = valid[raw].astype(bool)
        np.testing.assert_array_equal((code[recon] & 3)[m], (code[raw] & 3)[m])


def test_window_keys_tree_matches_per_base():
    """Log-tree packing is bit-identical to window_keys_bits on valid
    rows for every geometry class (single/multi-word, no-mid, wide-mid)."""
    import numpy as np
    from krisp_tpu import dna
    from krisp_tpu.ops.encode import window_keys_bits, window_keys_tree

    rng = np.random.default_rng(11)
    code = dna.CODE2_TABLE
    valid = dna.base_validity_table(2, disallow="Nn")
    comp = dna.COMP2_TABLE
    for left, mid, right in [(25, 1, 2), (30, 40, 30), (3, 0, 2),
                             (1, 1, 1), (12, 100, 7)]:
        buf = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=2048,
                         p=[.24, .24, .24, .24, .04])
        ok_a, w_a = window_keys_bits(buf, code, valid, comp, left, mid,
                                     right, 2, 5)
        ok_b, w_b = window_keys_tree(buf, code, valid, comp, left, mid,
                                     right, 5)
        okm = np.asarray(ok_a)
        assert np.array_equal(okm, np.asarray(ok_b))
        for a, b in zip(w_a, w_b):
            assert np.array_equal(np.asarray(a)[okm], np.asarray(b)[okm])
