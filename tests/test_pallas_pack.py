"""Pallas pack kernel vs. the XLA encode path (interpret mode on CPU)."""

import numpy as np
import pytest

from krisp_tpu import dna
from krisp_tpu.ops.encode import window_keys_bits
from krisp_tpu.ops.pallas_pack import pallas_window_keys


@pytest.mark.parametrize("geom", [(4, 1, 3), (10, 4, 10)])
@pytest.mark.parametrize("revcomp", [False, True])
def test_pallas_pack_matches_xla(geom, revcomp):
    rng = np.random.default_rng(0)
    left, mid, right = geom
    L = left + mid + right
    n_files = 5
    seq = rng.choice(np.frombuffer(b"ACGTNacgt", np.uint8), size=9000)
    buf = np.concatenate([seq, np.zeros(100, np.uint8)])

    ok_p, words_p = pallas_window_keys(buf, left, mid, right, 2, n_files,
                                       revcomp=revcomp, interpret=True)

    code_t = dna.CODE2_TABLE
    comp_t = dna.COMP2_TABLE
    valid_t = dna.base_validity_table(2, disallow="Nn")
    ok_x, words_x = window_keys_bits(buf, code_t, valid_t, comp_t,
                                    left, mid, right, 2, n_files)
    n_win = buf.size - L + 1
    # XLA path returns fwd then rc halves; pick the matching strand
    ok_x = np.asarray(ok_x)
    half = slice(n_win, 2 * n_win) if revcomp else slice(0, n_win)
    ok_ref = ok_x[half]
    np.testing.assert_array_equal(np.asarray(ok_p)[:n_win], ok_ref)
    for wp, wx in zip(words_p, words_x):
        got = np.asarray(wp)[:n_win]
        want = np.asarray(wx)[half]
        valid = ok_ref
        np.testing.assert_array_equal(got[valid], want[valid])


def test_pallas_pack_both_strands_amplicon_geometry():
    """The fused both-strands kernel at amplicon scale (L=100, 7-word
    keys): fwd and rc words + the shared validity must match the XLA
    path for both strand halves."""
    rng = np.random.default_rng(3)
    left, mid, right = 30, 40, 30
    L = left + mid + right
    n_files = 5
    seq = rng.choice(np.frombuffer(b"ACGTNacgt", np.uint8), size=6000)
    buf = np.concatenate([seq, np.zeros(200, np.uint8)])
    n_win = buf.size - L + 1

    from krisp_tpu.ops.pallas_pack import pallas_window_keys_both
    ok_b, w_f, w_r = pallas_window_keys_both(buf, left, mid, right, 2,
                                             n_files, interpret=True)

    code_t = dna.CODE2_TABLE
    comp_t = dna.COMP2_TABLE
    valid_t = dna.base_validity_table(2, disallow="Nn")
    ok_x, words_x = window_keys_bits(buf, code_t, valid_t, comp_t,
                                     left, mid, right, 2, n_files)
    ok_x = np.asarray(ok_x)
    np.testing.assert_array_equal(np.asarray(ok_b)[:n_win], ok_x[:n_win])
    valid = ok_x[:n_win]
    for wp, wx in zip(w_f, words_x):
        np.testing.assert_array_equal(np.asarray(wp)[:n_win][valid],
                                      np.asarray(wx)[:n_win][valid])
    for wp, wx in zip(w_r, words_x):
        np.testing.assert_array_equal(
            np.asarray(wp)[:n_win][valid],
            np.asarray(wx)[n_win:2 * n_win][valid])


def test_pallas_pack_both_omit_soft():
    """omit_soft folds the softmask drop into the shared validity."""
    rng = np.random.default_rng(4)
    buf = rng.choice(np.frombuffer(b"ACGTacgtN", np.uint8), size=5000)
    buf = np.concatenate([buf, np.zeros(120, np.uint8)])
    left, mid, right = 10, 2, 10
    L = left + mid + right
    n_win = buf.size - L + 1

    from krisp_tpu.ops.pallas_pack import pallas_window_keys_both
    ok_b, w_f, w_r = pallas_window_keys_both(buf, left, mid, right, 2, 5,
                                             omit_soft=True, interpret=True)
    code_t = dna.CODE2_TABLE
    comp_t = dna.COMP2_TABLE
    valid_t = dna.base_validity_table(2, disallow="Nn", omit_soft=True)
    ok_x, words_x = window_keys_bits(buf, code_t, valid_t, comp_t,
                                     left, mid, right, 2, 5)
    ok_x = np.asarray(ok_x)
    np.testing.assert_array_equal(np.asarray(ok_b)[:n_win], ok_x[:n_win])
    valid = ok_x[:n_win]
    for wp, wx in zip(w_r, words_x):
        np.testing.assert_array_equal(
            np.asarray(wp)[:n_win][valid],
            np.asarray(wx)[n_win:2 * n_win][valid])
