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
