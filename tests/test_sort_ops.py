"""Sort kernel tests: LSD multi-word sort vs numpy lexsort oracle."""

import numpy as np

from krisp_tpu.ops.sort import lsd_sort, unique_counts


def test_lsd_sort_matches_lexsort():
    rng = np.random.default_rng(0)
    n = 4096
    k0 = rng.integers(0, 4, n, dtype=np.uint32)   # few values -> many ties
    k1 = rng.integers(0, 8, n, dtype=np.uint32)
    k2 = rng.integers(0, 2**32, n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    ks, ps = lsd_sort([k0, k1, k2], [pay])
    order = np.lexsort((pay, k2, k1, k0))  # stable: payload==iota breaks ties
    np.testing.assert_array_equal(np.asarray(ks[0]), k0[order])
    np.testing.assert_array_equal(np.asarray(ks[1]), k1[order])
    np.testing.assert_array_equal(np.asarray(ks[2]), k2[order])
    np.testing.assert_array_equal(np.asarray(ps[0]), pay[order])


def test_lsd_sort_wide_path_permutes_payloads():
    rng = np.random.default_rng(1)
    n = 2048
    keys = [rng.integers(0, 16, n, dtype=np.uint32) for _ in range(5)]
    pays = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(3)]
    ks, ps = lsd_sort(keys, pays)
    order = np.lexsort(tuple([np.arange(n)] + keys[::-1]))
    for got, k in zip(ks, keys):
        np.testing.assert_array_equal(np.asarray(got), k[order])
    for got, p in zip(ps, pays):
        np.testing.assert_array_equal(np.asarray(got), p[order])


def test_lsd_sort_width_sweep():
    """u64 grouping across widths 1..6: even widths pair fully, odd widths
    exercise the lone u32 tail word; order must match lexsort at every W."""
    rng = np.random.default_rng(2)
    n = 1024
    for w in range(1, 7):
        keys = [rng.integers(0, 4, n, dtype=np.uint32) for _ in range(w)]
        pay = np.arange(n, dtype=np.uint32)
        ks, ps = lsd_sort(keys, [pay])
        order = np.lexsort(tuple([pay] + keys[::-1]))
        for got, k in zip(ks, keys):
            np.testing.assert_array_equal(np.asarray(got), k[order], err_msg=f"W={w}")
        np.testing.assert_array_equal(np.asarray(ps[0]), pay[order], err_msg=f"W={w}")


def test_lsd_sort_stability():
    """Equal keys keep input order (payload iota must come out ascending
    within every run of equal keys)."""
    rng = np.random.default_rng(3)
    n = 4096
    keys = [rng.integers(0, 2, n, dtype=np.uint32) for _ in range(3)]
    pay = np.arange(n, dtype=np.uint32)
    ks, ps = lsd_sort(keys, [pay])
    got = np.asarray(ps[0])
    key_rows = np.stack([np.asarray(k) for k in ks], 1)
    same_as_prev = (key_rows[1:] == key_rows[:-1]).all(1)
    assert (got[1:][same_as_prev] > got[:-1][same_as_prev]).all()


def test_group64_extreme_boundaries():
    """Word values at u32 extremes survive the u64 pack/unpack round trip
    and compare correctly across the 32-bit boundary."""
    hi = np.array([0, 0, 1, 0xFFFFFFFF, 0xFFFFFFFF], np.uint32)
    lo = np.array([0xFFFFFFFF, 0, 0, 0xFFFFFFFF, 0], np.uint32)
    ks, _ = lsd_sort([hi, lo])
    rows = list(zip(np.asarray(ks[0]).tolist(), np.asarray(ks[1]).tolist()))
    assert rows == sorted(zip(hi.tolist(), lo.tolist()))


def test_unique_counts():
    inv = np.array([0, 0, 0, 0, 0, 1, 1], np.uint32)
    w = [np.array([3, 3, 3, 7, 7, 0, 0], np.uint32)]
    inv_u, words_u, counts, nu = unique_counts(inv, w)
    assert int(nu) == 2
    assert np.asarray(words_u[0])[:2].tolist() == [3, 7]
    assert np.asarray(counts)[:2].tolist() == [3, 2]
