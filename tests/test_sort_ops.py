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


def test_survivor_weights_survive_prefix_sum_wrap():
    """Weighted survivor counting must stay exact when the running weight
    sum over the whole table exceeds 2^31 (the checkpoint path's weights
    are duplicate counts, so the prefix sum scales with the pre-dedup
    window total, not the on-device row count)."""
    import jax.numpy as jnp
    from krisp_tpu.ops.encode import KeyLayout
    from krisp_tpu.ops.intersect import survivor_mark_bits

    layout = KeyLayout(left=2, mid=1, right=2, bits=2, n_files=2)
    assert layout.n_words == 1 and layout.file_word_shift() == (0, 22)

    def key(flank, file, mid):
        return (flank << 24) | (file << 22) | (mid << 20)

    big = 1 << 30
    rows = [  # sorted ascending; both flank groups span both files
        (key(1, 0, 0), big),
        (key(1, 0, 0), big),      # duplicate full key: run sum = 2^31
        (key(1, 1, 0), big),      # cumsum wraps int32 from here on
        (key(1, 1, 1), 5),
        (key(2, 0, 0), 7),
        (key(2, 1, 0), big),
        (0xFFFFFFFF, 0),          # sentinels (file field all-ones)
        (0xFFFFFFFF, 0),
    ]
    keys = jnp.asarray(np.array([r[0] for r in rows], np.uint32))
    weights = jnp.asarray(np.array([r[1] for r in rows], np.uint32))

    keep, counts, group_id = survivor_mark_bits([keys], layout, 2,
                                                weights=weights)
    keep = np.asarray(keep)
    counts = np.asarray(counts, np.uint64)

    assert keep.tolist() == [True, False, True, True, True, True,
                             False, False]
    expected = [2 * big, 0, big, 5, 7, big, 0, 0]  # int64 oracle
    assert counts.tolist() == expected
