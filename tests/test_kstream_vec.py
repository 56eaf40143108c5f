"""Host-vectorized kstream engine: byte parity vs the exact string
pipeline (itself pinned against the reference in test_kstream.py), plus
engine-selection routing."""

import io

import numpy as np
import pytest

from krisp_tpu.kstream import KStream
from krisp_tpu.kstream_device import device_plan
from krisp_tpu.kstream_fast import host_bytes_estimate, run_fast_kstream
from krisp_tpu.kstream_vec import run_vec_kstream, vec_eligible


def _mkfasta(tmp_path, name, seqs):
    p = tmp_path / name
    with open(p, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">r{i}\n")
            for j in range(0, len(s), 60):
                fh.write(s[j:j + 60] + "\n")
    return str(p)


def _string_pipeline(path, plan):
    ks = KStream(kmers=[plan.k], disallow="Nn", sort=True,
                 complements=plan.mode == "complements",
                 canonicals=plan.mode == "canonicals",
                 omitsoft=plan.omit_soft, mapsoft=plan.map_soft)
    return "".join(s + "\n" for s in ks(path)).encode()


def _rand_seq(rng, n, soft=False):
    s = "".join(rng.choice(list("ACGTN"), size=n))
    if soft:
        chars = list(s)
        for i in rng.choice(n, size=max(1, n // 10), replace=False):
            chars[i] = chars[i].lower()
        s = "".join(chars)
    return s


@pytest.mark.parametrize("mode", ["plain", "complements", "canonicals"])
@pytest.mark.parametrize("k", [1, 7, 15, 16, 17, 28, 32])
def test_vec_matches_string_pipeline(mode, k, tmp_path):
    rng = np.random.default_rng(k * 7 + len(mode))
    path = _mkfasta(tmp_path, "a.fa",
                    [_rand_seq(rng, 400), _rand_seq(rng, 3),
                     "ACGT" * 30, _rand_seq(rng, 150)])
    plan = device_plan(kmers=[k], disallow="Nn", sort=True,
                       complements=mode == "complements",
                       canonicals=mode == "canonicals")
    out = io.BytesIO()
    n = run_vec_kstream(path, plan, out)
    want = _string_pipeline(path, plan)
    assert out.getvalue() == want
    assert n == want.count(b"\n")


@pytest.mark.parametrize("soft", ["omitsoft", "mapsoft"])
def test_vec_softmask_modes(soft, tmp_path):
    rng = np.random.default_rng(3)
    path = _mkfasta(tmp_path, "s.fa", [_rand_seq(rng, 300, soft=True),
                                       _rand_seq(rng, 80, soft=True)])
    plan = device_plan(kmers=[11], disallow="Nn", sort=True,
                       canonicals=True, omitsoft=soft == "omitsoft",
                       mapsoft=soft == "mapsoft")
    out = io.BytesIO()
    n = run_vec_kstream(path, plan, out)
    want = _string_pipeline(path, plan)
    assert out.getvalue() == want and n == want.count(b"\n")


def test_vec_duplicate_counts(tmp_path):
    """Repeated k-mers are emitted once per occurrence (GNU-sort parity)."""
    path = _mkfasta(tmp_path, "d.fa", ["AAAA" * 40, "ACGTACGT" * 25])
    plan = device_plan(kmers=[6], disallow="Nn", sort=True,
                       complements=True)
    out = io.BytesIO()
    n = run_vec_kstream(path, plan, out)
    want = _string_pipeline(path, plan)
    assert out.getvalue() == want and n == want.count(b"\n")


def test_vec_threaded_segments_match_serial(tmp_path, monkeypatch):
    """Segment-sharded key building is bit-identical to one segment."""
    rng = np.random.default_rng(11)
    path = _mkfasta(tmp_path, "big.fa", [_rand_seq(rng, 30_000)])
    plan = device_plan(kmers=[25], disallow="Nn", sort=True,
                       canonicals=True)
    import krisp_tpu.kstream_vec as kv
    one = io.BytesIO()
    monkeypatch.setattr(kv, "_n_threads", lambda n: 1)
    run_vec_kstream(path, plan, one)
    four = io.BytesIO()
    monkeypatch.setattr(kv, "_n_threads", lambda n: 4)
    run_vec_kstream(path, plan, four)
    assert one.getvalue() == four.getvalue()
    assert one.getvalue() == _string_pipeline(path, plan)


def test_vec_falls_back_on_iupac(tmp_path):
    path = _mkfasta(tmp_path, "i.fa", ["ACGTRYACGTACGT"])
    plan = device_plan(kmers=[5], disallow="Nn", sort=True)
    assert run_vec_kstream(path, plan, io.BytesIO()) is None


def test_vec_eligibility_k_cutoff():
    assert vec_eligible(device_plan(kmers=[32], disallow="Nn", sort=True))
    from krisp_tpu import kstream_vec as kv
    # 33..64 needs the native two-word core; past 64 never host-eligible
    assert (vec_eligible(device_plan(kmers=[33], disallow="Nn", sort=True))
            == (kv._load_core() is not None))
    assert not vec_eligible(device_plan(kmers=[65], disallow="Nn",
                                        sort=True))


def test_fast_auto_routes_to_host(tmp_path, monkeypatch):
    """auto picks the host engine for small eligible jobs (and never
    touches the device runtime: setup would raise here)."""
    path = _mkfasta(tmp_path, "a.fa", ["ACGTACGTACGTACGT"])
    plan = device_plan(kmers=[8], disallow="Nn", sort=True)
    import krisp_tpu.kstream_fast as kf
    monkeypatch.setattr(kf, "run_device_kstream",
                        lambda *a: pytest.fail("device engine selected"))
    out = io.BytesIO()
    n = run_fast_kstream(path, plan, out, engine="auto")
    assert n == out.getvalue().count(b"\n") > 0


def test_fast_auto_over_budget_routes_to_device(tmp_path, monkeypatch):
    path = _mkfasta(tmp_path, "a.fa", ["ACGTACGTACGTACGT"])
    plan = device_plan(kmers=[8], disallow="Nn", sort=True)
    import krisp_tpu.kstream_fast as kf
    hit = {}
    monkeypatch.setattr(kf, "run_device_kstream",
                        lambda p, pl, o: hit.setdefault("dev", 17))
    monkeypatch.setenv("KRISP_TPU_HOST_BUDGET", "1")
    assert run_fast_kstream(path, plan, io.BytesIO(),
                            engine="auto") == 17
    assert hit["dev"] == 17


def test_fast_engine_env_override(tmp_path, monkeypatch):
    path = _mkfasta(tmp_path, "a.fa", ["ACGTACGTACGTACGT"])
    plan = device_plan(kmers=[8], disallow="Nn", sort=True)
    import krisp_tpu.kstream_fast as kf
    monkeypatch.setattr(kf, "run_device_kstream",
                        lambda p, pl, o: 23)
    monkeypatch.setenv("KRISP_TPU_KSTREAM_ENGINE", "device")
    assert run_fast_kstream(path, plan, io.BytesIO()) == 23


def test_fast_host_ineligible_returns_none(tmp_path):
    """engine=host with a >64-mer plan: caller must use the string path."""
    path = _mkfasta(tmp_path, "a.fa", ["ACGT" * 30])
    plan = device_plan(kmers=[70], disallow="Nn", sort=True)
    assert run_fast_kstream(path, plan, io.BytesIO(), engine="host") is None


def test_host_bytes_estimate_scales_with_strands():
    plan_c = device_plan(kmers=[8], disallow="Nn", sort=True,
                         complements=True)
    plan_p = device_plan(kmers=[8], disallow="Nn", sort=True)
    assert (host_bytes_estimate(1 << 20, plan_c)
            > host_bytes_estimate(1 << 20, plan_p))


def test_native_core_matches_numpy_fuzz(monkeypatch):
    """The C++ engine core (csrc/kstreamcore.cpp) and the numpy pipeline
    must emit identical bytes on random plans/inputs — same tables, so any
    drift is a bug in one of them.  (The goldens above run whichever
    engine is default; this pins the two against each other directly.)"""
    from krisp_tpu import kstream_vec as kv

    if kv._load_core() is None:
        pytest.skip("native core unavailable (no toolchain)")
    rng = np.random.default_rng(11)
    for trial in range(24):
        k = int(rng.integers(1, 33))
        comp, canon = [(False, False), (True, False),
                       (False, True)][trial % 3]
        # softmask policy: none / omit / map — lowercase input appears for
        # both omit and map so the native core's mapsoft handling is pinned
        omit, mapsoft = [(False, False), (True, False),
                         (False, True)][int(rng.integers(0, 3))]
        plan = device_plan(kmers=[k], complements=comp, canonicals=canon,
                           disallow="Nn", omitsoft=omit, mapsoft=mapsoft,
                           sort=True)
        n = int(rng.integers(k, 4000))
        alpha = b"ACGTN" + (b"acgt" if omit or mapsoft else b"")
        buf = rng.choice(np.frombuffer(alpha, np.uint8), size=n)
        if n > 10:
            buf[rng.integers(0, n, 3)] = 0  # record sentinels
        a, b = io.BytesIO(), io.BytesIO()
        monkeypatch.setenv("KRISP_TPU_KSTREAM_HOST", "numpy")
        rn = kv.run_vec_kstream(None, plan, a, buf=buf.copy())
        monkeypatch.setenv("KRISP_TPU_KSTREAM_HOST", "native")
        rm = kv.run_vec_kstream(None, plan, b, buf=buf.copy())
        assert rn == rm, (k, plan.mode, omit, mapsoft)
        assert a.getvalue() == b.getvalue(), (k, plan.mode, omit, mapsoft)


@pytest.mark.parametrize("mode", ["plain", "complements", "canonicals"])
@pytest.mark.parametrize("k", [33, 40, 64])
def test_two_word_native_matches_string_pipeline(mode, k, tmp_path):
    """32 < k <= 64 rides the native two-word core (kstream_core_run_w2);
    there is no numpy mirror for this range, so the oracle is the exact
    string pipeline."""
    from krisp_tpu import kstream_vec as kv

    if kv._load_core() is None:
        pytest.skip("native core unavailable (no toolchain)")
    rng = np.random.default_rng(k * 13 + len(mode))
    path = _mkfasta(tmp_path, "w2.fa",
                    [_rand_seq(rng, 500), _rand_seq(rng, k - 1),
                     _rand_seq(rng, k), "ACGT" * 40])
    plan = device_plan(kmers=[k], disallow="Nn", sort=True,
                       complements=mode == "complements",
                       canonicals=mode == "canonicals")
    assert vec_eligible(plan)
    out = io.BytesIO()
    n = run_vec_kstream(path, plan, out)
    want = _string_pipeline(path, plan)
    assert out.getvalue() == want
    assert n == want.count(b"\n")


@pytest.mark.parametrize("mode", ["plain", "complements", "canonicals"])
def test_multi_k_native_matches_string_pipeline(mode, tmp_path):
    """Multi-k sorted jobs merge per-k native tables lexicographically;
    oracle is the exact string pipeline (prefix ties: shorter k first)."""
    from krisp_tpu import kstream_vec as kv

    if kv._load_core() is None:
        pytest.skip("native core unavailable (no toolchain)")
    rng = np.random.default_rng(len(mode) * 31)
    path = _mkfasta(tmp_path, "mk.fa",
                    [_rand_seq(rng, 600), "A" * 80, _rand_seq(rng, 90)])
    ks = [5, 6, 40]           # spans both key widths + heavy prefix ties
    out = io.BytesIO()
    n = kv.run_multi_k_kstream(path, ks, mode, False, False, out)
    s = KStream(kmers=ks, disallow="Nn", sort=True,
                complements=mode == "complements",
                canonicals=mode == "canonicals")
    want = "".join(x + "\n" for x in s(path)).encode()
    assert out.getvalue() == want
    assert n == want.count(b"\n")


def test_multi_k_respects_sort_mem(tmp_path):
    """--sort-mem caps the multi-k native path's budget the same way it
    caps the single-k fast path: a job whose estimate exceeds the cap
    declines (returns None) so the CLI falls back to the bounded string
    pipeline."""
    from krisp_tpu import kstream_vec as kv

    if kv._load_core() is None:
        pytest.skip("native core unavailable (no toolchain)")
    rng = np.random.default_rng(7)
    path = _mkfasta(tmp_path, "mem.fa", [_rand_seq(rng, 5000)])
    # estimate = 5k bases * 32 B * 2 ks + 64 MiB >> 1M
    assert kv.run_multi_k_kstream(path, [5, 6], "plain", False, False,
                                  io.BytesIO(), mem="1M") is None
    # and with an ample cap it runs
    n = kv.run_multi_k_kstream(path, [5, 6], "plain", False, False,
                               io.BytesIO(), mem="2G")
    assert n is not None and n > 0


def test_multi_k_cli_respects_engine(tmp_path, capsys, monkeypatch):
    """--engine device must bypass the host-native multi-k path (output
    stays correct via the fallback pipelines)."""
    from krisp_tpu import kstream_vec as kv
    from krisp_tpu.cli.kstream import main

    rng = np.random.default_rng(9)
    path = _mkfasta(tmp_path, "eng.fa", [_rand_seq(rng, 300)])
    calls = []
    real = kv.run_multi_k_kstream

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(kv, "run_multi_k_kstream", spy)
    monkeypatch.delenv("KRISP_TPU_KSTREAM_ENGINE", raising=False)
    args = [str(path), "-k", "5", "6", "--disallow", "Nn", "--sort"]
    main(args + ["--engine", "device"])
    dev_out = capsys.readouterr().out
    assert not calls                      # host-native path skipped
    main(args)                            # auto: host-native path allowed
    auto_out = capsys.readouterr().out
    assert calls                          # (it may still decline inside)
    assert dev_out == auto_out            # bytes identical either way


def test_sort_np_threads_byte_identical(tmp_path):
    """--sort-np changes the native team size, never the bytes."""
    from krisp_tpu import kstream_vec as kv

    if kv._load_core() is None:
        pytest.skip("native core unavailable (no toolchain)")
    rng = np.random.default_rng(13)
    path = _mkfasta(tmp_path, "np.fa", [_rand_seq(rng, 3000)])
    plan = device_plan(kmers=[11], disallow="Nn", sort=True,
                       complements=True)
    outs = []
    for threads in (None, 1, 3):
        out = io.BytesIO()
        assert kv.run_vec_kstream(path, plan, out, threads=threads)
        outs.append(out.getvalue())
    assert outs[0] == outs[1] == outs[2]
    # the thread request is honored (floored by available work)
    assert kv._core_threads(1 << 20, 3) == 3
    assert kv._core_threads(8192, 64) == 2   # capped by items//4096
    # an explicit --sort-np 1 forces a serial core (distinct from the
    # None default, which picks the heuristic team)
    assert kv._core_threads(1 << 20, 1) == 1
    assert kv._core_threads(1 << 20, None) > 1


# ---------------------------------------------------------------------------
# v2 shapes: --split / --sort-cols / unsorted / --allow / --expand-iupac
# routed onto the native core (csrc/kstreamcore.cpp kstream_core_run_v2).
# Oracle is always the exact string pipeline with the same flags.


def _oracle_bytes(path, **kw):
    ks = KStream(**kw)
    return "".join(s + "\n" for s in ks(path)).encode()


def _need_core():
    from krisp_tpu import kstream_vec as kv
    if kv._load_core() is None:
        pytest.skip("native core unavailable (no toolchain)")
    return kv


def test_v2_extraction_shape_matches_string_pipeline(tmp_path):
    """The krisp_fasta C12 two-stage shape (reference kstream.py:805-832 +
    sortPipe -k cols at :66-74): split [left,-right], sort by flank
    columns, complements, omit-softmask."""
    kv = _need_core()
    rng = np.random.default_rng(41)
    path = _mkfasta(tmp_path, "c12.fa",
                    [_rand_seq(rng, 800, soft=True), _rand_seq(rng, 120)])
    plan = device_plan(kmers=[28], disallow="Nn", sort=True,
                       complements=True, omitsoft=True,
                       split=[25, -2], sortcols=[0, 2])
    assert plan is not None and plan.v2 and vec_eligible(plan)
    out = io.BytesIO()
    n = kv.run_vec_kstream(path, plan, out)
    want = _oracle_bytes(path, kmers=[28], disallow="Nn", sort=True,
                         complements=True, omitsoft=True,
                         split=[25, -2], sortcols=[0, 2])
    assert out.getvalue() == want
    assert n == want.count(b"\n")


@pytest.mark.parametrize("mode", ["plain", "complements", "canonicals"])
def test_v2_unsorted_window_order(mode, tmp_path):
    """Unsorted jobs skip the sort phase and must reproduce the string
    pipeline's window order exactly (complements interleave fwd/rc)."""
    kv = _need_core()
    rng = np.random.default_rng(len(mode) * 5)
    path = _mkfasta(tmp_path, "u.fa",
                    [_rand_seq(rng, 300), _rand_seq(rng, 40)])
    plan = device_plan(kmers=[9], disallow="Nn", sort=False,
                       complements=mode == "complements",
                       canonicals=mode == "canonicals")
    assert plan is not None and plan.v2
    out = io.BytesIO()
    n = kv.run_vec_kstream(path, plan, out)
    want = _oracle_bytes(path, kmers=[9], disallow="Nn", sort=False,
                         complements=mode == "complements",
                         canonicals=mode == "canonicals")
    assert out.getvalue() == want
    assert n == want.count(b"\n")


def test_v2_multi_negative_split_column_order(tmp_path):
    """Reference split semantics: negative parts appear in ENCOUNTER
    order after the middle, not positional order (kstream.py:805-832)."""
    kv = _need_core()
    rng = np.random.default_rng(17)
    path = _mkfasta(tmp_path, "neg.fa", [_rand_seq(rng, 200)])
    for spec in ([-2, -3], [3, -2, 4], [-30], [5, 0, -1], [40]):
        plan = device_plan(kmers=[12], disallow="Nn", sort=True,
                           split=spec)
        assert plan is not None
        out = io.BytesIO()
        n = kv.run_vec_kstream(path, plan, out)
        want = _oracle_bytes(path, kmers=[12], disallow="Nn", sort=True,
                             split=spec)
        assert out.getvalue() == want, spec
        assert n == want.count(b"\n")


def test_v2_allow_filter(tmp_path):
    kv = _need_core()
    rng = np.random.default_rng(23)
    path = _mkfasta(tmp_path, "al.fa",
                    [_rand_seq(rng, 400, soft=True), _rand_seq(rng, 60)])
    # plain/canonicals take any subset; complements need a closed set
    for kw in (dict(allow="ACGT"), dict(allow="AC"),
               dict(allow="ACG", canonicals=True),
               dict(allow="AT", complements=True),
               dict(allow="ACGT", complements=True),
               dict(allow="ACGT", mapsoft=True),
               dict(allow="AC", omitsoft=True)):
        plan = device_plan(kmers=[8], sort=True, **kw)
        assert plan is not None, kw
        out = io.BytesIO()
        n = kv.run_vec_kstream(path, plan, out)
        want = _oracle_bytes(path, kmers=[8], sort=True, **kw)
        assert out.getvalue() == want, kw
        assert n == want.count(b"\n")
    # non-closed set in complements mode: fwd/rc filter independently in
    # the reference — per-window validity cannot model it, so fall back
    assert device_plan(kmers=[8], sort=True, allow="AC",
                       complements=True) is None
    # N in the allow set would make N-windows emittable: fall back
    assert device_plan(kmers=[8], sort=True, allow="ACGTN") is None


def test_v2_expand_iupac_is_identity_on_acgt(tmp_path):
    """--expand-iupac is an identity on the ACGT-only content the probe
    admits (N windows are dropped by the gates), so the fast path keeps
    covering it."""
    kv = _need_core()
    rng = np.random.default_rng(29)
    path = _mkfasta(tmp_path, "iu.fa", [_rand_seq(rng, 300)])
    plan = device_plan(kmers=[10], disallow="Nn", sort=True,
                       expandiupac=True, complements=True)
    assert plan is not None
    out = io.BytesIO()
    n = kv.run_vec_kstream(path, plan, out)
    want = _oracle_bytes(path, kmers=[10], disallow="Nn", sort=True,
                         expandiupac=True, complements=True)
    assert out.getvalue() == want
    assert n == want.count(b"\n")
    # ...but real IUPAC content still falls back via the probe
    p2 = _mkfasta(tmp_path, "iu2.fa", ["ACGTRYACGTACGTAAACGT"])
    assert kv.run_vec_kstream(p2, plan, io.BytesIO()) is None


def test_v2_fuzz_against_string_pipeline(tmp_path):
    """Random k/split/sortcols/sort/mode/softmask/allow plans: native v2
    bytes must equal the string pipeline on every eligible draw."""
    kv = _need_core()
    rng = np.random.default_rng(101)
    covered = 0
    for trial in range(40):
        k = int(rng.integers(2, 41))
        mode = ["plain", "complements", "canonicals"][trial % 3]
        omit, mapsoft = [(False, False), (True, False),
                         (False, True)][int(rng.integers(0, 3))]
        do_sort = bool(rng.integers(0, 2))
        n_split = int(rng.integers(0, 4))
        split = [int(rng.integers(-k - 2, k + 3))
                 for _ in range(n_split)] or None
        n_cols = len(split) + 1 if split else 1
        sortcols = None
        if do_sort and split and rng.integers(0, 2):
            sortcols = list(rng.integers(0, n_cols + 1,
                                         size=int(rng.integers(1, 4))))
        allow = None
        if rng.integers(0, 3) == 0:
            allow = ["ACGT", "AT", "GC"][int(rng.integers(0, 3))]
        kw = dict(kmers=[k], complements=mode == "complements",
                  canonicals=mode == "canonicals", omitsoft=omit,
                  mapsoft=mapsoft, sort=do_sort, split=split,
                  sortcols=sortcols, allow=allow,
                  disallow=None if allow else "Nn")
        plan = device_plan(**kw)
        if plan is None or not vec_eligible(plan):
            continue
        n = int(rng.integers(k, 1200))
        seqs = [_rand_seq(rng, n, soft=bool(rng.integers(0, 2))),
                _rand_seq(rng, int(rng.integers(1, 80)))]
        path = _mkfasta(tmp_path, f"fz{trial}.fa", seqs)
        out = io.BytesIO()
        got = kv.run_vec_kstream(path, plan, out)
        if got is None:
            # content probe fallback (lowercase without policy/allow)
            continue
        want = _oracle_bytes(path, **kw)
        assert out.getvalue() == want, kw
        assert got == want.count(b"\n"), kw
        covered += 1
    assert covered >= 15


def test_v2_cli_end_to_end(tmp_path, capsys):
    """CLI-level byte parity for the v2 shapes: the production entry
    point (cli.kstream.main) must route split/sort-cols, unsorted, and
    allow jobs through the fast path and print the string pipeline's
    exact bytes."""
    from krisp_tpu.cli.kstream import main

    rng = np.random.default_rng(77)
    path = _mkfasta(tmp_path, "cli.fa",
                    [_rand_seq(rng, 500, soft=True), _rand_seq(rng, 80)])
    cases = [
        (["-k", "28", "--disallow", "Nn", "--complements",
          "--omit-softmask", "--split", "25", "-2", "--sort",
          "--sort-cols", "0", "2"],
         dict(kmers=[28], disallow="Nn", complements=True, omitsoft=True,
              split=[25, -2], sort=True, sortcols=[0, 2])),
        (["-k", "9", "--disallow", "Nn"],
         dict(kmers=[9], disallow="Nn")),
        (["-k", "8", "--allow", "ACGT", "--sort", "--canonicals"],
         dict(kmers=[8], allow="ACGT", sort=True, canonicals=True)),
    ]
    for argv, kw in cases:
        main([str(path)] + argv)
        got = capsys.readouterr().out
        want = "".join(s + "\n" for s in KStream(**kw)(str(path)))
        assert got == want, argv
