#!/usr/bin/env python3
"""Headline benchmark: k-mers/s through the device sort+intersect engine.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N}

vs_baseline compares against the reference CPU pipeline (grunwaldlab/krisp's
kstream extraction + GNU sort + Python merge intersection), measured live on
this machine on a scaled-down input (its per-kmer cost is size-independent;
measured rate is extrapolation-free — we compare rates, not wall times).
The measured baseline rate is cached in BASELINE_MEASURED.json.

Workload: 5 synthetic 4 Mb genomes with planted shared spacer regions,
spacer geometry 25/1/2 (the krisp_fasta README example) — the end-to-end
krisp_fasta path minus rendering: window extraction, both strands, per-genome
sort+unique, 5-way intersection.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
N_FILES = int(os.environ.get("KRISP_BENCH_FILES", 5))
GENOME_SIZE = int(os.environ.get("KRISP_BENCH_GENOME_SIZE", 4_000_000))
BASE_GENOME_SIZE = 100_000    # for the CPU reference measurement
LEFT, MID, RIGHT = 25, 1, 2
L = LEFT + MID + RIGHT


def synth_genomes(tmpdir: Path, size: int, seed: int = 7):
    """Write N_FILES synthetic genomes sharing a few planted regions."""
    tmpdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    planted = ["".join(rng.choice(list("ACGT"), size=L)) for _ in range(3)]
    paths = []
    for f in range(N_FILES):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=size)
        seq = bytearray(seq.tobytes())
        for i, p in enumerate(planted):
            pos = (i + 1) * size // (len(planted) + 1)
            seq[pos:pos + L] = p.encode()
        path = tmpdir / f"genome{f}.fasta"
        with open(path, "w") as fh:
            fh.write(f">synthetic_{f}\n")
            s = seq.decode()
            for i in range(0, len(s), 80):
                fh.write(s[i:i + 80] + "\n")
        paths.append(str(path))
    return paths


AMP_LEFT, AMP_MID, AMP_RIGHT = 30, 40, 30   # amplicon mode: L=100, 7-word keys


def run_ours(paths, left=LEFT, mid=MID, right=RIGHT, genome_size=None):
    """Time the device pipeline end-to-end; returns (n_keys, seconds)."""
    from krisp_tpu.engine.pipeline import KmerGeometry, run_pipeline

    genome_size = genome_size or GENOME_SIZE
    geom = KmerGeometry(left, mid, right)
    ingroup, outgroup = paths[:2], paths[2:]
    # warm-up: compile everything
    run_pipeline(ingroup, outgroup, geom)
    # Best of adaptive timed repetitions: the axon tunnel has multi-second
    # stalls and multi-minute degraded phases that would dominate a single
    # sample.  Always run 3 reps; keep going (up to 8 reps / 300 s) while
    # the best time is still improving >10% per rep — i.e. while early reps
    # look stall-inflated and the tunnel is recovering.
    best = None
    groups = []
    times = []
    reps, improved = 0, True
    deadline = time.monotonic() + 300
    while reps < 3 or (improved and reps < 8
                       and time.monotonic() < deadline):
        t0 = time.perf_counter()
        groups = run_pipeline(ingroup, outgroup, geom)
        dt = time.perf_counter() - t0
        improved = best is None or dt < best * 0.9
        best = dt if best is None else min(best, dt)
        times.append(dt)
        reps += 1
        print(f"  rep {reps}: {dt:.2f}s (best {best:.2f}s)",
              file=sys.stderr)
    n_keys = N_FILES * 2 * (genome_size - geom.total + 1)  # both strands
    return n_keys, best, len(groups), times


def run_reference(tmpdir: Path, left=LEFT, mid=MID, right=RIGHT):
    """Time the reference CPU pipeline on a smaller input; returns rate."""
    paths = synth_genomes(tmpdir / f"ref{left}_{mid}", BASE_GENOME_SIZE)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}/tools/refstubs:/root/reference/src"
    cmd = [sys.executable, "-m", "krisp.krisp_fasta.krisp_fasta",
           *paths[:2], "--outgroup", *paths[2:],
           "--conserved-left", str(left), "--conserved-right", str(right),
           "--diagnostic", str(mid), "--cores", "4",
           "--out_csv", str(tmpdir / "ref_out.csv")]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=3600)
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"reference pipeline failed: {proc.stderr[-2000:]}")
    L_total = left + mid + right
    n_keys = N_FILES * 2 * (BASE_GENOME_SIZE - L_total + 1)
    return n_keys / dt


def baseline_rate(tmpdir: Path, key="kmers_per_s", left=LEFT, mid=MID,
                  right=RIGHT) -> float:
    cache = REPO / "BASELINE_MEASURED.json"
    data = json.loads(cache.read_text()) if cache.exists() else {}
    if key in data:
        return data[key]
    rate = run_reference(tmpdir, left, mid, right)
    data[key] = rate
    data.setdefault("workload",
                    f"krisp_fasta, {N_FILES}x{BASE_GENOME_SIZE}bp, 4 cores")
    data["machine"] = os.uname().nodename
    try:
        cache.write_text(json.dumps(data))
    except OSError:
        pass
    return rate


def _vcf_scan_rate(records=100_000, samples=100):
    """Warm device-engine scan rate on the scaled synthetic VCF, plus the
    reference scan rate measured/cached by tools/bench_vcf_scaled.py's
    methodology (stored in BASELINE_MEASURED.json)."""
    sys.path.insert(0, str(REPO / "tools"))
    from bench_vcf_scaled import synth_scaled
    from krisp_tpu.vcf.parser import VcfOffsetIndex
    from krisp_tpu.vcf.report import report_diag_region
    from krisp_tpu.vcf.classify import parse_group_data
    from krisp_tpu.cli.krisp_vcf import parse_reference

    meta, ref_fa, vcf = synth_scaled(records, samples)
    groups = parse_group_data(meta)
    reference = parse_reference(ref_fa)
    idx = VcfOffsetIndex(vcf)
    try:
        def scan():
            t0 = time.perf_counter()
            for _ in report_diag_region(idx, None, groups, reference,
                                        False, engine="device",
                                        min_samples=3):
                pass
            return records / (time.perf_counter() - t0)

        from krisp_tpu.thermo.design import clear_screen_memos
        scan()               # warm-up: compiles + columnar slice cache
        rates = []
        for _ in range(3):
            clear_screen_memos()   # warm = code paths, not memoized answers
            rates.append(scan())
        vps = max(rates)
    finally:
        idx.cleanup()

    cache = REPO / "BASELINE_MEASURED.json"
    data = json.loads(cache.read_text()) if cache.exists() else {}
    key = f"vcf_ref_variants_per_s_r{records}_s{samples}"
    ref_vps = data.get(key, 60.5)  # measured 2026-08 on this machine
    return vps, ref_vps, rates


def _kstream_rate(tmpdir: Path, k=28, size=2_000_000, flags=None,
                  plan_kwargs=None, cache_key="kstream_ref_kmers_per_s",
                  subdir="kstream"):
    """kstream vertical: a flag shape over a 2 Mb FASTA — ours through the
    production fast path (kstream_fast.run_fast_kstream, engine=auto:
    byte-identical to the string pipeline — tests/test_kstream_vec.py /
    test_kstream_device.py), the reference CLI measured live on a smaller
    input and cached (rates compare size-independently, as with the other
    baselines).  Default shape: ``--kmers 28 --disallow Nn --sort
    --canonicals``."""
    from krisp_tpu.kstream_device import device_plan
    from krisp_tpu.kstream_fast import run_fast_kstream

    if flags is None:
        flags = ["--kmers", str(k), "--disallow", "Nn", "--sort",
                 "--canonicals"]
        plan_kwargs = dict(kmers=[k], canonicals=True, disallow="Nn",
                           sort=True)
    paths = synth_genomes(tmpdir / subdir, size)

    cache = REPO / "BASELINE_MEASURED.json"
    data = json.loads(cache.read_text()) if cache.exists() else {}
    ref_rate = data.get(cache_key)
    if ref_rate is None:
        ref_size = 500_000
        ref_paths = synth_genomes(tmpdir / f"{subdir}_ref", ref_size)
        text = Path(ref_paths[0]).read_text()
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-m", "krisp.kstream.kstream", *flags],
            input=text.encode(), stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
            env={"PYTHONPATH": "/root/reference/src",
                 "PATH": "/usr/bin:/bin"}, timeout=3600)
        dt = time.perf_counter() - t0
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-500:].decode())
        ref_rate = (ref_size - k + 1) / dt
        data[cache_key] = ref_rate
        try:
            cache.write_text(json.dumps(data))
        except OSError:
            pass

    class _Sink:
        def write(self, b):
            return len(b)

    plan = device_plan(**plan_kwargs)
    assert plan is not None
    n = run_fast_kstream(paths[0], plan, _Sink())     # warm-up
    if n is None:
        raise RuntimeError("fast kstream fell back to the string pipeline")
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_fast_kstream(paths[0], plan, _Sink())
        rates.append(n / (time.perf_counter() - t0))
    return max(rates), ref_rate, rates


def _kstream_split_rate(tmpdir: Path, k=28, size=2_000_000):
    """The reference's documented two-stage extraction shape (C12:
    kstream.py:805-832 split + sortPipe -k columns, kstream.py:66-74):
    ``--split 25 -2 --sort --sort-cols 0 2 --complements`` — the permuted
    [flank|mid] key layout on the native v2 core."""
    flags = ["--kmers", str(k), "--disallow", "Nn", "--complements",
             "--split", "25", "-2", "--sort", "--sort-cols", "0", "2"]
    plan_kwargs = dict(kmers=[k], complements=True, disallow="Nn",
                       split=[25, -2], sort=True, sortcols=[0, 2])
    return _kstream_rate(tmpdir, k, size, flags=flags,
                         plan_kwargs=plan_kwargs,
                         cache_key="kstream_split_ref_kmers_per_s",
                         subdir="kstream_split")


def _device_watchdog(timeout_s: float):
    """Fail loudly instead of hanging forever when the TPU tunnel is down.

    PJRT client creation through the axon relay blocks indefinitely during
    tunnel outages (observed >1h on this box).  A worker thread touches
    jax.devices(); if it has not come back within ``timeout_s``, print a
    diagnostic JSON line (so the bench driver records a cause, not a
    timeout) and exit."""
    import threading

    ready = threading.Event()

    def probe():
        import jax
        jax.devices()
        ready.set()

    threading.Thread(target=probe, daemon=True).start()
    if not ready.wait(timeout_s):
        err = (f"TPU backend init exceeded {timeout_s:.0f}s "
               "(axon tunnel down?)")
        out = {"metric": "kmers_per_s_sort_intersect", "value": 0,
               "unit": "kmers/s", "vs_baseline": 0.0}
        last = REPO / "BENCH_LASTGOOD.json"
        if last.exists():
            try:
                # report the most recent successful measurement, clearly
                # labeled stale, rather than a meaningless zero
                out = json.loads(last.read_text())
                err += ("; values are the most recent successful run "
                        f"({out.pop('measured_at', 'unknown time')})")
            except ValueError:
                pass
        out["stale"] = True
        out["error"] = err
        print(json.dumps(out))
        sys.stdout.flush()
        os._exit(2)


def _rate_samples(n_keys, times):
    return [round(n_keys / t) for t in times]


def _spread_pct(samples):
    """(max-min) as a percentage of the best sample: the variance bar the
    recorded protocol carries next to every best-of-N value."""
    if len(samples) < 2:
        return 0.0
    return round(100.0 * (max(samples) - min(samples)) / max(samples), 1)


def main():
    import tempfile
    from krisp_tpu.runtime import setup
    setup()
    _device_watchdog(float(os.environ.get("KRISP_BENCH_INIT_TIMEOUT", 900)))
    with tempfile.TemporaryDirectory() as td:
        tmpdir = Path(td)
        ref_rate = baseline_rate(tmpdir)
        paths = synth_genomes(tmpdir, GENOME_SIZE)
        n_keys, dt, n_groups, times = run_ours(paths)
        rate = n_keys / dt
        variance = {"kmers_per_s_sort_intersect": {
            "samples": _rate_samples(n_keys, times),
            "spread_pct": _spread_pct(times)}}

        # amplicon mode (L=100, multi-word keys — SURVEY §7.4's hard part)
        amp_ref = baseline_rate(tmpdir, key="kmers_per_s_amplicon",
                                left=AMP_LEFT, mid=AMP_MID, right=AMP_RIGHT)
        amp_keys, amp_dt, _, amp_times = run_ours(paths, AMP_LEFT, AMP_MID,
                                                  AMP_RIGHT)
        amp_rate = amp_keys / amp_dt
        variance["amplicon_mode"] = {
            "samples": _rate_samples(amp_keys, amp_times),
            "spread_pct": _spread_pct(amp_times)}

        out = {
            "metric": "kmers_per_s_sort_intersect",
            "value": round(rate),
            "unit": "kmers/s",
            "vs_baseline": round(rate / ref_rate, 2),
            "amplicon_mode_value": round(amp_rate),
            "amplicon_mode_vs_baseline": round(amp_rate / amp_ref, 2),
        }
        try:
            # chip-only rate (inputs in HBM, dispatch/pull overhead
            # cancelled): separates kernel speed from the axon tunnel's
            # transfer floor, which dominates the end-to-end number
            from krisp_tpu.engine.pipeline import (KmerGeometry,
                                                   measure_device_rate)
            dev = measure_device_rate(paths[:2], paths[2:],
                                      KmerGeometry(LEFT, MID, RIGHT))
            if dev == dev:  # not NaN
                out["device_resident_value"] = round(dev)
                out["device_resident_vs_baseline"] = round(dev / ref_rate, 2)
        except Exception as exc:  # metric is informational, never fatal
            print(f"device-resident probe skipped: {exc!r}", file=sys.stderr)
        try:
            # krisp_vcf vertical (informational): device scan rate on the
            # 100k-record x 100-sample synthetic VCF, vs the measured
            # reference scan rate (tools/bench_vcf_scaled.py methodology)
            vps, ref_vps, vcf_samples = _vcf_scan_rate()
            out["vcf_variants_per_s"] = round(vps)
            out["vcf_vs_reference"] = round(vps / ref_vps, 2)
            variance["vcf_variants_per_s"] = {
                "samples": [round(r) for r in vcf_samples],
                "spread_pct": _spread_pct(vcf_samples)}
        except Exception as exc:
            print(f"vcf probe skipped: {exc!r}", file=sys.stderr)
        try:
            # kstream vertical (informational): device fast-path rate on a
            # 2 Mb FASTA vs the reference kstream CLI measured live
            ks_rate, ks_ref, ks_samples = _kstream_rate(tmpdir)
            out["kstream_kmers_per_s"] = round(ks_rate)
            out["kstream_vs_reference"] = round(ks_rate / ks_ref, 2)
            variance["kstream_kmers_per_s"] = {
                "samples": [round(r) for r in ks_samples],
                "spread_pct": _spread_pct(ks_samples)}
        except Exception as exc:
            print(f"kstream probe skipped: {exc!r}", file=sys.stderr)
        try:
            # split/sort-cols shape (the reference's two-stage extraction
            # workflow) on the native v2 core
            sp_rate, sp_ref, sp_samples = _kstream_split_rate(tmpdir)
            out["kstream_split_kmers_per_s"] = round(sp_rate)
            out["kstream_split_vs_reference"] = round(sp_rate / sp_ref, 2)
            variance["kstream_split_kmers_per_s"] = {
                "samples": [round(r) for r in sp_samples],
                "spread_pct": _spread_pct(sp_samples)}
        except Exception as exc:
            print(f"kstream split probe skipped: {exc!r}", file=sys.stderr)
        out["variance"] = variance
        if out["vs_baseline"] < 100:
            print(f"WARNING: vs_baseline {out['vs_baseline']} below the "
                  f"100x north star (BASELINE.json)", file=sys.stderr)
        try:
            # cache for the init-stall fallback (_device_watchdog)
            (REPO / "BENCH_LASTGOOD.json").write_text(json.dumps(
                {**out, "measured_at": time.strftime("%Y-%m-%d %H:%M UTC",
                                                     time.gmtime()),
                 "note": ("best-of-N snapshot for the tunnel-outage "
                          "fallback; per-metric samples and spread_pct are "
                          "under 'variance'. Run-to-run tunnel/host "
                          "variance is large (BASELINE.md), so diffs "
                          "against this file are not regressions by "
                          "themselves")}) + "\n")
        except OSError:
            pass
        print(json.dumps(out))


if __name__ == "__main__":
    main()
