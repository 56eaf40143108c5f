"""Long-running differential fuzz campaign against the live reference.

Runs the same byte-parity points the CI fuzz tests pin (krisp_vcf defaults,
krisp_vcf flag surface, dense overlapping indels, krisp_fasta geometries,
kstream device path) over fresh seed ranges for a wall-clock budget, so far
more of the input space gets covered than the handful of seeds CI re-runs.

Failing points preserve their inputs under --keep-dir and are listed in the
summary; rerun any failure with the printed family/seed pair.

Usage:
    python tools/fuzz_campaign.py --minutes 120 [--start-seed 10000]
"""

import argparse
import json
import shutil
import sys
import tempfile
import time
import traceback
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import test_fasta_fuzz as tf  # noqa: E402
import test_kstream as tk  # noqa: E402
import test_vcf_fuzz as tv  # noqa: E402

REF_PATH = f"{REPO}/tools/refstubs:/root/reference/src:{REPO}"


def vcf_default(seed, tmp):
    meta, ref, vcf = tv.synth_fuzz_inputs(Path(tmp), seed)
    open(vcf + ".tbi", "w").close()
    r = tv.run_cli("krisp.krisp_vcf.krisp_vcf", REF_PATH,
                   meta, ref, vcf, tmp, "ref")
    o = tv.run_cli("krisp_tpu.cli.krisp_vcf", str(REPO),
                   meta, ref, vcf, tmp, "ours")
    assert o[0] == r[0], "csv mismatch"
    assert o[1] == r[1], "align mismatch"


def vcf_flags(seed, tmp):
    rng = np.random.default_rng(seed)
    meta, ref, vcf = tv.synth_fuzz_inputs(Path(tmp), seed)
    open(vcf + ".tbi", "w").close()
    flags = tv._random_flags(rng)
    r = tv._run_cli_flags("krisp.krisp_vcf.krisp_vcf", REF_PATH,
                          meta, ref, vcf, tmp, "ref", flags)
    o = tv._run_cli_flags("krisp_tpu.cli.krisp_vcf", str(REPO),
                          meta, ref, vcf, tmp, "ours", flags)
    assert o == r, f"mismatch under flags {flags}"


def vcf_dense(seed, tmp):
    meta, ref, vcf = tv.synth_dense_inputs(Path(tmp), seed)
    open(vcf + ".tbi", "w").close()
    r = tv.run_cli("krisp.krisp_vcf.krisp_vcf", REF_PATH,
                   meta, ref, vcf, tmp, "ref")
    o = tv.run_cli("krisp_tpu.cli.krisp_vcf", str(REPO),
                   meta, ref, vcf, tmp, "ours")
    assert o[0] == r[0], "csv mismatch"
    assert o[1] == r[1], "align mismatch"


def _random_fasta_flags(rng):
    """Random geometry within the surface the fixed FLAG_SETS sample."""
    flags = []
    if rng.random() < 0.5:
        flags += ["--conserved", str(rng.integers(18, 36))]
    else:
        flags += ["--conserved-left", str(rng.integers(15, 41)),
                  "--conserved-right", str(rng.integers(4, 26))]
    if rng.random() < 0.35:
        # amplicon mode: total length above the flank sum
        flags += ["--amplicon", str(rng.integers(80, 130))]
    else:
        flags += ["--diagnostic", str(rng.integers(0, 41))]
    if rng.random() < 0.3:
        flags += ["--omit-soft"]
    if rng.random() < 0.3:
        flags += ["--dot-alignment"]
    return flags


def fasta(seed, tmp):
    rng = np.random.default_rng(seed)
    paths = tf.synth_genomes(Path(tmp), rng)
    flags = _random_fasta_flags(rng)
    r = tf.run_cli("krisp.krisp_fasta.krisp_fasta", REF_PATH,
                   paths, flags, tmp, "ref")
    o = tf.run_cli("krisp_tpu.cli.krisp_fasta", str(REPO),
                   paths, flags, tmp, "ours")
    assert o[0] == r[0], f"csv mismatch under flags {flags}"
    assert o[1] == r[1], f"align mismatch under flags {flags}"


def kstream(seed, tmp):
    tk.fuzz_kstream_point(seed, Path(tmp))


FAMILIES = [("vcf_default", vcf_default), ("vcf_flags", vcf_flags),
            ("vcf_dense", vcf_dense), ("fasta", fasta),
            ("kstream", kstream)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--start-seed", type=int, default=10000)
    ap.add_argument("--keep-dir", default="/tmp/fuzz_failures")
    ap.add_argument("--families", nargs="*",
                    default=[name for name, _ in FAMILIES])
    args = ap.parse_args()

    deadline = time.time() + args.minutes * 60
    fams = [(n, f) for n, f in FAMILIES if n in args.families]
    counts = {n: 0 for n, _ in fams}
    failures = []
    seed = args.start_seed
    while time.time() < deadline:
        for name, fn in fams:
            if time.time() >= deadline:
                break
            tmp = tempfile.mkdtemp(prefix=f"fuzz_{name}_{seed}_")
            t0 = time.time()
            try:
                fn(seed, tmp)
                counts[name] += 1
                print(f"PASS {name} seed={seed} ({time.time() - t0:.1f}s)",
                      flush=True)
                shutil.rmtree(tmp, ignore_errors=True)
            except Exception:
                keep = Path(args.keep_dir) / f"{name}_{seed}"
                keep.parent.mkdir(parents=True, exist_ok=True)
                shutil.move(tmp, keep)
                failures.append((name, seed))
                print(f"FAIL {name} seed={seed} -> {keep}", flush=True)
                traceback.print_exc()
        seed += 1
    print(json.dumps({"passes": counts,
                      "failures": [list(f) for f in failures]}), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
