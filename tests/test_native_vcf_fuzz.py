"""Crash-hardening fuzz for the native VCF tokenizer (csrc/vcfio.cpp).

The C++ parser sees untrusted whole-genome inputs in production; every
malformed file must produce either a clean Python-level failure (None /
exception → host-path fallback) or a successful parse — never a crash.
Each mutated input is parsed in a SUBPROCESS so a segfault shows up as a
signal exit, not a dead test runner.
"""

import subprocess
import sys

import numpy as np
import pytest

VALID = b"""##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2
ctg1\t100\t.\tA\tG\t900\tPASS\tMQ=60\tGT:AD:DP:GQ\t0/0:50,0:50:99\t1/1:0,50:50:99
ctg1\t200\t.\tC\tT,CT\t900\tPASS\tMQ=60\tGT:AD:DP:GQ\t0/1:25,25,0:50:99\t2/2:0,0,50:50:99
ctg1\t300\t.\tG\tA\t900\tPASS\tMQ=60\tGT:AD:DP:GQ\t./.:.:.:.\t0/0:50,0:50:99
"""

DRIVER = r"""
import sys
sys.path.insert(0, "/root/repo")
from krisp_tpu.io.native_vcf import read_columnar, read_index
try:
    # the one-pass indexer sees the untrusted bytes first in every scan
    read_index(sys.argv[1], sys.argv[1] + ".plain")
    col = read_columnar(sys.argv[1], 4)
    print("parsed" if col is not None else "rejected")
except Exception as exc:
    print(f"exception {type(exc).__name__}")
"""


def _run(path):
    proc = subprocess.run([sys.executable, "-c", DRIVER, str(path)],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode >= 0, (
        f"native parser killed by signal {-proc.returncode} on {path}:\n"
        f"{proc.stderr[-1000:]}")
    assert proc.returncode == 0, proc.stderr[-1000:]
    return proc.stdout.strip()


def _mutate(data: bytes, rng) -> bytes:
    op = rng.integers(0, 6)
    if op == 0:    # truncate anywhere (mid-record, mid-field)
        return data[:int(rng.integers(0, len(data)))]
    if op == 1:    # random byte corruption
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        return bytes(b)
    if op == 2:    # delete a random span
        i = int(rng.integers(0, len(data)))
        j = min(len(data), i + int(rng.integers(1, 40)))
        return data[:i] + data[j:]
    if op == 3:    # duplicate a random span (field-count confusion)
        i = int(rng.integers(0, len(data)))
        j = min(len(data), i + int(rng.integers(1, 40)))
        return data[:j] + data[i:j] + data[j:]
    if op == 4:    # swap tabs for spaces in a span
        b = bytearray(data)
        i = int(rng.integers(0, len(b)))
        for k in range(i, min(len(b), i + 60)):
            if b[k] == 9:
                b[k] = 32
        return bytes(b)
    # op == 5: inject binary garbage
    i = int(rng.integers(0, len(data)))
    return data[:i] + bytes(rng.integers(0, 256, 32,
                                         dtype=np.uint8)) + data[i:]


@pytest.mark.parametrize("seed", range(24))
def test_malformed_inputs_never_crash(tmp_path, seed):
    rng = np.random.default_rng(seed)
    data = VALID
    for _ in range(int(rng.integers(1, 4))):
        data = _mutate(data, rng)
    path = tmp_path / "fuzz.vcf"
    path.write_bytes(data)
    out = _run(path)
    assert out in ("parsed", "rejected") or out.startswith("exception")


def test_pathological_shapes(tmp_path):
    cases = {
        "empty": b"",
        "header_only": b"##fileformat=VCFv4.2\n#CHROM\tPOS\n",
        "no_newline_at_eof": VALID.rstrip(b"\n"),
        "crlf": VALID.replace(b"\n", b"\r\n"),
        "huge_pos": VALID.replace(b"\t100\t", b"\t99999999999999999999\t"),
        "negative_pos": VALID.replace(b"\t100\t", b"\t-5\t"),
        "empty_lines": VALID.replace(b"\nctg1\t200", b"\n\n\nctg1\t200"),
        "many_alts": VALID.replace(b"\tG\t900", b"\t" + b",".join([b"G"] * 64)
                                   + b"\t900"),
    }
    for name, data in cases.items():
        path = tmp_path / f"{name}.vcf"
        path.write_bytes(data)
        out = _run(path)
        assert out in ("parsed", "rejected") or out.startswith("exception"), \
            (name, out)


def test_gzip_pathologies(tmp_path):
    """The indexer inflates gzip itself; damaged streams must reject, not
    crash, and VcfOffsetIndex must fall back to the Python scan cleanly."""
    import gzip

    whole = gzip.compress(VALID)
    cases = {
        "gz_ok": whole,
        "gz_truncated": whole[: len(whole) // 2],
        "gz_corrupt": whole[:20] + bytes(16) + whole[36:],
        "gz_empty_member": gzip.compress(b""),
        "not_really_gz": b"\x1f\x8b" + b"junk" * 50,
    }
    for name, data in cases.items():
        path = tmp_path / f"{name}.vcf.gz"
        path.write_bytes(data)
        out = _run(path)
        assert out in ("parsed", "rejected") or out.startswith("exception"), \
            (name, out)
