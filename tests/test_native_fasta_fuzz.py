"""Crash-hardening fuzz for the native FASTA reader (csrc/fastaio.cpp),
mirroring tests/test_native_vcf_fuzz.py: malformed inputs must parse or
fail cleanly in a subprocess — never crash — and successful parses must
equal the Python reader byte-for-byte."""

import subprocess
import sys

import numpy as np
import pytest

VALID = b">rec1 desc\nACGTACGTNNACGT\nacgtacgt\n>rec2\nGGGTTTACA\n"

DRIVER = r"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from krisp_tpu.io.native import read_fasta_buffer_native
from krisp_tpu.io.fasta import read_fasta_buffer
try:
    native = read_fasta_buffer_native(sys.argv[1])
except Exception as exc:
    print(f"exception {type(exc).__name__}")
    sys.exit(0)
if native is None:
    print("rejected")
    sys.exit(0)
try:
    python = read_fasta_buffer(sys.argv[1])[0]
except Exception:
    print("parsed")   # python reader rejects; native parsed -> fine
    sys.exit(0)
print("parsed-equal" if np.array_equal(native, python) else "MISMATCH")
"""


def _run(path):
    proc = subprocess.run([sys.executable, "-c", DRIVER, str(path)],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode >= 0, (
        f"native reader killed by signal {-proc.returncode} on {path}:\n"
        f"{proc.stderr[-1000:]}")
    assert proc.returncode == 0, proc.stderr[-1000:]
    return proc.stdout.strip()


@pytest.mark.parametrize("seed", range(16))
def test_malformed_fasta_never_crashes(tmp_path, seed):
    rng = np.random.default_rng(seed)
    data = bytearray(VALID * int(rng.integers(1, 4)))
    for _ in range(int(rng.integers(1, 4))):
        op = rng.integers(0, 4)
        if op == 0:
            data = data[:int(rng.integers(0, len(data)))]
        elif op == 1 and data:
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
        elif op == 2:
            i = int(rng.integers(0, len(data) + 1))
            data = data[:i] + bytearray(rng.integers(
                0, 256, 16, dtype=np.uint8)) + data[i:]
        else:
            data = bytearray(data.replace(b"\n>", b">"))
    path = tmp_path / "fuzz.fa"
    path.write_bytes(bytes(data))
    out = _run(path)
    # MISMATCH is tolerated on malformed inputs: the two readers may
    # normalize garbage differently (well-formed equality is pinned by
    # tests/test_native_io.py and test_valid_fasta_native_equals_python;
    # the device engine's content probe rejects non-ACGTN buffers anyway).
    # What this test forbids is a crash.
    assert out in ("parsed", "parsed-equal", "rejected", "MISMATCH") \
        or out.startswith("exception"), out


def test_valid_fasta_native_equals_python(tmp_path):
    path = tmp_path / "ok.fa"
    path.write_bytes(VALID)
    assert _run(path) == "parsed-equal"
