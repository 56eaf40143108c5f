"""CLI behavior when the downstream pipe closes (``krisp_vcf ... | head``).

The reference CLIs die with a BrokenPipeError traceback here; ours must
exit 0 silently (cli/_pipe.py).
"""

import subprocess
import sys

from krisp_tpu.cli._pipe import pipe_safe


def test_pipe_safe_swallows_broken_pipe():
    @pipe_safe
    def boom():
        raise BrokenPipeError()

    assert boom() == 0


def test_pipe_safe_passes_through():
    @pipe_safe
    def ok(x):
        return x

    assert ok(17) == 17


def test_kstream_into_closed_pipe(tmp_path):
    fasta = tmp_path / "in.fa"
    fasta.write_text(">a\n" + "ACGT" * 50000 + "\n")
    # head -1 closes the pipe after one line; the CLI must exit 0 with an
    # empty stderr (no traceback)
    proc = subprocess.run(
        f"{sys.executable} -m krisp_tpu.cli.kstream {fasta} --kmers 6 "
        f"| head -1",
        shell=True, capture_output=True, text=True,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0
    assert "Traceback" not in proc.stderr
    assert proc.stdout.strip() == "ACGTAC"
