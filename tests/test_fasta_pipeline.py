"""End-to-end parity tests for the krisp_fasta engine on the bundled
reference test data (expected outputs documented in the reference README:
/root/reference/README.md:118-124, 157-166, 244-256)."""

import glob

import pytest

from krisp_tpu.engine.pipeline import solve_geometry

DATA = "/root/reference/test_data/krisp_fasta"
INGROUP = sorted(glob.glob(f"{DATA}/ingroup*.fasta.gz"))
OUTGROUP = sorted(glob.glob(f"{DATA}/outgroup*.fasta.gz"))


def test_geometry_solver():
    g = solve_geometry(amplicon=100, diagnostic=40)
    assert (g.left, g.mid, g.right) == (30, 40, 30)
    g = solve_geometry(amplicon=100, conserved=30)
    assert (g.left, g.mid, g.right) == (30, 40, 30)
    g = solve_geometry(diagnostic=1, conserved_left=25, conserved_right=2)
    assert (g.left, g.mid, g.right) == (25, 1, 2)
    with pytest.raises(ValueError):
        solve_geometry(diagnostic=1)


def test_measure_device_rate_smoke():
    """The chip-rate probe runs the same fused program as run_pipeline and
    returns a positive, finite rate (CPU backend here; the bench wires it
    to the real TPU)."""
    import glob as _glob
    from krisp_tpu.engine.pipeline import KmerGeometry, measure_device_rate

    data = "/root/reference/test_data/krisp_fasta"
    ingroup = sorted(_glob.glob(f"{data}/ingroup*.fasta.gz"))
    outgroup = sorted(_glob.glob(f"{data}/outgroup*.fasta.gz"))
    rate = measure_device_rate(ingroup, outgroup, KmerGeometry(25, 1, 2),
                               reps=1)
    assert rate > 0 and rate == rate
