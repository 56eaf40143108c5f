"""krisp_vcf --resume: a scan killed mid-chunk continues from the last
completed chunk and produces byte-identical outputs to an uninterrupted
run (including truncating the half-written chunk's rows)."""

import pytest

import krisp_tpu.vcf.report as report_mod
from krisp_tpu.cli.krisp_vcf import parse_args, run_all

from test_vcf_multicontig import synth_inputs


def _args(meta, ref, vcf, csv, align, extra=()):
    return parse_args([meta, ref, "--vcf", vcf,
                       "--groups", "EU1", "NA1", "NA2",
                       "--out_csv", csv, "--out_align", align, *extra])


class _Boom(RuntimeError):
    pass


@pytest.mark.parametrize("engine", ["host", "device"])
def test_resume_after_midchunk_crash(tmp_path, monkeypatch, engine):
    meta, ref, vcf = synth_inputs(tmp_path)
    eng = ["--engine", engine]

    # uninterrupted run -> golden bytes
    full_csv = str(tmp_path / "full.csv")
    full_align = str(tmp_path / "full.align")
    run_all(_args(meta, ref, vcf, full_csv, full_align, eng))
    want_csv = open(full_csv).read()
    want_align = open(full_align).read()
    assert want_csv  # sanity: the synthetic input produces results

    # crashing run: die after yielding part of the 3rd chunk
    out_csv = str(tmp_path / "res.csv")
    out_align = str(tmp_path / "res.align")
    real_scan = report_mod.report_diag_region
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # the synthetic input spans exactly 2 chunks
            it = real_scan(*a, **kw)
            for i, item in enumerate(it):
                if i == 2:
                    raise _Boom("simulated crash mid-chunk")
                yield item
        else:
            yield from real_scan(*a, **kw)

    monkeypatch.setattr(report_mod, "report_diag_region", flaky)
    with pytest.raises(_Boom):
        run_all(_args(meta, ref, vcf, out_csv, out_align,
                      ["--resume", *eng]))
    assert calls["n"] == 2  # the crash happened in the second chunk
    monkeypatch.setattr(report_mod, "report_diag_region", real_scan)

    progress = tmp_path / "res.csv.progress"
    assert progress.exists()

    # resume -> must converge to the uninterrupted bytes and clean up
    run_all(_args(meta, ref, vcf, out_csv, out_align,
                  ["--resume", *eng]))
    assert open(out_csv).read() == want_csv
    assert open(out_align).read() == want_align
    assert not progress.exists()


def test_resume_refuses_changed_args(tmp_path, monkeypatch):
    meta, ref, vcf = synth_inputs(tmp_path)
    out_csv = str(tmp_path / "r.csv")
    out_align = str(tmp_path / "r.align")

    real_scan = report_mod.report_diag_region
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise _Boom()
        yield from real_scan(*a, **kw)

    monkeypatch.setattr(report_mod, "report_diag_region", flaky)
    with pytest.raises(_Boom):
        run_all(_args(meta, ref, vcf, out_csv, out_align, ["--resume"]))
    monkeypatch.setattr(report_mod, "report_diag_region", real_scan)

    with pytest.raises(SystemExit, match="different"):
        run_all(_args(meta, ref, vcf, out_csv, out_align,
                      ["--resume", "--min_bases", "2"]))


def test_resume_requires_out_csv(tmp_path):
    meta, ref, vcf = synth_inputs(tmp_path)
    args = parse_args([meta, ref, "--vcf", vcf,
                       "--groups", "EU1", "NA1", "NA2", "--resume"])
    with pytest.raises(SystemExit, match="out_csv"):
        run_all(args)
