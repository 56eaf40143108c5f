"""Checkpoint/resume: cached tables must reproduce the fused-path result."""

import glob

from krisp_tpu.engine.pipeline import KmerGeometry, run_pipeline
from krisp_tpu.engine import render
from krisp_tpu.engine.checkpoint import TableCache

DATA = "/root/reference/test_data/krisp_fasta"
INGROUP = sorted(glob.glob(f"{DATA}/ingroup*.fasta.gz"))
OUTGROUP = sorted(glob.glob(f"{DATA}/outgroup*.fasta.gz"))


def test_workdir_checkpoint_roundtrip(tmp_path):
    geom = KmerGeometry(25, 1, 2)
    fused = [render.render_csv(g)
             for g in run_pipeline(INGROUP, OUTGROUP, geom)]
    # first run populates the cache
    first = [render.render_csv(g)
             for g in run_pipeline(INGROUP, OUTGROUP, geom,
                                   workdir=str(tmp_path))]
    assert first == fused
    cache = TableCache(str(tmp_path))
    assert len(cache.manifest()) == 5
    # second run resumes from cached tables — same result
    second = [render.render_csv(g)
              for g in run_pipeline(INGROUP, OUTGROUP, geom,
                                    workdir=str(tmp_path))]
    assert second == fused
