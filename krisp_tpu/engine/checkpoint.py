"""Checkpoint / resume for the k-mer engine.

The reference has no checkpointing — its only resume affordance is that
per-file sorted k-mer temp files persist inside the workdir during a run
(krisp_fasta.py:224, SURVEY.md §5).  Here per-genome unique tables are
first-class checkpoints: content-addressed by (file bytes, geometry,
encoding, softmask policy), so an interrupted or repeated run skips
extraction+sort for unchanged genomes and goes straight to the global
intersection.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np


def _table_key(path: str, geom, bits: int, omit_soft: bool,
               n_files: int) -> str:
    # v2: tables store bit-packed KeyLayout rows, whose width depends on
    # the genome-id field (n_files)
    h = hashlib.sha256()
    h.update(f"{geom.left},{geom.mid},{geom.right},{bits},{omit_soft},"
             f"{n_files},v2".encode())
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:32]


class TableCache:
    """On-disk cache of per-genome sorted unique k-mer tables."""

    def __init__(self, directory: str):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, key: str) -> Path:
        return self.dir / f"kmer_table_{key}.npz"

    def load(self, path: str, geom, bits: int, omit_soft: bool,
             n_files: int = 1):
        """Return (words [W, n] uint32, counts uint32, n_unique) or None."""
        f = self._path(_table_key(path, geom, bits, omit_soft, n_files))
        if not f.exists():
            return None
        try:
            data = np.load(f)
            return data["words"], data["counts"], int(data["n_unique"])
        except Exception:
            return None

    def store(self, path: str, geom, bits: int, omit_soft: bool,
              words: np.ndarray, counts: np.ndarray, n_unique: int,
              n_files: int = 1):
        f = self._path(_table_key(path, geom, bits, omit_soft, n_files))
        tmp = f.with_suffix(".tmp.npz")
        np.savez_compressed(tmp, words=words[:, :n_unique],
                            counts=counts[:n_unique],
                            n_unique=np.int64(n_unique))
        tmp.replace(f)

    def manifest(self):
        return sorted(p.name for p in self.dir.glob("kmer_table_*.npz"))
