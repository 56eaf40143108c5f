"""Self-contained VCF parser (replaces the reference's pysam/htslib layer).

Produces lightweight record objects exposing exactly the fields the engine
consumes (matching pysam semantics where the reference relies on them,
/root/reference/src/krisp/krisp_vcf/find_diag_var.py:203-411):

  - ``alleles`` = (ref, *alts)
  - per-sample ``DP``/``GQ``: int or None when missing ('.')
  - per-sample ``AD``: tuple of int/None per allele
  - ``qual`` (QUAL column, float), ``mq`` (INFO MQ)

Also provides region iteration over bgzip'd files (replacement for tabix
fetch, krisp_vcf.py:1185-1189): a single streaming pass with position
filtering — no index file needed.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass


def _open_text(path):
    if path == "-" or path is None:
        import sys
        return io.TextIOWrapper(sys.stdin.buffer)
    raw = open(path, "rb")
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.open(raw))
    return io.TextIOWrapper(raw)


@dataclass
class SampleData:
    dp: int | None
    gq: int | None
    ad: tuple  # of int | None, one per allele

    def __getitem__(self, key):
        if key == "DP":
            return self.dp
        if key == "GQ":
            return self.gq
        if key == "AD":
            return self.ad
        raise KeyError(key)


class VcfVariant:
    """One VCF record with pysam-shaped accessors."""

    __slots__ = ("chrom", "pos", "id", "ref", "alts", "qual", "mq",
                 "samples", "_sample_names")

    def __init__(self, chrom, pos, vid, ref, alts, qual, mq, samples,
                 sample_names):
        self.chrom = chrom
        self.pos = pos          # 1-based, as in the VCF
        self.id = vid
        self.ref = ref
        self.alts = alts
        self.qual = qual
        self.mq = mq
        self.samples = samples  # dict name -> SampleData (insertion order)
        self._sample_names = sample_names

    @property
    def alleles(self):
        return (self.ref,) + self.alts

    @property
    def rlen(self):
        return len(self.ref)

    @property
    def info(self):
        return {"MQ": self.mq}


def _to_int(tok):
    return None if tok in (".", "") else int(tok)


class VcfReader:
    """Streaming VCF reader; iterate all records or a coordinate window."""

    def __init__(self, path):
        self.path = path
        self.handle = _open_text(path)
        self.samples: list[str] = []
        self._read_header()

    def _read_header(self):
        for line in self.handle:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                cols = line.rstrip("\n").split("\t")
                self.samples = cols[9:]
                return
            raise ValueError("VCF missing #CHROM header line")

    def __iter__(self):
        for line in self.handle:
            if not line.strip():
                continue
            yield self._parse_record(line)

    def fetch(self, contig=None, start=None, end=None):
        """Yield records overlapping [start, end) on contig (0-based
        half-open, pysam convention: a record overlaps when its reference
        span [pos-1, pos-1+rlen) intersects the window)."""
        for var in self:
            if contig is not None and var.chrom != contig:
                continue
            rec_start = var.pos - 1
            rec_end = rec_start + var.rlen
            if start is not None and rec_end <= start:
                continue
            if end is not None and rec_start >= end:
                continue
            yield var

    def _parse_record(self, line):
        fields = line.rstrip("\n").split("\t")
        chrom, pos, vid, ref, alt, qual, _filt, info = fields[:8]
        alts = tuple(alt.split(",")) if alt != "." else ()
        n_alleles = 1 + len(alts)

        mq = None
        for item in info.split(";"):
            if item.startswith("MQ="):
                v = item[3:]
                mq = float(v) if "." in v or "e" in v else int(v)
                break

        fmt = fields[8].split(":") if len(fields) > 8 else []
        try:
            dp_i = fmt.index("DP")
        except ValueError:
            dp_i = None
        try:
            gq_i = fmt.index("GQ")
        except ValueError:
            gq_i = None
        try:
            ad_i = fmt.index("AD")
        except ValueError:
            ad_i = None

        samples = {}
        for name, raw in zip(self.samples, fields[9:]):
            toks = raw.split(":")
            dp = _to_int(toks[dp_i]) if dp_i is not None and dp_i < len(toks) else None
            gq = _to_int(toks[gq_i]) if gq_i is not None and gq_i < len(toks) else None
            if ad_i is not None and ad_i < len(toks) and toks[ad_i] != ".":
                ad = tuple(_to_int(t) for t in toks[ad_i].split(","))
                if len(ad) < n_alleles:
                    ad = ad + (None,) * (n_alleles - len(ad))
            else:
                ad = (None,) * n_alleles
            samples[name] = SampleData(dp=dp, gq=gq, ad=ad)

        return VcfVariant(chrom=chrom, pos=int(pos), vid=vid, ref=ref,
                          alts=alts,
                          qual=None if qual == "." else float(qual),
                          mq=mq, samples=samples,
                          sample_names=self.samples)


def read_contigs(path):
    """List (contig, max_pos) pairs by streaming the file once — the
    index-free replacement for tabix contig discovery
    (krisp_vcf.py:1016-1027)."""
    reader = VcfReader(path)
    seen = {}
    for var in reader:
        prev = seen.get(var.chrom, 0)
        end = var.pos - 1 + var.rlen
        if end > prev:
            seen[var.chrom] = end
    return list(seen.items())
