"""pysam stub backed by krisp_tpu's own VCF parser.

Lets the reference krisp_vcf implementation run in this environment (which
has no htslib) so it can serve as a live parity oracle for everything
downstream of VCF parsing.  Only the API surface the reference touches is
provided.
"""

import os

from krisp_tpu.vcf.parser import VcfReader, read_contigs


def _resolve(path):
    """The reference appends '.gz' after its tabix_index call
    (krisp_vcf.py:1016-1018); real tabix would have produced that file.
    The streaming reader needs no bgzip, so fall back to the original."""
    if path and not os.path.exists(path) and path.endswith(".gz")             and os.path.exists(path[:-3]):
        return path[:-3]
    return path


class _Samples:
    def __init__(self, data):
        self._data = data

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def __getitem__(self, key):
        return self._data[key]

    def __contains__(self, key):
        return key in self._data

    def __iter__(self):
        return iter(self._data)


class _Record:
    def __init__(self, var):
        self._var = var
        self.samples = _Samples(var.samples)

    def __getattr__(self, name):
        return getattr(self._var, name)


class VariantFile:
    def __init__(self, path):
        self.path = _resolve(path)
        self._reader = VcfReader(self.path)

    def __iter__(self):
        for var in self._reader:
            yield _Record(var)

    def fetch(self, contig=None, start=None, end=None):
        for var in self._reader.fetch(contig, start=start, end=end):
            yield _Record(var)


class TabixFile:
    def __init__(self, filename=None, index=None):
        self._path = _resolve(filename)

    @property
    def contigs(self):
        return [c for c, _ in read_contigs(self._path)]


def tabix_index(path, preset=None, keep_original=True, force=True):
    # streaming reader needs no index; create the marker file the caller
    # expects to find next time
    open(path + ".tbi", "w").close()
    return path
