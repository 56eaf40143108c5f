"""Bio.SeqIO stub: minimal FASTA parsing for the reference krisp_vcf."""


class _Seq(str):
    def lower(self):
        return _Seq(str.lower(self))

    def __getitem__(self, key):
        return _Seq(str.__getitem__(self, key))


class SeqRecord:
    def __init__(self, rec_id, seq):
        self.id = rec_id
        self.seq = _Seq(seq)

    def __len__(self):
        return len(self.seq)


def parse(handle, fmt):
    assert fmt == "fasta"
    name, chunks = None, []
    for line in handle:
        line = line.strip()
        if line.startswith(">"):
            if name is not None:
                yield SeqRecord(name, "".join(chunks))
            name = line[1:].split()[0]
            chunks = []
        else:
            chunks.append(line)
    if name is not None:
        yield SeqRecord(name, "".join(chunks))
