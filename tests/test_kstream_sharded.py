"""Sharded kstream vs the host string pipeline — byte-identical output at
1/2/4/8 virtual devices for all three modes, through the public
run_device_kstream entry (KRISP_TPU_DEVICES gates the mesh)."""

import io

import numpy as np
import pytest

from krisp_tpu.kstream import KStream
from krisp_tpu.kstream_device import device_plan, run_device_kstream


def _write_fasta(tmp_path, seq: str):
    p = tmp_path / "in.fa"
    body = "\n".join(seq[i:i + 71] for i in range(0, len(seq), 71))
    p.write_text(">s1\n" + body + "\n")
    return str(p)


def _stress_seq(n=2003, seed=3):
    """Random DNA with poly-T runs (sentinel-adjacent keys), N blocks
    (invalid windows), a lowercase block, and duplicated spans placed to
    straddle shard boundaries at every tested device count."""
    rng = np.random.default_rng(seed)
    s = list(rng.choice(list("ACGT"), n))
    s[120:150] = "T" * 30
    s[300:310] = "N" * 10
    s[700:730] = list("".join(s[100:130]).lower())
    s[1500:1560] = s[200:260]
    s[990:1010] = s[490:510]   # straddles the 2-device boundary
    return "".join(s)


@pytest.mark.parametrize("mode_kw", [{}, {"complements": True},
                                     {"canonicals": True}],
                         ids=["plain", "complements", "canonicals"])
@pytest.mark.parametrize("n_devices", ["2", "4", "8"])
@pytest.mark.parametrize("k", [16, 28])
def test_sharded_matches_host(tmp_path, monkeypatch, mode_kw, n_devices, k):
    fasta = _write_fasta(tmp_path, _stress_seq())
    plan = device_plan(kmers=[k], disallow="Nn", sort=True, omitsoft=True,
                       **mode_kw)
    assert plan is not None
    monkeypatch.setenv("KRISP_TPU_DEVICES", n_devices)
    out = io.BytesIO()
    n = run_device_kstream(fasta, plan, out)
    host = KStream(kmers=[k], disallow="Nn", sort=True, omitsoft=True,
                   complements=mode_kw.get("complements", False),
                   canonicals=mode_kw.get("canonicals", False))
    want = "".join(line + "\n" for line in host(fasta)).encode()
    assert out.getvalue() == want
    assert n == want.count(b"\n")


def test_sharded_equals_single_device(tmp_path, monkeypatch):
    """The mesh gate itself: same bytes with the mesh on and off."""
    fasta = _write_fasta(tmp_path, _stress_seq(seed=9))
    plan = device_plan(kmers=[24], disallow="Nn", sort=True, omitsoft=True,
                       canonicals=True)
    outs = {}
    for n in ["1", "8"]:
        monkeypatch.setenv("KRISP_TPU_DEVICES", n)
        buf = io.BytesIO()
        run_device_kstream(fasta, plan, buf)
        outs[n] = buf.getvalue()
    assert outs["1"] == outs["8"]
    assert len(outs["1"]) > 0


def test_sharded_overflow_retry(tmp_path, monkeypatch):
    """A skewed key distribution (A/C-only alphabet: every key's leading
    bits confine ownership to a quarter of the shards) overflows the
    uniform exchange capacity; the wrapper must retry with a bigger cap,
    not drop rows."""
    import krisp_tpu.parallel.kstream_shard as ks_mod

    caps = []
    orig = ks_mod._kstream_step

    def spy(mesh, k, mode, bits, omit_soft, chunk, cap):
        caps.append(cap)
        return orig(mesh, k, mode, bits, omit_soft, chunk, cap)

    monkeypatch.setattr(ks_mod, "_kstream_step", spy)
    rng = np.random.default_rng(5)
    # C-heavy A/C alphabet: the first base decides the owner shard, so
    # ~75% of each shard's keys target one destination — past the uniform
    # cap of 2*(rows/n); k=28 keeps the biased windows unique
    seq = "".join(rng.choice(list("AC"), 8000, p=[0.25, 0.75]))
    fasta = _write_fasta(tmp_path, seq)
    plan = device_plan(kmers=[28], disallow="Nn", sort=True)
    monkeypatch.setenv("KRISP_TPU_DEVICES", "8")
    out = io.BytesIO()
    n = run_device_kstream(fasta, plan, out)
    assert n is not None, "device path declined the input"
    assert len(caps) >= 2, f"overflow retry never fired (caps={caps})"
    host = KStream(kmers=[28], disallow="Nn", sort=True)
    want = "".join(line + "\n" for line in host(fasta)).encode()
    assert out.getvalue() == want


def test_short_input_falls_back_to_single_device(tmp_path, monkeypatch):
    """An input too short to cover each shard's (k-1)-byte halo must not
    silently drop boundary-spanning k-mers: the sharded table declines and
    the one-shot single-device path serves the request."""
    seq = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTAC"  # 38 bp, k=28, 8 shards
    fasta = _write_fasta(tmp_path, seq)
    plan = device_plan(kmers=[28], disallow="Nn", sort=True)
    monkeypatch.setenv("KRISP_TPU_DEVICES", "8")
    out = io.BytesIO()
    n = run_device_kstream(fasta, plan, out)
    host = KStream(kmers=[28], disallow="Nn", sort=True)
    want = "".join(line + "\n" for line in host(fasta)).encode()
    assert out.getvalue() == want
    assert n == want.count(b"\n") and n == len(seq) - 28 + 1
