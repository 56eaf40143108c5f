"""Multi-device VCF classification over a ``jax.sharding.Mesh``.

Two shardings of the C27/C28 device kernel (ops/vcfclass.py):

- ``shard="variants"`` — data-parallel over the variant axis: each device
  classifies its slice of the batch, no collectives.  The right layout for
  whole-genome scans (V >> S).
- ``shard="samples"`` — the cohort axis is sharded: each device reduces its
  sample slice into partial ``(sample_counts, allele_counts)`` and one
  ``psum`` over the mesh completes the counts; the per-variant finalize
  runs replicated.  The right layout for biobank-scale cohorts where the
  (V, S, A) genotype block exceeds one chip's HBM.

The reductions are integer sums, so both shardings are bit-identical to the
single-device kernel (pinned at 1/2/4/8 virtual devices by
tests/test_vcfclass_sharded.py).  The reference has no multi-device analog —
it classifies one variant at a time in Python
(/root/reference/src/krisp/krisp_vcf/find_diag_var.py:203-411).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.vcfclass import _accumulate, _finalize, pack_outputs as _pack

_THR_KEYS = ("min_samples", "min_reads", "min_geno_qual", "min_freq",
             "min_map_qual", "min_var_qual", "min_samp_prop")


@lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, n_groups: int, shard: str, thr: tuple):
    """One compiled shard_map program per (mesh, G, sharding, thresholds) —
    thresholds are trace-time constants, exactly like a CLI run's."""
    axis = mesh.axis_names[0]
    kw = dict(zip(_THR_KEYS, thr))

    if shard == "variants":
        def per_shard(dp, gq, ad, n_alleles, mq, qual, group_id,
                      group_sizes):
            sc, ac = _accumulate(dp, gq, ad, n_alleles, group_id, n_groups,
                                 kw["min_reads"], kw["min_geno_qual"],
                                 kw["min_freq"])
            out = _finalize(sc, ac, mq, qual, group_sizes, n_groups,
                            kw["min_samples"], kw["min_map_qual"],
                            kw["min_var_qual"], kw["min_samp_prop"])
            return _pack(out, dp.shape[0])

        in_specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                    P(), P())
        out_specs = P(axis)
    elif shard == "samples":
        def per_shard(dp, gq, ad, n_alleles, mq, qual, group_id,
                      group_sizes):
            sc, ac = _accumulate(dp, gq, ad, n_alleles, group_id, n_groups,
                                 kw["min_reads"], kw["min_geno_qual"],
                                 kw["min_freq"])
            sc = lax.psum(sc, axis)
            ac = lax.psum(ac, axis)
            out = _finalize(sc, ac, mq, qual, group_sizes, n_groups,
                            kw["min_samples"], kw["min_map_qual"],
                            kw["min_var_qual"], kw["min_samp_prop"])
            return _pack(out, dp.shape[0])

        in_specs = (P(None, axis), P(None, axis), P(None, axis, None),
                    P(), P(), P(), P(axis), P())
        out_specs = P()
    else:
        raise ValueError(f"unknown shard axis {shard!r}")

    return jax.jit(shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs))


def classify_batch_packed_sharded(mesh: Mesh, dp, gq, ad, n_alleles, mq,
                                  qual, group_id, group_sizes,
                                  n_groups: int, shard: str = "variants",
                                  **thresholds):
    """``ops.vcfclass.classify_batch_packed`` across a device mesh.

    Pads the sharded axis up to a multiple of the mesh size — padded
    variants are sliced off the result; padded samples carry
    ``group_id=-1`` / ``dp=-1`` / ``ad=0`` and therefore contribute zero
    to every count (the same encoding the single-device batch builder uses
    for unused cohort members)."""
    from ..ops.vcfclass import classify_batch_packed

    unknown = set(thresholds) - set(_THR_KEYS)
    if unknown:
        raise TypeError(f"unknown threshold kwargs: {sorted(unknown)}")
    n = mesh.devices.size
    thr = tuple(thresholds.get(k, d) for k, d in zip(
        _THR_KEYS, (5, 10, 40, 0.1, 30, 10, 0.9)))
    V, S, A = ad.shape
    if n == 1:
        return classify_batch_packed(
            dp, gq, ad, n_alleles, mq, qual, group_id, group_sizes,
            n_groups=n_groups, **dict(zip(_THR_KEYS, thr)))

    if shard == "variants":
        pad = (-V) % n
        if pad:
            dp = np.concatenate([dp, np.full((pad, S), -1, np.int32)])
            gq = np.concatenate([gq, np.full((pad, S), -1, np.int32)])
            ad = np.concatenate([ad, np.zeros((pad, S, A), np.int32)])
            n_alleles = np.concatenate(
                [n_alleles, np.zeros(pad, np.int32)])
            mq = np.concatenate([mq, np.full(pad, -1, np.float32)])
            qual = np.concatenate([qual, np.full(pad, -1, np.float32)])
    else:
        pad = (-S) % n
        if pad:
            dp = np.concatenate(
                [dp, np.full((V, pad), -1, np.int32)], axis=1)
            gq = np.concatenate(
                [gq, np.full((V, pad), -1, np.int32)], axis=1)
            ad = np.concatenate(
                [ad, np.zeros((V, pad, A), np.int32)], axis=1)
            group_id = np.concatenate(
                [group_id, np.full(pad, -1, np.int32)])

    fn = _sharded_fn(mesh, n_groups, shard, thr)
    out = fn(dp, gq, ad, n_alleles, mq, qual, group_id, group_sizes)
    return out[:V]
