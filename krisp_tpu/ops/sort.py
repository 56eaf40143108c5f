"""Device sort + run-length (unique/count) kernels for packed k-mer keys.

Replaces the reference's external-memory GNU sort subprocess
(/root/reference/src/krisp/kstream/kstream.py:45-119) and its generator-level
duplicate merging (krisp_fasta/shared.py:210-240) with one on-device sort of
multi-word integer keys followed by vectorized run detection.

``jax.lax.sort`` with ``num_keys > 1`` performs a lexicographic sort over the
leading operands, which XLA lowers to its native TPU sort.  A Pallas radix
sort can be slotted in behind the same API (see ops/radix.py) — both orderings
are total and identical, so results are bit-reproducible either way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sort_keys(invalid, words, payloads=()):
    """Lexicographic sort by (invalid, *words); payloads carried along.

    ``invalid`` leads so masked/padding rows sort after all real keys.
    Returns (invalid_sorted, words_sorted list, payloads_sorted list).
    """
    operands = (invalid, *words, *payloads)
    out = jax.lax.sort(operands, num_keys=1 + len(words), is_stable=True)
    nw = len(words)
    return out[0], list(out[1:1 + nw]), list(out[1 + nw:])


def run_heads(invalid, words):
    """Boolean head-of-run flags for a sorted table (first row of each
    distinct valid key)."""
    neq = jnp.zeros(invalid.shape[0] - 1, bool)
    for w in words:
        neq = neq | (w[1:] != w[:-1])
    head = jnp.concatenate([jnp.ones(1, bool), neq])
    return head & (invalid == 0)


@partial(jax.jit)
def unique_counts(invalid, words):
    """Collapse a sorted key table into (unique keys, multiplicities).

    Output arrays are padded to the input size; ``u_invalid`` marks padding.
    Mirrors the semantics of the reference's ``simplifyStream``
    (shared.py:210-240): adjacent equal rows merge and their label
    multiplicities add (here: occurrence counts per genome).
    """
    n = invalid.shape[0]
    n_valid = jnp.sum((invalid == 0).astype(jnp.int32))
    head = run_heads(invalid, words)
    n_unique = jnp.sum(head.astype(jnp.int32))
    hp = jnp.nonzero(head, size=n, fill_value=n)[0]
    nxt = jnp.minimum(jnp.concatenate([hp[1:], jnp.full(1, n, hp.dtype)]), n_valid)
    counts = (nxt - jnp.minimum(hp, n_valid)).astype(jnp.uint32)
    gather_at = jnp.clip(hp, 0, n - 1)
    u_words = [jnp.take(w, gather_at) for w in words]
    k = jnp.arange(n)
    u_invalid = (k >= n_unique).astype(jnp.uint32)
    counts = jnp.where(k < n_unique, counts, 0)
    return u_invalid, u_words, counts, n_unique


@partial(jax.jit, static_argnames=("bits",))
def build_sorted_unique(invalid, words, bits: int):
    """Fused per-genome stage: sort raw window keys, then unique+count.

    This is the device replacement for the reference's per-file
    ``extractSortedKmers`` (krisp_fasta/krisp_fasta.py:16-66): one sorted,
    duplicate-merged k-mer table per genome.
    """
    inv_s, words_s, _ = sort_keys(invalid, words)
    return unique_counts(inv_s, words_s)
