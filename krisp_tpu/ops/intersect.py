"""Device multi-way intersection over one globally sorted k-mer table.

The reference computes the intersection of F sorted k-mer tables by a
tournament of pairwise 2-way sorted merges across worker processes
(/root/reference/src/krisp/krisp_fasta/intersectAmplicons.py:232-310, with the
merge kernel in shared.py:285-347).  TPU-native design: concatenate every
genome's unique table, sort once, and evaluate the survivor test with run
(segment) reductions expressed as cumsum + gather — no scatters, so the whole
thing is VPU-friendly and deterministic by construction (the nondeterminism
that forced the reference to disable its parallel merge,
intersectAmplicons.py:216-218, cannot arise).

Survivor test: a flank-pair group survives iff rows from all F genomes are
present.  That is the fixed point of the reference's pairwise-intersection
tournament.  Per-group prefix-sum differences of per-file one-hot counts give
presence without any segment scatter.

The ingroup-unique diagnostic-column filter (Amplicon.py:495-521) runs on the
host over the compacted survivor set — survivors are tiny compared to the
input table, so this costs nothing and keeps the device pass scatter-free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .sort import sort_keys


def _flank_group_heads(invalid, words, n_flank_bases: int, bits: int):
    """Head flags for runs of equal (left,right) flank prefix in sorted
    order.  The flank occupies the leading ``n_flank_bases`` packed bases of
    the [left|right|mid] layout, so the comparison is whole leading words
    plus one masked boundary word."""
    per_word = 32 // bits
    full_words = n_flank_bases // per_word
    rem = n_flank_bases % per_word
    neq = invalid[1:] != invalid[:-1]
    for w in range(full_words):
        neq = neq | (words[w][1:] != words[w][:-1])
    if rem:
        mask = jnp.uint32(((1 << (bits * rem)) - 1) << (32 - bits * rem))
        bw = words[full_words] & mask
        neq = neq | (bw[1:] != bw[:-1])
    return jnp.concatenate([jnp.ones(1, bool), neq])


def group_bounds(head):
    """For each row of a sorted table: [start, end) of its run.

    start = last head index <= i (cumulative max of head positions);
    end = first head index > i (reverse cumulative min, shifted).
    """
    n = head.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    start = jax.lax.cummax(jnp.where(head, idx, 0))
    head_next = jnp.concatenate([head[1:], jnp.ones(1, bool)])
    nxt = jnp.where(head_next, idx + 1, n)
    end = jax.lax.cummin(nxt[::-1])[::-1]
    return start, end


@partial(jax.jit, static_argnames=("n_files", "flank_bases", "bits"))
def intersect_rows(invalid, w_stack, file_id, counts,
                   n_files: int, flank_bases: int, bits: int):
    """Sort the concatenated unique tables and mark intersection survivors.

    w_stack: uint32[W, n] key words.  Returns (w_stack_sorted, file_id,
    counts, group_id, row_keep) all length n; ``row_keep`` marks rows whose
    flank group has at least one row from every genome.
    """
    words = list(w_stack)
    inv, ws, (fid, cnt) = sort_keys(invalid, words, (file_id, counts))
    valid = inv == 0
    n = inv.shape[0]

    head = _flank_group_heads(inv, ws, flank_bases, bits)
    group_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    start, end = group_bounds(head)

    onehot = ((fid[:, None] == jnp.arange(n_files, dtype=fid.dtype)[None, :])
              & valid[:, None]).astype(jnp.int32)
    pre = jnp.cumsum(onehot, axis=0)                      # (n, F)
    tot_end = jnp.take(pre, end - 1, axis=0)
    tot_start = jnp.where((start > 0)[:, None],
                          jnp.take(pre, jnp.maximum(start - 1, 0), axis=0), 0)
    present = (tot_end - tot_start) > 0
    n_present = jnp.sum(present.astype(jnp.int32), axis=1)

    row_keep = (n_present == n_files) & valid
    return jnp.stack(ws), fid, cnt, group_id, row_keep


@partial(jax.jit, static_argnames=("left", "mid", "right", "bits", "cap",
                                   "omit_soft"))
def fused_pipeline(buffers, code_table, valid_table, comp_table, left: int,
                   mid: int, right: int, bits: int, cap: int,
                   omit_soft: bool = False):
    """Whole krisp_fasta compute path as ONE device program.

    buffers: uint8[F, P] sentinel-separated genome buffers (equal padded
    length).  Per genome (vmapped): window keys -> sort -> unique+count;
    then flatten, global sort, flank-group intersection, survivor
    compaction.  A single dispatch and a single small device->host transfer
    — the shape that makes dispatch/transfer latency irrelevant and lets
    XLA overlap every stage.
    """
    from .encode import kmer_keys
    from .sort import build_sorted_unique

    F, P = buffers.shape

    def per_file(buf):
        invalid, words = kmer_keys(buf, code_table, valid_table, comp_table,
                                   left, mid, right, bits,
                                   add_revcomp=True)
        u_inv, u_words, u_cnt, _ = build_sorted_unique(invalid, words, bits)
        return u_inv, jnp.stack(u_words), u_cnt

    u_inv, u_words, u_cnt = jax.vmap(per_file)(buffers)
    n_per = u_inv.shape[1]
    W = u_words.shape[1]
    invalid = u_inv.reshape(F * n_per)
    w_stack = jnp.transpose(u_words, (1, 0, 2)).reshape(W, F * n_per)
    counts = u_cnt.reshape(F * n_per)
    file_id = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.uint32)[:, None], (F, n_per)).reshape(-1)

    return intersect_and_compact(invalid, w_stack, file_id, counts,
                                 n_files=F, flank_bases=left + right,
                                 bits=bits, cap=cap)


@partial(jax.jit, static_argnames=("n_files", "flank_bases", "bits", "cap"))
def intersect_and_compact(invalid, w_stack, file_id, counts, n_files: int,
                          flank_bases: int, bits: int, cap: int):
    """Fused intersect + on-device survivor compaction.

    Avoids pulling the full sorted table to the host: only ``cap`` compacted
    survivor rows (plus a true survivor count for overflow detection) leave
    the device.  Returns (words [W, cap], file_id[cap], counts[cap],
    group_id[cap], n_survivors).
    """
    ws, fid, cnt, gid, keep = intersect_rows(invalid, w_stack, file_id,
                                             counts, n_files, flank_bases,
                                             bits)
    n = fid.shape[0]
    n_keep = jnp.sum(keep.astype(jnp.int32))
    idx = jnp.nonzero(keep, size=cap, fill_value=n - 1)[0]
    k = jnp.arange(cap)
    valid_out = k < n_keep
    out_words = jnp.take(ws, idx, axis=1)
    return (out_words, jnp.take(fid, idx), jnp.take(cnt, idx),
            jnp.where(valid_out, jnp.take(gid, idx), -1), n_keep)
