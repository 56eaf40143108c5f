"""End-to-end k-mer intersection pipeline (the krisp_fasta engine).

Host orchestration of the device kernels:

  FASTA -> uint8 buffer -> [device] window keys -> sort -> unique+count
        -> concat across genomes -> [device] global sort + segment intersect
        -> host decode of (small) survivor set -> FlankGroup objects.

This replaces the reference's four file-based stages
(/root/reference/src/krisp/krisp_fasta/krisp_fasta.py:237-290: per-file
extract+GNU-sort, tournament merge, ingroup filter, parallel render) with two
device launches and a host epilogue; no temp files, no subprocesses.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import dna
from ..io.fasta import load_buffer, bucket_size, simple_name
from ..ops.encode import kmer_keys
from ..ops.sort import build_sorted_unique
from ..ops.intersect import fused_pipeline, intersect_and_compact
from .groups import FlankGroup, KmerAmplicon


@dataclass
class KmerGeometry:
    left: int      # conserved flank length on the left
    mid: int       # diagnostic region length
    right: int     # conserved flank length on the right

    @property
    def total(self) -> int:
        return self.left + self.mid + self.right


def solve_geometry(amplicon=None, diagnostic=None, conserved=None,
                   conserved_left=None, conserved_right=None) -> KmerGeometry:
    """Derive (left, mid, right) from any sufficient flag subset
    (parity: krisp_fasta.py:178-213)."""
    if amplicon is not None:
        if diagnostic is not None:
            conserved = (amplicon - diagnostic) // 2
            return KmerGeometry(conserved, diagnostic, conserved)
        if conserved is not None:
            return KmerGeometry(conserved, amplicon - 2 * conserved, conserved)
        if conserved_left is not None and conserved_right is not None:
            return KmerGeometry(conserved_left,
                                amplicon - conserved_left - conserved_right,
                                conserved_right)
        raise ValueError("Could not deduce input parameters")
    if diagnostic is not None:
        if conserved is not None:
            return KmerGeometry(conserved, diagnostic, conserved)
        if conserved_left is not None and conserved_right is not None:
            return KmerGeometry(conserved_left, diagnostic, conserved_right)
    raise ValueError("Could not deduce input parameters")


def detect_bits(buffers) -> int:
    """Choose a common per-base encoding width for a set of genome buffers."""
    return max(dna.choose_bits(buf) for buf in buffers)


def genome_unique_table(buffer: np.ndarray, geom: KmerGeometry, bits: int,
                        omit_soft: bool):
    """Device stage 1 for one genome: windows -> sorted unique keys + counts.

    Matches ``extractSortedKmers`` semantics (krisp_fasta.py:16-66): k-mers of
    the full amplicon length, 'N'/'n' disallowed, both strands added
    (complements=True, NOT canonicalized), soft-masked bases dropped
    (--omit-soft) or uppercased (default), sorted by (left, right) flank.
    """
    code_table = dna.CODE2_TABLE if bits == 2 else dna.CODE4_TABLE
    comp_table = dna.COMP2_TABLE if bits == 2 else dna.COMP4_TABLE
    valid_table = dna.base_validity_table(bits, disallow="Nn",
                                          omit_soft=omit_soft)
    invalid, words = kmer_keys(buffer, code_table, valid_table, comp_table,
                               geom.left, geom.mid, geom.right, bits,
                               add_revcomp=True)
    return build_sorted_unique(invalid, words, bits)


def _cached_tables(paths, geom, bits, omit_soft, workdir):
    """Per-genome unique tables via the TableCache (checkpoint/resume
    path): load hits, compute+store misses.  Returns concatenated
    (invalid, w_stack, file_id, counts) numpy arrays."""
    from .checkpoint import TableCache
    from ..metrics import GLOBAL as METRICS

    cache = TableCache(workdir)
    parts = []
    for file_idx, path in enumerate(paths):
        hit = cache.load(path, geom, bits, omit_soft)
        if hit is None:
            with METRICS.stage("extract+sort", items=0):
                buf = load_buffer(path)
                padded = np.zeros(bucket_size(buf.size), np.uint8)
                padded[:buf.size] = buf
                u_inv, u_words, counts, n_unique = genome_unique_table(
                    padded, geom, bits, omit_soft)
            nu = int(n_unique)
            words = np.stack([np.asarray(w) for w in u_words])
            counts = np.asarray(counts)
            cache.store(path, geom, bits, omit_soft, words, counts, nu)
            words, counts = words[:, :nu], counts[:nu]
        else:
            words, counts, nu = hit
        parts.append((file_idx, words, counts))

    total = sum(p[1].shape[1] for p in parts)
    padded_total = bucket_size(total)
    W = parts[0][1].shape[0]
    w_stack = np.zeros((W, padded_total), np.uint32)
    file_id = np.zeros(padded_total, np.uint32)
    counts = np.zeros(padded_total, np.uint32)
    invalid = np.ones(padded_total, np.uint32)
    at = 0
    for file_idx, words, cnts in parts:
        n = words.shape[1]
        w_stack[:, at:at + n] = words
        file_id[at:at + n] = file_idx
        counts[at:at + n] = cnts
        invalid[at:at + n] = 0
        at += n
    return invalid, w_stack, file_id, counts


def run_pipeline(files, outgroup, geom: KmerGeometry, omit_soft: bool = False,
                 ingroup_filter: bool | None = None, workdir: str | None = None):
    """Run the full intersection for ingroup ``files`` + ``outgroup`` files.

    Returns a list of FlankGroup in deterministic sorted-key order.
    ``ingroup_filter`` defaults to the reference's gate: apply the
    ingroup-unique-column filter iff there is a diagnostic region
    (krisp_fasta.py:264-272) — note the reference applies it whenever
    mid > 0, with an empty ingroup set meaning "no filtering"
    (filterAlignments.py:31-40 skips when the ingroup set is empty, and
    the rendering ingroup is only set when outgroups exist).
    """
    all_files = list(files) + list(outgroup)
    tags = [simple_name(f) for f in all_files]
    ingroup_tags = frozenset(simple_name(f) for f in files)
    has_outgroup = len(outgroup) > 0

    if ingroup_filter is None:
        ingroup_filter = geom.mid > 0 and has_outgroup

    buffers = [load_buffer(path) for path in all_files]
    bits = detect_bits(buffers)

    cap = 1 << 16
    if workdir is not None:
        # Checkpoint/resume path: per-genome tables cached on disk keyed by
        # content+geometry; the global intersection re-runs over them.
        invalid, w_stack, file_id, counts = _cached_tables(
            all_files, geom, bits, omit_soft, workdir)
        while True:
            out_words, fid_d, cnt_d, gid_d, n_keep = intersect_and_compact(
                invalid, w_stack, file_id, counts, n_files=len(all_files),
                flank_bases=geom.left + geom.right, bits=bits, cap=cap)
            n_keep = int(n_keep)
            if n_keep <= cap:
                break
            cap = bucket_size(n_keep, quantum=1 << 16)
    else:
        # One fused device program: per-genome extract/sort/unique (vmapped
        # over the genome axis) + global sort + intersection + survivor
        # compaction.  Only ``cap`` compacted survivor rows cross back to
        # the host; overflow re-runs with a larger cap (deterministic
        # result, so this is safe).
        pad = bucket_size(max(b.size for b in buffers))
        stacked = np.zeros((len(buffers), pad), np.uint8)
        for i, buf in enumerate(buffers):
            stacked[i, :buf.size] = buf

        code_table = dna.CODE2_TABLE if bits == 2 else dna.CODE4_TABLE
        comp_table = dna.COMP2_TABLE if bits == 2 else dna.COMP4_TABLE
        valid_table = dna.base_validity_table(bits, disallow="Nn",
                                              omit_soft=omit_soft)
        while True:
            out_words, fid_d, cnt_d, gid_d, n_keep = fused_pipeline(
                stacked, code_table, valid_table, comp_table, left=geom.left,
                mid=geom.mid, right=geom.right, bits=bits, cap=cap)
            n_keep = int(n_keep)
            if n_keep <= cap:
                break
            cap = bucket_size(n_keep, quantum=1 << 16)

    words_h = np.asarray(out_words)[:, :n_keep].T
    fid_h = np.asarray(fid_d)[:n_keep]
    cnt_h = np.asarray(cnt_d)[:n_keep]
    gid_h = np.asarray(gid_d)[:n_keep]

    decoded = dna.decode_words(words_h, geom.total, bits)
    render_ingroup = frozenset(ingroup_tags) if has_outgroup else None

    groups: list[FlankGroup] = []
    current_gid = None
    for row, g, f, c in zip(decoded, gid_h, fid_h, cnt_h):
        left = row[:geom.left]
        right = row[geom.left:geom.left + geom.right]
        mid = row[geom.left + geom.right:]
        if current_gid != g:
            groups.append(FlankGroup(left=left, right=right,
                                     ingroup=render_ingroup))
            current_gid = g
        groups[-1].add(KmerAmplicon(left=left, mid=mid, right=right,
                                    label_counts={tags[f]: int(c)}))

    if ingroup_filter:
        # Diagnostic ingroup-unique-column filter on the survivor set
        # (parity: filterAlignments.py:4-40 over Amplicon.py:495-521).
        groups = [g for g in groups if g.ingroup_unique_columns()]
    return groups
