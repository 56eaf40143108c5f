"""Synthesize GB-scale krisp_fasta inputs with planted diagnostic sites.

Builds N_INGROUP + N_OUTGROUP genomes of --size bases each: independent
uniform-random sequence, except at planted 28-base sites (one per
--site-every bases, at fixed offsets so every genome agrees) where all
genomes share the same left(25)/right(2) flanks.  Half the sites give the
ingroup mid base 'A' and the outgroup 'C' (diagnostic under the reference
semantics: ingroup allele set disjoint from the outgroup's,
/root/reference/src/krisp/krisp_fasta/Amplicon.py:495-521); the other half
use 'G' everywhere (shared but non-diagnostic, so the ingroup filter must
drop them).  Expected spacer-search output = 1 row per diagnostic site:
both strands are added un-canonicalized, but with the asymmetric 25/1/2
geometry a diagnostic window's reverse complement carries the complemented
mid base inside its LEFT flank, so the ingroup and outgroup revcomp flank
pairs differ and the twin never survives the all-files intersection (the
README's revcomp pairs appear only in the symmetric 30/40/30 geometry,
README.md:231-232).  Non-diagnostic sites survive intersection on both
strands and must be dropped by the ingroup filter.

Usage: python tools/make_bigscale_fasta.py OUTDIR --size 100000000
"""

import argparse
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)
GEOM = (25, 1, 2)  # spacer-search geometry: left, mid, right
L = sum(GEOM)


def write_fasta(path: str, seq: np.ndarray, record_bases: int = 10_000_000,
                width: int = 80):
    """Wrap a uint8 base array into 80-column FASTA records, vectorized."""
    with open(path, "wb") as fh:
        for r, start in enumerate(range(0, seq.size, record_bases)):
            chunk = seq[start:start + record_bases]
            pad = (-chunk.size) % width
            grid = np.concatenate([chunk, np.zeros(pad, np.uint8)])
            grid = grid.reshape(-1, width)
            lines = np.full((grid.shape[0], width + 1), ord("\n"), np.uint8)
            lines[:, :width] = grid
            body = lines.reshape(-1)
            if pad:  # drop the zero padding from the final line
                body = np.concatenate(
                    [body[:-(pad + 1)], np.frombuffer(b"\n", np.uint8)])
            fh.write(b">rec%d len=%d\n" % (r, chunk.size))
            body.tofile(fh)


def make_genomes(outdir: str, size: int, n_ingroup: int = 2,
                 n_outgroup: int = 3, site_every: int = 1_000_000,
                 seed: int = 20260819):
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_sites = size // site_every
    # one shared flank per site, fixed across genomes
    flanks = BASES[rng.integers(0, 4, size=(n_sites, L))]
    site_pos = (np.arange(n_sites) * site_every
                + rng.integers(L, site_every - L, size=n_sites))
    diagnostic = np.arange(n_sites) % 2 == 0
    paths = []
    for g in range(n_ingroup + n_outgroup):
        ingroup = g < n_ingroup
        seq = BASES[rng.integers(0, 4, size=size)]
        for s in range(n_sites):
            window = flanks[s].copy()
            window[GEOM[0]] = (ord("A") if ingroup else ord("C")) \
                if diagnostic[s] else ord("G")
            seq[site_pos[s]:site_pos[s] + L] = window
        name = (f"ingroup{g}" if ingroup else f"outgroup{g - n_ingroup}")
        path = os.path.join(outdir, f"{name}.fasta")
        write_fasta(path, seq)
        paths.append(path)
    return paths, int(diagnostic.sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--size", type=int, default=100_000_000)
    ap.add_argument("--site-every", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=20260819)
    args = ap.parse_args()
    paths, n_diag = make_genomes(args.outdir, args.size,
                                 site_every=args.site_every, seed=args.seed)
    print(f"{len(paths)} genomes x {args.size} bases, "
          f"{n_diag} diagnostic sites -> expect {n_diag} CSV rows")
    for p in paths:
        print(" ", p)


if __name__ == "__main__":
    main()
