"""`kstream` command-line front-end.

Flag parity with the reference CLI
(/root/reference/src/krisp/kstream/kstream.py:835-956).
"""

from __future__ import annotations

import argparse
import sys

from ._pipe import pipe_safe


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description=("Read and parse kmers from fasta or kmer stream\n"
                     "Compatible with gz, bz2, and stdin."),
        prog="kstream",
        formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument("file", nargs="?", type=str, default="-",
                        help="Fasta file to read. .gz, .bz2, default stdin")
    parser.add_argument("-k", "--kmers", type=int, nargs="+",
                        help="Convert sequences into kmers of given length(s).")
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--canonicals", action="store_true",
                       help="Print canonical sequences (alphabetically first)")
    group.add_argument("--complements", action="store_true",
                       help="Add reverse complement to stream")
    parser.add_argument("--disallow", type=str,
                        help="Omit sequences containing dissallowed nucleotides")
    parser.add_argument("--allow", type=str,
                        help="Only accept sequences containing allowed nucleotides")
    parser.add_argument("--expand-iupac", action="store_true",
                        help="Expand IUPAC nucleotide codes (including N's)")
    parser.add_argument("--omit-softmask", action="store_true",
                        help="Omit sequences containing soft masking")
    parser.add_argument("--map-softmask", action="store_true",
                        help="Unmask sequences containing soft masking")
    parser.add_argument("--split", nargs="+", type=int,
                        help="Split kmers into columns and delimit by ','")
    parser.add_argument("-p", "--parallel", type=int, default=1,
                        help="Number of processors to use. Default 1")
    parser.add_argument("-s", "--sort", action="store_true",
                        help="Sort resulting kmers")
    parser.add_argument("--sort-np", type=int, default=None,
                        help="Number of processors to use for sorting "
                             "(sets the native host core's thread-team "
                             "size; mirrors GNU sort --parallel; "
                             "default: an up-to-4-thread heuristic — "
                             "pass 1 to force serial)")
    parser.add_argument("--sort-mem", type=str,
                        help="Amount of memory to use for sorting, GNU "
                             "sort -S grammar (N%%, K/M/G, bare = KiB): "
                             "bounds the string pipeline's spill chunks "
                             "and the fast-path host-engine budget")
    parser.add_argument("--sort-cols", nargs="+", type=int,
                        help="Sort based on these columns, 0-based indexing")
    parser.add_argument("--output",
                        help="Write output to file as opposed to terminal")
    parser.add_argument("--devices", type=int, default=None, metavar="INT",
                        help="Number of accelerator devices for the device "
                             "fast path (default: all; same as "
                             "KRISP_TPU_DEVICES)")
    parser.add_argument("--engine", choices=("auto", "host", "device"),
                        default="auto",
                        help="Fast-path engine for eligible extract+sort "
                             "jobs: host-vectorized, device, or auto "
                             "(host for k<=32 within the RAM budget; "
                             "default auto, same as "
                             "KRISP_TPU_KSTREAM_ENGINE)")
    parser.add_argument("--version", action="version", version="%(prog)s 1.0")
    return parser.parse_args(argv)


@pipe_safe
def main(argv=None):
    from ..kstream import KStream

    import os

    args = parse_args(sys.argv[1:] if argv is None else argv)
    if args.devices is not None:
        os.environ["KRISP_TPU_DEVICES"] = str(args.devices)
    sort_np = args.sort_np       # None = heuristic; an explicit 1 forces
                                 # a serial native core

    # Fast path: eligible extract+sort configurations run on the
    # host-vectorized or device packed-key engine (identical output bytes;
    # the content probe falls back to the exact string pipeline for
    # IUPAC/RNA/case cases).  Stdin cannot be re-read after a probe, so it
    # always takes the string path.
    if args.file != "-":
        from ..kstream_device import device_plan
        from ..kstream_fast import run_fast_kstream
        engine = os.environ.get("KRISP_TPU_KSTREAM_ENGINE", args.engine)
        plan = device_plan(kmers=args.kmers, complements=args.complements,
                           canonicals=args.canonicals, allow=args.allow,
                           disallow=args.disallow,
                           omitsoft=args.omit_softmask,
                           mapsoft=args.map_softmask,
                           expandiupac=args.expand_iupac, split=args.split,
                           sort=args.sort, sortcols=args.sort_cols)
        if plan is None and args.sort and not (args.sort_cols
                or args.split or args.expand_iupac
                or args.allow is not None) and args.disallow is not None \
                and set(args.disallow) == {"N", "n"} \
                and isinstance(args.kmers, list) and len(args.kmers) > 1 \
                and all(1 <= k <= 64 for k in args.kmers) \
                and engine in ("auto", "host"):
            # multi-k sorted jobs: native per-k tables + lexicographic
            # merge (byte-identical to the string pipeline, which remains
            # the fallback when the probe or budget declines).  A forced
            # non-host --engine skips this host-native path.
            from ..kstream_vec import run_multi_k_kstream
            mode = ("canonicals" if args.canonicals
                    else "complements" if args.complements else "plain")
            try:
                sink = (open(args.output, "wb") if args.output is not None
                        else sys.stdout.buffer)
                try:
                    done = run_multi_k_kstream(
                        args.file, args.kmers, mode, args.omit_softmask,
                        args.map_softmask, sink, mem=args.sort_mem,
                        threads=sort_np)
                    if args.output is None:
                        sys.stdout.buffer.flush()
                finally:
                    if args.output is not None:
                        sink.close()
                if done is not None:
                    return 0
            except BrokenPipeError:
                return 0
        if plan is not None:
            try:
                if args.output is not None:
                    with open(args.output, "wb") as fout:
                        done = run_fast_kstream(args.file, plan, fout,
                                                engine=args.engine,
                                                mem=args.sort_mem,
                                                threads=sort_np)
                else:
                    done = run_fast_kstream(args.file, plan,
                                            sys.stdout.buffer,
                                            engine=args.engine,
                                            mem=args.sort_mem,
                                            threads=sort_np)
                    sys.stdout.buffer.flush()
                if done is not None:
                    return 0
            except BrokenPipeError:
                return 0
    streamer = KStream(kmers=args.kmers,
                       complements=args.complements,
                       canonicals=args.canonicals,
                       allow=args.allow,
                       disallow=args.disallow,
                       omitsoft=args.omit_softmask,
                       mapsoft=args.map_softmask,
                       expandiupac=args.expand_iupac,
                       split=args.split,
                       parallel=args.parallel,
                       sort=args.sort,
                       sortnp=args.sort_np or 1,
                       sortmem=args.sort_mem,
                       sortcols=args.sort_cols)
    try:
        if args.output is not None:
            with open(args.output, "w") as fout:
                for seq in streamer(args.file):
                    print(seq, file=fout)
        else:
            for seq in streamer(args.file):
                print(seq)
    except BrokenPipeError:
        pass
    return 0


if __name__ == "__main__":
    main()
