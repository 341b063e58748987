"""Command-line interface: `elba-tpu [options] <reads.fa>`.

Mirrors the reference CLI (main.cpp:348-359): -x xdrop, -A match,
-B mismatch penalty, -G gap penalty, -c bad read cutoff, -o prefix; plus
runtime -k/-l/-u replacing the reference's compile-time KMER_SIZE /
LOWER_KMER_FREQ / UPPER_KMER_FREQ.
"""

from __future__ import annotations

import argparse
import sys

from .params import PipelineParams
from .pipeline import run_pipeline


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="elba-tpu",
        description="TPU-native distributed long-read assembler")
    d = PipelineParams()
    p.add_argument("fasta", help="input reads FASTA (requires .fai index)")
    p.add_argument("-x", type=int, default=d.xdrop,
                   help=f"x-drop alignment threshold [{d.xdrop}]")
    p.add_argument("-A", type=int, default=d.mat,
                   help=f"matching score [{d.mat}]")
    p.add_argument("-B", type=int, default=-d.mis,
                   help=f"mismatch penalty [{-d.mis}]")
    p.add_argument("-G", type=int, default=-d.gap,
                   help=f"gap penalty [{-d.gap}]")
    p.add_argument("-c", type=float, default=d.bad_read_cutoff,
                   help=f"bad read alignment cutoff [{d.bad_read_cutoff}]")
    p.add_argument("-o", type=str, default=d.output_prefix,
                   help=f"output file name prefix [{d.output_prefix}]")
    p.add_argument("-k", type=int, default=d.k,
                   help=f"k-mer size, odd, < 96 [{d.k}]")
    p.add_argument("--cpu", action="store_true",
                   help="pin the JAX platform to CPU (the container "
                        "otherwise force-selects the TPU backend)")
    p.add_argument("-l", type=int, default=d.lower_freq,
                   help=f"lower reliable k-mer frequency [{d.lower_freq}]")
    p.add_argument("-u", type=int, default=d.upper_freq,
                   help=f"upper reliable k-mer frequency [{d.upper_freq}]")
    p.add_argument("--log-level", type=int, default=1,
                   help="1=phases, 2=+kmer histogram and B dump, 3=+A dump "
                        "(mirrors the reference LOG_LEVEL)")
    p.add_argument("--count-parts", type=int, default=0,
                   help="multi-pass counting with N k-mer value ranges "
                        "(0 = auto by HBM footprint on TPU)")
    p.add_argument("--count-group", type=int, default=2,
                   help="count parts filled per read sweep (HBM holds N "
                        "part buffers at once) [2]")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    params = PipelineParams(
        k=args.k, lower_freq=args.l, upper_freq=args.u,
        mat=args.A, mis=-args.B, gap=-args.G, xdrop=args.x,
        bad_read_cutoff=args.c, output_prefix=args.o)
    run_pipeline(args.fasta, params, log_level=args.log_level,
                 count_parts=args.count_parts,
                 count_group=args.count_group)
    return 0


if __name__ == "__main__":
    sys.exit(main())
