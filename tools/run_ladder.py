#!/usr/bin/env python
"""Workload-ladder runner: E. coli-30X-scale synthetic assembly end to end.

The reference's ladder rung (README.md:106-110, corigpu-job-ecoli.sh):
E. coli ~4.6Mb, ~17k reads, k=31, L=2/U=8, xdrop=15.  This tool simulates
that scale with the in-repo oracle (tools/simulate.py), runs the full
pipeline (on the TPU backend the alignment runs the fused Pallas kernel),
and reports wall, phase breakdown, and assembly quality vs the known
genome.

Usage:
  python tools/run_ladder.py [--genome 4600000] [--reads 17250]
                             [--read-len 8000] [--err 0.005] [--cpu]
Prints one JSON line at the end; paste the markdown row into BASELINE.md.
"""

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=4_600_000)
    ap.add_argument("--reads", type=int, default=17_250)
    ap.add_argument("--read-len", type=int, default=8_000)
    ap.add_argument("--err", type=float, default=0.005)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--xdrop", type=int, default=15)
    ap.add_argument("--upper", type=int, default=8)
    ap.add_argument("--lower", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prefix", default="/tmp/elba_ladder")
    ap.add_argument("--align-batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tools.simulate import simulate
    from tools.eval_assembly import evaluate
    from elba_tpu.params import PipelineParams
    from elba_tpu.pipeline import run_pipeline

    t0 = time.time()
    if not os.path.exists(args.prefix + ".fa"):
        simulate(args.prefix, genome_len=args.genome, nreads=args.reads,
                 read_len=args.read_len, error=args.err, seed=30)
    sim_s = time.time() - t0

    params = PipelineParams(k=args.k, lower_freq=args.lower,
                            upper_freq=args.upper,
                            xdrop=args.xdrop, output_prefix=args.prefix)

    aligner = None
    if not args.cpu and jax.default_backend() != "cpu":
        from elba_tpu.align.xdrop_device import get_device_aligner
        aligner = get_device_aligner(batch=args.align_batch)

    t0 = time.time()
    result = run_pipeline(args.prefix + ".fa", params, aligner=aligner,
                          log=lambda m: print(m, flush=True))
    wall = time.time() - t0

    stats = evaluate(args.prefix + ".contigs.fa",
                     args.prefix + ".genome.fa", k=31)
    out = dict(
        metric="ladder_e2e_seconds", value=round(wall, 1), unit="s",
        reads=len(result.readset), genome=args.genome,
        alignments=int(result.R.nnz), string_edges=int(result.S.nnz),
        contigs=len(result.contigs),
        genome_fraction=float(stats["genome_fraction"]),
        n50=int(stats["n50"]),
        phases={k: round(v, 1) for k, v in result.timings.items()},
        sim_seconds=round(sim_s, 1),
        backend=jax.default_backend(),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
