#!/usr/bin/env python
"""Medium-scale end-to-end benchmark: simulate a 20-30x long-read dataset,
run the full pipeline (TPU alignment kernel), report phase timings and
assembly quality vs the known genome.

Usage: python tools/run_scale_bench.py [genome_kb] [coverage] [read_len]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402


def main(genome_kb=150, coverage=20, read_len=5000):
    from tools.simulate import simulate
    from tools.eval_assembly import evaluate
    from elba_tpu.params import PipelineParams
    from elba_tpu.pipeline import run_pipeline

    genome_len = genome_kb * 1000
    nreads = genome_len * coverage // read_len
    prefix = f"/tmp/elba_scale_{genome_kb}k"
    print(f"simulating {nreads} reads x {read_len}bp over {genome_kb}kb "
          f"({coverage}x), 1.5% error", flush=True)
    simulate(prefix, genome_len=genome_len, nreads=nreads,
             read_len=read_len, error=0.015, seed=1)

    params = PipelineParams(k=31, lower_freq=max(3, coverage // 4),
                            upper_freq=coverage * 2, xdrop=15,
                            output_prefix=prefix)
    t0 = time.time()
    result = run_pipeline(prefix + ".fa", params)
    wall = time.time() - t0

    stats = evaluate(prefix + ".contigs.fa", prefix + ".genome.fa", k=31)
    out = dict(wall_seconds=round(wall, 2),
               reads=nreads, genome_kb=genome_kb,
               alignments=result.R.nnz,
               string_edges=result.S.nnz,
               timings={k: round(v, 2) for k, v in result.timings.items()},
               quality=stats)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
