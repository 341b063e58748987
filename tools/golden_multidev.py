#!/usr/bin/env python
"""Multi-device golden run: distributed pipeline vs single-device pipeline.

The TPU equivalent of the reference's `runtests.sh`, which diffs the full
binary output at np=1/4/9/16 on its E. coli sample: here the distributed
SPMD pipeline (run_multihost_pipeline over an N-virtual-device CPU mesh,
on-mesh graph phases, ordered writes) must produce the SAME overlap PAF,
string PAF, and contig set as the serial host pipeline (run_pipeline).

Usage:
  # the reference's own 227-read E. coli sample, mesh sizes 1/4/8:
  python tools/golden_multidev.py --fasta /root/reference/reads.fa

  # a synthetic rung at real scale (slow on CPU; alignment runs in-step
  # with the vmapped XLA kernel):
  python tools/golden_multidev.py --genome 4600000 --reads 17250 \
      --read-len 8000 --ndev 8

Prints one JSON line per mesh size with match verdicts; exit code 0 iff
every diff matches.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def read_lines(path):
    with open(path) as f:
        return sorted(line for line in f if line.strip())


def read_contig_seqs(path):
    """Contig sequences as a canonical multiset (a contig may legally be
    emitted reverse-complemented depending on chain-walk direction)."""
    comp = str.maketrans("ACGT", "TGCA")
    seqs = []
    cur = []
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    return sorted(min(s, s.translate(comp)[::-1]) for s in seqs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fasta", help="existing read FASTA (e.g. the "
                                    "reference's 227-read sample)")
    ap.add_argument("--genome", type=int, default=0,
                    help="synthesize a fixture of this genome size")
    ap.add_argument("--reads", type=int, default=0)
    ap.add_argument("--read-len", type=int, default=8000)
    ap.add_argument("--err", type=float, default=0.005)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--lower", type=int, default=2)
    ap.add_argument("--upper", type=int, default=8)
    ap.add_argument("--xdrop", type=int, default=5)
    ap.add_argument("--ndev", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--prefix", default="/tmp/elba_golden")
    ap.add_argument("--reuse-single", action="store_true",
                    help="skip the serial run if its outputs exist "
                         "(rerunning only the mesh side after an XLA "
                         "CPU rendezvous starvation crash)")
    args = ap.parse_args()

    from elba_tpu.dseq.multihost import run_multihost_pipeline
    from elba_tpu.params import PipelineParams
    from elba_tpu.parallel.mesh import make_mesh2d
    from elba_tpu.pipeline import run_pipeline

    fasta = args.fasta
    if not fasta:
        assert args.genome and args.reads, "--fasta or --genome/--reads"
        from tools.simulate import simulate
        fasta = args.prefix + ".fa"
        if not os.path.exists(fasta):
            simulate(args.prefix, genome_len=args.genome,
                     nreads=args.reads, read_len=args.read_len,
                     error=args.err, seed=30)

    def params_for(prefix):
        return PipelineParams(k=args.k, lower_freq=args.lower,
                              upper_freq=args.upper, xdrop=args.xdrop,
                              output_prefix=prefix)

    # serial host pipeline = the golden
    single_done = all(
        os.path.exists(f"{args.prefix}_single.{sfx}")
        for sfx in ("overlap.paf", "string.paf", "contigs.fa"))
    if args.reuse_single and single_done:
        print(json.dumps(dict(run="single", reused=True)), flush=True)
    else:
        t0 = time.time()
        run_pipeline(fasta, params_for(args.prefix + "_single"), log=None)
        t_single = time.time() - t0
        print(json.dumps(dict(run="single", seconds=round(t_single, 1))),
              flush=True)

    ok_all = True
    for nd in args.ndev:
        mesh = make_mesh2d(devices=jax.devices()[:nd])
        pre = f"{args.prefix}_nd{nd}"
        t0 = time.time()
        run_multihost_pipeline(fasta, params_for(pre), process_index=0,
                               process_count=1, mesh=mesh)
        dt = time.time() - t0
        res = dict(run=f"ndev{nd}", seconds=round(dt, 1))
        for suffix, loader in (("overlap.paf", read_lines),
                               ("string.paf", read_lines),
                               ("contigs.fa", read_contig_seqs)):
            a = loader(f"{args.prefix}_single.{suffix}")
            b = loader(f"{pre}.{suffix}")
            key = suffix.split(".")[0] + "_match"
            res[key] = (a == b)
            res[suffix.split(".")[0] + "_n"] = len(b)
            ok_all &= (a == b)
        print(json.dumps(res), flush=True)

    print(json.dumps(dict(golden_ok=ok_all)))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
