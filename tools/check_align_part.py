#!/usr/bin/env python
"""Mid-run alignment exactness checker for a staged ladder rung.

Loads a completed alignment checkpoint (R_part_*.npz) from a
`run_ladder.py --staged` stage dir, re-runs a sample of its pairs
through the integer-exact CPU oracle (align/xdrop_ref.py — the
executable spec the Pallas kernels must match bit-for-bit), and compares
every field.  Use it minutes into a multi-hour align stage instead of
waiting for the stage's own end-of-stage seed_fail guard — it caught
the int32 code-offset wrap that silently zeroed every pair past
2.147 Gbp (see stage_align), and round 4's rice rung is the first
production run of the uint32-offset path past 8.6 Gbp.

  python tools/check_align_part.py /tmp/elba_rice.stage.k31L15U35x15 \
      /tmp/elba_rice.fa [--part 0] [--sample 16] [--k 31] [--xdrop 15]

Exit code 0 = all sampled fields bit-identical; 1 = mismatch (prints
the first offender).  Host-only (pins the CPU backend).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stagedir")
    ap.add_argument("fasta")
    ap.add_argument("--part", type=int, default=0,
                    help="checkpoint start offset (R_part_{N}.npz)")
    ap.add_argument("--sample", type=int, default=16)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--mat", type=int, default=1)
    ap.add_argument("--mis", type=int, default=-1)
    ap.add_argument("--gap", type=int, default=-1)
    ap.add_argument("--xdrop", type=int, default=15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from elba_tpu.dseq.dna import load_fasta
    from elba_tpu.align.xdrop_ref import xdrop_align_ref

    part = np.load(os.path.join(args.stagedir, f"R_part_{args.part}.npz"))
    B = np.load(os.path.join(args.stagedir, "B.npz"))
    qi, ti = B["q"].astype(np.int64), B["t"].astype(np.int64)
    sel = qi < ti
    qi, ti = qi[sel], ti[sel]
    seedQ = B["seedQ0"][sel].astype(np.int32)
    seedT = B["seedT0"][sel].astype(np.int32)

    n = len(part["score"])
    lo = args.part
    rng = np.random.default_rng(args.seed)
    idx = np.sort(rng.choice(n, size=min(args.sample, n), replace=False))

    readset = load_fasta(args.fasta)
    s0 = readset.start_id
    fields = ("score", "begQ", "endQ", "begT", "endT", "rc")
    bad = 0
    neg = int(np.sum(part["score"] < 0))
    for i in idx:
        g = lo + int(i)
        q, t = int(qi[g] - s0), int(ti[g] - s0)
        ref = xdrop_align_ref(readset.read_codes(q), readset.read_codes(t),
                              int(seedQ[g]), int(seedT[g]), args.k,
                              args.mat, args.mis, args.gap, args.xdrop)
        got = {f: part[f][i] for f in fields}
        for f in fields:
            if int(got[f]) != int(ref[f]):
                bad += 1
                print(f"MISMATCH pair {g} (q={q} t={t}) field {f}: "
                      f"device={got[f]} oracle={ref[f]}\n"
                      f"  device={got} oracle={ref}")
                break
    print(json.dumps(dict(metric="align_part_exactness",
                          part=args.part, pairs_in_part=n,
                          sampled=len(idx), mismatches=bad,
                          negative_scores_in_part=neg,
                          exact=bad == 0)))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
