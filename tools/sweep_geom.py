#!/usr/bin/env python
"""On-chip throughput sweep over x-drop kernel geometries.

Narrow-VMEM Mosaic kernels compile in seconds (CLAUDE.md), so geometry
variants can be measured directly: each candidate runs the bench fixture
through the fused device driver and reports pairs/s + exactness vs the
oracle on a sample.  One JSON line per candidate.

  python tools/sweep_geom.py                 # default candidate set
  python tools/sweep_geom.py --pairs 2048 --batch 512
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--read-len", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated candidate names to run")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import numpy as np

    import bench
    from elba_tpu.align.xdrop_device_geom import GeomDeviceAligner
    from elba_tpu.align.xdrop_geom import Geometry
    from elba_tpu.align.xdrop_tr import TrGeometry
    from elba_tpu.align.xdrop_ref import xdrop_align_ref

    rs, qi, ti, bq, bt, q, t = bench.make_xdrop_fixture(
        pairs=args.pairs, read_len=args.read_len)

    candidates = [
        ("narrow", Geometry()),
        ("narrow-u32", Geometry(unroll=32)),
        ("narrow-s32", Geometry(sub=32)),
        ("narrow-s32-u32", Geometry(sub=32, unroll=32)),
        ("narrow-rb10", Geometry(refetch_batch=10)),
        ("narrow-t512", Geometry(twr=512)),
        ("wide-v4", Geometry(bandw=128, wwin=256, twr=640)),
        ("tr", TrGeometry()),
        ("tr-u32", TrGeometry(unroll=32)),
        ("tr-u8", TrGeometry(unroll=8)),
        ("tr-rb32", TrGeometry(refetch_batch=32)),
        ("tr-w48", TrGeometry(wwin=48, bandw=24)),
        ("tr-trr256", TrGeometry(trr=256)),
        ("tr-u32-rb32", TrGeometry(unroll=32, refetch_batch=32)),
        ("tr-u64", TrGeometry(unroll=64)),
        ("tr-u32-rb8", TrGeometry(unroll=32, refetch_batch=8)),
        ("tr-u128", TrGeometry(unroll=128)),
        ("tr-u64-rb32", TrGeometry(unroll=64, refetch_batch=32)),
        ("tr-u64-rb64", TrGeometry(unroll=64, refetch_batch=64)),
        # narrower bands/windows: every [wwin, 128] substep op shrinks
        # proportionally; bandw=24 still covers the p99=18-lane band at
        # x=15 (overflows escalate to WIDE), bandw=16 tests the edge
        ("tr-w48-u64", TrGeometry(wwin=48, bandw=24, unroll=64)),
        ("tr-w48-u96", TrGeometry(wwin=48, bandw=24, unroll=96)),
        ("tr-w48-u128", TrGeometry(wwin=48, bandw=24, unroll=128)),
        ("tr-w32-u64", TrGeometry(wwin=32, bandw=16, unroll=64)),
        # smaller target register: the per-antidiagonal treg roll moves
        # trr sublanes; cheaper roll vs more frequent refetches
        ("tr-trr128-u64", TrGeometry(trr=128, unroll=64)),
        ("tr-w48-trr128-u64", TrGeometry(wwin=48, bandw=24, trr=128,
                                         unroll=64)),
        ("tr-w48-trr96-u64", TrGeometry(wwin=48, bandw=24, trr=96,
                                        unroll=64)),
    ]
    if args.only:
        names = set(args.only.split(","))
        candidates = [c for c in candidates if c[0] in names]
    for name, g in candidates:
        try:
            al = GeomDeviceAligner(batch=args.batch, primary=g)
            t0 = time.time()
            res = al(rs, qi, ti, bq, bt, 17, 1, -1, -1, 15)
            first = time.time() - t0
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.time()
                res = al(rs, qi, ti, bq, bt, 17, 1, -1, -1, 15)
                best = min(best, time.time() - t0)
            exact = True
            for i in np.linspace(0, args.pairs - 1, 32).astype(int):
                ref = xdrop_align_ref(q[i], t[i], int(bq[i]), int(bt[i]),
                                      17, 1, -1, -1, 15)
                for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
                    if int(res[f][i]) != int(ref[f]):
                        exact = False
            print(json.dumps(dict(
                geom=name, pairs_per_sec=round(args.pairs / best, 1),
                seconds=round(best, 4), first_call_s=round(first, 1),
                exact=exact, **al.last_stats)), flush=True)
        except Exception as e:
            print(json.dumps(dict(geom=name, error=repr(e)[:200])),
                  flush=True)


if __name__ == "__main__":
    main()
