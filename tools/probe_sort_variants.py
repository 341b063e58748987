#!/usr/bin/env python
"""Microbench the counting pass's candidate primitive rewrites at real
ladder sizes, on the live backend (run on the chip when it is free).

Variants probed (all at the chunk-sort shape and the final-merge shape):

  A. current chunk compaction: 1-key sort on uint64 k-mer, 2 payloads
  B. dead-key compaction: 1-key sort on uint8 deadness, 3 payloads
     (km demoted to payload; final merge sort is stable so tie order is
     unchanged -- candidate replacement)
  C. current reliable-count: segment_sum + [gid] gather
  D. scan reliable-count: two associative scans (cummax of head index
     forward / min of next-head backward), no segment op, no gather

Prints one JSON line with per-variant seconds per call (best of 3).
"""

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    outs = fn(*args)
    for o in (outs if isinstance(outs, tuple) else (outs,)):
        o.block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        outs = fn(*args)
        for o in (outs if isinstance(outs, tuple) else (outs,)):
            o.block_until_ready()
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=33_423_360,
                    help="chunk-sort slots (default: 4096 rows x 8160)")
    ap.add_argument("--merge", type=int, default=128 * 1024 * 1024,
                    help="final-merge slots (default: 128M)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    n = args.chunk
    rng = np.random.default_rng(0)
    km_h = rng.integers(0, 1 << 62, n, dtype=np.uint64)
    dead_h = (rng.random(n) < 0.97)          # ~1/37 live, as at the rung
    km_h[dead_h] = np.uint64(0xFFFFFFFFFFFFFFFF)
    km = jnp.asarray(km_h)
    dead = jnp.asarray(dead_h, dtype=jnp.uint8)
    rid = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)

    res = {}

    @jax.jit
    def var_a(km, rid, pos):
        return jax.lax.sort((km, rid, pos), num_keys=1, is_stable=True)

    @jax.jit
    def var_b(dead, km, rid, pos):
        return jax.lax.sort((dead, km, rid, pos), num_keys=1,
                            is_stable=True)

    res["chunk_sort_u64key_s"] = round(timeit(var_a, km, rid, pos), 3)
    res["chunk_sort_deadkey_s"] = round(timeit(var_b, dead, km, rid, pos), 3)

    # ---- reliable-count variants at the final-merge shape ----
    m = args.merge
    groups = np.sort(rng.integers(0, m // 20, m).astype(np.int64))
    kmm = jnp.asarray(groups.astype(np.uint64))

    @jax.jit
    def var_c(kmm):
        nloc = kmm.shape[0]
        bound = jnp.concatenate([jnp.ones(1, bool), kmm[1:] != kmm[:-1]])
        gid = jnp.cumsum(bound.astype(jnp.int32)) - 1
        cnt = jax.ops.segment_sum(jnp.ones(nloc, jnp.int32), gid,
                                  num_segments=nloc)[gid]
        return cnt

    @jax.jit
    def var_d(kmm):
        nloc = kmm.shape[0]
        bound = jnp.concatenate([jnp.ones(1, bool), kmm[1:] != kmm[:-1]])
        idx = jnp.arange(nloc, dtype=jnp.int32)
        start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(bound, idx, -1))
        # next head strictly after slot i (or n): reverse min-scan of
        # "i+1 if bound[i+1] else n"
        after = jax.lax.associative_scan(
            jnp.minimum,
            jnp.where(jnp.concatenate([bound[1:], jnp.ones(1, bool)]),
                      idx + 1, nloc), reverse=True)
        return after - start

    res["count_segsum_gather_s"] = round(timeit(var_c, kmm), 3)
    res["count_two_scans_s"] = round(timeit(var_d, kmm), 3)
    # exactness cross-check on a small prefix
    small = kmm[: 1 << 20]
    ok = bool(jnp.all(var_c(small) == var_d(small)))
    res["count_variants_equal"] = ok

    res["chunk_slots"] = n
    res["merge_slots"] = m
    print(json.dumps(dict(metric="sort_variant_probe", **res)))


if __name__ == "__main__":
    main()
