#!/usr/bin/env python
"""Phase-level profile of the Pallas x-drop driver on the real chip.

Reuses bench.py's synthetic workload (cached kernel shapes) but times each
phase of xdrop_pairs_pallas separately: sequence upload, window build,
kernel dispatch (device time via block_until_ready), host postprocessing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp
import numpy as np

from elba_tpu.align import xdrop_pallas as xp


def make_workload(pairs=512, read_len=4096, overlap=2048, err=0.03, k=17):
    rng = np.random.default_rng(0xBE7C)
    L = read_len
    genome = rng.integers(0, 4, pairs * (read_len - overlap) + read_len + 64,
                          dtype=np.uint8)

    def noisy(seg):
        m = rng.random(len(seg)) < err
        out = seg.copy()
        out[m] = (out[m] + rng.integers(1, 4, m.sum())) % 4
        return out

    q = np.zeros((pairs, L), np.int8)
    t = np.zeros((pairs, L), np.int8)
    for i in range(pairs):
        a = i * (read_len - overlap)
        q[i] = noisy(genome[a:a + read_len])
        t[i] = noisy(genome[a + (read_len - overlap):a + 2 * read_len - overlap])
    lens = np.full(pairs, read_len, np.int32)
    bq = np.full(pairs, read_len - overlap + 64, np.int32)
    bt = np.full(pairs, 64, np.int32)
    for i in range(pairs):
        t[i, bt[i]:bt[i] + k] = q[i, bq[i]:bq[i] + k]
    return q, t, lens, bq, bt, k


def main():
    q, t, lens, bq, bt, k = make_workload()
    # warm (compile everything once)
    t0 = time.time()
    xp.xdrop_pairs_pallas(q, t, lens, lens, bq, bt, k, 1, -1, -1, 15)
    print(f"warm call: {time.time()-t0:.3f}s")

    # phase timing via monkey-patched instrumentation
    times = {}

    orig_rounds = xp.xdrop_extend_items_rounds
    orig_bw = None

    def timed_rounds(params, qw, tw, st_in, interpret=False):
        jax.block_until_ready((qw, tw, st_in))
        t0 = time.time()
        out = orig_rounds(params, qw, tw, st_in, interpret)
        jax.block_until_ready(out)
        times.setdefault("kernel", []).append(time.time() - t0)
        return out

    xp.xdrop_extend_items_rounds = timed_rounds
    try:
        for rep in range(3):
            times.clear()
            t0 = time.time()
            res = xp.xdrop_pairs_pallas(q, t, lens, lens, bq, bt,
                                        k, 1, -1, -1, 15)
            total = time.time() - t0
            ker = sum(times.get("kernel", []))
            nrounds = len(times.get("kernel", []))
            print(f"rep{rep}: total={total:.3f}s kernel={ker:.3f}s "
                  f"({nrounds} rounds) other={total-ker:.3f}s "
                  f"pairs/s={512/total:.1f} "
                  f"kernel-only pairs/s={512/ker:.1f}")
    finally:
        xp.xdrop_extend_items_rounds = orig_rounds


if __name__ == "__main__":
    main()
