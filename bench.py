#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: aligned pairs/sec of the batched X-drop kernel on the real chip
(the assembler's hot kernel; reference equivalent is the LOGAN GPU x-drop
aligner the reference hooks in via submodule, .gitmodules:1-6).

Extra metrics (recorded in the JSON "extra" field): SharedSeeds SpGEMM
throughput (nnz/s) and end-to-end pipeline time on the in-repo 227-read
E. coli fixture.

vs_baseline compares against .bench_baseline.json (written on first run,
updated only manually) so the driver can track round-over-round progress.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def bench_xdrop(pairs=512, read_len=4096, overlap=2048, err=0.03,
                band=128, k=17):
    import jax
    import jax.numpy as jnp
    from elba_tpu.align.xdrop_jax import xdrop_batch

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
    # seed inside the overlap region
    bq = np.full(pairs, read_len - overlap + 64, np.int32)
    bt = np.full(pairs, 64, np.int32)
    # make the seed window exact so alignment happens
    for i in range(pairs):
        t[i, bt[i]:bt[i] + k] = q[i, bq[i]:bq[i] + k]

    args = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(lens),
            jnp.asarray(lens), jnp.asarray(bq), jnp.asarray(bt))

    t0 = time.time()
    res = xdrop_batch(*args, k, 1, -1, -1, 15, band)
    jax.block_until_ready(res)
    compile_s = time.time() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = xdrop_batch(*args, k, 1, -1, -1, 15, band)
        jax.block_until_ready(res)
        best = min(best, time.time() - t0)
    nscored = int((np.asarray(res["score"]) > 0).sum())
    return pairs / best, dict(batch=pairs, read_len=read_len,
                              seconds=round(best, 4),
                              compile_seconds=round(compile_s, 1),
                              scored=nscored)


def bench_spgemm():
    """SharedSeeds SpGEMM (B = A A^T) throughput on a synthetic A at the
    E. coli-sample scale; reports output nnz/s (host path for now)."""
    from elba_tpu.dsparse.seedmat import build_seed_matrix
    from elba_tpu.kmers.count import KmerMatrix

    rng = np.random.default_rng(3)
    n_reads, n_kmers, copies = 20000, 200000, 4
    cols = np.repeat(np.arange(n_kmers), copies)
    rows = rng.integers(0, n_reads, len(cols))
    pos = rng.integers(0, 1 << 14, len(cols)).astype(np.int32)
    order = np.lexsort((pos, rows, cols))
    A = KmerMatrix(rows=rows[order].astype(np.int64),
                   cols=cols[order].astype(np.int64),
                   pos=pos[order], kmers=np.arange(n_kmers, dtype=np.uint64),
                   num_reads=n_reads, num_kmers=n_kmers)
    t0 = time.time()
    B = build_seed_matrix(A, min_shared=2, full=True)
    dt = time.time() - t0
    return B.nnz / dt, dict(input_nnz=A.nnz, output_nnz=B.nnz,
                            seconds=round(dt, 3))


def bench_e2e():
    from elba_tpu.params import PipelineParams
    from elba_tpu.pipeline import run_pipeline
    params = PipelineParams(k=17, lower_freq=2, upper_freq=8, xdrop=5,
                            output_prefix="/tmp/elba_bench")
    t0 = time.time()
    result = run_pipeline("/root/reference/reads.fa", params, log=None)
    dt = time.time() - t0
    return dt, dict(reads=len(result.readset), alignments=result.R.nnz,
                    string_edges=result.S.nnz, contigs=len(result.contigs))


def main():
    extra = {}
    pairs_per_sec, info = bench_xdrop()
    extra["xdrop"] = info
    try:
        spgemm_nnz_s, sinfo = bench_spgemm()
        extra["spgemm_nnz_per_sec"] = round(spgemm_nnz_s)
        extra["spgemm"] = sinfo
    except Exception as e:  # never lose the headline metric
        extra["spgemm_error"] = str(e)
    try:
        e2e_s, einfo = bench_e2e()
        extra["e2e_reads_fa_seconds"] = round(e2e_s, 2)
        extra["e2e"] = einfo
    except Exception as e:
        extra["e2e_error"] = str(e)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["value"]
    else:
        base = pairs_per_sec
        with open(baseline_path, "w") as f:
            json.dump({"metric": "aligned_pairs_per_sec",
                       "value": pairs_per_sec}, f)

    print(json.dumps({
        "metric": "aligned_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / base, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
