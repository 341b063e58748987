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

import jax

# the sitecustomize imports jax before this file runs, so the env var alone
# is not seen at import time; the config route works post-import.  NB: with
# no compilation cache configured the executable-dispatch path is ~3x
# slower per call on the tunneled backend, so this is a perf setting too.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np


def make_xdrop_fixture(pairs=2048, read_len=4096, overlap=2048, err=0.03,
                       k=17):
    """The bench read set: `pairs` overlapping read pairs with an exact
    seed planted inside the overlap.  Shared by the bench and the
    kernel pre-compile tool (tools/precompile_geom.py) so both produce
    identical program shapes."""
    from elba_tpu.dseq.dna import ReadSet

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
    # seed inside the overlap region
    bq = np.full(pairs, read_len - overlap + 64, np.int32)
    bt = np.full(pairs, 64, np.int32)
    # make the seed window exact so alignment happens
    for i in range(pairs):
        t[i, bt[i]:bt[i] + k] = q[i, bq[i]:bq[i] + k]

    # interleave q/t into one flat-code read set (reads 2i / 2i+1)
    codes = np.empty((2 * pairs, L), np.uint8)
    codes[0::2] = q
    codes[1::2] = t
    codes = codes.reshape(-1)
    lengths = np.full(2 * pairs, L, np.int64)
    offsets = (np.arange(2 * pairs, dtype=np.int64) * L)
    rs = ReadSet(codes=codes, offsets=offsets, lengths=lengths,
                 names=[f"r{i}" for i in range(2 * pairs)], start_id=0)
    qi = np.arange(0, 2 * pairs, 2, dtype=np.int32)
    ti = np.arange(1, 2 * pairs, 2, dtype=np.int32)
    return rs, qi, ti, bq, bt, q, t


def get_bench_aligner(batch):
    """Aligner under test: the production block-addressed driver by
    default (what the ladder's align stage runs since the rice rung
    exposed the geom driver's 2^31-byte addressing cap);
    ELBA_BENCH_ALIGNER selects earlier generations for comparison
    sweeps."""
    kind = os.environ.get("ELBA_BENCH_ALIGNER", "blocks")
    if kind == "v3":
        from elba_tpu.align.xdrop_device import get_device_aligner
        return get_device_aligner(batch=batch), kind
    if kind == "v4":
        from elba_tpu.align.xdrop_device_geom import GeomDeviceAligner
        from elba_tpu.align.xdrop_geom import NARROW
        return GeomDeviceAligner(batch=batch, primary=NARROW), kind
    if kind == "geom":
        from elba_tpu.align.xdrop_device_geom import get_device_aligner_geom
        return get_device_aligner_geom(batch=batch), kind
    from elba_tpu.align.xdrop_device_blocks import get_device_aligner_blocks
    return get_device_aligner_blocks(batch=batch), kind


def bench_xdrop(pairs=2048, batch=512, read_len=4096, overlap=2048,
                err=0.03, band=128, k=17):
    """Headline: the device-resident single-dispatch driver
    (align/xdrop_device_geom.py) — read set uploaded once, window build +
    Pallas kernel + continuation rounds fused into one jitted program per
    batch.  pairs > batch so the measurement covers the pipelined steady
    state (the driver dispatches every batch before fetching any result,
    so host prep of batch N+1 overlaps device execution of batch N)."""

    rs, qi, ti, bq, bt, q, t = make_xdrop_fixture(pairs, read_len, overlap,
                                                  err, k)
    aligner, aligner_kind = get_bench_aligner(batch)

    t0 = time.time()
    res = aligner(rs, qi, ti, bq, bt, k, 1, -1, -1, 15)
    compile_s = time.time() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = aligner(rs, qi, ti, bq, bt, k, 1, -1, -1, 15)
        best = min(best, time.time() - t0)
    nscored = int((np.asarray(res["score"]) > 0).sum())

    # on-device exactness regression: a sample of the real-chip Pallas
    # results must match the integer oracle field-for-field every bench run
    # (the reference's semantic-checker ethos, test.py:1-66); one silent
    # Mosaic lowering change would otherwise corrupt every alignment while
    # the throughput number still looks great
    from elba_tpu.align.xdrop_ref import xdrop_align_ref
    sample = np.linspace(0, pairs - 1, 64).astype(int)
    exact = True
    for i in sample:
        ref = xdrop_align_ref(q[i], t[i], int(bq[i]), int(bt[i]),
                              k, 1, -1, -1, 15)
        for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
            if int(res[f][i]) != int(ref[f]):
                exact = False
    info = dict(pairs=pairs, batch=batch, read_len=read_len,
                seconds=round(best, 4),
                compile_seconds=round(compile_s, 1),
                scored=nscored, exact=exact, aligner=aligner_kind)
    info.update(getattr(aligner, "last_stats", {}))
    return pairs / best, info


def bench_blocks_exact(pairs=128, read_len=4096, overlap=2048, err=0.03,
                       k=17):
    """On-chip exactness of the BLOCK-addressed driver
    (align/xdrop_device_blocks.py, the 17.2 Gbp-cap replacement): a
    small blk_bytes forces the fixture's reads across multiple packed
    blocks, so the real-chip run exercises the (block, byte-in-block)
    addressing, block-edge margins, and cross-round refetches — not
    just the nblk=1 degenerate case.  Every pair is checked against the
    integer oracle field-for-field."""
    from elba_tpu.align.xdrop_device_blocks import BlockDeviceAligner
    from elba_tpu.align.xdrop_ref import xdrop_align_ref

    rs, qi, ti, bq, bt, q, t = make_xdrop_fixture(pairs, read_len, overlap,
                                                  err, k)
    # 2^16-byte blocks = 262k bases: ~30 read pairs per block here
    al = BlockDeviceAligner(batch=pairs, blk_bytes=1 << 16)
    t0 = time.time()
    res = al(rs, qi, ti, bq, bt, k, 1, -1, -1, 15)
    dt = time.time() - t0
    nblk = int(al._dev["offBlk"].max()) + 1
    exact = True
    for i in range(pairs):
        ref = xdrop_align_ref(q[i], t[i], int(bq[i]), int(bt[i]),
                              k, 1, -1, -1, 15)
        for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
            if int(res[f][i]) != int(ref[f]):
                exact = False
    info = dict(al.last_stats)
    info.update(pairs=pairs, blocks=nblk, exact=exact,
                seconds=round(dt, 3))
    return exact, info


def bench_spgemm():
    """SharedSeeds SpGEMM (B = A A^T) pure device time: one jitted program
    (chunked expand + sort-merge reduce, seedmat_device.py) over a
    coverage-structured synthetic A.  Reads live in overlap windows of 16
    so pairs repeat across k-mers like genomic data; the read-id space is
    far beyond the old n^2 < 2^31 cap.  Inputs are uploaded once; the timed
    region is the single device dispatch; only scalar stats come back."""
    import jax
    from elba_tpu.dsparse.seedmat_device import (_spgemm_device,
                                                 upload_kmer_matrix)
    from elba_tpu.kmers.count import KmerMatrix

    rng = np.random.default_rng(3)
    n_reads, n_kmers, copies, win = 200_000, 400_000, 8, 16
    nwin = n_reads // win
    wstart = (rng.integers(0, nwin, n_kmers) * win)
    cols = np.repeat(np.arange(n_kmers), copies)
    rows = (np.repeat(wstart, copies)
            + rng.integers(0, win, n_kmers * copies))
    pos = rng.integers(0, 1 << 14, len(cols)).astype(np.int32)
    order = np.lexsort((pos, rows, cols))
    A = KmerMatrix(rows=rows[order].astype(np.int64),
                   cols=cols[order].astype(np.int64),
                   pos=pos[order], kmers=np.arange(n_kmers, dtype=np.uint64),
                   num_reads=n_reads, num_kmers=n_kmers)

    # span = 2*upper-1 = 15 product slots per instance: 2M instances/chunk
    # = ~31M-slot merge sorts, the sweet spot from the sort microbench
    dev, total, upper, chunk_inst = upload_kmer_matrix(
        A, chunk_inst=1 << 21)
    out_cap = 1 << 23
    from elba_tpu.dsparse.seedmat_device import _pend_cap_for
    span = 2 * upper - 1
    nchunks = -(-A.nnz // chunk_inst)
    args = (dev["rows"], dev["pos"], dev["gid"], dev["total_inst"])
    kw = dict(chunk_inst=chunk_inst, out_cap=out_cap,
              pend_cap=_pend_cap_for(out_cap, chunk_inst * span,
                                     chunk_inst, nchunks),
              min_shared=2, full=True, upper=upper)
    res = _spgemm_device(*args, **kw)            # compile + run
    jax.block_until_ready(res["t"])
    stats = {k: int(v) for k, v in res["stats"].items()}
    assert stats["overflow"] == 0, stats
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = _spgemm_device(*args, **kw)
        jax.block_until_ready(res["t"])          # result stays on device
        best = min(best, time.time() - t0)
    # the ladder's perf path skips the fold-last-seed payload (consumers
    # read only seeds[0], like the reference aligner)
    kw1 = dict(kw, two_seeds=False)
    res = _spgemm_device(*args, **kw1)
    jax.block_until_ready(res["t"])
    best1 = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = _spgemm_device(*args, **kw1)
        jax.block_until_ready(res["t"])
        best1 = min(best1, time.time() - t0)
    nnz = stats["nnz"]
    return nnz / best, dict(input_nnz=A.nnz, output_nnz=nnz,
                            distinct_pairs=stats["pairs"],
                            products=total,
                            products_per_sec=round(total / best),
                            seconds=round(best, 3),
                            products_per_sec_one_seed=round(total / best1),
                            seconds_one_seed=round(best1, 3))


def bench_e2e():
    # run in a CPU-pinned subprocess: the e2e fixture has 19kb reads whose
    # kernel shape bucket is expensive to compile on-device, and a crashed
    # TPU worker must not take down the headline metric
    import subprocess
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import json, time\n"
        "from elba_tpu.params import PipelineParams\n"
        "from elba_tpu.pipeline import run_pipeline\n"
        "p = PipelineParams(k=17, lower_freq=2, upper_freq=8, xdrop=5,\n"
        "                   output_prefix='/tmp/elba_bench')\n"
        "t0 = time.time()\n"
        "r = run_pipeline('/root/reference/reads.fa', p, log=None)\n"
        "print(json.dumps(dict(dt=time.time()-t0, reads=len(r.readset),\n"
        "      alignments=r.R.nnz, string_edges=r.S.nnz,\n"
        "      contigs=len(r.contigs))))\n")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    info = json.loads(out.stdout.strip().splitlines()[-1])
    dt = info.pop("dt")
    return dt, info


def main():
    extra = {}
    pairs_per_sec, info = bench_xdrop()
    extra["xdrop"] = info
    try:
        blocks_ok, binfo = bench_blocks_exact()
        extra["blocks_exact"] = blocks_ok
        extra["blocks"] = binfo
    except Exception as e:  # never lose the headline metric
        extra["blocks_error"] = str(e)
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
        "exact": extra.get("xdrop", {}).get("exact", False),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
