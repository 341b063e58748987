#!/usr/bin/env python
"""Workload-ladder runner: E. coli-30X-scale synthetic assembly end to end.

The reference's ladder rung (README.md:106-110, corigpu-job-ecoli.sh):
E. coli ~4.6Mb, ~17k reads, k=31, L=2/U=8, xdrop=15.  This tool simulates
that scale with the in-repo oracle (tools/simulate.py), runs the full
pipeline (on the TPU backend the alignment runs the fused Pallas kernel),
and reports wall, phase breakdown, and assembly quality vs the known
genome.

Two execution modes:

* default: one in-process `run_pipeline` call (fine on CPU or a stable
  backend).
* `--staged`: each device-heavy phase (counting+SpGEMM, alignment) runs in
  its OWN subprocess with artifacts checkpointed to {prefix}.stage/, and
  the orchestrator retries a phase when the tunneled TPU worker crashes
  mid-run (observed repeatedly at this scale).  Alignment additionally
  checkpoints every --align-ckpt pairs so a crash resumes mid-phase.
  Artifacts double as restartable stage outputs (the reference's
  equivalent is rerunning from its .mtx/.paf dumps).

Usage:
  python tools/run_ladder.py [--genome 4600000] [--reads 17250]
                             [--read-len 8000] [--err 0.005] [--cpu]
                             [--staged] [--retries 4]
Prints one JSON line at the end; paste the markdown row into BASELINE.md.
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
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
    ap.add_argument("--staged", action="store_true")
    ap.add_argument("--stage", choices=["count", "align", "graph"],
                    default=None, help="internal: run one stage")
    ap.add_argument("--retries", type=int, default=4)
    ap.add_argument("--stage-timeout", type=int, default=6 * 3600,
                    help="kill + retry a stage subprocess after this many "
                         "seconds (the tunnel's remote leg can hang "
                         "forever; a killed stage resumes from its "
                         "checkpoints)")
    ap.add_argument("--stall-timeout", type=int, default=2100,
                    help="kill + retry a stage subprocess that prints "
                         "NOTHING for this many seconds: the tunnel "
                         "connection dies under sustained load (~every "
                         "2.2-2.5h observed) leaving the stage hung on a "
                         "dead connection while a fresh process sees a "
                         "healthy device.  Must exceed the longest silent "
                         "remote compile (~25 min observed for giant sort "
                         "shapes) or a cold-cache stage gets kill-looped")
    ap.add_argument("--align-ckpt", type=int, default=65536)
    ap.add_argument("--count-parts", type=int, default=0,
                    help="force multi-pass counting with N k-mer value "
                         "ranges (0 = auto by HBM footprint)")
    ap.add_argument("--count-group", type=int, default=1,
                    help="grouped mode only: share one read sweep across "
                         "N consecutive count parts "
                         "(kmers/count_grouped.py); N part buffers live "
                         "in HBM at once, so N*cap*16B must fit beside "
                         "the read array (1 = one sweep per part)")
    ap.add_argument("--count-mode", default="auto",
                    choices=["auto", "tokens", "grouped", "chunked"],
                    help="multi-pass counting variant: token sweeps "
                         "(near-linear, kmers/count_tokens.py), grouped "
                         "fills, or one range per sweep; auto = tokens")
    ap.add_argument("--token-budget", type=int, default=2_500_000_000,
                    help="token-sweep mode: HBM bytes for the token "
                         "buffer (sizes ranges-per-sweep)")
    ap.add_argument("--spgemm-slots", type=int, default=1 << 25,
                    help="per-chunk product-slot budget for the count-"
                         "stage SpGEMM; shrink (e.g. 1<<22) when a "
                         "large resident word array leaves little HBM "
                         "for the flush merge (human-10X)")
    ap.add_argument("--spgemm-pend", type=int, default=0,
                    help="explicit pending-buffer slots for the count-"
                         "stage SpGEMM (0 = auto ~2x out_cap); shrink "
                         "with --spgemm-slots when HBM is tight")
    ap.add_argument("--b-cap", type=int, default=0,
                    help="explicit B-accumulator capacity (pairs); "
                         "0 = 1.4x the reads*coverage model.  The "
                         "model is accurate to ~2% on every rung so "
                         "far, so ~1.1x is enough when HBM is tight")
    ap.add_argument("--count-budget", type=int, default=58_000_000,
                    help="per-part instance budget for auto-sized "
                         "multi-pass counting; the part buffer cap is "
                         "1.05*budget + 34M slots.  Shrink below the "
                         "58M default when the resident read words eat "
                         "the HBM the part buffers need (human-10X: "
                         "words alone are 7.75 GB of 16)")
    return ap.parse_args(argv)


def _jax_setup(args):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    return jax


def _params(args):
    from elba_tpu.params import PipelineParams
    return PipelineParams(k=args.k, lower_freq=args.lower,
                          upper_freq=args.upper,
                          xdrop=args.xdrop, output_prefix=args.prefix)


def _stagedir(args):
    # keyed by the parameters that shape the artifacts: a rerun with a
    # different reliable band / k / xdrop must NOT reuse a stale B.npz or
    # R parts (observed: a U=8 B.npz silently poisoning a U=35 rerun).
    # Stage subprocesses get every CLI flag forwarded, so they compute
    # the same key as the orchestrator.
    key = f"k{args.k}L{args.lower}U{args.upper}x{args.xdrop}"
    d = f"{args.prefix}.stage.{key}"
    os.makedirs(d, exist_ok=True)
    return d


def ensure_fixture(args):
    from tools.simulate import simulate
    t0 = time.time()
    if not os.path.exists(args.prefix + ".fa"):
        simulate(args.prefix, genome_len=args.genome, nreads=args.reads,
                 read_len=args.read_len, error=args.err, seed=30)
    else:
        # same footgun as stale stage artifacts: a leftover fixture from
        # a DIFFERENT workload under the same prefix must fail loudly
        with open(args.prefix + ".fa.fai") as f:
            n = sum(1 for _ in f)
        assert n == args.reads, (
            f"fixture {args.prefix}.fa has {n} reads, args ask for "
            f"{args.reads}; delete it or change --prefix")
    return time.time() - t0


# ---------------- stages (each runs in its own subprocess) ----------------


def stage_count(args):
    """Counting + SharedSeeds SpGEMM on device; saves B triples."""
    jax = _jax_setup(args)
    from elba_tpu.dseq.dna import load_fasta
    from elba_tpu.kmers.count_device import count_device_raw
    from elba_tpu.dsparse.seedmat_device import (spgemm_from_device_count,
                                                 device_result_to_host)

    params = _params(args)
    d = _stagedir(args)
    t0 = time.time()
    readset = load_fasta(args.prefix + ".fa")
    t_load = time.time() - t0

    # single-shot counting sorts R*W instance slots at ~32B/slot peak
    # (double-buffered variadic sort); past ~2*10^8 slots that blows the
    # v5e's 16GB HBM, so switch to the multi-pass counter (one k-mer
    # value range per pass, same bits out)
    n = len(readset)
    L = 1 << max(int(np.ceil(np.log2(max(readset.max_length,
                                         params.k + 1)))), 0)
    Rpad = max(-(-n // 1024) * 1024, 8)
    slots = Rpad * L
    total_inst = int(np.maximum(
        readset.lengths.astype(np.int64) - (params.k - 1), 0).sum())
    parts = args.count_parts
    if parts == 0 and slots > 220_000_000:
        # Fixed per-part budget of 58M instances.  parts =
        # ceil(total/budget) makes every auto-sized part's fill <= budget
        # BY CONSTRUCTION (inverse-CDF boundaries equalize expected load),
        # so the buffer cap only needs ~5% skew slack plus the 34M-slot
        # append window — NOT the old 1.6x slack, which sized cap to
        # 61<<21 (128M) and put 4 grouped buffers at 8.2GB: with the
        # resident packed reads (1.6GB), fill temporaries (~2.5GB) and
        # the cross-part SpGEMM accumulator, chr1-scale sweeps OOMed the
        # 16GB HBM (measured 2026-08-18).  The tighter cap (~95M) also
        # halves the SpGEMM relayout pad (2^27 vs 2^28 slots).
        # One SHARED cap shape for every auto-sized rung: the finalize /
        # fallback / SpGEMM-relayout programs are keyed by the part
        # buffer shape, so a fixed cap means later rungs reuse the
        # compilation cache instead of paying ~10 min of fresh remote
        # compiles each.  (Compile-helper bound: sorts past ~130M slots
        # OOM the remote compile host — 95M is well inside.)
        budget = args.count_budget
        cap_target = -(-(budget * 105 // 100 + 34_000_000) // 1024) * 1024
        parts = max(2, -(-total_inst // budget))
        count_cap = cap_target
    else:
        count_cap = 0
    if params.k > 32:
        # device counting packs one uint64 word (k <= 32); k in 33..95
        # counts on the host (native C++ multi-word counter) and feeds
        # the device SpGEMM
        from elba_tpu.kmers.count import build_kmer_matrix
        from elba_tpu.dsparse.seedmat_device import build_seed_matrix_device
        print(f"[stage count] k={params.k} > 32: host native counting + "
              f"device SpGEMM", flush=True)
        t0 = time.time()
        A = build_kmer_matrix(readset, params.k, params.lower_freq,
                              params.upper_freq)
        nk, nnz = A.num_kmers, len(A.rows)
        t_count = time.time() - t0
        print(f"[stage count] A: {nk} reliable k-mers, {nnz} instances "
              f"({t_count:.1f}s)", flush=True)
        t0 = time.time()
        bres, _ = build_seed_matrix_device(A, min_shared=2, full=False,
                                           stage_chunks=4,
                                           upper=params.upper_freq)
        host = device_result_to_host(bres, min_shared=2)
        t_spgemm = time.time() - t0
        print(f"[stage count] B: {len(host['q'])} candidate pairs "
              f"({t_spgemm:.1f}s)", flush=True)
        np.savez(os.path.join(d, "B.npz"), **host)
        with open(os.path.join(d, "count.json"), "w") as f:
            json.dump(dict(load_fasta=t_load, kmer_matrix=t_count,
                           seed_matrix=t_spgemm, n_kmers=int(nk),
                           a_nnz=int(nnz), b_nnz=len(host["q"])), f)
        return

    # two_seeds=False: the alignment stage reads only seedQ0/seedT0 (as the
    # reference aligner does, PairwiseAlignment.cpp:90), so the fold-last
    # seed payload is skipped in the multiply's hot sorts
    if parts:
        from elba_tpu.kmers.count_chunked import iter_count_parts
        from elba_tpu.dsparse.seedmat_device import spgemm_from_count_parts
        t0 = time.time()
        agg = dict(nk=0, nnz=0)

        def _sweep_log(event, **info):
            print(f"[stage count] {event}: {info}", flush=True)

        mode = args.count_mode
        if mode == "auto":
            mode = "tokens"
        ck = ck_state = None
        ck_part = ck_nk = ck_nnz = 0
        if mode == "tokens":
            from elba_tpu.kmers.count_tokens import iter_count_parts_tokens

            # the accumulator otherwise lives only on device: checkpoint
            # the flushed live prefix every few parts so a tunnel/worker
            # crash resumes mid-count instead of redoing hours (observed:
            # a dead tunnel connection at part 171/196 of the rice rung)
            ck = os.path.join(d, "count_ckpt.npz")
            if os.path.exists(ck):
                z = np.load(ck)
                ck_part, ck_nk, ck_nnz = (int(z["part"]), int(z["nk"]),
                                          int(z["nnz"]))
                ck_state = {f: z[f] for f in ("t", "q", "w", "s0", "s1")}
                ck_state["overflow"] = int(z["overflow"])
                print(f"[stage count] resuming from checkpoint: part "
                      f"{ck_part}/{parts}, {len(ck_state['t'])} pairs",
                      flush=True)

            def _iter_parts():
                return iter_count_parts_tokens(
                    readset, params.k, params.lower_freq,
                    params.upper_freq, parts=parts, cap=count_cap,
                    token_budget_bytes=args.token_budget,
                    progress=_sweep_log, start_part=ck_part,
                    nk_offset0=ck_nk)
        elif mode == "grouped" and args.count_group > 1:
            from elba_tpu.kmers.count_grouped import \
                iter_count_parts_grouped

            def _iter_parts():
                return iter_count_parts_grouped(
                    readset, params.k, params.lower_freq,
                    params.upper_freq, parts=parts, cap=count_cap,
                    group=args.count_group, progress=_sweep_log)
        else:
            def _iter_parts():
                return iter_count_parts(
                    readset, params.k, params.lower_freq,
                    params.upper_freq, parts=parts, cap=count_cap)

        cursor = dict(part=ck_part)

        def parts_fn():
            agg["nk"], agg["nnz"] = ck_nk, ck_nnz
            cursor["part"] = ck_part
            tp = time.time()
            for res in _iter_parts():
                agg["nk"] += int(res["nk"])
                agg["nnz"] += int(res["nnz"])
                cursor["part"] += 1
                print(f"[stage count] part {cursor['part']}/{parts}: "
                      f"nk={agg['nk']} nnz={agg['nnz']} "
                      f"({time.time() - tp:.1f}s)", flush=True)
                tp = time.time()
                yield res

        def _save_ck(consumed, host):
            t0 = time.time()
            np.savez(ck + ".tmp.npz", part=cursor["part"],
                     nk=agg["nk"], nnz=agg["nnz"], **host)
            os.replace(ck + ".tmp.npz", ck)
            print(f"[stage count] checkpoint at part {cursor['part']}: "
                  f"{len(host['t'])} pairs "
                  f"({time.time() - t0:.1f}s)", flush=True)

        # B-accumulator capacity from the validated pair model
        # (B nnz ~= reads * coverage: cel30 11.19M actual vs 11.25M
        # predicted, E. coli-30X 514k vs 517k).  Undersizing forces a
        # doubled-cap retry that re-runs counting parts — hours at giant
        # rungs — so pre-size with 40% headroom once the 16.7M default
        # stops covering the model; the flush merge scales with the
        # capacity, so don't oversize either.
        print(f"[stage count] multi-pass counting: {parts} parts, "
              f"{total_inst} raw instances", flush=True)
        total_bases = int(np.asarray(readset.lengths, np.int64).sum())
        expected_pairs = int(len(readset) * total_bases / max(args.genome, 1))
        b_cap = 0
        if expected_pairs * 14 // 10 > (1 << 24):
            b_cap = -(-(expected_pairs * 14 // 10) // 1024) * 1024
        if args.b_cap:
            b_cap = args.b_cap
        resume = None
        mult_path = os.path.join(d, "count_bcap_mult")
        if ck is not None:
            # resume needs a deterministic explicit capacity; a persisted
            # multiplier doubles it across restarts if it ever overflows
            # (the checkpoint prefix itself is capacity-independent)
            mult = (int(open(mult_path).read())
                    if os.path.exists(mult_path) else 1)
            b_cap = max(b_cap, 1 << 24) * mult
            resume = dict(state=ck_state, every=16, save=_save_ck)
        try:
            bres = spgemm_from_count_parts(parts_fn, params.upper_freq,
                                           min_shared=2, full=False,
                                           out_cap=b_cap,
                                           stage_chunks=4, two_seeds=False,
                                           resume=resume,
                                           ci_slots=args.spgemm_slots,
                                           pend_slots=args.spgemm_pend)
        except RuntimeError as e:
            # only a B-accumulator overflow warrants doubling the
            # persisted capacity multiplier; any other device
            # RuntimeError (count-part rerun requests, tunnel faults)
            # must not inflate every future flush's merge sort
            if ck is not None and "overflow" in str(e):
                with open(mult_path, "w") as f:
                    f.write(str(mult * 2))
            raise
        if ck is not None:
            for p in (ck, mult_path):
                if os.path.exists(p):
                    os.remove(p)
        nk, nnz = agg["nk"], agg["nnz"]
        t_count = 0.0  # interleaved with the multiply; reported there
    else:
        t0 = time.time()
        count_res = count_device_raw(readset, params.k, params.lower_freq,
                                     params.upper_freq)
        nk, nnz = int(count_res["nk"]), int(count_res["nnz"])
        t_count = time.time() - t0
        print(f"[stage count] A: {nk} reliable k-mers, {nnz} instances "
              f"({t_count:.1f}s)", flush=True)

        t0 = time.time()
        # staged dispatches: each remote execution stays short (long single
        # executions through the tunnel are crash-prone at this scale)
        bres = spgemm_from_device_count(count_res, params.upper_freq,
                                        min_shared=2, full=False,
                                        stage_chunks=4, two_seeds=False)
    host = device_result_to_host(bres, min_shared=2)
    t_spgemm = time.time() - t0
    print(f"[stage count] B: {len(host['q'])} candidate pairs "
          f"({t_spgemm:.1f}s)", flush=True)
    np.savez(os.path.join(d, "B.npz"), **host)
    with open(os.path.join(d, "count.json"), "w") as f:
        json.dump(dict(load_fasta=t_load, kmer_matrix=t_count,
                       seed_matrix=t_spgemm, n_kmers=nk, a_nnz=nnz,
                       b_nnz=len(host["q"])), f)


def stage_align(args):
    """Checkpointed alignment of B's pairs with the device aligner."""
    jax = _jax_setup(args)
    from elba_tpu.dseq.dna import load_fasta
    # block-addressed driver: the uint32-byte-offset geom driver mis-
    # addresses reads past byte offset 2^31 (8.6 Gbp) on chip — first
    # crossed at the rice rung, where garbage windows sent ~half of all
    # pairs through band-overflow escalation into the host oracle
    # (~100x the align wall).  Block addressing keeps every index int32.
    from elba_tpu.align.xdrop_device_blocks import \
            get_device_aligner_blocks as get_device_aligner
    from elba_tpu.align.xdrop_jax import align_batch_jax

    params = _params(args)
    d = _stagedir(args)
    B = np.load(os.path.join(d, "B.npz"))
    qi, ti = B["q"].astype(np.int64), B["t"].astype(np.int64)
    sel = qi < ti
    qi, ti = qi[sel], ti[sel]
    seedQ = B["seedQ0"][sel].astype(np.int32)
    seedT = B["seedT0"][sel].astype(np.int32)
    n = len(qi)

    readset = load_fasta(args.prefix + ".fa")
    on_tpu = jax.default_backend() != "cpu"
    print(f"[stage align] backend={jax.default_backend()} pairs={n}",
          flush=True)
    if not on_tpu and not args.cpu and n > 1_000_000:
        # a transient tunnel/device init failure silently falls back to
        # the CPU kernel (~43 pairs/s — observed at the rice rung: 11
        # DAYS for 42.5M pairs).  Fail loudly instead; the orchestrator
        # retries and the next attempt re-probes the device.
        raise RuntimeError(
            f"align stage got backend=cpu for {n} pairs on a TPU rung; "
            "refusing the silent CPU fallback")
    aligner = (get_device_aligner(batch=args.align_batch) if on_tpu
               else align_batch_jax)

    fields = ("score", "begQ", "endQ", "begT", "endT", "rc")
    t0 = time.time()
    done_parts = 0
    for lo in range(0, n, args.align_ckpt):
        part = os.path.join(d, f"R_part_{lo}.npz")
        if os.path.exists(part):
            done_parts += 1
            continue
        hi = min(lo + args.align_ckpt, n)
        res = aligner(readset, qi[lo:hi], ti[lo:hi], seedQ[lo:hi],
                      seedT[lo:hi], params.k, params.mat, params.mis,
                      params.gap, params.xdrop)
        np.savez(part, **{f: np.asarray(res[f]) for f in fields})
        print(f"[stage align] {hi}/{n} pairs "
              f"({(hi - lo) / max(time.time() - t0, 1e-9):.0f} pairs/s "
              f"this run) {getattr(aligner, 'last_stats', {})}",
              flush=True)
        t0 = time.time()

    # assemble parts into one R.npz
    out = {f: [] for f in fields}
    for lo in range(0, n, args.align_ckpt):
        part = np.load(os.path.join(d, f"R_part_{lo}.npz"))
        for f in fields:
            out[f].append(part[f])
    merged = {f: np.concatenate(out[f]) if out[f] else np.empty(0)
              for f in fields}
    np.savez(os.path.join(d, "R.npz"), q=qi, t=ti, seedQ=seedQ,
             seedT=seedT, **merged)
    # seeds come from exact k-mer matches, so a failed seed check
    # (score == -1) means an aligner-side bug -- the int32 code-offset
    # wrap silently failed EVERY pair past 2.147 Gbp until this stat
    # existed.  Scream if more than a trace fails.
    seed_fail = int(np.sum(merged["score"] < 0)) if n else 0
    if seed_fail > max(64, n // 10000):
        print(f"[stage align] WARNING: {seed_fail}/{n} pairs failed the "
              "seed check -- aligner bug?", flush=True)
    with open(os.path.join(d, "align.json"), "w") as f:
        json.dump(dict(pairs=n, resumed_parts=done_parts,
                       seed_fail=seed_fail), f)


def stage_graph(args):
    """Host graph phase from the saved alignment results + eval."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from elba_tpu.dseq.dna import load_fasta
    from elba_tpu.align.classify import classify_and_fill
    from elba_tpu.dsparse.coo import COOMatrix
    from elba_tpu.graph.prune import prune_overlap_graph
    from elba_tpu.graph.tr import transitive_reduction
    from elba_tpu.graph.contigs import generate_contigs
    from elba_tpu.io.paf import write_paf
    from elba_tpu.io.fasta_out import write_contigs_fasta
    from tools.eval_assembly import evaluate

    steps = {}

    def _step(name, fn):
        t0 = time.time()
        out = fn()
        steps[name] = round(time.time() - t0, 2)
        print(f"[stage graph] {name}: {steps[name]}s", flush=True)
        return out

    params = _params(args)
    d = _stagedir(args)
    R_ = _step("load_R", lambda: np.load(os.path.join(d, "R.npz")))
    readset = _step("load_fasta", lambda: load_fasta(args.prefix + ".fa"))

    t0 = time.time()
    qi = R_["q"].astype(np.int64)
    ti = R_["t"].astype(np.int64)
    lenQ = readset.lengths[qi - readset.start_id].astype(np.int32)
    lenT = readset.lengths[ti - readset.start_id].astype(np.int32)

    def _classify():
        vals = classify_and_fill(R_["score"], R_["begQ"], R_["endQ"],
                                 R_["begT"], R_["endT"], R_["rc"],
                                 lenQ, lenT)
        vals["seedQ"] = R_["seedQ"].astype(np.int32)
        vals["seedT"] = R_["seedT"].astype(np.int32)
        return vals

    vals = _step("classify", _classify)
    n = len(readset)
    R = _step("R_sort", lambda: COOMatrix(rows=qi, cols=ti, vals=vals,
                                          shape=(n, n)).sorted())
    _step("overlap_paf", lambda: write_paf(
        R, readset.names, params.output_prefix + ".overlap.paf"))
    Rp = _step("prune", lambda: prune_overlap_graph(
        R, params.bad_read_cutoff))
    S = _step("tr", lambda: transitive_reduction(Rp))
    _step("string_paf", lambda: write_paf(
        S, readset.names, params.output_prefix + ".string.paf"))
    contigs = _step("contigs", lambda: generate_contigs(S, readset))
    _step("contigs_fa", lambda: write_contigs_fasta(
        contigs, params.output_prefix + ".contigs.fa"))
    t_graph = time.time() - t0

    stats = _step("eval", lambda: evaluate(
        params.output_prefix + ".contigs.fa",
        args.prefix + ".genome.fa", k=31))
    with open(os.path.join(d, "graph.json"), "w") as f:
        json.dump(dict(graph_seconds=t_graph, alignments=int(R.nnz),
                       string_edges=int(S.nnz), contigs=len(contigs),
                       genome_fraction=float(stats["genome_fraction"]),
                       n50=int(stats["n50"]), steps=steps), f)


def _run_stage_watched(cmd, stage_timeout, stall_timeout):
    """Run one stage subprocess with a stall watchdog.

    Round-3 failure mode: the tunnel connection dies under sustained
    load and the stage process hangs FOREVER on its dead connection
    (no output, no exit) while a fresh process would see a healthy
    device.  The old flat `subprocess.run(timeout=...)` only noticed
    after the full stage timeout (hours).  Here the child's output is
    tee'd through a pipe; silence past `stall_timeout` (or total wall
    past `stage_timeout`) kills the EXACT process group we spawned
    (never a pattern kill) and the caller retries — the stage resumes
    from its checkpoints.  Returns the exit code, or "stalled" /
    "timeout".
    """
    import signal
    import threading

    env = dict(os.environ, PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            start_new_session=True, env=env)
    last = [time.time()]

    def _pump():
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            last[0] = time.time()

    th = threading.Thread(target=_pump, daemon=True)
    th.start()

    def _kill(why):
        print(f"[orchestrate] watchdog: {why}; killing stage pgid "
              f"{proc.pid}", flush=True)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        proc.wait()

    t0 = time.time()
    while True:
        rc = proc.poll()
        if rc is not None:
            th.join(timeout=30)
            return rc
        now = time.time()
        if now - t0 > stage_timeout:
            _kill(f"stage exceeded {stage_timeout}s wall")
            return "timeout"
        if now - last[0] > stall_timeout:
            _kill(f"no output for {stall_timeout}s (dead tunnel "
                  "connection?)")
            return "stalled"
        time.sleep(5)


def orchestrate(args):
    """Run stages as subprocesses; retry on TPU worker crashes."""
    sim_s = ensure_fixture(args)
    d = _stagedir(args)
    base = [sys.executable, os.path.abspath(__file__)]
    fwd = []
    for k, v in vars(args).items():
        if k in ("staged", "stage", "retries", "stage_timeout"):
            continue
        flag = "--" + k.replace("_", "-")
        if isinstance(v, bool):
            if v:
                fwd.append(flag)
        elif v is not None:
            fwd += [flag, str(v)]

    wall0 = time.time()
    times = {}
    for stage, artifact in (("count", "B.npz"), ("align", "R.npz"),
                            ("graph", "graph.json")):
        if os.path.exists(os.path.join(d, artifact)) and stage != "graph":
            print(f"[orchestrate] {stage}: artifact exists, skipping",
                  flush=True)
            continue
        t0 = time.time()
        for attempt in range(args.retries):
            rc = _run_stage_watched(base + fwd + ["--stage", stage],
                                    args.stage_timeout, args.stall_timeout)
            if rc == 0:
                break
            wait = 90 * (attempt + 1)
            print(f"[orchestrate] stage {stage} failed "
                  f"(rc={rc}, attempt {attempt + 1}/"
                  f"{args.retries}); retrying in {wait}s", flush=True)
            time.sleep(wait)
        else:
            raise RuntimeError(f"stage {stage} failed after "
                               f"{args.retries} attempts")
        times[stage] = round(time.time() - t0, 1)

    phases = {}
    for name in ("count", "align", "graph"):
        p = os.path.join(d, name + ".json")
        if os.path.exists(p):
            with open(p) as f:
                phases[name] = json.load(f)
    g = phases.get("graph", {})
    out = dict(metric="ladder_e2e_seconds",
               value=round(time.time() - wall0, 1), unit="s",
               reads=args.reads, genome=args.genome,
               alignments=g.get("alignments"),
               string_edges=g.get("string_edges"),
               contigs=g.get("contigs"),
               genome_fraction=g.get("genome_fraction"),
               n50=g.get("n50"),
               stage_walls=times, phases=phases,
               sim_seconds=round(sim_s, 1), staged=True)
    print(json.dumps(out))


def main():
    # kill -USR1 <pid> dumps every thread's Python stack to stderr (the
    # orchestrator tees it into the run log): the only way to see WHERE
    # a silent stage is spinning — no py-spy/gdb in this container
    import faulthandler
    import signal as _signal
    faulthandler.register(_signal.SIGUSR1, all_threads=True)
    args = parse_args()
    if args.stage:
        {"count": stage_count, "align": stage_align,
         "graph": stage_graph}[args.stage](args)
        return
    if args.staged:
        orchestrate(args)
        return

    jax = _jax_setup(args)
    from elba_tpu.pipeline import run_pipeline
    from tools.eval_assembly import evaluate

    sim_s = ensure_fixture(args)
    params = _params(args)

    aligner = None
    if not args.cpu and jax.default_backend() != "cpu":
        # block-addressed production driver (no 2^31-byte resident cap;
        # same escalation ladder and exactness as the geom driver)
        from elba_tpu.align.xdrop_device_blocks import \
            get_device_aligner_blocks as get_device_aligner
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
