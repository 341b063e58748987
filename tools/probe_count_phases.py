#!/usr/bin/env python
"""Phase-level timing probe for the device multi-pass counting +
chained SpGEMM (the ladder's count stage), to locate where the wall
goes: per-pass counting, relayout, per-stage multiply dispatches,
finalize + fetch.  Mirrors `spgemm_from_count_parts`
(dsparse/seedmat_device.py) with a `block_until_ready` at every
boundary so each phase is charged its true device time.

Usage:
  python tools/probe_count_phases.py /tmp/elba_yeast.fa \
      [--parts 7] [--k 31] [--lower 15] [--upper 35] [--stage-chunks 2]

Prints one JSON line with the breakdown.
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
    ap.add_argument("fasta")
    ap.add_argument("--parts", type=int, default=7)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--lower", type=int, default=15)
    ap.add_argument("--upper", type=int, default=35)
    ap.add_argument("--stage-chunks", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from elba_tpu.dseq.dna import load_fasta
    from elba_tpu.kmers.count_chunked import iter_count_parts
    from elba_tpu.dsparse import seedmat_device as sd

    t0 = time.time()
    readset = load_fasta(args.fasta)
    t_load = time.time() - t0

    upper = args.upper
    span = max(upper - 1, 1)
    out_cap = 1 << 24
    state = None
    pass_s, relayout_s, stage_s = [], [], []
    nk = nnz = nstages = 0

    it = iter_count_parts(readset, args.k, args.lower, upper,
                          parts=args.parts)
    while True:
        t0 = time.time()
        part = next(it, None)  # int(nk) inside forces device sync
        if part is None:
            break
        pass_s.append(round(time.time() - t0, 2))
        nk += int(part["nk"])
        nnz += int(part["nnz"])

        N = int(part["km"].shape[0])
        CI_max = max((1 << 25) // span, 1 << 18)
        CI = min(CI_max, sd._pow2(max(N, 1 << 10)))
        npad = sd._pow2(-(-N // CI) * CI + 2 * upper)
        t0 = time.time()
        rows, pos_p, gid_p = sd._relayout_from_count(
            part["rid"], part["pos"], part["rank"], part["nnz"],
            upper, npad)
        rows.block_until_ready()
        relayout_s.append(round(time.time() - t0, 2))
        if state is None:
            state = sd._empty_state(
                out_cap, sd._pend_cap_for(out_cap, CI_max * span, CI_max))
        total_inst = part["nnz"].astype(jnp.int32)
        nchunks = max(-(-int(part["nnz"]) // CI), 1)
        start = 0
        while start < nchunks:
            t0 = time.time()
            state = sd._spgemm_stage(rows, pos_p, gid_p, total_inst,
                                     jnp.int32(start), state,
                                     chunk_inst=CI, out_cap=out_cap,
                                     full=False, upper=upper,
                                     steps=args.stage_chunks,
                                     two_seeds=False)
            state[0].block_until_ready()
            stage_s.append(round(time.time() - t0, 2))
            start += args.stage_chunks
            nstages += 1
        del rows, pos_p, gid_p, part

    t0 = time.time()
    res = sd._finalize_state(state, min_shared=2, two_seeds=False)
    b_nnz = int(res["stats"]["nnz"])
    overflow = int(res["stats"]["overflow"])
    pairs = int(res["stats"]["pairs"])
    t_fin = round(time.time() - t0, 2)

    warm = stage_s[1:] if len(stage_s) > 1 else stage_s
    out = dict(
        metric="count_phase_breakdown",
        reads=len(readset), parts=args.parts, nk=nk, a_nnz=nnz,
        b_nnz=b_nnz, distinct_pairs=pairs, overflow=overflow,
        load_s=round(t_load, 2),
        pass_s=pass_s, pass_total=round(sum(pass_s), 1),
        relayout_s=relayout_s,
        stages=nstages, stage_s_first=stage_s[0] if stage_s else None,
        stage_s_mean_warm=round(sum(warm) / max(len(warm), 1), 2),
        stage_total=round(sum(stage_s), 1),
        finalize_s=t_fin,
        wall=round(sum(pass_s) + sum(relayout_s) + sum(stage_s) + t_fin, 1),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
