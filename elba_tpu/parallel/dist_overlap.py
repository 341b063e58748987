"""Distributed overlap detection: the full SPMD pipeline step over a 2D mesh.

One jitted shard_map program per step, covering the reference's phases
(SURVEY.md section 3.1) with mesh collectives:

  1. local canonical k-mer extraction (each device owns a 1D read shard,
     flat row-major device order = the reference's FastaIndex partition)
  2. k-mer exchange to hash owners      -- lax.all_to_all over ("r","c")
     (reference: KmerOps ALLTOALLV, KmerOps.cpp:117-151)
  3. exact local counting + reliable filter (sort + segment counts)
  4. shared-seed pair expansion (SharedSeeds semiring products)
  5. pair routing to 2D block owners    -- second all_to_all
     (reference: SUMMA SpGEMM redistribution, SharedSeeds.cpp:7)
  6. read replication: row block = all_gather(axis="c"), column block =
     all_gather(axis="r") (reference: DistributedFastaData exchange,
     DistributedFastaData.cpp:98-216)
  7. local batched X-drop alignment over owned pairs
  8. global stats via psum

All shapes are static; capacities are config knobs (the TPU analogue of
the reference's MAX_ALLTOALL_MEM batching, KmerOps.hpp:10-12).  Overflowing
a capacity drops entries and is reported in the returned stats so callers
can re-run with bigger capacities (exact sizing pass planned).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..align.xdrop_jax import _xdrop_one_pair
from ..kmers.extract import extract_canonical_kmers

SENTINEL = jnp.uint64(0xFFFFFFFFFFFFFFFF)
MIX = jnp.uint64(0x9E3779B97F4A7C15)


@dataclasses.dataclass(frozen=True)
class DistOverlapConfig:
    reads_per_shard: int      # Rb: reads owned by each device
    max_read_len: int         # L (padded)
    k: int = 17
    lower: int = 2
    upper: int = 8
    mat: int = 1
    mis: int = -1
    gap: int = -1
    xdrop: int = 15
    band: int = 64
    kmer_cap: int = 256       # per-destination k-mer exchange capacity
    pair_cap: int = 256       # per-destination pair exchange capacity
    align_cap: int = 64       # aligned pairs per device per step
    align_in_step: bool = True  # False: emit candidates only; the caller
    #                             aligns them with the fused Pallas kernel
    #                             (the LOGAN-role fast path on real TPU)


def _stable_sort3(km, rid, pos):
    """Sort instances by (kmer, readid, pos) with three stable passes so
    the result is mesh-layout independent."""
    o = jnp.argsort(pos, stable=True)
    km, rid, pos = km[o], rid[o], pos[o]
    o = jnp.argsort(rid, stable=True)
    km, rid, pos = km[o], rid[o], pos[o]
    o = jnp.argsort(km, stable=True)
    return km[o], rid[o], pos[o]


def _bucketize(owner, valid, payloads, nbuckets: int, cap: int, fills):
    """Scatter elements into [nbuckets, cap] slots by owner; overflow and
    invalid elements are dropped.  Returns (outs, dropped_count)."""
    n = owner.shape[0]
    owner = jnp.where(valid, owner, nbuckets)
    order = jnp.argsort(owner, stable=True)
    so = owner[order]
    idx = jnp.arange(n, dtype=jnp.int64)
    is_start = jnp.concatenate([jnp.ones(1, bool), so[1:] != so[:-1]])
    start_of_group = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, 0))
    rank = idx - start_of_group
    ok = (so < nbuckets) & (rank < cap)
    flat_idx = jnp.where(ok, so * cap + rank, nbuckets * cap)
    outs = []
    for pay, fill in zip(payloads, fills):
        buf = jnp.full((nbuckets * cap,), fill, dtype=pay.dtype)
        buf = buf.at[flat_idx].set(pay[order], mode="drop")
        outs.append(buf.reshape(nbuckets, cap))
    dropped = jnp.sum((so < nbuckets) & (rank >= cap))
    return outs, dropped


def build_distributed_overlap_step(mesh: Mesh, cfg: DistOverlapConfig):
    """Returns a jitted function (codes, lengths) -> stats/result dict.

    codes:   uint8[(pr*pc)*Rb, L]  sharded over both mesh axes (axis 0)
    lengths: int32[(pr*pc)*Rb]     likewise
    """
    if cfg.k > 32:
        raise ValueError(
            "the distributed overlap step packs k-mers into one uint64 "
            f"(k <= 32); got k={cfg.k}.  The single-device pipeline "
            "supports k < 96 (kmers/count.py multi-word path).")
    pr, pc = mesh.devices.shape
    nproc = pr * pc
    Rb = cfg.reads_per_shard
    nreads = nproc * Rb
    axes = ("r", "c")

    def step(codes, lengths):
        # --- 1. local extraction -------------------------------------------
        r_idx = jax.lax.axis_index("r")
        c_idx = jax.lax.axis_index("c")
        me = r_idx * pc + c_idx
        base = (me * Rb).astype(jnp.int64)

        canon, valid = extract_canonical_kmers(codes, lengths, cfg.k)
        W = canon.shape[1]
        km = canon.reshape(-1)
        vmask = valid.reshape(-1)
        rid = (base + jnp.repeat(jnp.arange(Rb, dtype=jnp.int64), W))
        pos = jnp.tile(jnp.arange(W, dtype=jnp.int32), Rb)

        # --- 2. exchange to hash owners ------------------------------------
        owner = ((km * MIX) % jnp.uint64(nproc)).astype(jnp.int64)
        (km_s, rid_s, pos_s), drop1 = _bucketize(
            owner, vmask, [km, rid.astype(jnp.int64), pos],
            nproc, cfg.kmer_cap,
            [SENTINEL, jnp.int64(-1), jnp.int32(-1)])
        km_r = jax.lax.all_to_all(km_s, axes, 0, 0, tiled=True)
        rid_r = jax.lax.all_to_all(rid_s, axes, 0, 0, tiled=True)
        pos_r = jax.lax.all_to_all(pos_s, axes, 0, 0, tiled=True)

        # --- 3. exact counting ---------------------------------------------
        kmf = km_r.reshape(-1)
        ridf = rid_r.reshape(-1)
        posf = pos_r.reshape(-1)
        kmf, ridf, posf = _stable_sort3(kmf, ridf, posf)
        n = kmf.shape[0]
        idx = jnp.arange(n, dtype=jnp.int64)
        b = jnp.concatenate([jnp.ones(1, bool), kmf[1:] != kmf[:-1]])
        gid = jnp.cumsum(b.astype(jnp.int64)) - 1
        cnt_per_g = jax.ops.segment_sum(
            jnp.ones(n, jnp.int64), gid, num_segments=n)
        cnt = cnt_per_g[gid]
        reliable = (kmf != SENTINEL) & (cnt >= cfg.lower) & (cnt <= cfg.upper)

        # --- 4. pair expansion (SharedSeeds products, a < b in group) ------
        pq_list, pt_list, q_list, t_list, pv_list, km_list = \
            [], [], [], [], [], []
        for o in range(1, cfg.upper):
            j = jnp.minimum(idx + o, n - 1)
            same = (kmf[j] == kmf) & (idx + o < n) & reliable
            q = ridf
            t = ridf[j]
            ok = same & (q != t)
            # orient q < t (instances are readid-sorted within a kmer, so
            # the earlier instance belongs to the smaller read)
            qq = jnp.minimum(q, t)
            tt = jnp.maximum(q, t)
            pq = jnp.where(q <= t, posf, posf[j])
            pt = jnp.where(q <= t, posf[j], posf)
            q_list.append(qq)
            t_list.append(tt)
            pq_list.append(pq)
            pt_list.append(pt)
            pv_list.append(ok)
            km_list.append(kmf)
        q = jnp.concatenate(q_list)
        t = jnp.concatenate(t_list)
        pq = jnp.concatenate(pq_list)
        pt = jnp.concatenate(pt_list)
        pvalid = jnp.concatenate(pv_list)
        pkm = jnp.concatenate(km_list)

        # --- 5. route pairs to 2D block owners -----------------------------
        rb = q // (Rb * pc)               # mesh row that replicates q
        cb = (t // Rb) % pc               # mesh column that replicates t
        pair_dst = rb * pc + cb
        (q_s, t_s, pq_s, pt_s, km_s2), drop2 = _bucketize(
            pair_dst, pvalid,
            [q, t, pq.astype(jnp.int32), pt.astype(jnp.int32), pkm],
            nproc, cfg.pair_cap,
            [jnp.int64(-1), jnp.int64(-1), jnp.int32(-1), jnp.int32(-1),
             SENTINEL])
        q_r = jax.lax.all_to_all(q_s, axes, 0, 0, tiled=True).reshape(-1)
        t_r = jax.lax.all_to_all(t_s, axes, 0, 0, tiled=True).reshape(-1)
        pq_r = jax.lax.all_to_all(pq_s, axes, 0, 0, tiled=True).reshape(-1)
        pt_r = jax.lax.all_to_all(pt_s, axes, 0, 0, tiled=True).reshape(-1)
        km_r2 = jax.lax.all_to_all(km_s2, axes, 0, 0, tiled=True).reshape(-1)
        has_pair = q_r >= 0

        # --- 6. B-shard assembly (SharedSeeds add) -------------------------
        # canonical merge order (kmer, posQ, posT) within each (q, t) group
        # makes seed choice identical to the single-device path and
        # independent of the mesh layout
        key = jnp.where(has_pair, q_r * nreads + t_r, jnp.int64(2**62))
        # one variadic 4-key sort = lexicographic (key, km, posQ, posT)
        # with (q, t) riding as payloads (successive argsort+gather
        # passes cost ~3x a carried sort each on v5e, CLAUDE.md)
        key, km_r2, pqb, ptb, qb_, tb_ = jax.lax.sort(
            (key, km_r2, pq_r, pt_r, q_r, t_r), num_keys=4,
            is_stable=True)
        np_ = key.shape[0]
        pb = jnp.concatenate([jnp.ones(1, bool), key[1:] != key[:-1]])
        pgid = jnp.cumsum(pb.astype(jnp.int64)) - 1
        shared = jax.ops.segment_sum(
            jnp.ones(np_, jnp.int64), pgid, num_segments=np_)[pgid]
        is_head = pb & (key < 2**62) & (shared >= 2)
        is_tail = jnp.concatenate([pb[1:], jnp.ones(1, bool)]) & \
            (key < 2**62) & (shared >= 2)
        # fold-last seed (SharedSeeds add keeps first + last in merge order)
        seed1Q = jax.ops.segment_max(
            jnp.where(is_tail, pqb, -1), pgid, num_segments=np_)[pgid]
        seed1T = jax.ops.segment_max(
            jnp.where(is_tail, ptb, -1), pgid, num_segments=np_)[pgid]

        # --- 7. sequence replication + local alignment ---------------------
        rowbuf = jax.lax.all_gather(codes, "c", axis=0, tiled=True)
        colbuf = jax.lax.all_gather(codes, "r", axis=0, tiled=True)
        rowlens = jax.lax.all_gather(lengths, "c", axis=0, tiled=True)
        collens = jax.lax.all_gather(lengths, "r", axis=0, tiled=True)

        # compact candidate heads to the front, take align_cap of them
        comp = jnp.argsort(~is_head, stable=True)[: cfg.align_cap]
        asel = is_head[comp]
        aq = qb_[comp]
        at = tb_[comp]
        apq = pqb[comp]
        apt = ptb[comp]

        ql = jnp.clip(aq - r_idx.astype(jnp.int64) * (Rb * pc), 0,
                      Rb * pc - 1)
        tl = jnp.clip((at // (Rb * pc)) * Rb + at % Rb, 0, Rb * pr - 1)
        qcodes = rowbuf[ql]
        tcodes = colbuf[tl]
        qlen = rowlens[ql].astype(jnp.int32)
        tlen = collens[tl].astype(jnp.int32)

        if cfg.align_in_step:
            # chunked vmap: one whole-align_cap vmap materializes
            # [align_cap, band, L]-class DP temporaries per shard — at
            # E. coli scale on an 8-shard CPU-emulation host that peaked
            # 83 GB RSS and drew the OOM killer.  lax.map over fixed
            # chunks serializes the temporaries (identical results, peak
            # divided by align_cap/chunk); on-TPU meshes this path is
            # unused (use_pallas_align aligns out-of-step).
            chunk = 512 if cfg.align_cap % 512 == 0 else cfg.align_cap
            nch = cfg.align_cap // chunk

            def _one_chunk(args):
                a, bb, c_, d, e, f = args
                return jax.vmap(
                    lambda a1, b1, c1, d1, e1, f1: _xdrop_one_pair(
                        a1, b1, c1, d1, e1, f1, cfg.k, cfg.mat, cfg.mis,
                        cfg.gap, cfg.xdrop, cfg.band))(a, bb, c_, d, e, f)

            def _ch(x):
                return x.reshape((nch, chunk) + x.shape[1:])

            res = jax.lax.map(_one_chunk, (
                _ch(qcodes.astype(jnp.int8)), _ch(tcodes.astype(jnp.int8)),
                _ch(qlen), _ch(tlen), _ch(apq), _ch(apt)))
            res = {kk: v.reshape((cfg.align_cap,) + v.shape[2:])
                   for kk, v in res.items()}
        else:
            # candidates only: the caller runs the fused Pallas kernel
            # over the emitted (q, t, seed) list per shard
            z = jnp.zeros(cfg.align_cap, jnp.int32)
            res = dict(score=z, begQ=z, endQ=z, begT=z, endT=z,
                       rc=jnp.zeros(cfg.align_cap, bool),
                       overflow=jnp.zeros(cfg.align_cap, bool))
        score = jnp.where(asel, res["score"], -1)
        align_truncated = jnp.maximum(jnp.sum(is_head) - cfg.align_cap, 0)

        # --- 8. global statistics ------------------------------------------
        stats = dict(
            candidate_pairs=jax.lax.psum(jnp.sum(is_head), axes),
            shared_products=jax.lax.psum(jnp.sum(pvalid), axes),
            reliable_instances=jax.lax.psum(jnp.sum(reliable), axes),
            aligned=jax.lax.psum(jnp.sum(score > 0), axes),
            total_score=jax.lax.psum(
                jnp.sum(jnp.where(score > 0, score, 0)), axes),
            dropped_kmers=jax.lax.psum(drop1, axes),
            dropped_pairs=jax.lax.psum(drop2, axes),
            align_truncated=jax.lax.psum(align_truncated, axes),
        )
        local = dict(q=aq, t=at, score=score, rc=res["rc"],
                     begQ=res["begQ"], endQ=res["endQ"],
                     begT=res["begT"], endT=res["endT"], valid=asel,
                     overflow=res["overflow"],
                     seedQ=apq, seedT=apt,
                     numshared=shared[comp].astype(jnp.int32),
                     seed1Q=seed1Q[comp].astype(jnp.int32),
                     seed1T=seed1T[comp].astype(jnp.int32))
        return stats, local

    spec_in = P(("r", "c"))
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(spec_in, spec_in),
        out_specs=(P(), P(("r", "c"))),
        check_vma=False)
    return jax.jit(fn)
