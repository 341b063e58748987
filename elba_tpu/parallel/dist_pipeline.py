"""Distributed end-to-end pipeline over a device mesh.

Runs the SPMD overlap-detection + alignment step (dist_overlap) on the
mesh, gathers the per-device results, and hands the overlap graph R to the
(host) graph phases -- with the distributed TR/CC steps available for the
heavy rounds.  The key contract, enforced by tests/test_dist_pipeline.py:
the distributed path produces the SAME overlap graph (every Overlap field,
including seed choice) as the single-device pipeline, for any mesh shape
-- the TPU equivalent of the reference's "same binary, more ranks" golden
testing (runtests.sh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..align.classify import classify_and_fill
from ..align.xdrop_ref import xdrop_align_ref
from ..dseq.dna import ReadSet
from ..dsparse.coo import COOMatrix
from ..params import PipelineParams
from .dist_overlap import DistOverlapConfig, build_distributed_overlap_step
from .mesh import make_mesh2d


def run_distributed_overlap(readset: ReadSet, params: PipelineParams,
                            mesh: Optional[Mesh] = None,
                            kmer_cap: int = 0, pair_cap: int = 0,
                            align_cap: int = 0, band: int = 128
                            ) -> COOMatrix:
    """Distributed B + alignment; returns the overlap graph R (upper
    pairs, Overlap SoA values), identical to align.pairwise_alignment."""
    if mesh is None:
        mesh = make_mesh2d()
    pr, pc = mesh.devices.shape
    nproc = pr * pc
    nreads = len(readset)
    Rb = -(-nreads // nproc)
    npad = Rb * nproc
    L = max(int(readset.max_length), params.k + 1)

    codes = np.zeros((npad, L), np.uint8)
    lengths = np.zeros(npad, np.int32)
    codes[:nreads, :] = readset.padded_codes(L)
    lengths[:nreads] = readset.lengths

    # exact two-phase sizing (the reference's counting pass, KmerOps
    # phase 1): compute per-(src, dst) message sizes on the host, then run
    # the jitted exchange with exact static capacities
    if not (kmer_cap and pair_cap and align_cap):
        from ..kmers.count import build_kmer_matrix
        from ..kmers.extract import extract_canonical_np
        from .dist_overlap import MIX as _MIX

        canon, valid = extract_canonical_np(codes, lengths, params.k)
        src_dev = np.repeat(np.arange(npad) // Rb, canon.shape[1]
                            ).reshape(npad, -1)
        owner = ((canon * np.uint64(_MIX)) % np.uint64(nproc)).astype(
            np.int64)
        cnt1 = np.zeros((nproc, nproc), np.int64)
        np.add.at(cnt1, (src_dev[valid], owner[valid]), 1)
        if kmer_cap == 0:
            kmer_cap = max(128, int(cnt1.max()))
            kmer_cap = -(-kmer_cap // 128) * 128

        A = build_kmer_matrix(readset, params.k, params.lower_freq,
                              params.upper_freq)
        # pairs per (kmer-owner src, 2D block dst); within a kmer group of
        # c instances the owner emits c*(c-1)/2 a<b pairs
        kowner = ((A.kmers * np.uint64(_MIX)) % np.uint64(nproc)).astype(
            np.int64)
        # enumerate a<b instance pairs exactly like the kernel
        from ..utils.segments import expand_cross_products
        counts = np.bincount(A.cols, minlength=A.num_kmers)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        li, ri = expand_cross_products(starts, counts)
        m = li < ri
        li, ri = li[m], ri[m]
        qv = np.minimum(A.rows[li], A.rows[ri])
        tv = np.maximum(A.rows[li], A.rows[ri])
        keepm = qv != tv
        li, qv, tv = li[keepm], qv[keepm], tv[keepm]
        dst = (qv // (Rb * pc)) * pc + (tv // Rb) % pc
        src = kowner[A.cols[li]]
        cnt2 = np.zeros((nproc, nproc), np.int64)
        np.add.at(cnt2, (src, dst), 1)
        if pair_cap == 0:
            pair_cap = max(128, int(cnt2.max()))
            pair_cap = -(-pair_cap // 128) * 128
        if align_cap == 0:
            # candidate heads per dst block: distinct (q, t) with >= 2
            key = qv * np.int64(npad) + tv
            order = np.argsort(key, kind="stable")
            key_s, dst_s = key[order], dst[order]
            bound = np.ones(len(key_s), bool)
            bound[1:] = key_s[1:] != key_s[:-1]
            gstarts = np.flatnonzero(bound)
            gcounts = np.diff(np.append(gstarts, len(key_s)))
            heads = gstarts[gcounts >= 2]
            cnt3 = np.bincount(dst_s[heads], minlength=nproc)
            align_cap = max(64, int(cnt3.max()))
            align_cap = -(-align_cap // 64) * 64

    cfg = DistOverlapConfig(
        reads_per_shard=Rb, max_read_len=L, k=params.k,
        lower=params.lower_freq, upper=params.upper_freq,
        mat=params.mat, mis=params.mis, gap=params.gap,
        xdrop=params.xdrop, band=band,
        kmer_cap=kmer_cap, pair_cap=pair_cap, align_cap=align_cap)

    step = build_distributed_overlap_step(mesh, cfg)
    stats, local = step(jnp.asarray(codes), jnp.asarray(lengths))
    stats = {k: int(v) for k, v in stats.items()}
    if stats["dropped"] or stats["align_truncated"]:
        raise RuntimeError(
            f"distributed overlap capacities exceeded: {stats}; "
            f"increase kmer_cap/pair_cap/align_cap")

    loc = {k: np.asarray(v).reshape(-1, *np.asarray(v).shape[2:])
           if np.asarray(v).ndim > 2 else np.asarray(v).reshape(-1)
           for k, v in local.items()}
    sel = np.flatnonzero(loc["valid"])
    qi = loc["q"][sel].astype(np.int64)
    ti = loc["t"][sel].astype(np.int64)

    res = {f: loc[f][sel] for f in
           ("score", "begQ", "endQ", "begT", "endT", "rc")}

    # oracle re-run for band-overflow pairs (exactness is never dropped)
    for r in np.flatnonzero(loc["overflow"][sel]):
        ref = xdrop_align_ref(
            readset.read_codes(int(qi[r])), readset.read_codes(int(ti[r])),
            int(loc["seedQ"][sel][r]), int(loc["seedT"][sel][r]),
            params.k, params.mat, params.mis, params.gap, params.xdrop)
        for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
            res[f][r] = ref[f]

    lenQ = readset.lengths[qi].astype(np.int32)
    lenT = readset.lengths[ti].astype(np.int32)
    vals = classify_and_fill(res["score"], res["begQ"], res["endQ"],
                             res["begT"], res["endT"], res["rc"],
                             lenQ, lenT)
    vals["seedQ"] = loc["seedQ"][sel].astype(np.int32)
    vals["seedT"] = loc["seedT"][sel].astype(np.int32)
    R = COOMatrix(rows=qi, cols=ti, vals=vals, shape=(nreads, nreads))
    return R.sorted()


def run_distributed_pipeline(readset: ReadSet, params: PipelineParams,
                             mesh: Optional[Mesh] = None, **caps):
    """Full distributed pipeline: SPMD overlap/alignment, then the graph
    phases (prune, TR, contigs) on the gathered overlap graph.  Returns
    (R, S, contigs)."""
    from ..graph.contigs import generate_contigs
    from ..graph.prune import prune_overlap_graph
    from ..graph.tr import transitive_reduction

    R = run_distributed_overlap(readset, params, mesh, **caps)
    Rp = prune_overlap_graph(R, params.bad_read_cutoff)
    S = transitive_reduction(Rp)
    contigs = generate_contigs(S, readset)
    return R, S, contigs


def estimate_capacities_hll(readset: ReadSet, params: PipelineParams,
                            nproc: int, slack: float = 1.5):
    """HLL-based capacity estimation for the distributed exchanges -- the
    role HyperLogLog plays in the reference (sizing the distributed hash
    table from the global distinct-k-mer estimate, KmerOps.cpp:45-73).

    Cheaper than the exact two-phase count at scale: one pass of canonical
    extraction feeds the sketch; capacities are the balanced share times a
    slack factor.  The SPMD step still *reports* drops, so an underestimate
    is an error, never silent truncation.
    """
    from ..kmers.extract import extract_canonical_np
    from ..sketch import HyperLogLog

    codes = readset.padded_codes()
    lengths = readset.lengths
    canon, valid = extract_canonical_np(codes, lengths, params.k)
    instances = int(valid.sum())

    hll = HyperLogLog()
    hll.add(canon[valid])
    distinct = hll.estimate()
    mean_count = max(instances / max(distinct, 1.0), 1.0)

    kmer_cap = int(instances / nproc * slack) + 128
    # pairs per instance ~ (count - 1) / 2 for counts <= upper
    c = min(mean_count, params.upper_freq)
    pair_cap = int(instances * (c - 1) / 2 / nproc * slack) + 128
    align_cap = pair_cap
    rup = lambda x: -(-x // 128) * 128
    return rup(kmer_cap), rup(pair_cap), rup(align_cap)
