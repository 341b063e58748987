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


def _distributed_overlap_local(readset: ReadSet, params: PipelineParams,
                               mesh: Mesh, kmer_cap: int = 0,
                               pair_cap: int = 0, align_cap: int = 0,
                               band: int = 128, max_retries: int = 4,
                               use_pallas_align: Optional[bool] = None):
    """Run the SPMD overlap step; returns (stats, device-resident local
    result arrays, cfg, lengths).

    Capacity sizing: one cheap HLL pass estimates the exchange shares
    (the reference's HyperLogLog table sizing, KmerOps.cpp:45-73); the
    SPMD step counts every drop, and a drop triggers a retry with the
    failing capacity doubled -- never an O(products) host pre-pass and
    never silent truncation."""
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

    if not (kmer_cap and pair_cap and align_cap):
        ek, ep, ea = estimate_capacities_hll(readset, params, nproc)
        kmer_cap = kmer_cap or ek
        pair_cap = pair_cap or ep
        align_cap = align_cap or ea

    # fused Pallas aligner (the LOGAN role) on real TPU; the vmapped
    # while_loop kernel stays in-step on CPU meshes and in the dryrun
    if use_pallas_align is None:
        use_pallas_align = jax.default_backend() == "tpu"

    stats = local = cfg = None
    for attempt in range(max_retries):
        cfg = DistOverlapConfig(
            reads_per_shard=Rb, max_read_len=L, k=params.k,
            lower=params.lower_freq, upper=params.upper_freq,
            mat=params.mat, mis=params.mis, gap=params.gap,
            xdrop=params.xdrop, band=band,
            kmer_cap=kmer_cap, pair_cap=pair_cap, align_cap=align_cap,
            align_in_step=not use_pallas_align)
        step = build_distributed_overlap_step(mesh, cfg)
        stats, local = step(jnp.asarray(codes), jnp.asarray(lengths))
        stats = {k: int(v) for k, v in stats.items()}
        if not (stats["dropped_kmers"] or stats["dropped_pairs"]
                or stats["align_truncated"]):
            break
        if stats["dropped_kmers"]:
            kmer_cap *= 2
        if stats["dropped_pairs"]:
            pair_cap *= 2
        if stats["align_truncated"]:
            align_cap *= 2
    else:
        raise RuntimeError(
            f"distributed overlap capacities exceeded after "
            f"{max_retries} retries: {stats}")

    if use_pallas_align:
        local = _align_candidates_pallas(readset, params, local)
    return stats, local, cfg, lengths


def _align_candidates_pallas(readset: ReadSet, params: PipelineParams,
                             local):
    """Align the SPMD step's candidate list with the fused Pallas x-drop
    kernel (per-shard embarrassing parallelism; on one chip this is the
    whole list) and scatter the results into the device-resident arrays."""
    from ..align.xdrop_device_blocks import get_device_aligner_blocks

    sel = np.flatnonzero(np.asarray(local["valid"]).reshape(-1))
    if len(sel) == 0:
        return local
    q = np.asarray(local["q"]).reshape(-1)[sel]
    t = np.asarray(local["t"]).reshape(-1)[sel]
    sq = np.asarray(local["seedQ"]).reshape(-1)[sel]
    st = np.asarray(local["seedT"]).reshape(-1)[sel]
    aligner = get_device_aligner_blocks()
    aligner.interpret = jax.default_backend() != "tpu"
    res = aligner(readset, q, t, sq, st, params.k, params.mat,
                  params.mis, params.gap, params.xdrop)
    local = dict(local)
    jidx = jnp.asarray(sel)
    for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
        flat = local[f].reshape(-1)
        local[f] = flat.at[jidx].set(
            jnp.asarray(res[f].astype(np.asarray(flat).dtype)))
    # align_batch_pallas already re-ran overflow pairs with the oracle
    local["overflow"] = jnp.zeros_like(local["overflow"]).reshape(-1)
    return local


def _fixup_overflow_device(readset: ReadSet, params: PipelineParams,
                           local):
    """Oracle re-run for band-overflow pairs, scattered back into the
    device-resident result arrays (exactness is never dropped)."""
    ovf = np.asarray(local["overflow"]).reshape(-1) \
        & np.asarray(local["valid"]).reshape(-1)
    idxs = np.flatnonzero(ovf)
    if len(idxs) == 0:
        return local
    q = np.asarray(local["q"]).reshape(-1)
    t = np.asarray(local["t"]).reshape(-1)
    sq = np.asarray(local["seedQ"]).reshape(-1)
    st = np.asarray(local["seedT"]).reshape(-1)
    upd = {f: [] for f in ("score", "begQ", "endQ", "begT", "endT", "rc")}
    for g in idxs:
        ref = xdrop_align_ref(
            readset.read_codes(int(q[g])), readset.read_codes(int(t[g])),
            int(sq[g]), int(st[g]),
            params.k, params.mat, params.mis, params.gap, params.xdrop)
        for f in upd:
            upd[f].append(ref[f])
    local = dict(local)
    jidx = jnp.asarray(idxs)
    for f in upd:
        flat = local[f].reshape(-1)
        local[f] = flat.at[jidx].set(
            jnp.asarray(np.array(upd[f], np.asarray(flat).dtype)))
    return local


def run_distributed_overlap(readset: ReadSet, params: PipelineParams,
                            mesh: Optional[Mesh] = None,
                            kmer_cap: int = 0, pair_cap: int = 0,
                            align_cap: int = 0, band: int = 128,
                            max_retries: int = 4,
                            use_pallas_align: Optional[bool] = None
                            ) -> COOMatrix:
    """Distributed B + alignment; returns the overlap graph R (upper
    pairs, Overlap SoA values), identical to align.pairwise_alignment."""
    if mesh is None:
        mesh = make_mesh2d()
    stats, local, cfg, _ = _distributed_overlap_local(
        readset, params, mesh, kmer_cap, pair_cap, align_cap, band,
        max_retries, use_pallas_align)

    nreads = len(readset)
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


_R_DTYPES = dict(rc=bool, passed=bool, containedQ=bool, containedT=bool,
                 direction=np.int8, directionT=np.int8)


def _assemble_coo(nreads, q, t, fields, sel) -> COOMatrix:
    vals = {}
    for f, arr in fields.items():
        a = np.asarray(arr).reshape(-1)[sel]
        vals[f] = a.astype(_R_DTYPES.get(f, np.int32))
    return COOMatrix(rows=np.asarray(q).reshape(-1)[sel].astype(np.int64),
                     cols=np.asarray(t).reshape(-1)[sel].astype(np.int64),
                     vals=vals, shape=(nreads, nreads)).sorted()


def run_distributed_pipeline(readset: ReadSet, params: PipelineParams,
                             mesh: Optional[Mesh] = None,
                             on_mesh: bool = True, **caps):
    """Full distributed pipeline.  With on_mesh=True (default) the graph
    phases run as SPMD programs over the mesh -- classify/prune/
    symmetricize (dist_graph), transitive-reduction marking (dist_tr) and
    connected components (dist_cc) never gather the overlap graph R to the
    host; only the small string graph S and the contig labels do, for the
    serial chain walk (which is serial per rank in the reference too,
    ContigGeneration.cpp:396-458).  on_mesh=False keeps the legacy path
    (host graph phases on the gathered R) for cross-checking.

    Returns (R, S, contigs); R is gathered at the end solely as the
    overlap.paf output artifact."""
    from ..graph.contigs import generate_contigs, walk_contigs
    from ..graph.prune import prune_overlap_graph
    from ..graph.tr import transitive_reduction

    if mesh is None:
        mesh = make_mesh2d()

    if not on_mesh:
        R = run_distributed_overlap(readset, params, mesh, **caps)
        Rp = prune_overlap_graph(R, params.bad_read_cutoff)
        S = transitive_reduction(Rp)
        contigs = generate_contigs(S, readset)
        return R, S, contigs

    from .dist_cc import DistCCConfig, build_distributed_cc_sweep
    from .dist_graph import (FIELDS, DistGraphConfig,
                             build_branch_filter_step,
                             build_prune_sym_step, build_tr_apply_step)
    from .dist_tr import DistTRConfig, build_distributed_tr_step

    pr, pc = mesh.devices.shape
    nproc = pr * pc
    nreads = len(readset)

    stats, local, cfg, lengths = _distributed_overlap_local(
        readset, params, mesh, **caps)
    local = _fixup_overflow_device(readset, params, local)

    Rb = cfg.reads_per_shard
    npad = nproc * Rb
    A = cfg.align_cap
    # per-(src,dst) transpose routing is bounded by the sender's total
    # entries (align_cap), so sym_cap = align_cap never drops; same for
    # mark routing bounded by the per-device S storage
    Slen = A + nproc * A
    gcfg = DistGraphConfig(n=npad, Rb=Rb, align_cap=A, sym_cap=A,
                           mark_cap=Slen, bad_cutoff=params.bad_read_cutoff)

    ps = build_prune_sym_step(mesh, gcfg)
    rfields, S, pstats = ps(
        jnp.asarray(lengths), local["q"], local["t"], local["valid"],
        local["score"], local["begQ"], local["endQ"], local["begT"],
        local["endT"], local["rc"], local["seedQ"], local["seedT"])
    pstats = {k: int(v) for k, v in pstats.items()}
    assert pstats["sym_dropped"] == 0, pstats  # impossible by construction

    # ---- transitive reduction marking (one round = the fixpoint, see
    # graph/tr.py: second-round products carry direction -1) ----------
    S = {k: v.reshape(-1) for k, v in S.items()}
    Sq, St = S["q"], S["t"]
    keys = jnp.where(Sq >= 0,
                     Sq.astype(jnp.int64) * npad + St.astype(jnp.int64),
                     jnp.int64(2**62))
    dirs = jnp.where(Sq >= 0, S["direction"], -1).astype(jnp.int8)
    sufs = S["suffix"].astype(jnp.int32)

    max_degree = 32
    while True:
        tr_step = build_distributed_tr_step(
            mesh, DistTRConfig(n=npad, block_cap=Slen, join_cap=0,
                               max_degree=max_degree))
        marks, tr_stats = tr_step(keys, dirs, sufs)
        if int(tr_stats["join_overflow"]) == 0:
            break
        max_degree *= 2  # degree bound exceeded: retry, never drop

    ta = build_tr_apply_step(mesh, gcfg)
    keep, astats = ta(Sq, St, S["direction"], marks.reshape(-1))
    keep = keep.reshape(-1)

    # ---- contigs: branch filter + CC on the mesh ---------------------
    bf = build_branch_filter_step(mesh, gcfg)
    keep2, bstats = bf(Sq, St, keep)
    keep2 = keep2.reshape(-1)

    sweep = build_distributed_cc_sweep(
        mesh, DistCCConfig(n=npad, block=Rb, edge_cap=Slen))
    ei = jnp.where(keep2, Sq, -1).astype(jnp.int32)
    ej = jnp.where(keep2, St, -1).astype(jnp.int32)
    labels = jnp.arange(npad, dtype=jnp.int32)
    while True:
        labels, changed = sweep(labels, ei, ej)
        if int(changed) == 0:
            break

    # ---- host: small gathers only (string graph + labels) ------------
    lab = np.asarray(labels)[:nreads]
    roots = np.unique(lab)
    assignments = np.searchsorted(roots, lab).astype(np.int64)
    ncc = len(roots)

    keep_h = np.asarray(keep)
    sel = np.flatnonzero(keep_h)
    Sfields = {f: S[f] for f, _, _ in FIELDS}
    S_host = _assemble_coo(nreads, Sq, St, Sfields, sel)
    contigs = walk_contigs(S_host, readset, assignments, ncc)

    # R gather: output artifact only (overlap.paf)
    rsel = np.flatnonzero(np.asarray(local["valid"]).reshape(-1))
    R = _assemble_coo(nreads, local["q"], local["t"], rfields, rsel)
    return R, S_host, contigs


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

    # exchange buffers are [nproc, cap] per device, so the balanced share
    # of one (src, dst) bucket is 1/nproc^2 of the total
    kmer_cap = int(instances / nproc ** 2 * slack) + 128
    # pair INSTANCES per routed bucket: ~ (count - 1) / 2 per instance for
    # counts <= upper (multiplicity included -- each shared k-mer routes
    # one product)
    c = min(mean_count, params.upper_freq)
    total_pairs = instances * (c - 1) / 2
    pair_cap = int(total_pairs / nproc ** 2 * slack) + 128
    # candidate HEADS per device: distinct read pairs, NOT product
    # instances (a long overlap contributes hundreds of products but one
    # head).  ~16 overlap partners per read is generous for <= 40x
    # coverage; undershoot is corrected by the drop-retry loop, while
    # overshoot costs real alignment compute on every padded slot.
    align_cap = int(16 * len(readset) / nproc * slack) + 128
    # power-of-two caps: retry doubling then reuses compiled programs
    rup = lambda x: 1 << int(np.ceil(np.log2(max(x, 128))))
    return rup(kmer_cap), rup(pair_cap), rup(align_cap)
