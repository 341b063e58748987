"""On-mesh distributed graph phase: classify -> prune -> symmetricize ->
transitive reduction -> connected components, all as SPMD programs over the
2D device mesh.  The big overlap graph R never gathers to the host; only
the final (small) string graph S and the per-read contig labels do, for the
serial chain walk -- mirroring the reference, whose contig walk is also
serial per rank after distributed routing (ContigGeneration.cpp:396-458).

Reference equivalents:
  prune        main.cpp:553-582 (find_bad_reads / find_contained_reads via
               row+col Reduce on the distributed R)
  symmetricize TransitiveReduction.cpp:15-19 (R += R^T with Overlap
               Transpose functor)
  TR marking   TransitiveReduction.cpp:45-80 (iterated distributed
               min-plus SpGEMM; see dist_tr.py -- one marking round is the
               fixpoint because second-round products carry direction -1)
  CC           vendored LACC, CC.hpp:1404-1544 (see dist_cc.py)

Data layout (shared with dist_overlap): reads 1D-sharded Rb per device in
flat row-major device order; edges (q, t) live on device
(q // (Rb*pc), (t // Rb) % pc); per-vertex reductions fold edge
contributions with segment sums + psum along the replicating axis, then
slice the local 1D shard (the same trick as dist_cc's label folding).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..align.classify import classify_and_fill_jnp
from .dist_overlap import _bucketize

AXES = ("r", "c")

# Overlap SoA carried through the graph phase: (name, dtype, pad fill)
FIELDS = [
    ("score", jnp.int32, -1), ("begQ", jnp.int32, 0), ("endQ", jnp.int32, 0),
    ("begT", jnp.int32, 0), ("endT", jnp.int32, 0),
    ("lenQ", jnp.int32, 0), ("lenT", jnp.int32, 0),
    ("rc", jnp.int32, 0), ("passed", jnp.int32, 0),
    ("containedQ", jnp.int32, 0), ("containedT", jnp.int32, 0),
    ("direction", jnp.int32, -1), ("directionT", jnp.int32, -1),
    ("suffix", jnp.int32, 0), ("suffixT", jnp.int32, 0),
    ("seedQ", jnp.int32, 0), ("seedT", jnp.int32, 0),
]
SWAP = {"begQ": "begT", "begT": "begQ", "endQ": "endT", "endT": "endQ",
        "lenQ": "lenT", "lenT": "lenQ", "suffix": "suffixT",
        "suffixT": "suffix", "direction": "directionT",
        "directionT": "direction", "containedQ": "containedT",
        "containedT": "containedQ"}


@dataclasses.dataclass(frozen=True)
class DistGraphConfig:
    n: int            # padded vertex count (nproc * Rb)
    Rb: int           # reads per device
    align_cap: int    # aligned entries per device (dist_overlap layout)
    sym_cap: int      # per-(src,dst) bucket capacity for transpose routing
    mark_cap: int     # per-(src,dst) bucket capacity for TR mark routing
    bad_cutoff: float = 0.65


def build_prune_sym_step(mesh: Mesh, cfg: DistGraphConfig):
    """Jitted SPMD program: classify the local aligned pairs, prune
    failed alignments / bad reads / contained reads with mesh reductions,
    then symmetricize by routing each surviving edge's transpose to its
    block owner.  Returns (R fields aligned to input slots, S storage,
    stats)."""
    pr, pc = mesh.devices.shape
    nproc = pr * pc
    Rb = cfg.Rb
    A = cfg.align_cap
    B2 = cfg.sym_cap

    def step(lengths, q, t, valid, score, begQ, endQ, begT, endT, rc,
             seedQ, seedT):
        r_idx = jax.lax.axis_index("r")
        c_idx = jax.lax.axis_index("c")
        q = q.reshape(-1)
        t = t.reshape(-1)
        valid = valid.reshape(-1)
        score = score.reshape(-1)
        begQ, endQ = begQ.reshape(-1), endQ.reshape(-1)
        begT, endT = begT.reshape(-1), endT.reshape(-1)
        rc = rc.reshape(-1)
        seedQ, seedT = seedQ.reshape(-1), seedT.reshape(-1)

        rowlens = jax.lax.all_gather(lengths, "c", axis=0, tiled=True)
        collens = jax.lax.all_gather(lengths, "r", axis=0, tiled=True)
        li = jnp.clip(q - r_idx.astype(q.dtype) * (Rb * pc),
                      0, Rb * pc - 1).astype(jnp.int32)
        lj = jnp.clip((t // (Rb * pc)) * Rb + t % Rb,
                      0, Rb * pr - 1).astype(jnp.int32)
        lenQ = rowlens[li].astype(jnp.int32)
        lenT = collens[lj].astype(jnp.int32)

        vals = classify_and_fill_jnp(score, begQ, endQ, begT, endT,
                                     rc.astype(bool), lenQ, lenT)
        vals["seedQ"] = seedQ.astype(jnp.int32)
        vals["seedT"] = seedT.astype(jnp.int32)

        def fold_vertex(per_edge_q, per_edge_t, op="sum"):
            """Per-vertex reduction of edge contributions -> my 1D shard
            [Rb] (reference row+col Reduce, main.cpp:558-562)."""
            if op == "sum":
                seg, pcomb = jax.ops.segment_sum, jax.lax.psum
            else:
                seg, pcomb = jax.ops.segment_max, jax.lax.pmax
            rowv = pcomb(seg(per_edge_q, li, num_segments=Rb * pc), "c")
            colv = pcomb(seg(per_edge_t, lj, num_segments=Rb * pr), "r")
            mine = (jax.lax.dynamic_slice(rowv, (c_idx * Rb,), (Rb,))
                    + jax.lax.dynamic_slice(colv, (r_idx * Rb,), (Rb,))
                    if op == "sum" else
                    jnp.maximum(
                        jax.lax.dynamic_slice(rowv, (c_idx * Rb,), (Rb,)),
                        jax.lax.dynamic_slice(colv, (r_idx * Rb,), (Rb,))))
            return mine

        def to_blocks(vec_1d):
            """Replicate a 1D-sharded per-vertex vector to row/col block
            views (the DistributedFastaData replication trick)."""
            rowv = jax.lax.all_gather(vec_1d, "c", axis=0, tiled=True)
            colv = jax.lax.all_gather(vec_1d, "r", axis=0, tiled=True)
            return rowv, colv

        one = valid.astype(jnp.int32)
        deg = fold_vertex(one, one)
        good = fold_vertex(one * vals["passed"], one * vals["passed"])
        bad_1d = ((good.astype(jnp.float64) + 1.0)
                  / (deg.astype(jnp.float64) + 1.0)) <= cfg.bad_cutoff

        valid2 = valid & vals["passed"]
        rowbad, colbad = to_blocks(bad_1d)
        valid3 = valid2 & ~rowbad[li] & ~colbad[lj]

        v3 = valid3.astype(jnp.int32)
        contq = fold_vertex(v3 * vals["containedQ"],
                            jnp.zeros_like(v3), op="max")
        contt = fold_vertex(jnp.zeros_like(v3),
                            v3 * vals["containedT"], op="max")
        cont_1d = (contq | contt) > 0
        rowcont, colcont = to_blocks(cont_1d)
        valid4 = valid3 & ~rowcont[li] & ~colcont[lj]

        # ---- symmetricize: route (t, q) with swapped fields ----------
        dstT = ((t // (Rb * pc)) * pc + (q // Rb) % pc).astype(jnp.int64)
        pay_names = [n for (n, _, _) in FIELDS]
        swapped = [vals[SWAP.get(n, n)].astype(jnp.int32)
                   for n in pay_names]
        payloads = [t.astype(jnp.int64), q.astype(jnp.int64)] + swapped
        fills = [jnp.int64(-1), jnp.int64(-1)] + \
            [jnp.int32(f) for (_, _, f) in FIELDS]
        bufs, dropped = _bucketize(dstT, valid4, payloads, nproc, B2, fills)
        recv = [jax.lax.all_to_all(b, AXES, 0, 0, tiled=True).reshape(-1)
                for b in bufs]

        Sq = jnp.concatenate([jnp.where(valid4, q, -1), recv[0]])
        St = jnp.concatenate([jnp.where(valid4, t, -1), recv[1]])
        S = {n: jnp.concatenate([vals[n].astype(jnp.int32), recv[2 + i]])
             for i, n in enumerate(pay_names)}

        stats = dict(
            r_entries=jax.lax.psum(jnp.sum(valid), AXES),
            pruned_entries=jax.lax.psum(jnp.sum(valid4), AXES),
            bad_reads=jax.lax.psum(jnp.sum(bad_1d), AXES),
            contained_reads=jax.lax.psum(jnp.sum(cont_1d), AXES),
            s_entries=jax.lax.psum(
                jnp.sum(Sq >= 0), AXES),
            sym_dropped=jax.lax.psum(dropped, AXES),
        )
        rfields = {n: vals[n].reshape(1, -1) for n in pay_names}
        out_S = {"q": Sq.reshape(1, -1), "t": St.reshape(1, -1)}
        out_S.update({n: S[n].reshape(1, -1) for n in pay_names})
        return rfields, out_S, stats

    spec = P(("r", "c"))
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(spec,) * 12,
        out_specs=({n: spec for n, _, _ in FIELDS},
                   {n: spec for n in
                    ["q", "t"] + [f for f, _, _ in FIELDS]},
                   P()),
        check_vma=False)
    return jax.jit(fn)


def build_tr_apply_step(mesh: Mesh, cfg: DistGraphConfig):
    """Jitted SPMD program: given S storage and the TR marks for local
    entries, symmetricize the marks (route each marked key's transpose to
    its block owner, reference I += I^T, TransitiveReduction.cpp:69-74)
    and invalidate marked / direction -1 entries."""
    pr, pc = mesh.devices.shape
    nproc = pr * pc
    Rb = cfg.Rb
    B3 = cfg.mark_cap
    n = cfg.n

    def step(Sq, St, Sdir, marks):
        Sq = Sq.reshape(-1)
        St = St.reshape(-1)
        Sdir = Sdir.reshape(-1)
        marks = marks.reshape(-1)
        valid = Sq >= 0

        # route transposed marked keys (t, q) to their block owners
        mdst = ((St // (Rb * pc)) * pc + (Sq // Rb) % pc).astype(jnp.int64)
        key_t = St.astype(jnp.int64) * n + Sq.astype(jnp.int64)
        (mk,), dropped = _bucketize(
            mdst, marks & valid, [key_t], nproc, B3, [jnp.int64(-1)])
        recv = jax.lax.all_to_all(mk, AXES, 0, 0, tiled=True).reshape(-1)

        # match received keys against local entries
        rk = jnp.where(recv >= 0, recv, jnp.int64(2**62))
        rk = jnp.sort(rk)
        mykey = Sq.astype(jnp.int64) * n + St.astype(jnp.int64)
        pos = jnp.searchsorted(rk, mykey)
        pos = jnp.clip(pos, 0, rk.shape[0] - 1)
        marked_recv = (rk[pos] == mykey) & valid

        keep = valid & ~marks & ~marked_recv & (Sdir >= 0)
        stats = dict(
            tr_removed=jax.lax.psum(jnp.sum(valid & ~keep), AXES),
            s_final=jax.lax.psum(jnp.sum(keep), AXES),
            mark_dropped=jax.lax.psum(dropped, AXES),
        )
        return keep.reshape(1, -1), stats

    spec = P(("r", "c"))
    fn = shard_map(step, mesh=mesh, in_specs=(spec,) * 4,
                   out_specs=(spec, P()), check_vma=False)
    return jax.jit(fn)


def build_branch_filter_step(mesh: Mesh, cfg: DistGraphConfig):
    """Jitted SPMD program: compute vertex degrees of the (symmetric)
    string graph, mark branch vertices (degree > 2) and return the
    edge-keep mask of the branchless graph (reference GetRead2Contigs,
    ContigGeneration.cpp:19-54: Reduce degree, PruneFull branches)."""
    pr, pc = mesh.devices.shape
    Rb = cfg.Rb

    def step(Sq, St, keep):
        r_idx = jax.lax.axis_index("r")
        c_idx = jax.lax.axis_index("c")
        Sq = Sq.reshape(-1)
        St = St.reshape(-1)
        keep = keep.reshape(-1)
        li = jnp.clip(Sq - r_idx.astype(Sq.dtype) * (Rb * pc),
                      0, Rb * pc - 1).astype(jnp.int32)
        lj = jnp.clip((St // (Rb * pc)) * Rb + St % Rb,
                      0, Rb * pr - 1).astype(jnp.int32)
        # S symmetric: degree = count of entries with q == v
        one = keep.astype(jnp.int32)
        rowdeg = jax.lax.psum(
            jax.ops.segment_sum(one, li, num_segments=Rb * pc), "c")
        deg_1d = jax.lax.dynamic_slice(rowdeg, (c_idx * Rb,), (Rb,))
        branch_1d = deg_1d > 2
        rowb = jax.lax.all_gather(branch_1d, "c", axis=0, tiled=True)
        colb = jax.lax.all_gather(branch_1d, "r", axis=0, tiled=True)
        keep2 = keep & ~rowb[li] & ~colb[lj]
        nbranch = jax.lax.psum(jnp.sum(branch_1d), AXES)
        return keep2.reshape(1, -1), dict(branches=nbranch)

    spec = P(("r", "c"))
    fn = shard_map(step, mesh=mesh, in_specs=(spec,) * 3,
                   out_specs=(spec, P()), check_vma=False)
    return jax.jit(fn)
