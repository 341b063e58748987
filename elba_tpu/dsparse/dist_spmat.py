"""DistSpMat: a reusable 2D-block-sharded sparse matrix over the device
mesh — the CombBLAS SpParMat role (reference usage: SpParMat<int64_t, ...>
throughout src/, e.g. TransitiveReduction.cpp:45-80, SharedSeeds.cpp:4-10).

The specialized SPMD programs (parallel/dist_overlap.py, dist_tr.py,
dist_cc.py) hand-fuse their layouts for speed; this module provides the
GENERAL facility: any semiring, any matrix, the full CombBLAS-style
operation set, on one uniform layout.  It favors clarity and generality —
the hot pipeline paths keep their fused programs.

Layout
------
A global n x m matrix on a (pr, pc) mesh is cut into pr row bands x pc
column bands (block distribution, same as CombBLAS CommGrid).  Device
(i, j) owns the COO triples of block (i, j) as fixed-capacity padded SoA:

  keys int64[cap]   global key r * m + c, EMPTY (2^62) marks a free slot
  vals {name: int32/int64[cap]}

Host-side the handle stores jax arrays shaped [pr*pc, cap] sharded on the
leading axis over ("r", "c"); inside shard_map each device sees [1, cap].

Semantics
---------
* Every fixed capacity reports overflow in a stats dict — never a silent
  drop (same contract as the dist_* modules).
* SUMMA SpGEMM: device (i, j) all-gathers A's row panel along "c" and B's
  column panel along "r" and joins locally on the shared middle index —
  the all-stages-at-once form of SUMMA (the ICI all_gather replaces the
  per-stage broadcast of Mult_AnXBn_DoubleBuff).  Panels are sorted by
  (middle index, partner) first so 'first'/'last' semiring adds are
  deterministic and mesh-invariant.
* 'first'/'last' reduce over products in ascending middle-index order —
  for SharedSeeds-style semirings this reproduces the canonical merge
  order of the host algebra (dsparse/seedmat.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EMPTY = np.int64(2 ** 62)   # key sentinel: empty slot (sorts after real keys)


@dataclasses.dataclass(frozen=True, eq=False)
class Semiring:
    """mul maps aligned (left vals, right vals) product dicts to product
    value dicts; add names the per-field reduction over products that share
    an output (r, c): 'sum' | 'min' | 'max' | 'first' | 'last'.

    eq=False: instances hash by identity so they key the compiled-program
    cache — reuse one Semiring instance across calls to avoid recompiles."""
    mul: Callable[[Dict, Dict], Dict]
    add: Dict[str, str]
    zero: Dict[str, int]


#: plain arithmetic semiring over one field 'v' (counts / pattern algebra)
ARITH = Semiring(mul=lambda a, b: {"v": a["v"] * b["v"]},
                 add={"v": "sum"}, zero={"v": 0})


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _band_sizes(n: int, m: int, pr: int, pc: int):
    return _cdiv(n, pr), _cdiv(m, pc)


def _owner_np(r, c, n, m, pr, pc):
    rb, cb = _band_sizes(n, m, pr, pc)
    return (r // rb) * pc + (c // cb)


class DistSpMat:
    """Handle for a 2D-block-sharded sparse matrix.  Construct with
    from_coo / from_triples; operations return new handles and stats."""

    def __init__(self, mesh: Mesh, n: int, m: int, cap: int,
                 keys, vals: Dict):
        self.mesh = mesh
        self.n = n
        self.m = m
        self.cap = cap
        self.keys = keys          # [nproc, cap] int64, sharded
        self.vals = vals          # {name: [nproc, cap]}, sharded
        pr, pc = mesh.devices.shape
        self.pr, self.pc = pr, pc
        self.nproc = pr * pc

    # ---------------- construction / conversion --------------------------

    @staticmethod
    def from_triples(mesh: Mesh, n: int, m: int, rows, cols,
                     vals: Dict, cap: int = 0) -> "DistSpMat":
        """Host-side scatter of COO triples to their 2D block owners
        (ctor-from-triples, CombBLAS SpParMat(tuples) role).  cap=0 sizes
        to the fullest block rounded up to a power of two."""
        pr, pc = mesh.devices.shape
        nproc = pr * pc
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        own = _owner_np(rows, cols, n, m, pr, pc)
        counts = np.bincount(own, minlength=nproc)
        if cap == 0:
            cap = 1 << max(int(np.ceil(np.log2(max(counts.max(), 1)))), 3)
        if counts.max() > cap:
            raise ValueError(
                f"block capacity {cap} < fullest block {counts.max()}")
        keys = np.full((nproc, cap), EMPTY, np.int64)
        out = {f: np.full((nproc, cap), 0, np.asarray(v).dtype)
               for f, v in vals.items()}
        order = np.argsort(own, kind="stable")
        slot = np.arange(len(rows)) - np.concatenate(
            [[0], np.cumsum(counts)])[own[order]]
        keys[own[order], slot] = rows[order] * m + cols[order]
        for f, v in vals.items():
            out[f][own[order], slot] = np.asarray(v)[order]
        sh = NamedSharding(mesh, P(("r", "c")))
        return DistSpMat(
            mesh, n, m, cap, jax.device_put(keys, sh),
            {f: jax.device_put(v, sh) for f, v in out.items()})

    def to_triples(self):
        """Gather to host; returns (rows, cols, vals) sorted by (r, c)."""
        keys = np.asarray(self.keys).reshape(-1)
        live = keys < EMPTY
        keys = keys[live]
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        vals = {f: np.asarray(v).reshape(-1)[live][order]
                for f, v in self.vals.items()}
        return keys // self.m, keys % self.m, vals

    @property
    def nnz(self) -> int:
        return int((np.asarray(self.keys) < EMPTY).sum())

    def _spec(self):
        return P(("r", "c"))

    # ---------------- local elementwise ops -------------------------------

    def apply(self, fn: Callable[[Dict], Dict]) -> "DistSpMat":
        """Per-entry value transform (SpParMat::Apply role)."""
        return DistSpMat(self.mesh, self.n, self.m, self.cap, self.keys,
                         fn(self.vals))

    def prune(self, pred: Callable[[Dict], jnp.ndarray]) -> "DistSpMat":
        """Remove entries where pred(vals) is True (Prune role)."""
        dead = pred(self.vals)
        return DistSpMat(
            self.mesh, self.n, self.m, self.cap,
            jnp.where(dead, EMPTY, self.keys), self.vals)

    # ---------------- distributed ops -------------------------------------

    def transpose(self, out_cap: int = 0):
        """A^T with on-device all_to_all routing to the transposed block
        owners.  Returns (DistSpMat, stats{dropped})."""
        out_cap = out_cap or self.cap
        fn = _build_transpose(self.mesh, self.n, self.m, self.cap, out_cap,
                              tuple(sorted(self.vals)))
        vtup = tuple(self.vals[f] for f in sorted(self.vals))
        keys, vtup_o, dropped = fn(self.keys, vtup)
        vals = dict(zip(sorted(self.vals), vtup_o))
        return (DistSpMat(self.mesh, self.m, self.n, out_cap, keys, vals),
                {"dropped": int(dropped)})

    def spgemm(self, other: "DistSpMat", sr: Semiring, out_cap: int = 0,
               max_degree: int = 32):
        """C = self . other under semiring sr (SUMMA Mult_AnXBn role).
        Returns (DistSpMat, stats{products, join_overflow, out_overflow}).
        max_degree is the AVERAGE-degree product-capacity multiplier: the
        per-device product buffer holds panel_slots * max_degree entries
        (no per-left degree cap — the join enumerates products by offset).
        Retry with larger max_degree / out_cap on overflow."""
        assert self.m == other.n, "inner dimensions must agree"
        assert self.mesh is other.mesh or self.mesh == other.mesh
        out_cap = out_cap or max(self.cap, other.cap)
        lf = tuple(sorted(self.vals))
        rf = tuple(sorted(other.vals))
        fn = _build_spgemm(self.mesh, self.n, self.m, other.m,
                           self.cap, other.cap, out_cap, max_degree,
                           lf, rf, sr)
        ltup = tuple(self.vals[f] for f in lf)
        rtup = tuple(other.vals[f] for f in rf)
        keys, vtup, stats = fn(self.keys, ltup, other.keys, rtup)
        names = sorted(sr.zero)
        vals = dict(zip(names, vtup))
        return (DistSpMat(self.mesh, self.n, other.m, out_cap, keys, vals),
                {k: int(v) for k, v in stats.items()})

    def ewise_mult(self, other: "DistSpMat",
                   mul: Callable[[Dict, Dict], Dict],
                   negate: bool = False):
        """EWiseApply intersection: entries present in BOTH keep
        mul(a, b); with negate=True, keep self's entries NOT in other
        (the negated-mask form, EWiseApply(..., negate) role).  Both
        operands must share shape and mesh."""
        assert (self.n, self.m) == (other.n, other.m)
        lf = tuple(sorted(self.vals))
        rf = tuple(sorted(other.vals))
        fn = _build_ewise(self.mesh, self.cap, other.cap, lf, rf,
                          negate, mul)
        ltup = tuple(self.vals[f] for f in lf)
        rtup = tuple(other.vals[f] for f in rf)
        keys, vtup = fn(self.keys, ltup, other.keys, rtup)
        names = lf if negate else tuple(sorted(mul(
            {f: np.zeros(1, np.int64) for f in lf},
            {f: np.zeros(1, np.int64) for f in rf})))
        vals = dict(zip(names, vtup))
        return DistSpMat(self.mesh, self.n, self.m, self.cap, keys, vals)

    def reduce_rows(self, field: str, op: str = "sum") -> np.ndarray:
        """Per-row reduction to a dense host vector (Reduce(Row) role)."""
        fn = _build_reduce(self.mesh, self.n, self.m, self.cap, op)
        return np.asarray(fn(self.keys, self.vals[field]))[: self.n]


# ---------------- jitted builders (cached per static config) --------------


def _compact(keys, vtups, cap, fills):
    """Sort-on-deadness compaction of padded entries into [1, cap];
    returns (keys[1,cap], vtups, n_dropped)."""
    order = jnp.argsort(keys, stable=True)
    keys_s = keys[order]
    n_live = jnp.sum(keys_s < EMPTY)
    dropped = jnp.maximum(n_live - cap, 0)
    idx = jnp.arange(cap, dtype=jnp.int64)
    take = jnp.clip(idx, 0, keys.shape[0] - 1)
    kout = jnp.where(idx < n_live, keys_s[take], EMPTY)
    vout = tuple(
        jnp.where(idx < n_live, v[order][take], fill)
        for v, fill in zip(vtups, fills))
    return kout.reshape(1, -1), tuple(v.reshape(1, -1) for v in vout), dropped


@functools.lru_cache(maxsize=None)
def _build_transpose(mesh, n, m, cap, out_cap, fields):
    pr, pc = mesh.devices.shape
    nproc = pr * pc
    rbT, cbT = _band_sizes(m, n, pr, pc)

    def step(keys, vtup):
        keys = keys.reshape(-1)
        vtup = tuple(v.reshape(-1) for v in vtup)
        r = keys // m
        c = keys % m
        tkey = jnp.where(keys < EMPTY, c * n + r, EMPTY)
        dest = (c // rbT) * pc + (r // cbT)
        # bucket into [nproc, scap] send slots, all_to_all, compact
        scap = max(_cdiv(cap, 1), 1)
        from ..parallel.dist_overlap import _bucketize
        (k_s, *v_s), drop1 = _bucketize(
            dest, keys < EMPTY, [tkey] + list(vtup), nproc, scap,
            [jnp.int64(EMPTY)] + [jnp.zeros((), v.dtype) for v in vtup])
        k_r = jax.lax.all_to_all(k_s, ("r", "c"), 0, 0, tiled=True)
        v_r = tuple(jax.lax.all_to_all(v, ("r", "c"), 0, 0, tiled=True)
                    for v in v_s)
        kout, vout, drop2 = _compact(
            k_r.reshape(-1), tuple(v.reshape(-1) for v in v_r), out_cap,
            [jnp.zeros((), v.dtype) for v in vtup])
        dropped = jax.lax.psum(drop1 + drop2, ("r", "c"))
        return kout, vout, dropped

    fn = shard_map(step, mesh=mesh,
                   in_specs=(P(("r", "c")), P(("r", "c"))),
                   out_specs=(P(("r", "c")), P(("r", "c")), P()),
                   check_vma=False)
    return jax.jit(fn)


def _seg_reduce(op, vals, bound, gid, nseg, pos):
    """Reduce vals over runs marked by bound (heads), run id gid."""
    if op == "sum":
        return jax.ops.segment_sum(vals, gid, num_segments=nseg)
    if op == "min":
        return jax.ops.segment_min(vals, gid, num_segments=nseg)
    if op == "max":
        return jax.ops.segment_max(vals, gid, num_segments=nseg)
    if op == "first":
        # head element's value: tag with -position, take the max tag
        tag = jnp.where(bound, vals, jnp.iinfo(vals.dtype).min)
        return jax.ops.segment_max(tag, gid, num_segments=nseg)
    if op == "last":
        tail = jnp.concatenate([bound[1:], jnp.ones(1, bool)])
        tag = jnp.where(tail, vals, jnp.iinfo(vals.dtype).min)
        return jax.ops.segment_max(tag, gid, num_segments=nseg)
    raise ValueError(f"unknown add op {op!r}")


@functools.lru_cache(maxsize=None)
def _build_spgemm(mesh, n, k_dim, m, lcap, rcap, out_cap, max_degree,
                  lfields, rfields, sr):
    pr, pc = mesh.devices.shape

    def step(lkeys, ltup, rkeys, rtup):
        # panels: A row panel along "c" (all of A's blocks in my block row),
        # B column panel along "r"
        lkeys = jax.lax.all_gather(lkeys.reshape(-1), "c", axis=0,
                                   tiled=True)
        ltup = tuple(jax.lax.all_gather(v.reshape(-1), "c", axis=0,
                                        tiled=True) for v in ltup)
        rkeys = jax.lax.all_gather(rkeys.reshape(-1), "r", axis=0,
                                   tiled=True)
        rtup = tuple(jax.lax.all_gather(v.reshape(-1), "r", axis=0,
                                        tiled=True) for v in rtup)

        # canonical panel order: (middle index, partner) ascending — makes
        # 'first'/'last' adds deterministic and mesh-invariant.  Payloads
        # ride the variadic sort (a post-argsort gather costs ~3x the sort
        # itself on v5e, CLAUDE.md).
        Lp = lkeys.shape[0]
        Rp = rkeys.shape[0]
        lr0 = lkeys // k_dim
        lk0 = jnp.where(lkeys < EMPTY, lkeys % k_dim, EMPTY)
        lsort = jnp.where(lkeys < EMPTY, lk0 * n + lr0, EMPTY)
        srt = jax.lax.sort((lsort, lr0, lk0) + ltup, num_keys=1,
                           is_stable=True)
        lr, lk = srt[1], srt[2]
        ltup = srt[3:]

        rk0 = jnp.where(rkeys < EMPTY, rkeys // m, EMPTY)
        rj0 = rkeys % m
        rsort = jnp.where(rkeys < EMPTY, rk0 * m + rj0, EMPTY)
        srt = jax.lax.sort((rsort, rk0, rj0) + rtup, num_keys=1,
                           is_stable=True)
        rk, rj = srt[1], srt[2]
        rtup = srt[3:]

        # ---- join on the middle index by offset enumeration (the
        # searchsorted-free pattern of the fused paths: searchsorted costs
        # ~30x a sort pass on v5e).  A sort-join over the concatenated
        # middle keys (rights before lefts within a key run) yields, per
        # left element, its partner-run start and degree via segment ops;
        # product slots are then enumerated with one scatter + cummax.
        ckey = jnp.concatenate([rk, lk])
        side = jnp.concatenate([jnp.zeros(Rp, jnp.int64),
                                jnp.ones(Lp, jnp.int64)])
        cpos = jnp.concatenate([jnp.arange(Rp, dtype=jnp.int64),
                                jnp.arange(Lp, dtype=jnp.int64)])
        ckey, side, cpos = jax.lax.sort((ckey, side, cpos), num_keys=2,
                                        is_stable=True)
        isr = (side == 0).astype(jnp.int64)
        rcum = jnp.cumsum(isr) - isr            # rights strictly before
        cb = jnp.concatenate([jnp.ones(1, bool), ckey[1:] != ckey[:-1]])
        cgid = jnp.cumsum(cb.astype(jnp.int64)) - 1
        ncseg = Rp + Lp
        runcnt = jax.ops.segment_sum(isr, cgid, num_segments=ncseg)
        runsta = jax.ops.segment_min(rcum, cgid, num_segments=ncseg)
        isl = (side == 1) & (ckey < EMPTY)
        ldst = jnp.where(isl, cpos, Lp)
        deg = jnp.zeros(Lp, jnp.int64).at[ldst].set(runcnt[cgid],
                                                    mode="drop")
        rstart = jnp.zeros(Lp, jnp.int64).at[ldst].set(runsta[cgid],
                                                       mode="drop")

        prod_cap = Lp * max_degree
        pstart = jnp.cumsum(deg) - deg          # exclusive, left order
        nprod = jnp.sum(deg)
        joverflow = jnp.maximum(nprod - prod_cap, 0)

        slot = jnp.arange(prod_cap, dtype=jnp.int64)
        livel = deg > 0
        lid = jnp.full(prod_cap, -1, jnp.int64).at[
            jnp.where(livel & (pstart < prod_cap), pstart, prod_cap)
        ].max(jnp.arange(Lp, dtype=jnp.int64), mode="drop")
        lidx = jax.lax.cummax(lid)
        lsafe = jnp.clip(lidx, 0, Lp - 1)
        off = slot - pstart[lsafe]
        ridx = jnp.clip(rstart[lsafe] + off, 0, Rp - 1)
        ok = (slot < jnp.minimum(nprod, prod_cap)) & (lidx >= 0)

        ldict = {f: v[lsafe] for f, v in zip(lfields, ltup)}
        rdict = {f: v[ridx] for f, v in zip(rfields, rtup)}
        prod = sr.mul(ldict, rdict)
        key = jnp.where(ok, lr[lsafe] * m + rj[ridx], EMPTY)
        kmid = jnp.where(ok, lk[lsafe], 0)
        vals = {f: jnp.where(ok, prod[f], sr.zero[f]).astype(jnp.int64)
                for f in sr.zero}

        # canonical product order: (output key, middle index) — at most
        # one product per (r, c, k), so this is a total order and
        # 'first'/'last' adds are deterministic at any mesh shape
        fields = tuple(sorted(sr.zero))
        sorted_arrs = jax.lax.sort(
            (key, kmid) + tuple(vals[f] for f in fields),
            num_keys=2, is_stable=True)
        key = sorted_arrs[0]
        vals = dict(zip(fields, sorted_arrs[2:]))
        npk = key.shape[0]
        bound = jnp.concatenate([jnp.ones(1, bool), key[1:] != key[:-1]])
        gid = jnp.cumsum(bound.astype(jnp.int64)) - 1
        pos = jnp.arange(npk, dtype=jnp.int64)
        red = {f: _seg_reduce(sr.add[f], v, bound, gid, npk, pos)[gid]
               for f, v in vals.items()}
        head = bound & (key < EMPTY)
        hkey = jnp.where(head, key, EMPTY)

        kout, vout, out_overflow = _compact(
            hkey, tuple(red[f] for f in fields), out_cap,
            [jnp.asarray(sr.zero[f], red[f].dtype) for f in fields])
        stats = dict(
            products=jax.lax.psum(nprod, ("r", "c")),
            join_overflow=jax.lax.psum(joverflow, ("r", "c")),
            out_overflow=jax.lax.psum(out_overflow, ("r", "c")))
        return kout, vout, stats

    fn = shard_map(step, mesh=mesh,
                   in_specs=(P(("r", "c")),) * 4,
                   out_specs=(P(("r", "c")), P(("r", "c")), P()),
                   check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_ewise(mesh, lcap, rcap, lfields, rfields, negate, mul):
    def step(lkeys, ltup, rkeys, rtup):
        lkeys = lkeys.reshape(-1)
        rkeys = rkeys.reshape(-1)
        ltup = tuple(v.reshape(-1) for v in ltup)
        rtup = tuple(v.reshape(-1) for v in rtup)
        # sort-join: concat with side tags; matching keys become adjacent
        key = jnp.concatenate([lkeys, rkeys])
        side = jnp.concatenate([jnp.zeros(lcap, jnp.int64),
                                jnp.ones(rcap, jnp.int64)])
        pos = jnp.concatenate([jnp.arange(lcap, dtype=jnp.int64),
                               jnp.arange(rcap, dtype=jnp.int64)])
        key, side, pos = jax.lax.sort((key, side, pos), num_keys=2,
                                      is_stable=True)
        nxt_same = jnp.concatenate([key[:-1] == key[1:],
                                    jnp.zeros(1, bool)])
        in_both_l = nxt_same & (side == 0) & (key < EMPTY)
        # scatter matched flags / partner positions back to left slots
        match = jnp.zeros(lcap, bool).at[
            jnp.where(side == 0, pos, 0)].max(
                in_both_l, mode="drop")
        partner = jnp.zeros(lcap, jnp.int64).at[
            jnp.where(in_both_l, pos, lcap)].set(
                jnp.concatenate([pos[1:], jnp.zeros(1, jnp.int64)]),
                mode="drop")
        ldict = dict(zip(lfields, ltup))
        if negate:
            keys_out = jnp.where(match, EMPTY, lkeys)
            return keys_out.reshape(1, -1), tuple(
                v.reshape(1, -1) for v in ltup)
        rdict = {f: v[partner] for f, v in zip(rfields, rtup)}
        prod = mul(ldict, rdict)
        keys_out = jnp.where(match, lkeys, EMPTY)
        fields = tuple(sorted(prod))
        return keys_out.reshape(1, -1), tuple(
            jnp.where(match, prod[f], 0).reshape(1, -1) for f in fields)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(P(("r", "c")),) * 4,
                   out_specs=(P(("r", "c")), P(("r", "c"))),
                   check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_reduce(mesh, n, m, cap, op):
    npad = _cdiv(n, 8) * 8

    def step(keys, vals):
        keys = keys.reshape(-1)
        vals = vals.reshape(-1)
        r = jnp.where(keys < EMPTY, keys // m, npad)
        if op == "sum":
            out = jnp.zeros(npad, vals.dtype).at[r].add(
                jnp.where(keys < EMPTY, vals, 0), mode="drop")
        elif op == "max":
            out = jnp.full(npad, jnp.iinfo(vals.dtype).min,
                           vals.dtype).at[r].max(vals, mode="drop")
        elif op == "min":
            out = jnp.full(npad, jnp.iinfo(vals.dtype).max,
                           vals.dtype).at[r].min(vals, mode="drop")
        else:
            raise ValueError(op)
        if op == "sum":
            return jax.lax.psum(out, ("r", "c")).reshape(1, -1)
        red = jax.lax.pmax if op == "max" else jax.lax.pmin
        return red(out, ("r", "c")).reshape(1, -1)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(P(("r", "c")), P(("r", "c"))),
                   out_specs=P(None),
                   check_vma=False)

    def run(keys, vals):
        return fn(keys, vals)[0]

    return jax.jit(run)
