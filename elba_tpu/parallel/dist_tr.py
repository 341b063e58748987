"""Distributed transitive reduction: min-plus semiring SpGEMM over the 2D
mesh (reference: iterated Mult_AnXBn_DoubleBuff<MinPlusSR> on the CommGrid,
TransitiveReduction.cpp:45-80).

SUMMA dataflow mapped to mesh axes: the overlap graph S is 2D-block
sharded as fixed-capacity COO triples; device (i, j) computes block
N(i,j) = sum_k P(i,k) . S(k,j) by all-gathering P's row panel along "c"
and S's column panel along "r", then running a local sorted join under the
direction-composing min-plus semiring.  The transitive-edge test
(GreaterThanSR with FUZZ) and the mark symmetricization are local +
all_to_all steps on the same layout.

Static shapes throughout: per-block capacities are config knobs; the local
join enumerates right-partners by offset with a static max-degree bound.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..params import TR_FUZZ

INF = jnp.int64(2**62)
EMPTY = jnp.int64(2**62)  # key sentinel for unoccupied COO slots


@dataclasses.dataclass(frozen=True)
class DistTRConfig:
    n: int                 # global vertex count (reads)
    block_cap: int         # max nnz per 2D block
    join_cap: int          # max products per local join
    max_degree: int = 32   # static bound on per-vertex panel degree


def _local_minplus_join(li, lk, ldir, lsuf, rk, rj, rdir, rsuf, cfg):
    """Products of left entries (i,k) with right entries (k,j) sharing k.

    All inputs are padded arrays with key sentinels; returns padded product
    arrays (key = i * n + j col-major-free encoding, slot, value) plus the
    number of partners beyond the static max_degree bound that could NOT be
    enumerated (reported, never silently dropped)."""
    n = jnp.int64(cfg.n)
    D = cfg.max_degree

    order = jnp.argsort(rk, stable=True)
    rk_s = rk[order]
    rj_s = rj[order]
    rdir_s = rdir[order]
    rsuf_s = rsuf[order]

    start = jnp.searchsorted(rk_s, lk)
    # partners beyond the static degree bound would be silently skipped by
    # the offset enumeration below; count them so callers can retry with a
    # bigger max_degree (same contract as the capacity drops elsewhere)
    end = jnp.searchsorted(rk_s, lk, side="right")
    overflow = jnp.sum(
        jnp.where(lk < EMPTY,
                  jnp.maximum(end - start - D, 0), 0))
    prods = []
    for o in range(D):
        idx = jnp.clip(start + o, 0, rk_s.shape[0] - 1)
        same = (rk_s[idx] == lk) & (lk < EMPTY)
        d1 = ldir.astype(jnp.int64)
        d2 = rdir_s[idx].astype(jnp.int64)
        ok = same & (d1 >= 0) & (d2 >= 0) & (((d2 >> 1) & 1) != (d1 & 1))
        slot = 2 * ((d1 >> 1) & 1) + (d2 & 1)
        val = lsuf.astype(jnp.int64) + rsuf_s[idx].astype(jnp.int64)
        key = jnp.where(ok, li * n + rj_s[idx], EMPTY)
        prods.append((key, jnp.where(ok, slot, 0), jnp.where(ok, val, INF)))
    key = jnp.concatenate([p[0] for p in prods])
    slot = jnp.concatenate([p[1] for p in prods])
    val = jnp.concatenate([p[2] for p in prods])
    return key, slot, val, overflow


def build_distributed_tr_step(mesh: Mesh, cfg: DistTRConfig):
    """Returns a jitted step computing, per 2D block of S: the min-plus
    product N over the block row/column panels and the transitive mark for
    each local S entry (suffix + FUZZ >= N path at the entry's direction).

    Inputs (per device, sharded on leading axis):
      keys  int64[P, cap]: i * n + j of local S entries (EMPTY = empty)
      dirs  int8[P, cap], sufs int32[P, cap]
    Returns (marks bool[P, cap], stats) where marks aligns with input slots.
    """
    pr, pc = mesh.devices.shape

    def step(keys, dirs, sufs):
        keys = keys.reshape(-1)
        dirs = dirs.reshape(-1)
        sufs = sufs.reshape(-1)
        n = jnp.int64(cfg.n)
        li = keys // n
        lj = keys % n

        # panels: row panel of P along "c", column panel of S along "r"
        pk_i = jax.lax.all_gather(li, "c", axis=0, tiled=True)
        pk_k = jax.lax.all_gather(lj, "c", axis=0, tiled=True)
        pdir = jax.lax.all_gather(dirs, "c", axis=0, tiled=True)
        psuf = jax.lax.all_gather(sufs, "c", axis=0, tiled=True)

        sk_k = jax.lax.all_gather(li, "r", axis=0, tiled=True)
        sk_j = jax.lax.all_gather(lj, "r", axis=0, tiled=True)
        sdir = jax.lax.all_gather(dirs, "r", axis=0, tiled=True)
        ssuf = jax.lax.all_gather(sufs, "r", axis=0, tiled=True)

        # local join on the shared middle vertex
        valid_l = pk_i < cfg.n
        lk = jnp.where(valid_l, pk_k, EMPTY)
        rk = jnp.where(sk_k < cfg.n, sk_k, EMPTY)
        jkey, jslot, jval, joverflow = _local_minplus_join(
            pk_i, lk, pdir, psuf, rk, sk_j, sdir, ssuf, cfg)

        # segment-min products by (i, j) key, then look up local entries
        order = jnp.argsort(jkey, stable=True)
        jkey = jkey[order]
        jslot = jslot[order]
        jval = jval[order]
        m = jkey.shape[0]
        bound = jnp.concatenate(
            [jnp.ones(1, bool), jkey[1:] != jkey[:-1]])
        gid = jnp.cumsum(bound.astype(jnp.int64)) - 1
        # per-group per-slot min via segment_min on gid * 4 + slot
        seg = gid * 4 + jslot
        paths = jax.ops.segment_min(jval, seg, num_segments=4 * m)

        gstart = jnp.searchsorted(jkey, keys)
        gstart = jnp.clip(gstart, 0, m - 1)
        found = jkey[gstart] == keys
        g = gid[gstart]
        dir_slot = jnp.clip(dirs.astype(jnp.int64), 0, 3)
        path = jnp.where(found,
                         paths[g * 4 + dir_slot], INF)
        fuzzed = sufs.astype(jnp.int64) + TR_FUZZ
        marks = (dirs >= 0) & (keys < EMPTY) & (fuzzed >= path)

        nmarks = jax.lax.psum(jnp.sum(marks), ("r", "c"))
        nprod = jax.lax.psum(jnp.sum(jkey < EMPTY), ("r", "c"))
        novf = jax.lax.psum(joverflow, ("r", "c"))
        return (marks.reshape(1, -1),
                dict(marks=nmarks, products=nprod, join_overflow=novf))

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(("r", "c")), P(("r", "c")), P(("r", "c"))),
        out_specs=(P(("r", "c")), P()),
        check_vma=False)
    return jax.jit(fn)
