"""Segment utilities: the TPU-native substitute for hash tables and dynamic
sparse accumulators.

Everything here operates on sorted key arrays with static shapes.  The core
trick shared by k-mer counting, the SharedSeeds SpGEMM, and the min-plus
SpGEMM is *two-phase sorted join*: sort by key, find group boundaries, count
exact output sizes on the host, then expand index mappings with searchsorted
so every output slot knows its (left, right) input rows.  This replaces the
reference's hash-SpGEMM accumulators (CombBLAS Mult_AnXBn_DoubleBuff local
multiply) with sort/scan/gather primitives that XLA compiles well.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def segment_boundaries(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """bool[n]: True where a new group starts (first element is True)."""
    n = sorted_keys.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    prev = jnp.concatenate([sorted_keys[:1], sorted_keys[:-1]])
    b = sorted_keys != prev
    return b.at[0].set(True)


def segment_ids_from_boundaries(boundaries: jnp.ndarray) -> jnp.ndarray:
    """int32[n]: 0-based group id for each element."""
    return jnp.cumsum(boundaries.astype(jnp.int32)) - 1


def segment_starts_counts(boundaries: np.ndarray):
    """(starts, counts) as numpy arrays; host-side (dynamic output size)."""
    boundaries = np.asarray(boundaries)
    starts = np.flatnonzero(boundaries)
    n = boundaries.shape[0]
    counts = np.diff(np.append(starts, n))
    return starts.astype(np.int64), counts.astype(np.int64)


def expand_cross_products(starts: np.ndarray, counts: np.ndarray):
    """For groups of sizes c_g over a sorted array, produce index pairs
    (li, ri) enumerating, for every group, all c_g^2 ordered pairs of
    elements in row-major order (a-major, b-minor; stable downstream
    ordering).

    Host-side sizing, device-friendly output (pure numpy here; small
    bookkeeping arrays are fine on host, the big gathers happen on device).
    """
    return expand_join_products(starts, counts, starts, counts)


def expand_join_products(lstarts: np.ndarray, lcounts: np.ndarray,
                         rstarts: np.ndarray, rcounts: np.ndarray):
    """Joining two sorted arrays over shared keys: group g contributes
    lcounts[g] * rcounts[g] pairs (li from left, ri from right), emitted
    (g, a)-major / b-minor.  The caller is responsible for aligning the
    group lists (same key order, zero counts for keys absent on one side).

    Enumeration is run-length decode (scatter ones + cumsum + gather):
    np.repeat with array counts runs at ~2.6M elem/s on small hosts
    (per-group memcpy overhead) and per-element searchsorted + // are
    worse still, while plain gathers run at ~165M elem/s."""
    lcounts = lcounts.astype(np.int64)
    rcounts = rcounts.astype(np.int64)
    sizes = lcounts * rcounts
    total = int(sizes.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    # int32 index space halves the memory traffic of the decode whenever
    # the product count allows it (the returned li/ri index the caller's
    # edge arrays, far smaller than 2^31)
    dt = np.int32 if total < 2**31 else np.int64
    # drop groups with no products so every decoded run is non-empty
    # (run starts are then strictly increasing -- plain marker stores)
    act = np.flatnonzero(sizes)
    lc, rc = lcounts[act].astype(dt), rcounts[act].astype(dt)
    ls = np.asarray(lstarts)[act].astype(dt)
    rs = np.asarray(rstarts)[act].astype(dt)

    def ids_from_counts(counts, n):
        """(ids, starts): index of the owning run per output position,
        for all-positive run lengths summing to n."""
        starts = np.cumsum(counts, dtype=dt) - counts
        marker = np.zeros(n, dt)
        marker[starts] = 1
        return np.cumsum(marker, dtype=dt) - 1, starts

    # one block per (group, a): decode group ids over the block space
    nblk = int(lc.sum())
    gid, gstarts = ids_from_counts(lc, nblk)
    blk = np.arange(nblk, dtype=dt)
    lrow = ls[gid] + (blk - gstarts[gid])
    rc_blk = rc[gid]
    rs_blk = rs[gid]
    # expand each block over b = 0..rc-1: decode block ids over products
    bid, bstarts = ids_from_counts(rc_blk, total)
    t = np.arange(total, dtype=dt)
    li = lrow[bid]
    ri = rs_blk[bid] + (t - bstarts[bid])
    return li, ri
