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
    elements.  Pair t within group g has a = local//c, b = local%c, so pairs
    are emitted in row-major order (stable downstream ordering).

    Host-side sizing, device-friendly output (pure numpy here; small
    bookkeeping arrays are fine on host, the big gathers happen on device).
    """
    counts = counts.astype(np.int64)
    sizes = counts * counts
    total = int(sizes.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    gcum = np.cumsum(sizes)
    t = np.arange(total, dtype=np.int64)
    grp = np.searchsorted(gcum, t, side="right")
    local = t - (gcum[grp] - sizes[grp])
    c = counts[grp]
    a = local // c
    b = local % c
    li = starts[grp] + a
    ri = starts[grp] + b
    return li, ri


def expand_join_products(lstarts: np.ndarray, lcounts: np.ndarray,
                         rstarts: np.ndarray, rcounts: np.ndarray):
    """Like expand_cross_products but joining two sorted arrays over shared
    keys: group g contributes lcounts[g] * rcounts[g] pairs (li from left,
    ri from right).  The caller is responsible for aligning the group lists
    (same key order, zero counts for keys absent on one side)."""
    lcounts = lcounts.astype(np.int64)
    rcounts = rcounts.astype(np.int64)
    sizes = lcounts * rcounts
    total = int(sizes.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    gcum = np.cumsum(sizes)
    t = np.arange(total, dtype=np.int64)
    grp = np.searchsorted(gcum, t, side="right")
    local = t - (gcum[grp] - sizes[grp])
    rc = rcounts[grp]
    a = local // rc
    b = local % rc
    li = lstarts[grp] + a
    ri = rstarts[grp] + b
    return li, ri
