"""B = A @ A.T under the SharedSeeds semiring, as a sorted join.

Reference semantics (SharedSeeds.hpp:36-58, SharedSeeds.cpp:4-10):
  multiply(posQ, posT) -> one-seed SharedSeeds
  add(lhs, rhs)        -> {lhs.seeds[0], rhs.seeds[0]}, counts summed
so a left-fold accumulation keeps the FIRST and the LAST seed in merge
order; only seeds[0] is consumed downstream (PairwiseAlignment.cpp:90).
We define the canonical merge order as (kmer rank, readid, pos) ascending,
which is deterministic and mesh-size independent (the reference's order
depends on hash-table iteration and the SUMMA stage schedule; the B
count/pattern are identical either way, SURVEY.md section 3.2).

Join shape: A is sorted by kmer; every kmer group of c instances (c <=
upper_freq) contributes c^2 ordered pairs -- a segment cross product, not a
dense matmul, which is the right decomposition for a sparse boolean-ish
rank-k outer-product on any hardware.  Prune keeps numshared >= 2
(reference B.Prune(numshared <= 1)).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..kmers.count import KmerMatrix
from ..utils.segments import expand_cross_products
from .coo import COOMatrix


@dataclasses.dataclass
class SeedMatrix:
    """B (reads x reads): candidate overlap pairs with shared-seed info."""
    mat: COOMatrix  # vals: numshared, seedQ0, seedT0, seedQ1, seedT1

    @property
    def nnz(self):
        return self.mat.nnz


def build_seed_matrix(A: KmerMatrix, min_shared: int = 2,
                      full: bool = True) -> SeedMatrix:
    """Compute B = A A^T under the SharedSeeds semiring.

    full=True emits both triangles + diagonal (like the reference's B);
    full=False emits only strictly-upper pairs (the set alignment consumes).
    """
    K = A.num_kmers
    counts = np.bincount(A.cols, minlength=K).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    li, ri = expand_cross_products(starts, counts)
    qi = A.rows[li]
    ti = A.rows[ri]
    pq = A.pos[li].astype(np.int32)
    pt = A.pos[ri].astype(np.int32)

    if not full:
        m = qi < ti
        qi, ti, pq, pt = qi[m], ti[m], pq[m], pt[m]

    n = np.int64(A.num_reads)
    key = ti * n + qi  # column-major canonical order
    # pairs were generated in (kmer rank, readid, pos) order; stable sort
    # preserves that within each (q, t) group
    order = np.argsort(key, kind="stable")
    key = key[order]
    qi, ti, pq, pt = qi[order], ti[order], pq[order], pt[order]

    bound = np.ones(len(key), dtype=bool)
    if len(key):
        bound[1:] = key[1:] != key[:-1]
    gstarts = np.flatnonzero(bound)
    gcounts = np.diff(np.append(gstarts, len(key)))

    keep = gcounts >= min_shared
    gstarts, gcounts = gstarts[keep], gcounts[keep]
    last = gstarts + gcounts - 1

    vals = dict(
        numshared=gcounts.astype(np.int32),
        seedQ0=pq[gstarts], seedT0=pt[gstarts],
        seedQ1=pq[last], seedT1=pt[last],
    )
    mat = COOMatrix(rows=qi[gstarts].astype(np.int64),
                    cols=ti[gstarts].astype(np.int64),
                    vals=vals,
                    shape=(A.num_reads, A.num_reads))
    return SeedMatrix(mat=mat)
