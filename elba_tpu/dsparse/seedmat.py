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




def _reduce_pairs(qi, ti, pq, pt, n, w=None, s1q=None, s1t=None):
    """Group pair products by (q, t) key in canonical order and fold the
    SharedSeeds add: count sum, first seed, last seed.

    w/s1q/s1t: when merging already-reduced chunks, each element carries a
    weight (its count) and its own fold-last seed."""
    key = ti * np.int64(n) + qi
    order = np.argsort(key, kind="stable")
    key = key[order]
    qi, ti, pq, pt = qi[order], ti[order], pq[order], pt[order]
    w = np.ones(len(key), np.int64) if w is None else w[order]
    s1q = pq if s1q is None else s1q[order]
    s1t = pt if s1t is None else s1t[order]

    bound = np.ones(len(key), dtype=bool)
    if len(key):
        bound[1:] = key[1:] != key[:-1]
    gstarts = np.flatnonzero(bound)
    gend = np.append(gstarts[1:], len(key)) - 1
    gid = np.cumsum(bound) - 1
    gcounts = np.bincount(gid, weights=w, minlength=len(gstarts)
                          ).astype(np.int64)
    return (qi[gstarts], ti[gstarts], gcounts,
            pq[gstarts], pt[gstarts], s1q[gend], s1t[gend])


@dataclasses.dataclass
class SeedMatrix:
    """B (reads x reads): candidate overlap pairs with shared-seed info."""
    mat: COOMatrix  # vals: numshared, seedQ0, seedT0, seedQ1, seedT1

    @property
    def nnz(self):
        return self.mat.nnz


def seed_matrix_from_device_result(res, num_reads: int,
                                   min_shared: int = 2) -> SeedMatrix:
    """Package a device SpGEMM result dict as a SeedMatrix (fetches only
    the compacted entries)."""
    from .seedmat_device import device_result_to_host

    got = device_result_to_host(res, min_shared)
    vals = dict(numshared=got["numshared"].astype(np.int32),
                seedQ0=got["seedQ0"].astype(np.int32),
                seedT0=got["seedT0"].astype(np.int32),
                seedQ1=got["seedQ1"].astype(np.int32),
                seedT1=got["seedT1"].astype(np.int32))
    mat = COOMatrix(rows=got["q"].astype(np.int64),
                    cols=got["t"].astype(np.int64),
                    vals=vals, shape=(num_reads, num_reads))
    return SeedMatrix(mat=mat)


def seed_matrix_device(A: KmerMatrix, min_shared: int = 2,
                       full: bool = True) -> SeedMatrix:
    """Device SpGEMM path (dsparse/seedmat_device.py) packaged as a
    SeedMatrix; identical entries and canonical order to the host path
    (the accumulator is (t, q)-sorted = column-major)."""
    from .seedmat_device import build_seed_matrix_device

    res, _total = build_seed_matrix_device(A, min_shared=min_shared,
                                           full=full)
    return seed_matrix_from_device_result(res, A.num_reads, min_shared)


def device_spgemm_suitable(A: KmerMatrix, upper: int) -> bool:
    """The device SpGEMM packs positions 2-per-int32 and bounds the
    offset enumeration by the group size."""
    if upper > 256 or A.num_reads >= 2**31:
        return False
    return A.nnz == 0 or int(A.pos.max()) < (1 << 15)


def build_seed_matrix(A: KmerMatrix, min_shared: int = 2,
                      full: bool = True,
                      max_products: int = 200_000_000) -> SeedMatrix:
    """Compute B = A A^T under the SharedSeeds semiring.

    full=True emits both triangles + diagonal (like the reference's B);
    full=False emits only strictly-upper pairs (the set alignment consumes).

    The expansion is memory-bounded: k-mer groups are processed in chunks
    of at most `max_products` semiring products each (the single-host
    analogue of the reference's MAX_ALLTOALL_MEM streaming batches,
    KmerOps.hpp:10-12) and merged by key at the end -- chunk boundaries
    fall between k-mer groups, so the canonical (kmer, posQ, posT) merge
    order is preserved.
    """
    K = A.num_kmers
    counts = np.bincount(A.cols, minlength=K).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    sizes = counts * counts
    total = int(sizes.sum())
    n = A.num_reads

    def expand(lo, hi):
        li, ri = expand_cross_products(starts[lo:hi], counts[lo:hi])
        qi = A.rows[li]
        ti = A.rows[ri]
        pq = A.pos[li].astype(np.int32)
        pt = A.pos[ri].astype(np.int32)
        if not full:
            m = qi < ti
            qi, ti, pq, pt = qi[m], ti[m], pq[m], pt[m]
        return qi, ti, pq, pt

    if total > max_products:
        # product-bounded chunks (boundaries between k-mer groups), each
        # reduced before merging so peak memory is O(max_products + nnz(B))
        cum = np.cumsum(sizes)
        bounds = [0]
        while bounds[-1] < K:
            lo = bounds[-1]
            base = cum[lo - 1] if lo else 0
            hi = int(np.searchsorted(cum, base + max_products, "right"))
            bounds.append(max(hi, lo + 1))
        red = [_reduce_pairs(*expand(lo, hi), n)
               for lo, hi in zip(bounds[:-1], bounds[1:])]
        qi = np.concatenate([r[0] for r in red])
        ti = np.concatenate([r[1] for r in red])
        w = np.concatenate([r[2] for r in red])
        pq = np.concatenate([r[3] for r in red])
        pt = np.concatenate([r[4] for r in red])
        s1q = np.concatenate([r[5] for r in red])
        s1t = np.concatenate([r[6] for r in red])
        # chunk order == kmer order, so a stable merge keeps fold semantics
        qi, ti, gcounts, pq0, pt0, s1q, s1t = _reduce_pairs(
            qi, ti, pq, pt, n, w=w, s1q=s1q, s1t=s1t)
    else:
        qi, ti, gcounts, pq0, pt0, s1q, s1t = _reduce_pairs(
            *expand(0, K), n)

    keep = gcounts >= min_shared
    vals = dict(
        numshared=gcounts[keep].astype(np.int32),
        seedQ0=pq0[keep], seedT0=pt0[keep],
        seedQ1=s1q[keep], seedT1=s1t[keep],
    )
    mat = COOMatrix(rows=qi[keep].astype(np.int64),
                    cols=ti[keep].astype(np.int64),
                    vals=vals,
                    shape=(A.num_reads, A.num_reads))
    return SeedMatrix(mat=mat)
