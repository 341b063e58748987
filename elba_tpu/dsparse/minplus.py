"""Min-plus semiring SpGEMM over Overlap matrices (transitive reduction).

Reference semantics (TransitiveReduction.hpp:78-110):
  multiply(e1, e2): valid only if both have a direction (arrows) and the
    composition is head-to-tail compatible (t2 != h1); result sets
    suffix_paths[2*t1 + h2] = e1.suffix + e2.suffix.
  add: elementwise min over the 4 suffix_paths slots.

Implemented as a sorted join on the middle vertex: for every vertex k,
cross the entries of column k of P with the entries of row k of R, then
segment-min the products by output key.  Entries whose products are all
invalid never materialize, which subsumes the reference's
Prune(NoPathSRing).
"""

from __future__ import annotations

import numpy as np

from ..utils.segments import expand_join_products
from .coo import COOMatrix

INF = np.int64(2**62)  # suffix_paths "no path" sentinel (INT_MAX in reference)


def minplus_spgemm(P: COOMatrix, R: COOMatrix) -> COOMatrix:
    """N = P . R under the min-plus direction-composing semiring.

    P entries need vals direction(int8), suffix; R likewise.  Returns a
    COOMatrix with vals suffix_paths (int64[nnz, 4]) and direction=-1
    (products are pure path entries, reference Overlap() default).
    """
    n = P.shape[0]
    nrows = np.int64(n)

    pdir = P.vals["direction"]
    rdir = R.vals["direction"]
    empty = COOMatrix(np.zeros(0, np.int64), np.zeros(0, np.int64),
                      dict(suffix_paths=np.zeros((0, 4), np.int64),
                           direction=np.zeros(0, np.int8),
                           suffix=np.zeros(0, np.int64)),
                      P.shape)

    def _join(psel, rsel):
        """Expand psel x rsel products joined on middle vertex (left
        grouped by column, right by row).  Returns (i, j, slot, val)."""
        z = np.zeros(0, np.int64)
        if len(psel) == 0 or len(rsel) == 0:
            return z, z, z, z
        lorder = psel[np.argsort(P.cols[psel], kind="stable")]
        rorder = rsel[np.argsort(R.rows[rsel], kind="stable")]
        lcounts = np.bincount(P.cols[lorder], minlength=n)
        rcounts = np.bincount(R.rows[rorder], minlength=n)
        lstarts = np.concatenate([[0], np.cumsum(lcounts)[:-1]])
        rstarts = np.concatenate([[0], np.cumsum(rcounts)[:-1]])
        li, ri = expand_join_products(lstarts, lcounts, rstarts, rcounts)
        if len(li) == 0:
            return z, z, z, z
        li = lorder[li]
        ri = rorder[ri]
        t1 = (pdir[li].astype(np.int64) >> 1) & 1
        h2 = rdir[ri].astype(np.int64) & 1
        slot = 2 * t1 + h2
        val = P.vals["suffix"][li].astype(np.int64) + \
            R.vals["suffix"][ri].astype(np.int64)
        return P.rows[li], R.cols[ri], slot, val

    # the composition is valid iff t2 != h1, so pre-partition the (small)
    # edge lists by those bits and expand only the two valid combinations
    # -- half the products of a full cross join, and no O(products)
    # direction gathers or validity filter.  Product ORDER differs from a
    # canonical full join, which is safe: the only reduction is an
    # order-independent elementwise min (np.minimum.at below).
    h1 = pdir & 1
    t2 = (rdir >> 1) & 1
    pv, rv = pdir != -1, rdir != -1
    parts = [_join(np.flatnonzero(pv & (h1 == 0)),
                   np.flatnonzero(rv & (t2 == 1))),
             _join(np.flatnonzero(pv & (h1 == 1)),
                   np.flatnonzero(rv & (t2 == 0)))]
    i = np.concatenate([p[0] for p in parts])
    j = np.concatenate([p[1] for p in parts])
    slot = np.concatenate([p[2] for p in parts])
    val = np.concatenate([p[3] for p in parts])
    if len(i) == 0:
        return empty

    key = j * nrows + i
    order = np.argsort(key, kind="stable")
    key, i, j, slot, val = key[order], i[order], j[order], slot[order], val[order]
    bound = np.ones(len(key), dtype=bool)
    bound[1:] = key[1:] != key[:-1]
    gid = np.cumsum(bound) - 1
    ng = int(gid[-1]) + 1

    paths = np.full((ng, 4), INF, dtype=np.int64)
    np.minimum.at(paths, (gid, slot), val)

    starts = np.flatnonzero(bound)
    return COOMatrix(rows=i[starts].astype(np.int64),
                     cols=j[starts].astype(np.int64),
                     vals=dict(suffix_paths=paths,
                               direction=np.full(ng, -1, np.int8),
                               suffix=np.zeros(ng, np.int64)),
                     shape=P.shape)
