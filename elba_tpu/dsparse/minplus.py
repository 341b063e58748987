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
    psel = np.flatnonzero(pdir != -1)
    rsel = np.flatnonzero(rdir != -1)
    empty = COOMatrix(np.zeros(0, np.int64), np.zeros(0, np.int64),
                      dict(suffix_paths=np.zeros((0, 4), np.int64),
                           direction=np.zeros(0, np.int8),
                           suffix=np.zeros(0, np.int64)),
                      P.shape)
    if len(psel) == 0 or len(rsel) == 0:
        return empty

    # left side grouped by column (middle vertex), right side by row
    lorder = psel[np.argsort(P.cols[psel], kind="stable")]
    rorder = rsel[np.argsort(R.rows[rsel], kind="stable")]
    lk = P.cols[lorder]
    rk = R.rows[rorder]
    lcounts = np.bincount(lk, minlength=n)
    rcounts = np.bincount(rk, minlength=n)
    lstarts = np.concatenate([[0], np.cumsum(lcounts)[:-1]])
    rstarts = np.concatenate([[0], np.cumsum(rcounts)[:-1]])

    li, ri = expand_join_products(lstarts, lcounts, rstarts, rcounts)
    if len(li) == 0:
        return empty
    li = lorder[li]
    ri = rorder[ri]

    d1 = pdir[li].astype(np.int64)
    d2 = rdir[ri].astype(np.int64)
    t1, h1 = (d1 >> 1) & 1, d1 & 1
    t2, h2 = (d2 >> 1) & 1, d2 & 1
    valid = t2 != h1
    li, ri = li[valid], ri[valid]
    t1, h2 = t1[valid], h2[valid]
    if len(li) == 0:
        return empty

    slot = (2 * t1 + h2).astype(np.int64)
    val = P.vals["suffix"][li].astype(np.int64) + \
        R.vals["suffix"][ri].astype(np.int64)
    i = P.rows[li]
    j = R.cols[ri]

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
