"""Transitive reduction of the overlap graph (reference
TransitiveReduction.cpp:3-100).

Steps:
  1. symmetricize: S = R + transpose(R with Q/T fields swapped)
  2. F = S with FUZZ added to the suffixes (robustness slack)
  3. mark edge (i,j) transitive when
     suffix(i,j) + FUZZ >= N(i,j).suffix_paths[direction(i,j)] with
     N = S . S under the min-plus direction-composing semiring, then
     symmetricize the marks.  The reference iterates P = N until |T|
     stabilizes, but products carry direction=-1 and multiply requires
     a direction on the left operand, so N2 = N . S is always empty and
     one marking pass IS the fixpoint (MinPlusSR.multiply guard at
     TransitiveReduction.hpp:95).  The marks are computed by a masked
     SpGEMM that never materializes N (see _transitive_mask).
  4. remove T-marked edges from S, then drop direction == -1 leftovers.
"""

from __future__ import annotations

import numpy as np

from ..dsparse.coo import COOMatrix
from ..params import TR_FUZZ
from ..utils.segments import expand_join_products


def overlap_transpose_values(vals):
    """Swap query/target roles in the Overlap SoA (reference
    Overlap.hpp:42-68: swaps beg/end/len pairs, suffix<->suffixT,
    direction<->directionT, containedQ<->containedT; keeps score/rc/seed)."""
    out = dict(vals)
    for a, b in [("begQ", "begT"), ("endQ", "endT"), ("lenQ", "lenT"),
                 ("suffix", "suffixT"), ("direction", "directionT"),
                 ("containedQ", "containedT")]:
        out[a], out[b] = vals[b], vals[a]
    return out


def symmetricize(R: COOMatrix) -> COOMatrix:
    RT = R.transpose(overlap_transpose_values)
    return R.add_keep_lhs(RT)


def _transitive_mask_native(S: COOMatrix) -> np.ndarray | None:
    """Native OpenMP marking kernel (native/trmark.cpp): same marks as
    _transitive_mask, computed per middle vertex with two-pointer sorted
    intersections instead of materialized product lists.  Returns None
    when the native library is unavailable."""
    from ..native.loader import get_lib
    lib = get_lib()
    if lib is None:
        return None
    import ctypes
    rows = np.ascontiguousarray(S.rows, dtype=np.int64)
    cols = np.ascontiguousarray(S.cols, dtype=np.int64)
    dirs = np.ascontiguousarray(S.vals["direction"], dtype=np.int8)
    suffix = np.ascontiguousarray(S.vals["suffix"], dtype=np.int32)
    mark = np.zeros(S.nnz, dtype=np.uint8)
    lib.tr_mark(rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                suffix.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                np.int64(S.nnz), np.int64(S.shape[0]), np.int32(TR_FUZZ),
                mark.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mark.view(bool)


def _transitive_mask(S: COOMatrix) -> np.ndarray:
    """bool[S.nnz]: edges the min-plus marking step declares transitive.

    Semantically `suffix(i,j) + FUZZ >= N(i,j).suffix_paths[direction]`
    with N = S.S under the min-plus direction-composing semiring — but
    computed WITHOUT materializing N (a masked SpGEMM): the comparison
    against a min over 2-paths holds iff SOME product satisfies it, and
    only products landing on S's own nonzero positions can affect the
    marks, so each product is binary-searched into S's sorted key array
    and tested directly.  This skips the O(products) sort + segment-min
    of minplus_spgemm (the dominant host cost at scale) while producing
    identical marks.
    """
    nn = int(S.shape[0])
    # per-product work is pure gathers + arithmetic; run it in int32
    # whenever the composite key space fits (suffixes are < read length,
    # so sums stay far below 2^31)
    kdt = np.int32 if nn * nn < 2**31 else np.int64
    n = kdt(nn)
    sdir = S.vals["direction"]
    srows = S.rows.astype(kdt)
    scols = S.cols.astype(kdt)
    suffix = S.vals["suffix"].astype(np.int32)
    fuzzed = suffix + np.int32(TR_FUZZ)
    skey = scols * n + srows  # canonical order: sorted ascending

    transitive = np.zeros(S.nnz, dtype=bool)
    h1 = sdir & 1
    t2 = (sdir >> 1) & 1
    valid = sdir != -1

    # composition is valid iff t2 != h1 (TransitiveReduction.hpp:95):
    # expand only the two valid bit combinations, joined on the middle
    # vertex (left grouped by column, right by row)
    for lmask, rmask in ((valid & (h1 == 0), valid & (t2 == 1)),
                         (valid & (h1 == 1), valid & (t2 == 0))):
        lsel = np.flatnonzero(lmask)
        rsel = np.flatnonzero(rmask)
        if len(lsel) == 0 or len(rsel) == 0:
            continue
        lorder = lsel[np.argsort(S.cols[lsel], kind="stable")]
        rorder = rsel[np.argsort(S.rows[rsel], kind="stable")]
        lcounts = np.bincount(S.cols[lorder], minlength=nn)
        rcounts = np.bincount(S.rows[rorder], minlength=nn)
        lstarts = np.cumsum(lcounts) - lcounts
        rstarts = np.cumsum(rcounts) - rcounts
        li, ri = expand_join_products(lstarts, lcounts, rstarts, rcounts)
        if len(li) == 0:
            continue
        li = lorder[li].astype(kdt, copy=False)
        ri = rorder[ri].astype(kdt, copy=False)
        key = scols[ri] * n + srows[li]
        idx = np.minimum(np.searchsorted(skey, key), S.nnz - 1)
        hit = skey[idx] == key
        # the product's suffix_paths slot must be the edge's direction
        # (sdir == -1 never equals a slot in 0..3, subsuming has_dir)
        slot = (2 * ((sdir[li].astype(np.int8) >> 1) & 1)
                + (sdir[ri].astype(np.int8) & 1))
        cond = hit & (sdir[idx] == slot) & \
            (fuzzed[idx] >= suffix[li] + suffix[ri])
        transitive[idx[cond]] = True
    return transitive


def transitive_reduction(R: COOMatrix) -> COOMatrix:
    S = symmetricize(R)
    n = np.int64(S.shape[0])
    skey = S.key()

    transitive = _transitive_mask_native(S)
    if transitive is None:
        transitive = _transitive_mask(S)
    # symmetricize the marks (I += I^T, reference :69-74)
    tkey = S.rows[transitive] * n + S.cols[transitive]
    idx = np.minimum(np.searchsorted(skey, tkey), max(S.nnz - 1, 0))
    if len(idx):
        transitive[idx[skey[idx] == tkey]] = True

    # the reference loops P = N until |T| stabilizes; every N entry has
    # direction -1, which the semiring rejects as a left operand, so the
    # second iteration's products are empty and the marks above are
    # already the fixpoint (TransitiveReduction.hpp:95, and the former
    # looped implementation of this function behaved identically)

    # S = S where T absent (EWiseApply negated mask + InvalidSRing prune)
    S = S.select(~transitive)
    return S.select(S.vals["direction"] != -1)
