"""Transitive reduction of the overlap graph (reference
TransitiveReduction.cpp:3-100).

Steps:
  1. symmetricize: S = R + transpose(R with Q/T fields swapped)
  2. F = S with FUZZ added to the suffixes (robustness slack)
  3. fixpoint loop: N = P . S under the min-plus direction-composing
     semiring; mark edge (i,j) transitive when
     suffix(i,j) + FUZZ >= N(i,j).suffix_paths[direction(i,j)];
     symmetricize the marks; accumulate into T; P = N; repeat until
     |T| stops changing.
     (Because products carry direction=-1 and multiply requires a
     direction on the left operand, N2 = N . S is always empty, so the
     loop converges on the second iteration -- faithfully matching the
     reference implementation's behavior, see MinPlusSR.multiply guard at
     TransitiveReduction.hpp:95.)
  4. remove T-marked edges from S, then drop direction == -1 leftovers.
"""

from __future__ import annotations

import numpy as np

from ..dsparse.coo import COOMatrix
from ..dsparse.minplus import minplus_spgemm, INF
from ..params import TR_FUZZ


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


def transitive_reduction(R: COOMatrix) -> COOMatrix:
    S = symmetricize(R)
    n = np.int64(S.shape[0])

    # T accumulates transitive-edge keys (col-major composite keys)
    t_keys = np.zeros(0, dtype=np.int64)

    P = S
    while True:
        prev = len(t_keys)
        N = minplus_spgemm(P, S)
        P = N

        if N.nnz:
            # GreaterThanSR over F = S + FUZZ against N (absent N -> INF)
            dirs = S.vals["direction"]
            has_dir = dirs != -1
            nidx = N.lookup(S.rows, S.cols)
            path = np.full(S.nnz, INF, dtype=np.int64)
            found = nidx >= 0
            sel = found & has_dir
            path[sel] = N.vals["suffix_paths"][nidx[sel],
                                               dirs[sel].astype(np.int64)]
            fuzzed = S.vals["suffix"].astype(np.int64) + TR_FUZZ
            transitive = has_dir & (fuzzed >= path)

            marks = S.key()[np.flatnonzero(transitive)]
            # symmetricize the marks (I += I^T, reference :69-74)
            ti = S.rows[transitive]
            tj = S.cols[transitive]
            marks_t = ti * n + tj  # transposed key: row becomes col
            t_keys = np.unique(np.concatenate([t_keys, marks, marks_t]))

        if len(t_keys) == prev:
            break

    # S = S where T absent (EWiseApply negated mask + InvalidSRing prune)
    key = S.key()
    in_t = np.isin(key, t_keys)
    S = S.select(~in_t)
    return S.select(S.vals["direction"] != -1)
