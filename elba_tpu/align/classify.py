"""Alignment classification and Overlap field computation (vectorized).

Reproduces classify_alignment (reference XDropAligner.cpp:7-44) and the
field filling of Overlap::extend_overlap (reference src/Overlap.cpp:20-73):
containment tests on the overhangs, the Chernoff-style quality threshold
score < (1 - 0.1) * 0.99 * overlap, the 500bp minimum overlap, and the
2-bit direction code (tail << 1 | head) with suffix lengths.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..params import DELTA_CHERNOFF, MIN_OVERLAP_LEN

# OverlapClass (reference XDropAligner.hpp:11-18)
BAD_ALIGNMENT = 0
FIRST_CONTAINED = 1
SECOND_CONTAINED = 2
FIRST_TO_SECOND = 3
SECOND_TO_FIRST = 4


def classify_and_fill(score, begQ, endQ, begT, endT, rc, lenQ, lenT
                      ) -> Dict[str, np.ndarray]:
    """All inputs are parallel arrays (one entry per aligned pair).
    Returns the Overlap value SoA (without matrix indices)."""
    score = np.asarray(score, np.int32)
    begQ = np.asarray(begQ, np.int32)
    endQ = np.asarray(endQ, np.int32)
    begT = np.asarray(begT, np.int32)
    endT = np.asarray(endT, np.int32)
    rc = np.asarray(rc, bool)
    lenQ = np.asarray(lenQ, np.int32)
    lenT = np.asarray(lenT, np.int32)

    begTr = np.where(rc, lenT - endT, begT)
    endTr = np.where(rc, lenT - begT, endT)

    maplen = ((endT - begT) + (endQ - begQ)) // 2
    overhang = np.minimum(begQ, begTr) + np.minimum(lenQ - endQ, lenT - endTr)
    overlap = maplen + overhang
    thr = (1.0 - DELTA_CHERNOFF) * (0.99 * overlap.astype(np.float64))

    q_contained = (begQ <= begTr) & (lenQ - endQ <= lenT - endTr)
    t_contained = (begQ >= begTr) & (lenQ - endQ >= lenT - endTr)
    lowqual = (score.astype(np.float64) < thr) | (overlap < MIN_OVERLAP_LEN)

    kind = np.full(score.shape, BAD_ALIGNMENT, np.int8)
    # order of tests matches the reference's if/else chain
    cond_fc = q_contained
    cond_sc = ~cond_fc & t_contained
    cond_bad = ~cond_fc & ~cond_sc & lowqual
    cond_f2s = ~cond_fc & ~cond_sc & ~cond_bad & (begQ > begTr)
    cond_s2f = ~cond_fc & ~cond_sc & ~cond_bad & ~(begQ > begTr)
    kind[cond_fc] = FIRST_CONTAINED
    kind[cond_sc] = SECOND_CONTAINED
    kind[cond_f2s] = FIRST_TO_SECOND
    kind[cond_s2f] = SECOND_TO_FIRST
    kind[score <= 0] = BAD_ALIGNMENT

    passed = kind != BAD_ALIGNMENT

    direction = np.full(score.shape, -1, np.int8)
    directionT = np.full(score.shape, -1, np.int8)
    suffix = np.zeros(score.shape, np.int32)
    suffixT = np.zeros(score.shape, np.int32)

    f2s = kind == FIRST_TO_SECOND
    s2f = kind == SECOND_TO_FIRST
    direction[f2s] = np.where(rc[f2s], 0, 1)
    directionT[f2s] = np.where(rc[f2s], 0, 2)
    suffix[f2s] = ((lenT - endTr) - (lenQ - endQ))[f2s]
    suffixT[f2s] = (begQ - begTr)[f2s]
    direction[s2f] = np.where(rc[s2f], 3, 2)
    directionT[s2f] = np.where(rc[s2f], 3, 1)
    suffix[s2f] = (begTr - begQ)[s2f]
    suffixT[s2f] = ((lenQ - endQ) - (lenT - endTr))[s2f]

    return dict(
        begQ=begQ, begT=begT, endQ=endQ, endT=endT,
        lenQ=lenQ, lenT=lenT,
        score=score, rc=rc,
        passed=passed,
        containedQ=kind == FIRST_CONTAINED,
        containedT=kind == SECOND_CONTAINED,
        direction=direction, directionT=directionT,
        suffix=suffix, suffixT=suffixT,
    )


def classify_and_fill_jnp(score, begQ, endQ, begT, endT, rc, lenQ, lenT):
    """jnp twin of classify_and_fill for use inside jitted SPMD programs
    (the on-mesh graph phase).  Same integer/float arithmetic; where-chains
    replace boolean-mask assignment.  Equivalence is pinned by
    tests/test_dist_graph.py."""
    import jax.numpy as jnp

    score = score.astype(jnp.int32)
    begQ = begQ.astype(jnp.int32)
    endQ = endQ.astype(jnp.int32)
    begT = begT.astype(jnp.int32)
    endT = endT.astype(jnp.int32)
    rc = rc.astype(bool)
    lenQ = lenQ.astype(jnp.int32)
    lenT = lenT.astype(jnp.int32)

    begTr = jnp.where(rc, lenT - endT, begT)
    endTr = jnp.where(rc, lenT - begT, endT)

    maplen = ((endT - begT) + (endQ - begQ)) // 2
    overhang = (jnp.minimum(begQ, begTr)
                + jnp.minimum(lenQ - endQ, lenT - endTr))
    overlap = maplen + overhang
    thr = (1.0 - DELTA_CHERNOFF) * (0.99 * overlap.astype(jnp.float64))

    q_contained = (begQ <= begTr) & (lenQ - endQ <= lenT - endTr)
    t_contained = (begQ >= begTr) & (lenQ - endQ >= lenT - endTr)
    lowqual = (score.astype(jnp.float64) < thr) | (overlap < MIN_OVERLAP_LEN)

    cond_fc = q_contained
    cond_sc = ~cond_fc & t_contained
    cond_bad = ~cond_fc & ~cond_sc & lowqual
    cond_f2s = ~cond_fc & ~cond_sc & ~cond_bad & (begQ > begTr)
    cond_s2f = ~cond_fc & ~cond_sc & ~cond_bad & ~(begQ > begTr)

    kind = jnp.full(score.shape, BAD_ALIGNMENT, jnp.int8)
    kind = jnp.where(cond_fc, FIRST_CONTAINED, kind)
    kind = jnp.where(cond_sc, SECOND_CONTAINED, kind)
    kind = jnp.where(cond_f2s, FIRST_TO_SECOND, kind)
    kind = jnp.where(cond_s2f, SECOND_TO_FIRST, kind)
    kind = jnp.where(score <= 0, BAD_ALIGNMENT, kind)

    passed = kind != BAD_ALIGNMENT
    f2s = kind == FIRST_TO_SECOND
    s2f = kind == SECOND_TO_FIRST

    direction = jnp.where(
        f2s, jnp.where(rc, 0, 1),
        jnp.where(s2f, jnp.where(rc, 3, 2), -1)).astype(jnp.int8)
    directionT = jnp.where(
        f2s, jnp.where(rc, 0, 2),
        jnp.where(s2f, jnp.where(rc, 3, 1), -1)).astype(jnp.int8)
    suffix = jnp.where(
        f2s, (lenT - endTr) - (lenQ - endQ),
        jnp.where(s2f, begTr - begQ, 0)).astype(jnp.int32)
    suffixT = jnp.where(
        f2s, begQ - begTr,
        jnp.where(s2f, (lenQ - endQ) - (lenT - endTr), 0)).astype(jnp.int32)

    return dict(
        begQ=begQ, begT=begT, endQ=endQ, endT=endT,
        lenQ=lenQ, lenT=lenT,
        score=score, rc=rc,
        passed=passed,
        containedQ=kind == FIRST_CONTAINED,
        containedT=kind == SECOND_CONTAINED,
        direction=direction, directionT=directionT,
        suffix=suffix, suffixT=suffixT,
    )
