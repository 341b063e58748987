"""Scalar numpy oracle for X-drop seed-and-extend alignment.

This is an executable specification of the reference algorithm
(XDropAligner.cpp:46-282), written in antidiagonal/column coordinates:

  * three rolling antidiagonals ad1/ad2/ad3 indexed by column;
  * at antidiagonal number `ad_no`, live columns are [min_col, max_col);
  * a cell is `undef` when its score drops below best - dropoff;
  * the band advances/retracts past runs of undef cells and the loop ends
    when it empties.

Coordinate frame per direction (cols = extension length on Q + 1,
rows = extension length on T + 1):
  right extension: posQ = col - 1 + endQ,  posT = ad_no - col - 1 + endT
  left  extension: posQ = begQ - col,      posT = begT - (ad_no - col)

Quirks reproduced exactly:
  * `best_ext` is updated for every column whose score beats the best of
    all *previous* antidiagonals, so the LAST such column in scan order
    wins (not the maximum) -- reference :132-138.
  * the band bound checks compare against the *creation-time* extents of
    the previous antidiagonal buffers -- reference :143-155.
  * returned value is best_ext_score (the score at the recorded extension
    cell), not necessarily the global best.
"""

from __future__ import annotations

import numpy as np

INT_MIN = -(2**31)


def extend_one_direction_ref(seqQ: np.ndarray, seqT_eff: np.ndarray,
                             extleft: bool, begQ: int, endQ: int,
                             begT: int, endT: int,
                             mat: int, mis: int, gap: int, dropoff: int):
    """Extend a verified seed in one direction.

    seqT_eff must already be the reverse complement if the pair is rc
    (coordinates begT/endT are then in revcomp space), mirroring the
    reference's revcomp_at access (XDropAligner.cpp:119).

    Returns (best_ext_score, dQ, dT): the score and the extension deltas to
    apply to (begQ, begT) [extleft] or (endQ, endT) [right].
    """
    lenQ = len(seqQ)
    lenT = len(seqT_eff)
    lenQ_ext = begQ if extleft else lenQ - endQ
    lenT_ext = begT if extleft else lenT - endT
    cols = lenQ_ext + 1
    rows = lenT_ext + 1
    if rows == 1 or cols == 1:
        return 0, 0, 0

    length = 2 * max(cols, rows)
    min_err_score = INT_MIN // length
    gap = max(gap, min_err_score)
    mis = max(mis, min_err_score)
    undef = INT_MIN - gap - mis  # sentinel below any reachable score

    # antidiagonal buffers in column coordinates; (lo, hi) = creation extents
    ad2 = {0: 0}
    lo2, hi2 = 0, 0
    init = undef if (-gap > dropoff) else gap
    ad3 = {0: init, 1: init}
    lo3, hi3 = 0, 1

    min_col, max_col = 1, 2
    ad_no = 1
    best = 0
    best_ext_col = best_ext_row = best_ext_score = 0

    ad1, lo1, hi1 = None, 0, 0

    while min_col < max_col:
        ad_no += 1
        ad1, lo1, hi1 = ad2, lo2, hi2
        ad2, lo2, hi2 = ad3, lo3, hi3
        lo3, hi3 = min_col - 1, max_col
        ad3 = {}

        ad3[lo3] = ad3[hi3] = undef
        if ad_no * gap > best - dropoff:
            if lo3 == 0:
                ad3[0] = ad_no * gap
            if ad_no == max_col:
                ad3[max_col] = ad_no * gap

        ad_best = ad_no * gap

        for col in range(min_col, max_col):
            if extleft:
                posQ = cols - 1 - col          # = begQ - col
                posT = rows - 1 + col - ad_no  # = begT + col - ad_no
            else:
                posQ = col - 1 + endQ
                posT = ad_no - col - 1 + endT
            sub = mat if seqQ[posQ] == seqT_eff[posT] else mis
            temp = max(max(ad2[col - 1], ad2[col]) + gap, ad1[col - 1] + sub)
            if temp < best - dropoff:
                ad3[col] = undef
            else:
                ad3[col] = temp
                ad_best = max(ad_best, temp)
            if temp > best:
                best_ext_col = col
                best_ext_row = ad_no - col
                best_ext_score = ad3[col]

        best = max(best, ad_best)

        # advance min_col past leading undef runs (bounds are creation-time)
        while (min_col <= hi3 and ad3[min_col] == undef
               and min_col - 1 <= hi2 and ad2[min_col - 1] == undef):
            min_col += 1
        # retract max_col past trailing undef runs
        while (max_col - 1 >= lo3 and ad3[max_col - 1] == undef
               and ad2[max_col - 1] == undef):
            max_col -= 1
        max_col += 1

        min_col = max(min_col, ad_no + 2 - rows)
        max_col = min(max_col, cols)

    if extleft:
        return best_ext_score, -best_ext_col, -best_ext_row
    return best_ext_score, best_ext_col, best_ext_row


def xdrop_align_ref(seqQ: np.ndarray, seqT: np.ndarray, begQ: int, begT: int,
                    k: int, mat: int, mis: int, gap: int, dropoff: int):
    """Full seed-and-extend (reference xdrop_aligner, XDropAligner.cpp:232-282).

    Returns dict(score, begQ, endQ, begT, endT, rc) with begT/endT in the
    original (forward) T coordinates; score=-1 on seed rejection.
    """
    lenQ, lenT = len(seqQ), len(seqT)
    bad = dict(score=-1, begQ=0, endQ=0, begT=0, endT=0, rc=False)
    if begQ < 0 or begQ + k > lenQ or begT < 0 or begT + k > lenT:
        return bad
    if begQ == 0 and begT == 0:
        return bad

    # strand detection via the middle base of the seed (k odd)
    rc = seqQ[begQ + (k >> 1)] != seqT[begT + (k >> 1)]
    seqT_eff = (3 - seqT[::-1]).astype(seqT.dtype) if rc else seqT
    begT_s = lenT - begT - k if rc else begT

    # exact seed verification
    for i in range(k):
        if seqQ[begQ + i] != seqT_eff[begT_s + i]:
            return bad

    endQ, endT_s = begQ + k, begT_s + k

    lscore, dQ, dT = extend_one_direction_ref(
        seqQ, seqT_eff, True, begQ, endQ, begT_s, endT_s,
        mat, mis, gap, dropoff)
    begQ_ext, begT_ext = begQ + dQ, begT_s + dT
    rscore, dQ, dT = extend_one_direction_ref(
        seqQ, seqT_eff, False, begQ, endQ, begT_s, endT_s,
        mat, mis, gap, dropoff)
    endQ_ext, endT_ext = endQ + dQ, endT_s + dT

    score = lscore + rscore + mat * k
    return dict(
        score=int(score),
        begQ=int(begQ_ext), endQ=int(endQ_ext),
        begT=int(lenT - endT_ext) if rc else int(begT_ext),
        endT=int(lenT - begT_ext) if rc else int(endT_ext),
        rc=bool(rc),
    )
