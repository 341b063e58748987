"""Chimeric-read trimming via coverage pileup (reference
PruneChimeras.{hpp,cpp} -- compiled but not invoked by the reference's
main; provided here for capability parity and as a usable pipeline stage).

For every read, accumulate the overlap intervals covering it (the target
coordinates of its column's nonzeros, PruneChimeras.cpp:137-147; the
distributed version Allreduce(SUM)s the pileup over the column
subcommunicator, :153).  The trimmed interval is the densest coverage
window of length > 2500 with per-base coverage >= threshold.

Note: the reference's GetTrimmedInterval computes best{start,end} but
returns the *trailing* run {start, end} (PruneChimeras.cpp:66 returns the
loop variables) -- an apparent bug in never-exercised code.  We implement
the evidently intended best-window semantics by default and expose the
literal trailing-run behavior behind `literal=True`.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..dsparse.coo import COOMatrix

MIN_SPAN = 2500  # maxlen seed value in the reference (:35)


def read_pileups(R: COOMatrix, lengths: np.ndarray) -> List[np.ndarray]:
    """Coverage pileup per read: for each overlap nonzero (q, t), the
    interval [begT, endT) covers read t (column read)."""
    n = R.shape[0]
    piles = [np.zeros(int(lengths[i]), dtype=np.int32) for i in range(n)]
    begT = R.vals["begT"]
    endT = R.vals["endT"]
    for e in range(R.nnz):
        t = int(R.cols[e])
        b, d = int(begT[e]), int(endT[e])
        if d > b:
            piles[t][b:d] += 1
    return piles


def trimmed_interval(pileup: np.ndarray, threshold: int,
                     literal: bool = False) -> Optional[Tuple[int, int]]:
    """Best (or literal trailing) >=threshold coverage window; None if no
    window longer than MIN_SPAN qualifies."""
    ok = pileup >= threshold
    best = None
    bestavg = 0.0
    maxlen = MIN_SPAN
    start = None
    cur = 0
    last_run = None
    n = len(pileup)
    i = 0
    while i < n:
        if ok[i]:
            if start is None:
                start = i
                cur = 0
            cur += int(pileup[i])
            span = i - start + 1
            avg = cur / span
            last_run = (start, i)
            if span > maxlen and avg > bestavg:
                best = (start, i)
                maxlen = span
                bestavg = avg
        else:
            start = None
            last_run = None
        i += 1
    if literal:
        return last_run
    return best


def prune_chimeras(R: COOMatrix, lengths: np.ndarray, threshold: int = 2
                   ) -> np.ndarray:
    """Read ids whose pileup has NO dense window (candidate chimeras /
    junk reads); callers may PruneFull these like bad reads."""
    piles = read_pileups(R, lengths)
    out = []
    for i, p in enumerate(piles):
        if len(p) and trimmed_interval(p, threshold) is None:
            out.append(i)
    return np.array(out, dtype=np.int64)
