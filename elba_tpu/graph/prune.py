"""Overlap-graph pruning: bad reads and contained reads.

Reproduces find_bad_reads / find_contained_reads (reference
main.cpp:553-582).  Note the reference's naming trap: Prune(pred, false)
RETURNS the copy with pred-entries removed, so its "badnzs" matrix actually
holds the *passed* alignments -- a read is deleted when
(passed + 1) / (degree + 1) <= cutoff.
"""

from __future__ import annotations

import numpy as np

from ..dsparse.coo import COOMatrix


def find_bad_reads(R: COOMatrix, cutoff: float) -> np.ndarray:
    """Read ids whose passed-alignment fraction is too low."""
    n = R.shape[0]
    deg = np.bincount(R.rows, minlength=n) + np.bincount(R.cols, minlength=n)
    passed = R.vals["passed"]
    good = (np.bincount(R.rows[passed], minlength=n)
            + np.bincount(R.cols[passed], minlength=n))
    ratio = (good.astype(np.float64) + 1) / (deg.astype(np.float64) + 1)
    return np.flatnonzero(ratio <= cutoff).astype(np.int64)


def find_contained_reads(R: COOMatrix) -> np.ndarray:
    """Read ids contained in another read (row-OR of containedQ plus
    col-OR of containedT, reference main.cpp:573-582)."""
    n = R.shape[0]
    out = np.zeros(n, dtype=bool)
    out[R.rows[R.vals["containedQ"]]] = True
    out[R.cols[R.vals["containedT"]]] = True
    return np.flatnonzero(out).astype(np.int64)


def prune_overlap_graph(R: COOMatrix, cutoff: float) -> COOMatrix:
    """The main.cpp:305-311 sequence: bad reads (computed on the full R),
    drop failed alignments, delete bad reads, then delete contained reads."""
    bad = find_bad_reads(R, cutoff)
    R = R.select(R.vals["passed"])
    R = R.prune_full(bad)
    contained = find_contained_reads(R)
    R = R.prune_full(contained)
    return R
