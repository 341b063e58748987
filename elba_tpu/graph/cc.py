"""Connected components on a symmetric sparse pattern.

The reference vendors a CombBLAS Awerbuch-Shiloach/LACC implementation
(CC.hpp:1404-1544: conditional/unconditional hooking via Select2ndMin SpMV,
star checks, pointer-jumping shortcuts).  The TPU-native equivalent is
min-label propagation with pointer jumping: per sweep every vertex takes
the minimum label over itself and its neighbors (a segment-min "SpMV"),
then labels are compressed by label = label[label] until stable.  Both
converge to the same canonical labeling: every vertex gets the minimum
vertex id of its component, then components are renumbered 0..C-1 in root
order (reference LabelCC, CC.hpp:1383-1401).
"""

from __future__ import annotations

import numpy as np


def connected_components(rows: np.ndarray, cols: np.ndarray, n: int):
    """Return (assignments int64[n], num_components).

    rows/cols: edge endpoint arrays (symmetric or not -- both directions
    are used).  Isolated vertices form their own components.
    """
    parent = np.arange(n, dtype=np.int64)
    while True:
        m = parent.copy()
        if len(rows):
            np.minimum.at(m, rows, parent[cols])
            np.minimum.at(m, cols, parent[rows])
        # pointer jumping until stable
        while True:
            mm = m[m]
            if np.array_equal(mm, m):
                break
            m = mm
        if np.array_equal(m, parent):
            break
        parent = m

    roots = np.unique(parent)
    # renumber components 0..C-1 ordered by root vertex id
    assignments = np.searchsorted(roots, parent).astype(np.int64)
    return assignments, len(roots)
