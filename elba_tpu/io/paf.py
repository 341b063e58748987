"""PAF output matching the reference writer (main.cpp:514-551).

Column order: nameQ lenQ begQ endQ strand nameT lenT begT endT score maplen
255 passed -- including the reference's maplen quirk
max(endQ - begQ, endT - endT) == endQ - begQ (main.cpp:538) and the
13th `passed` column.  Entries are emitted in column-major order, which is
the reference's single-process DCSC traversal order.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..dsparse.coo import COOMatrix


def paf_lines(R: COOMatrix, names: List[str]) -> List[str]:
    m = R.sorted()
    v = m.vals
    out = []
    maplen = np.maximum(v["endQ"] - v["begQ"], 0)
    strand = np.where(v["rc"], "-", "+")
    for idx in range(m.nnz):
        out.append("\t".join((
            names[m.rows[idx]], str(v["lenQ"][idx]), str(v["begQ"][idx]),
            str(v["endQ"][idx]), strand[idx],
            names[m.cols[idx]], str(v["lenT"][idx]), str(v["begT"][idx]),
            str(v["endT"][idx]), str(v["score"][idx]), str(maplen[idx]),
            "255", str(int(v["passed"][idx])))))
    return out


def write_paf(R: COOMatrix, names: List[str], path: str) -> None:
    with open(path, "w") as f:
        for line in paf_lines(R, names):
            f.write(line + "\n")
