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
    from ..native.loader import get_lib
    lib = get_lib()
    if lib is not None and R.nnz:
        import ctypes
        m = R.sorted()
        v = m.vals
        blob = "".join(names).encode()
        name_off = np.zeros(len(names) + 1, np.int64)
        name_off[1:] = np.cumsum([len(s) for s in names])
        cap = R.nnz * 280 + 1024
        out = ctypes.create_string_buffer(cap)
        a32 = lambda x: np.ascontiguousarray(x, np.int32)
        a8 = lambda x: np.ascontiguousarray(x, np.uint8)
        a64 = lambda x: np.ascontiguousarray(x, np.int64)
        p32 = ctypes.POINTER(ctypes.c_int32)
        p8 = ctypes.POINTER(ctypes.c_uint8)
        p64 = ctypes.POINTER(ctypes.c_int64)
        args = [a64(m.rows), a64(m.cols)]
        fields = [a32(v["lenQ"]), a32(v["begQ"]), a32(v["endQ"]),
                  a8(v["rc"]), a32(v["lenT"]), a32(v["begT"]),
                  a32(v["endT"]), a32(v["score"]), a8(v["passed"])]
        w = lib.format_paf(
            args[0].ctypes.data_as(p64), args[1].ctypes.data_as(p64),
            ctypes.c_int64(m.nnz),
            fields[0].ctypes.data_as(p32), fields[1].ctypes.data_as(p32),
            fields[2].ctypes.data_as(p32), fields[3].ctypes.data_as(p8),
            fields[4].ctypes.data_as(p32), fields[5].ctypes.data_as(p32),
            fields[6].ctypes.data_as(p32), fields[7].ctypes.data_as(p32),
            fields[8].ctypes.data_as(p8),
            ctypes.c_char_p(blob), name_off.ctypes.data_as(p64),
            out, ctypes.c_int64(cap))
        if w >= 0:
            with open(path, "wb") as f:
                f.write(out.raw[:w])
            return
    with open(path, "w") as f:
        for line in paf_lines(R, names):
            f.write(line + "\n")
