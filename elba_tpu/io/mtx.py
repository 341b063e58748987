"""Matrix Market dumps of the pipeline matrices (reference
ELBALogger.cpp:5-43: A at LOG_LEVEL>=3, B and R at >=2, via
ParallelWriteMM with custom value printers)."""

from __future__ import annotations

import numpy as np


def write_mtx_kmer_matrix(A, path: str) -> None:
    """A: reads x kmers, value = position (reference IOHandler prints the
    PosInRead value)."""
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write(f"{A.num_reads} {A.num_kmers} {A.nnz}\n")
        order = np.lexsort((A.rows, A.cols))
        for i in order:
            f.write(f"{A.rows[i] + 1} {A.cols[i] + 1} {A.pos[i]}\n")


def write_mtx_seed_matrix(B, path: str, brief: bool = True) -> None:
    """B: reads x reads SharedSeeds; brief form prints numstored and
    numshared (reference SharedSeeds::IOHandlerBrief)."""
    m = B.mat
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write(f"{m.shape[0]} {m.shape[1]} {m.nnz}\n")
        ns = m.vals["numshared"]
        for i in range(m.nnz):
            stored = min(2, int(ns[i]))
            if brief:
                f.write(f"{m.rows[i] + 1} {m.cols[i] + 1} "
                        f"{stored}\t{ns[i]}\n")
            else:
                f.write(
                    f"{m.rows[i] + 1} {m.cols[i] + 1} "
                    f"{{({m.vals['seedQ0'][i]},{m.vals['seedT0'][i]}),"
                    f"({m.vals['seedQ1'][i]},{m.vals['seedT1'][i]}),"
                    f"{ns[i]}}}\n")


def write_mtx_overlap_matrix(R, path: str) -> None:
    """R: Overlap nonzeros (reference Overlap operator<< field order:
    lenQ begQ endQ rc lenT begT endT score direction suffix)."""
    v = R.vals
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write(f"{R.shape[0]} {R.shape[1]} {R.nnz}\n")
        for i in range(R.nnz):
            rcflag = "-" if v["rc"][i] else "+"
            f.write(f"{R.rows[i] + 1} {R.cols[i] + 1} "
                    f"{v['lenQ'][i]}\t{v['begQ'][i]}\t{v['endQ'][i]}\t"
                    f"{rcflag}\t{v['lenT'][i]}\t{v['begT'][i]}\t"
                    f"{v['endT'][i]}\t{v['score'][i]}\t"
                    f"{v['direction'][i]}\t{v['suffix'][i]}\n")
