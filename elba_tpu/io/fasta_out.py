"""Contig FASTA output (reference main.cpp:487-512): one record per contig
named >contig{i}, ids globally ordered across parts."""

from __future__ import annotations

from typing import List


def write_contigs_fasta(contigs: List[str], path: str, id_offset: int = 0) -> None:
    with open(path, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">contig{i + id_offset}\n{c}\n")
