"""Contig FASTA output (reference main.cpp:487-512): one record per contig
named >contig{i}, ids globally ordered across parts."""

from __future__ import annotations

from typing import List


def contigs_fasta_bytes(contigs: List[str], id_offset: int = 0) -> bytes:
    """FASTA text for a part's contigs; id_offset is the exclusive scan of
    contig counts over preceding parts (reference Exscan, main.cpp:492)."""
    return "".join(f">contig{i + id_offset}\n{c}\n"
                   for i, c in enumerate(contigs)).encode()


def write_contigs_fasta(contigs: List[str], path: str, id_offset: int = 0) -> None:
    with open(path, "wb") as f:
        f.write(contigs_fasta_bytes(contigs, id_offset))
