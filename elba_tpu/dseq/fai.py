"""FASTA index (.fai) parsing and the base-balanced 1D read partition.

The greedy partition rule is reproduced exactly from the reference
(FastaIndex.cpp:47-94) because it determines read ownership and hence all
downstream global ids: for each of the first nparts-1 parts, accumulate
consecutive reads while (bases_so_far + next_len) < avg_bases_per_part; the
last part receives the remainder.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np


@dataclasses.dataclass
class FaidxRecord:
    """One .fai line: name, sequence length, file offset of first base,
    bases per line (reference FastaIndex.hpp:10, FastaIndex.cpp:15-23)."""
    name: str
    length: int
    pos: int
    bases_per_line: int


def parse_faidx(path: str) -> List[FaidxRecord]:
    records = []
    with open(path, "r") as f:
        for line in f:
            if not line.strip():
                continue
            parts = line.split("\t")
            # samtools faidx columns: NAME LENGTH OFFSET LINEBASES LINEWIDTH
            records.append(
                FaidxRecord(
                    name=parts[0],
                    length=int(parts[1]),
                    pos=int(parts[2]),
                    bases_per_line=int(parts[3]),
                ))
    return records


def greedy_partition(lengths: Sequence[int], nparts: int) -> np.ndarray:
    """Return per-part read counts using the reference's greedy rule
    (FastaIndex.cpp:69-93).  Ordered partition of reads balanced by bases;
    the last part tends to get more than average."""
    lengths = np.asarray(lengths, dtype=np.int64)
    numreads = len(lengths)
    totbases = int(lengths.sum())
    avg = totbases / nparts
    counts = np.zeros(nparts, dtype=np.int64)
    readid = 0
    for i in range(nparts - 1):
        bases_so_far = 0
        start = readid
        while readid < numreads and bases_so_far + lengths[readid] < avg:
            bases_so_far += int(lengths[readid])
            readid += 1
        got = readid - start
        if got < 1:
            raise ValueError(
                f"partition failed: part {i} would receive zero reads "
                f"({numreads} reads over {nparts} parts)")
        counts[i] = got
    counts[nparts - 1] = numreads - readid
    return counts


def read_owner(displs: np.ndarray, readid: int) -> int:
    """Owner part of a global read id given the exclusive-scan displacement
    array with total appended (reference FastaIndex.cpp:25-45)."""
    return int(np.searchsorted(displs, readid, side="right") - 1)
