"""Sequence layer: FASTA index parsing, base-balanced read partitioning,
2-bit packed read storage (struct-of-arrays), and ASCII round trips.

Replaces the reference's FastaIndex / DnaSeq / DnaBuffer /
DistributedFastaData stack (reference include/FastaIndex.hpp,
include/DnaSeq.hpp, include/DnaBuffer.hpp, include/DistributedFastaData.hpp)
with flat numpy/JAX arrays: per-base 2-bit codes live in a flat uint8 array
plus (offset, length) views, and a 4-bases-per-byte packed form is provided
for compact storage and IO parity.
"""

from .fai import FaidxRecord, parse_faidx, greedy_partition, read_owner
from .dna import (
    ReadSet,
    ascii_to_codes,
    codes_to_ascii,
    revcomp_codes,
    pack_2bit,
    unpack_2bit,
    load_fasta,
)
