"""2-bit DNA storage as struct-of-arrays.

Code mapping matches the reference (DnaSeq.hpp:136-154): A/a -> 0, C/c -> 1,
G/g -> 2, T/t -> 3, N/n -> 0 (N is treated as A).  Reverse complement of a
code is 3 - code (DnaSeq.hpp:119).

Packed form is 4 bases/byte MSB-first (base i in bits 6-2*(i%4);
DnaSeq.cpp:48-54), provided for compact storage and round-trip tests; the
compute path uses one code byte per base, which maps cleanly onto TPU int8
lanes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from .fai import FaidxRecord, parse_faidx

# ASCII -> 2-bit code lookup (everything unknown -> 0, like N).
_CODE_LUT = np.zeros(256, dtype=np.uint8)
for _c, _v in [("A", 0), ("a", 0), ("C", 1), ("c", 1), ("G", 2), ("g", 2),
               ("T", 3), ("t", 3), ("N", 0), ("n", 0)]:
    _CODE_LUT[ord(_c)] = _v

_CHAR_LUT = np.frombuffer(b"ACGT", dtype=np.uint8)


def ascii_to_codes(s: bytes | str) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode()
    arr = np.frombuffer(s, dtype=np.uint8)
    return _CODE_LUT[arr]


def codes_to_ascii(codes: np.ndarray) -> str:
    return _CHAR_LUT[codes].tobytes().decode()


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return (3 - codes[::-1]).astype(np.uint8)


def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """Pack per-base codes into 4 bases/byte, MSB-first."""
    n = len(codes)
    nbytes = (n + 3) // 4
    padded = np.zeros(nbytes * 4, dtype=np.uint8)
    padded[:n] = codes
    q = padded.reshape(nbytes, 4)
    return (q[:, 0] << 6 | q[:, 1] << 4 | q[:, 2] << 2 | q[:, 3]).astype(np.uint8)


def unpack_2bit(packed: np.ndarray, n: int) -> np.ndarray:
    out = np.empty((len(packed), 4), dtype=np.uint8)
    out[:, 0] = (packed >> 6) & 3
    out[:, 1] = (packed >> 4) & 3
    out[:, 2] = (packed >> 2) & 3
    out[:, 3] = packed & 3
    return out.reshape(-1)[:n]


@dataclasses.dataclass
class ReadSet:
    """A set of reads in struct-of-arrays form.

    codes:   flat uint8 array of 2-bit codes, all reads concatenated
    offsets: int64[num_reads] start of each read in `codes`
    lengths: int64[num_reads]
    names:   read names (for PAF output)
    start_id: global id of the first read in this set (sharded ingest)
    """
    codes: np.ndarray
    offsets: np.ndarray
    lengths: np.ndarray
    names: List[str]
    start_id: int = 0

    def __len__(self) -> int:
        return len(self.lengths)

    @property
    def total_bases(self) -> int:
        return int(self.lengths.sum())

    @property
    def max_length(self) -> int:
        return int(self.lengths.max()) if len(self.lengths) else 0

    def read_codes(self, i: int) -> np.ndarray:
        o, l = int(self.offsets[i]), int(self.lengths[i])
        return self.codes[o:o + l]

    def read_ascii(self, i: int) -> str:
        return codes_to_ascii(self.read_codes(i))

    def padded_codes(self, max_len: Optional[int] = None,
                     pad_value: int = 0) -> np.ndarray:
        """Dense [num_reads, max_len] uint8 code matrix (padded)."""
        L = max_len if max_len is not None else self.max_length
        out = np.full((len(self), L), pad_value, dtype=np.uint8)
        for i in range(len(self)):
            o, l = int(self.offsets[i]), int(self.lengths[i])
            out[i, :l] = self.codes[o:o + l]
        return out

    @staticmethod
    def from_sequences(seqs: Sequence[bytes | str],
                       names: Optional[List[str]] = None,
                       start_id: int = 0) -> "ReadSet":
        codes_list = [ascii_to_codes(s) for s in seqs]
        lengths = np.array([len(c) for c in codes_list], dtype=np.int64)
        offsets = np.zeros(len(codes_list), dtype=np.int64)
        if len(codes_list):
            offsets[1:] = np.cumsum(lengths)[:-1]
        codes = (np.concatenate(codes_list)
                 if codes_list else np.zeros(0, dtype=np.uint8))
        if names is None:
            names = [f"read{i + start_id}" for i in range(len(codes_list))]
        return ReadSet(codes=codes, offsets=offsets, lengths=lengths,
                       names=list(names), start_id=start_id)


def load_fasta(fasta_path: str,
               faidx_path: Optional[str] = None,
               record_range: Optional[tuple] = None) -> ReadSet:
    """Load (a slice of) a FASTA file using its .fai index, unwrapping the
    fixed line width per record (reference FastaIndex.cpp:191-290).

    record_range: (start, stop) global record indices for sharded ingest.
    """
    faidx_path = faidx_path or fasta_path + ".fai"
    records = parse_faidx(faidx_path)
    lo, hi = record_range if record_range is not None else (0, len(records))
    myrecords = records[lo:hi]
    if not myrecords:
        return ReadSet(np.zeros(0, np.uint8), np.zeros(0, np.int64),
                       np.zeros(0, np.int64), [], start_id=lo)

    first, last = myrecords[0], myrecords[-1]
    startpos = first.pos
    endpos = last.pos + last.length + (last.length // last.bases_per_line)
    with open(fasta_path, "rb") as f:
        f.seek(0, 2)
        filesize = f.tell()
        endpos = min(endpos, filesize)
        f.seek(startpos)
        buf = f.read(endpos - startpos)
    raw = np.frombuffer(buf, dtype=np.uint8)

    lengths = np.array([r.length for r in myrecords], dtype=np.int64)
    offsets = np.zeros(len(myrecords), dtype=np.int64)
    offsets[1:] = np.cumsum(lengths)[:-1]
    codes = np.empty(int(lengths.sum()), dtype=np.uint8)

    from ..native.loader import get_lib
    lib = get_lib()
    if lib is not None:
        import ctypes
        poss = np.array([r.pos for r in myrecords], dtype=np.int64)
        widths = np.array([r.bases_per_line for r in myrecords],
                          dtype=np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.fasta_unwrap_pack(
            buf, ctypes.c_int64(startpos), ctypes.c_int64(len(myrecords)),
            lengths.ctypes.data_as(i64p), poss.ctypes.data_as(i64p),
            widths.ctypes.data_as(i64p), offsets.ctypes.data_as(i64p),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    else:
        for i, rec in enumerate(myrecords):
            # Remove the newline every bases_per_line characters.
            chunk = rec.pos - startpos
            remain = rec.length
            out = offsets[i]
            locpos = 0
            while remain > 0:
                cnt = min(rec.bases_per_line, remain)
                seg = raw[chunk + locpos: chunk + locpos + cnt]
                codes[out:out + cnt] = _CODE_LUT[seg]
                out += cnt
                remain -= cnt
                locpos += cnt + 1
    return ReadSet(codes=codes, offsets=offsets, lengths=lengths,
                   names=[r.name for r in myrecords], start_id=lo)
