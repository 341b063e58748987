"""Exact reliable-k-mer counting and the reads-by-kmers matrix A.

Pipeline (replacing reference KmerOps.cpp:18-401):
  1. extract canonical k-mers for all windows of all reads
  2. sort instances by (kmer, readid, pos)   [device sort]
  3. group by kmer; keep groups with lower <= count <= upper (exact
     counting; same reliable set as the reference's Bloom + two-pass since
     presence depends only on the true global count, SURVEY.md section 7.3)
  4. A = COO triples (readid, kmer_rank, pos); kmer_rank is the rank of the
     kmer in sorted canonical order (deterministic, unlike the reference's
     hash-table iteration order -- the difference cancels in B = A @ A.T)

Instances within a kmer group are ordered by (readid, pos), which equals the
reference's single-process arrival order (read-major, position-minor;
KmerOps.cpp:283-318).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .extract import (extract_canonical_kmers, extract_canonical_kmers2,
                      extract_canonical_np, extract_canonical_np2)

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


@dataclasses.dataclass
class KmerMatrix:
    """COO of A (reads x kmers), sorted by (kmer_rank, readid, pos).

    rows: int64[nnz] global read ids
    cols: int64[nnz] kmer ranks (0..num_kmers-1 in sorted canonical order)
    pos:  int32[nnz] window position of the kmer instance within the read
    kmers: uint64[num_kmers] the canonical packed k-mers, sorted
    num_reads / num_kmers: matrix shape
    """
    rows: np.ndarray
    cols: np.ndarray
    pos: np.ndarray
    kmers: np.ndarray
    num_reads: int
    num_kmers: int

    @property
    def nnz(self) -> int:
        return len(self.rows)


def _sort_instances(canon, valid, read_ids):
    """Flatten (kmer, read, pos) instances and sort by (kmer, read, pos).

    The row-major flattening is already ascending in (read, pos), so one
    stable sort by kmer yields the full (kmer, read, pos) order.  The sort
    runs on host: XLA's variadic sort both compiles and runs poorly for
    64-bit keys, and the counting stage is host-orchestrated anyway (a
    device radix sort is tracked as a perf milestone)."""
    canon = np.asarray(canon)
    valid = np.asarray(valid)
    read_ids = np.asarray(read_ids)
    R, W = canon.shape
    rid_f, pos_f = np.nonzero(valid)
    km = canon[rid_f, pos_f]
    rid = read_ids[rid_f]
    pos = pos_f.astype(np.int32)
    order = np.argsort(km, kind="stable")
    return km[order], rid[order], pos[order], len(km)


def count_reliable_kmers(codes, lengths, read_ids, k: int,
                         lower: int, upper: int) -> KmerMatrix:
    """Single-shard exact counting; returns the A matrix COO.

    codes/lengths: padded reads (device or numpy), read_ids: global ids.
    """
    # host extraction: the counting sort is host-side, so a device
    # round-trip would only add transfer cost (the distributed step keeps
    # extraction on device because its consumer is on device)
    codes = np.asarray(codes)
    lengths = np.asarray(lengths)
    read_ids = np.asarray(read_ids, dtype=np.int64)
    two_word = k > 32
    if two_word:
        chi, clo, valid = extract_canonical_np2(codes, lengths, k)
        canon = chi  # primary sort word; secondary handled below
    else:
        canon, valid = extract_canonical_np(codes, lengths, k)
    if canon.shape[1] == 0:
        return KmerMatrix(np.zeros(0, np.int64), np.zeros(0, np.int64),
                          np.zeros(0, np.int32), np.zeros(0, np.uint64),
                          int(codes.shape[0]), 0)
    if two_word:
        km, km2, rid, pos, nvalid = _sort_instances2(
            chi, clo, valid, read_ids)
    else:
        km, rid, pos, nvalid = _sort_instances(canon, valid, read_ids)
        km2 = None

    boundaries = np.empty(nvalid, dtype=bool)
    if nvalid:
        boundaries[0] = True
        np.not_equal(km[1:], km[:-1], out=boundaries[1:])
        if km2 is not None:
            boundaries[1:] |= km2[1:] != km2[:-1]
    starts = np.flatnonzero(boundaries)
    counts = np.diff(np.append(starts, nvalid))

    reliable = (counts >= lower) & (counts <= upper)
    rel_starts = starts[reliable]
    num_kmers = int(reliable.sum())

    # Instance selection mask + kmer rank per instance (vectorized).
    group_id = np.cumsum(boundaries) - 1
    keep = reliable[group_id]
    rank_of_group = np.cumsum(reliable) - 1  # rank among reliable kmers
    rank_of_instance = rank_of_group[group_id]

    kmers_out = (km[rel_starts] if km2 is None
                 else np.stack([km[rel_starts], km2[rel_starts]], axis=1))
    return KmerMatrix(
        rows=rid[keep].astype(np.int64),
        cols=rank_of_instance[keep],
        pos=pos[keep].astype(np.int32),
        kmers=kmers_out,
        num_reads=int(codes.shape[0]),
        num_kmers=num_kmers,
    )


def _sort_instances2(chi, clo, valid, read_ids):
    """Two-word variant: sort by (hi, lo, read, pos)."""
    chi = np.asarray(chi)
    clo = np.asarray(clo)
    valid = np.asarray(valid)
    read_ids = np.asarray(read_ids)
    rid_f, pos_f = np.nonzero(valid)
    hi = chi[rid_f, pos_f]
    lo = clo[rid_f, pos_f]
    rid = read_ids[rid_f]
    pos = pos_f.astype(np.int32)
    order = np.lexsort((lo, hi))
    return hi[order], lo[order], rid[order], pos[order], len(hi)


def build_kmer_matrix(readset, k: int, lower: int, upper: int) -> KmerMatrix:
    """Convenience: extract + count from a ReadSet."""
    codes = readset.padded_codes()
    lengths = readset.lengths
    read_ids = np.arange(readset.start_id, readset.start_id + len(readset),
                         dtype=np.int64)
    m = count_reliable_kmers(codes, lengths, read_ids, k, lower, upper)
    return m
