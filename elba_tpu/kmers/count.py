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
                      extract_canonical_np, extract_canonical_np2,
                      extract_canonical_words_np)

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


@dataclasses.dataclass
class KmerMatrixSummary:
    """Shape/statistics stand-in for A when the instance arrays stay on
    device (the chained device counting -> SpGEMM path)."""
    num_reads: int
    num_kmers: int
    nnz: int


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


def _bloom_repeat_mask(keys: np.ndarray, chunk: int = 1 << 22,
                       error: float = 0.02) -> np.ndarray:
    """Boolean mask of instances whose key value occurs >= 2 times.

    The reference's Bloom pass (src/KmerOps.cpp pass 1 via
    include/Bloom.hpp): first occurrence of a value arms the filter,
    a re-occurrence promotes the value to the exact counting structure.
    Here pass 1 builds a `repeat` Bloom of values seen at least twice
    (cross-chunk via check-then-add, in-chunk via a per-chunk unique);
    pass 2 keeps every instance of a (possibly-)repeated value.  False
    positives only let singleton values through to the exact counting
    sort, where `counts >= lower` drops them — the output is
    bit-identical to the unfiltered path for lower >= 2.
    """
    from ..sketch.bloom import BloomFilter

    n = len(keys)
    seen = BloomFilter(n, error)
    repeat = BloomFilter(max(n // 4, 1024), error)
    for lo in range(0, n, chunk):
        h = keys[lo:lo + chunk]
        hit = seen.check(h)
        seen.add(h)
        uniq, inv, cnt = np.unique(h, return_inverse=True,
                                   return_counts=True)
        dup = (cnt > 1)[inv]
        rep = h[hit | dup]
        if len(rep):
            repeat.add(rep)
    keep = np.empty(n, bool)
    for lo in range(0, n, chunk):
        keep[lo:lo + chunk] = repeat.check(keys[lo:lo + chunk])
    return keep


# instances below this size sort fast enough that the Bloom pass is noise
_BLOOM_MIN_INSTANCES = 1 << 22


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
    nwords = 1 if k <= 32 else (k + 31) // 32
    if nwords == 1:
        canon, valid = extract_canonical_np(codes, lengths, k)
        words = [canon]
    else:
        # generic multi-word path covers the reference's full k < 96 range
        # (Kmer<2> for k <= 64, Kmer<3> for k <= 95, Kmer.hpp:95-97)
        words, valid = extract_canonical_words_np(codes, lengths, k)
    if words[0].shape[1] == 0:
        return KmerMatrix(np.zeros(0, np.int64), np.zeros(0, np.int64),
                          np.zeros(0, np.int32), np.zeros(0, np.uint64),
                          int(codes.shape[0]), 0)
    kmw, rid, pos, nvalid = _sort_instances_words(words, valid, read_ids,
                                                  prefilter=lower >= 2)

    boundaries = np.empty(nvalid, dtype=bool)
    if nvalid:
        boundaries[0] = True
        np.not_equal(kmw[0][1:], kmw[0][:-1], out=boundaries[1:])
        for w in kmw[1:]:
            boundaries[1:] |= w[1:] != w[:-1]
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

    kmers_out = (kmw[0][rel_starts] if nwords == 1
                 else np.stack([w[rel_starts] for w in kmw], axis=1))
    return KmerMatrix(
        rows=rid[keep].astype(np.int64),
        cols=rank_of_instance[keep],
        pos=pos[keep].astype(np.int32),
        kmers=kmers_out,
        num_reads=int(codes.shape[0]),
        num_kmers=num_kmers,
    )


def _sort_instances_words(words, valid, read_ids, prefilter=False):
    """Multi-word variant: sort by (word0, word1, ..., read, pos).

    np.lexsort is stable and the row-major flattening is ascending in
    (read, pos), so sorting by the word tuple alone yields the full
    canonical instance order.

    prefilter=True runs the Bloom repeat pass first (reference KmerOps
    pass 1) so the expensive multi-key lexsort only sees instances of
    (possibly-)repeated values — a large cut at high error rates where
    singleton error k-mers dominate.  Exactness is unaffected: the
    run-length `counts >= lower` filter downstream drops the Bloom's
    false-positive singletons, and every instance of a true repeat is
    kept (membership is by value).  Only valid for lower >= 2."""
    from ..sketch.hll import _mix64

    valid = np.asarray(valid)
    read_ids = np.asarray(read_ids)
    rid_f, pos_f = np.nonzero(valid)
    flat = [np.asarray(w)[rid_f, pos_f] for w in words]
    rid = read_ids[rid_f]
    pos = pos_f.astype(np.int32)
    if prefilter and len(flat[0]) > _BLOOM_MIN_INSTANCES:
        key = flat[0].astype(np.uint64)
        for w in flat[1:]:  # fold multi-word values into one 64-bit key
            key = _mix64(key) ^ w.astype(np.uint64)
        keep = _bloom_repeat_mask(key)
        flat = [w[keep] for w in flat]
        rid = rid[keep]
        pos = pos[keep]
    order = np.lexsort(tuple(reversed(flat)))
    return ([w[order] for w in flat], rid[order], pos[order], len(flat[0]))


def count_reliable_kmers_native(readset, k: int, lower: int, upper: int):
    """C++ fast path (native/kmercount.cpp): rolling canonical extraction
    + parallel stable sort + run-length filter, ~10x the numpy path on
    genome-scale inputs.  Returns None when unavailable (k > 32 or no
    toolchain); the caller falls back to numpy.  Same canonical instance
    order and reliable set as the numpy path (asserted by tests)."""
    if k > 32:
        return None
    from ..native.loader import get_lib
    lib = get_lib()
    if lib is None:
        return None
    import ctypes

    n = len(readset)
    lengths = readset.lengths.astype(np.int64)
    bounds = np.zeros(n + 1, np.int64)
    bounds[1:] = np.cumsum(lengths)
    if n and np.array_equal(np.asarray(readset.offsets), bounds[:-1]):
        codes = np.ascontiguousarray(readset.codes, np.uint8)
    else:  # non-contiguous ReadSet: compact once
        codes = np.concatenate(
            [readset.read_codes(i) for i in range(n)]
        ).astype(np.uint8) if n else np.zeros(0, np.uint8)

    W = int(np.maximum(lengths - k + 1, 0).sum())
    rows = np.empty(max(W, 1), np.int64)
    cols = np.empty(max(W, 1), np.int64)
    pos = np.empty(max(W, 1), np.int32)
    kmers = np.empty(max(W, 1), np.uint64)
    nk = np.zeros(1, np.int64)
    i64 = ctypes.c_int64
    kept = lib.kmer_count_reliable(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bounds.ctypes.data_as(ctypes.POINTER(i64)),
        i64(n), i64(k), i64(lower), i64(upper),
        rows.ctypes.data_as(ctypes.POINTER(i64)),
        cols.ctypes.data_as(ctypes.POINTER(i64)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        kmers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        nk.ctypes.data_as(ctypes.POINTER(i64)))
    num_kmers = int(nk[0])
    return KmerMatrix(
        rows=rows[:kept] + readset.start_id,
        cols=cols[:kept].copy(),
        pos=pos[:kept].copy(),
        kmers=kmers[:num_kmers].copy(),
        num_reads=n, num_kmers=num_kmers)


def build_kmer_matrix(readset, k: int, lower: int, upper: int,
                      native: bool = True) -> KmerMatrix:
    """Convenience: extract + count from a ReadSet (C++ fast path when
    available, numpy otherwise)."""
    if native:
        m = count_reliable_kmers_native(readset, k, lower, upper)
        if m is not None:
            return m
    codes = readset.padded_codes()
    lengths = readset.lengths
    read_ids = np.arange(readset.start_id, readset.start_id + len(readset),
                         dtype=np.int64)
    m = count_reliable_kmers(codes, lengths, read_ids, k, lower, upper)
    return m
