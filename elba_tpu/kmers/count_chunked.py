"""Memory-bounded device k-mer counting: multi-pass over k-mer value
ranges (k <= 32).

The single-shot device counter (count_device.py) materializes all R*W
instance slots at once; its sort's double buffering blows HBM past
~2*10^8 slots (yeast-scale).  This module bounds memory by partitioning
the CANONICAL K-MER VALUE SPACE into P contiguous ranges and counting one
range per pass — the DEDUKT/KmerOps "supermer partition" role
(reference src/KmerOps.cpp:45-120 partitions by hash owner across ranks;
here the partition is by value range across PASSES on one chip, which
additionally preserves the global canonical (kmer, readid, pos) order:
every instance of a k-mer falls in exactly one range, and ranges are
value-ordered, so concatenating per-part results reproduces the
single-shot order bit-for-bit).

Per pass, one jitted program streams the resident read array in row
chunks:

  extract canonical k-mers for the chunk  (VPU, cheap — repeated P times,
      which is the price of O(total/P) memory)
  -> mask to [part_lo, part_hi) and sort the chunk by k-mer (sentinels
      last), giving a compacted sorted run
  -> ragged-append the run into a fixed part buffer at fill offset f via
      dynamic_update_slice: the window's sentinel tail is OVERWRITTEN by
      the next chunk's window (writes advance by the live count, so each
      write's tail overlaps the next write's head); only the final tail
      stays sentinel, and the buffer is sentinel-initialized
  -> after all chunks: one sort of the buffer merges the runs (stable on
      the k-mer key; runs are ascending read-id, so ties keep (rid, pos)
      order), then the reliable filter + head-rank + dead-compaction of
      count_device._count_device

Buffer overflow (f + window > cap) is detected and reported, never
silent; the caller retries with a doubled capacity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .count import KmerMatrix
from .extract import extract_canonical_kmers

SENTK = jnp.uint64(0xFFFFFFFFFFFFFFFF)

# Largest part-buffer sort shape the REMOTE COMPILE HELPER survives: a
# 177M-slot part program (and a 128M-slot probe sort) got the helper
# OOM-SIGKILLed, while this shape compiles fine (measured 2026-08-18,
# CLAUDE.md).  Overflow retries double capacity UP TO this bound and then
# fail loudly instead of minting an uncompilable shape.
COMPILE_CAP = 61 << 21


def _grow_cap(cap: int) -> int:
    """Next retry capacity: doubled, 1024-aligned, clamped to COMPILE_CAP."""
    return min(-(-2 * cap // 1024) * 1024, COMPILE_CAP)


def pack_code_rows(codes: np.ndarray) -> np.ndarray:
    """Pack [R, L] per-base codes into [R, L//4] bytes (4 bases/byte,
    MSB-first — dna.pack_2bit's layout, rowwise).  The resident read
    array is the counters' largest long-lived device buffer; packed it
    costs 1/4 the HBM and tunnel upload (2.24 Gbp ~= 0.6 GB instead of
    2.3 GB)."""
    R, L = codes.shape
    assert L % 4 == 0
    q = codes.reshape(R, L // 4, 4)
    return (q[:, :, 0] << 6 | q[:, :, 1] << 4
            | q[:, :, 2] << 2 | q[:, :, 3]).astype(np.uint8)


def unpack_code_rows(packed):
    """Device-side inverse of pack_code_rows: [R, L4] u8 -> [R, 4*L4] u8.
    A few elementwise ops per chunk — negligible next to the chunk sort."""
    x = (packed[:, :, None].astype(jnp.int32)
         >> jnp.asarray([6, 4, 2, 0], jnp.int32)) & 3
    return x.reshape(packed.shape[0], -1).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("k", "lower", "upper", "read_chunk", "cap"))
def _count_part(codes, lengths, part_lo, part_hi, nk_offset,
                k: int, lower: int, upper: int, read_chunk: int, cap: int):
    """Count the k-mers with canonical value in [part_lo, part_hi).

    codes:   uint8[R, L // 4] resident 2-bit-packed read array
             (pack_code_rows), R a multiple of read_chunk
    lengths: int32[R]
    part_lo/part_hi: uint64 scalars (dynamic — one compile serves all parts)
    nk_offset: int32 scalar, global rank of this part's first k-mer

    Returns dict(km, rid, pos, rank, nnz, nk, overflow) where rank is the
    GLOBAL k-mer rank (nk_offset added) and only the first nnz compacted
    slots are live.
    """
    R, L4 = codes.shape
    L = 4 * L4
    W = L - k + 1
    Rc = read_chunk
    C = R // Rc
    Wsz = Rc * W
    assert R % Rc == 0 and cap >= Wsz

    rid_base = jnp.repeat(jnp.arange(Rc, dtype=jnp.int32), W)
    pos_tile = jnp.tile(jnp.arange(W, dtype=jnp.int32), Rc)

    def body(c, carry):
        f, bkm, brid, bpos, ovf = carry
        rows0 = c * Rc
        codes_c = unpack_code_rows(
            jax.lax.dynamic_slice(codes, (rows0, 0), (Rc, L4)))
        lens_c = jax.lax.dynamic_slice(lengths, (rows0,), (Rc,))
        canon, valid = extract_canonical_kmers(codes_c, lens_c, k)
        keep = valid & (canon >= part_lo) & (canon < part_hi)
        km = jnp.where(keep, canon, SENTK).reshape(-1)
        # sentinel-keyed sort: live entries stay k-mer-sorted with
        # (rid, pos) row-major ties, dead slots go last
        km, rid, pos = jax.lax.sort(
            (km, rid_base + rows0, pos_tile), num_keys=1, is_stable=True)
        c_live = jnp.sum(km != SENTK).astype(jnp.int32)
        ovf = ovf | (f + Wsz > cap)
        # clamp keeps the write in bounds when overflowing (the result is
        # discarded by the retry); on the normal path f + Wsz <= cap
        fw = jnp.minimum(f, cap - Wsz)
        bkm = jax.lax.dynamic_update_slice(bkm, km, (fw,))
        brid = jax.lax.dynamic_update_slice(brid, rid, (fw,))
        bpos = jax.lax.dynamic_update_slice(bpos, pos, (fw,))
        return f + c_live, bkm, brid, bpos, ovf

    init = (jnp.int32(0),
            jnp.full((cap,), SENTK, jnp.uint64),
            jnp.zeros((cap,), jnp.int32),
            jnp.zeros((cap,), jnp.int32),
            jnp.bool_(False))
    f, bkm, brid, bpos, ovf = jax.lax.fori_loop(0, C, body, init)

    res = _finalize_kmrun(bkm, brid, bpos, nk_offset, lower, upper)
    res["overflow"] = ovf
    return res


def _finalize_kmrun(km, rid, pos, nk_offset, lower: int, upper: int):
    """Shared counting tail (traceable): stable 1-key merge sort by k-mer
    value (equal-value ties keep array order, which every caller arranges
    to be global (rid, pos) order), reliable [lower, upper] filter,
    head-rank assignment, dead-compaction.  Used by _count_part, the
    grouped counter's finalize, and the token-sweep counter — one copy so
    the three paths stay bit-identical by construction."""
    km, rid, pos = jax.lax.sort((km, rid, pos), num_keys=1,
                                is_stable=True)
    n = km.shape[0]
    bound = jnp.concatenate([jnp.ones(1, bool), km[1:] != km[:-1]])
    gid = jnp.cumsum(bound.astype(jnp.int32)) - 1
    cnt = jax.ops.segment_sum(
        jnp.ones(n, jnp.int32), gid, num_segments=n)[gid]
    rel = (km != SENTK) & (cnt >= lower) & (cnt <= upper)
    head = bound & rel
    rank = jnp.cumsum(head.astype(jnp.int32)) - 1 + nk_offset
    dead = (~rel).astype(jnp.int32)
    _, km2, rid2, pos2, rank2 = jax.lax.sort(
        (dead, km, rid, pos, rank), num_keys=1, is_stable=True)
    return dict(km=km2, rid=rid2, pos=pos2, rank=rank2,
                nnz=jnp.sum(rel), nk=jnp.sum(head))


def _pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


def plan_parts(readset, k: int, parts: int, read_chunk: int = 0,
               slack: float = 1.6, min_len: int = 0):
    """Size the pass geometry: (read_chunk, cap, boundaries).

    cap covers the EXPECTED per-part load (total/parts) with `slack` for
    composition skew, plus the append window; the overflow retry covers
    pathological skew.  Boundaries are spaced by the canonical-value
    CDF: canonical k-mers are min(fwd, rc) of a ~uniform value, so
    P(v <= u*span) ~= 2u - u^2, and even splits would load the first
    part ~1.9x the mean.  The inverse CDF u = 1 - sqrt(1 - q) equalizes
    expected load per part (verified bit-identical for any boundary
    choice by tests/test_count_chunked.py).

    min_len floors the padded row length L: the token-sweep counter
    packs rows into uint64 words (L % 32 == 0), so it must size
    read_chunk/cap with the SAME floored L its fill kernels use —
    otherwise a readset with max_length < 32 trips the kernels' static
    cap asserts at trace time instead of the loud slot-bound ValueError.
    """
    n = len(readset)
    L = max(_pow2(max(readset.max_length, k + 1)), min_len)
    W = L - k + 1
    if read_chunk == 0:
        # ~32M instance slots per chunk: chunk sort stays ~1GB peak.
        # Small readsets shrink to the padded read count — a huge default
        # chunk would size cap (and every downstream padded program) by
        # the append window instead of the actual load.
        read_chunk = max(min((1 << 25) // W, 4096, _pow2(max(n, 1))), 64)
    total = int(np.maximum(np.asarray(readset.lengths, np.int64)
                           - (k - 1), 0).sum())
    cap = int(total * slack / parts) + read_chunk * W
    cap = -(-cap // 1024) * 1024
    span = 1 << (2 * k)
    bounds = [min(int(span * (1.0 - np.sqrt(1.0 - p / parts))), span)
              for p in range(parts)]
    bounds.append(span)
    assert all(a <= b for a, b in zip(bounds, bounds[1:]))
    return read_chunk, cap, bounds


def _count_part_retrying(codes_d, lengths_d, lo, hi, nk_off, k, lower,
                         upper, rc, cap0: int, max_retries: int, p: int):
    """The shared retry loop around _count_part: doubled caps clamped to
    the compile bound, loud failure past it (used by iter_count_parts and
    the grouped counter's skew fallback — one policy, one copy)."""
    part_cap = cap0
    for attempt in range(max_retries):
        res = _count_part(codes_d, lengths_d, lo, hi, jnp.int32(nk_off),
                          k, lower, upper, read_chunk=rc, cap=part_cap)
        if not bool(res["overflow"]):
            return res
        del res
        if part_cap >= COMPILE_CAP:
            raise RuntimeError(
                f"count part {p} overflowed at the compile-bound cap "
                f"{part_cap}; rerun with more parts")
        part_cap = _grow_cap(part_cap)
    raise RuntimeError(f"count part {p} overflowed cap={part_cap}")


def iter_count_parts(readset, k: int, lower: int, upper: int,
                     parts: int = 8, read_chunk: int = 0, cap: int = 0,
                     max_retries: int = 3):
    """Generator of per-part device counting results (global ranks).

    Each yielded dict has the count_device_raw layout (km/rid/pos/rank
    device arrays, nnz/nk device scalars) restricted to one k-mer value
    range; concatenating the first-nnz slices in order reproduces the
    single-shot result exactly.  Yields parts one at a time so the caller
    (e.g. the chained SpGEMM) can free each before the next is built.
    """
    assert k <= 32, "chunked device counting packs one uint64 (k <= 32)"
    rc, cap_auto, bounds = plan_parts(readset, k, parts, read_chunk)
    if cap == 0:
        cap = cap_auto
    # the FIRST attempt must respect the remote-compile bound too, not
    # just the retries: too few parts for the workload would otherwise
    # jit an uncompilable shape before any overflow can be detected.
    # Clamped (not raised): if the actual load fits the bound anyway the
    # run proceeds; real overflow still fails loudly in the retry loop.
    cap = min(cap, COMPILE_CAP)
    n = len(readset)
    L = _pow2(max(readset.max_length, k + 1))
    Rpad = -(-max(n, 1) // rc) * rc
    codes = np.zeros((Rpad, L // 4), np.uint8)
    lengths = np.zeros(Rpad, np.int32)
    codes[:n] = pack_code_rows(readset.padded_codes(L))
    lengths[:n] = readset.lengths
    codes_d = jnp.asarray(codes)
    lengths_d = jnp.asarray(lengths)
    del codes

    nk_off = 0
    for p in range(parts):
        lo = jnp.uint64(bounds[p])
        hi = (SENTK if p == parts - 1 else jnp.uint64(bounds[p + 1]))
        res = _count_part_retrying(codes_d, lengths_d, lo, hi, nk_off,
                                   k, lower, upper, rc, cap, max_retries, p)
        nk_off += int(res["nk"])
        yield res


def count_device_chunked(readset, k: int, lower: int, upper: int,
                         parts: int = 8, read_chunk: int = 0,
                         cap: int = 0):
    """All parts as a list (small inputs / tests).  For scale, consume
    iter_count_parts lazily instead."""
    return list(iter_count_parts(readset, k, lower, upper, parts=parts,
                                 read_chunk=read_chunk, cap=cap))


def build_kmer_matrix_from_parts(readset, part_iter) -> KmerMatrix:
    """Host A matrix from any per-part counting iterator (compacted
    per-part fetches).  Shared by the chunked and grouped builders —
    the two iterators yield bit-identical parts by contract."""
    rows, cols, pos, kms = [], [], [], []
    nk_total = 0
    for res in part_iter:
        nnz = int(res["nnz"])
        nk_total += int(res["nk"])
        if nnz == 0:
            continue
        rows.append(np.asarray(res["rid"][:nnz]).astype(np.int64)
                    + readset.start_id)
        cols.append(np.asarray(res["rank"][:nnz]).astype(np.int64))
        pos.append(np.asarray(res["pos"][:nnz]).astype(np.int32))
        km = np.asarray(res["km"][:nnz])
        first = np.ones(nnz, bool)
        first[1:] = km[1:] != km[:-1]
        kms.append(km[first])
    cat = lambda xs, dt: (np.concatenate(xs) if xs
                          else np.zeros(0, dtype=dt))
    kmers = cat(kms, np.uint64)
    assert len(kmers) == nk_total
    return KmerMatrix(rows=cat(rows, np.int64), cols=cat(cols, np.int64),
                      pos=cat(pos, np.int32), kmers=kmers,
                      num_reads=len(readset), num_kmers=nk_total)


def build_kmer_matrix_chunked(readset, k: int, lower: int, upper: int,
                              parts: int = 8, read_chunk: int = 0,
                              cap: int = 0) -> KmerMatrix:
    """Host A matrix via the multi-pass counter.  Bit-identical to
    build_kmer_matrix_device for any partition geometry
    (tests/test_count_chunked.py)."""
    return build_kmer_matrix_from_parts(
        readset, iter_count_parts(readset, k, lower, upper, parts=parts,
                                  read_chunk=read_chunk, cap=cap))
