"""Token-sweep multi-pass k-mer counting: near-linear read sweeps
(k <= 32).

The grouped counter (count_grouped.py) still pays one FULL 16-byte-per-
slot chunk sort per sweep, and sweeps scale as ceil(parts / group) with
`group` bounded by HBM for full (km, rid, pos) part buffers — at
multi-Gbp rungs the count stage is O(parts * total_instances) and turns
quadratic in genome size (C. elegans-30X: ~3,500 s of its count stage was
re-sweeps; a rice-30X projection is ~19,000 s).

This module makes the sweep cost per instance ~4 bytes instead of ~16 and
covers ~10x more parts per sweep, by splitting counting into two phases:

PHASE A (sweeps).  For each read chunk, extract canonical values, map
each window to its RANGE ID within the sweep's group of value ranges
(a handful of u64 compares), and sort ONE packed int32 per slot:

    packed = range_id << 25 | slot          (slot = window index in chunk)

A single-array int32 sort both compacts the live windows and orders them
by range — tie order within a range is slot order = (rid, pos) order,
exactly what the counting tail needs.  Only 4-byte TOKENS (slot indices)
are appended to one shared token buffer; a tiny [chunks, group] count
matrix records every (chunk, range) run length.  No k-mer values, read
ids, or positions are materialized per sweep, so one token buffer of a
few GB covers ~30-60 value ranges per sweep and the sort moves 4x less
data than the grouped fill's.

PHASE B (per part).  The part's tokens are gathered from the token
buffer (run boundaries come from the count matrix via a scatter-delta +
cumsum broadcast — no searchsorted), (rid, pos) are recomputed from the
token arithmetically, and the canonical value is re-derived by TWO u64
gathers from the resident word-packed read array plus shift/reverse bit
math (bit-identical to extract_canonical_kmers — asserted by
tests/test_count_tokens.py).  The standard counting tail
(count_chunked._finalize_kmrun) then produces a part that is
bit-identical to count_chunked.iter_count_parts' — same dicts, same
order, same bits.

Reference role: KmerOps' hash-owner partition with memory-bounded
batching (src/KmerOps.cpp:45-120, KmerOps.hpp:33-56); here the partition
is by canonical value range, batched by token-buffer capacity, with the
re-derivation trick standing in for shipping (kmer, readid, pos) triples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .count_chunked import (COMPILE_CAP, SENTK, _count_part_retrying,
                            _finalize_kmrun, _grow_cap, _pow2,
                            pack_code_rows, plan_parts)

SLOT_BITS = 25                   # read_chunk * W <= 2^25 (plan_parts)
SLOT_MASK = (1 << SLOT_BITS) - 1
DEAD_ID = 63                     # range ids are < 62; 63 sorts last
MAX_GROUP = 62


def _bucket(n: int) -> int:
    """Smallest {1, 1.5} * 2^m >= n (min 2^20): phase-B array shapes are
    bucketed so every sort/gather is sized ~the actual part instead of
    the worst-case cap (the E. coli probe measured phase B ~linear in
    the static shape), while keeping the number of compiled program
    variants to at most two per power of two."""
    n = max(int(n), 1 << 20)
    m = int(np.floor(np.log2(n)))
    for c in (1 << m, 3 << (m - 1), 1 << (m + 1)):
        if c >= n:
            return c
    return 1 << (m + 1)


def pack_code_words(codes_bytes: np.ndarray) -> np.ndarray:
    """[R, L4] byte-packed rows (pack_code_rows) -> [R, L4/8 + 1] uint64
    words, base 32w+j of row r in bits (62 - 2j)..(63 - 2j) of
    words[r, w] (MSB-first across the whole word, matching the byte
    layout).  One zero pad column so every (word, word+1) gather in
    phase B stays in bounds."""
    R, L4 = codes_bytes.shape
    assert L4 % 8 == 0
    words = codes_bytes.reshape(R, L4).view(">u8").astype(np.uint64)
    out = np.zeros((R, words.shape[1] + 1), np.uint64)
    out[:, :-1] = words
    return out


def _mask2k(k: int):
    return jnp.uint64((1 << (2 * k)) - 1 if k < 32
                      else 0xFFFFFFFFFFFFFFFF)


def _extract_canonical_words(wchunk, lengths_c, k: int):
    """Canonical k-mers per window straight from word-packed rows.

    Builds the 64-bit MSB-first base window v(p) = bases p..p+31 once
    per window with ONE shift-combine of adjacent words, then derives
    forward (top 2k bits) and twin (2-bit-group reversal of the
    complement's low 2k bits) — ~16 u64 ops total instead of the
    2k shifted ORs of extract_canonical_kmers.  Bit-identical to it on
    valid windows (tests/test_count_tokens.py); invalid windows may
    differ over the row padding and must be masked by `valid`, as with
    the reference extractor.

    wchunk: uint64[Rc, Wpr] (pack_code_words minus the pad column)
    Returns (canon uint64[Rc, W], valid bool[Rc, W]), W = 32*Wpr - k + 1.
    """
    Rc, Wpr = wchunk.shape
    L = 32 * Wpr
    W = L - k + 1
    w1 = jnp.concatenate(
        [wchunk[:, 1:], jnp.zeros((Rc, 1), jnp.uint64)], axis=1)
    # STATIC shift amounts only: variable-amount u64 shifts are emulated
    # expensively on TPU (a vectorized shift table measured ~6x slower)
    cols = [wchunk]
    for j in range(1, 32):
        cols.append((wchunk << jnp.uint64(2 * j))
                    | (w1 >> jnp.uint64(64 - 2 * j)))
    v = jnp.stack(cols, axis=2).reshape(Rc, L)[:, :W]
    fwd = v >> jnp.uint64(64 - 2 * k)
    rcv = _rev2_u64(~v) & _mask2k(k)
    canon = jnp.minimum(fwd, rcv)
    pos = jnp.arange(W, dtype=lengths_c.dtype)[None, :]
    valid = pos <= (lengths_c[:, None] - k)
    return canon, valid


def _rev2_u64(x):
    """Reverse the 32 two-bit groups of a uint64 (group 0 <-> group 31)."""
    m = jnp.uint64
    x = (x >> m(32)) | (x << m(32))
    x = ((x & m(0xFFFF0000FFFF0000)) >> m(16)) | \
        ((x & m(0x0000FFFF0000FFFF)) << m(16))
    x = ((x & m(0xFF00FF00FF00FF00)) >> m(8)) | \
        ((x & m(0x00FF00FF00FF00FF)) << m(8))
    x = ((x & m(0xF0F0F0F0F0F0F0F0)) >> m(4)) | \
        ((x & m(0x0F0F0F0F0F0F0F0F)) << m(4))
    x = ((x & m(0xCCCCCCCCCCCCCCCC)) >> m(2)) | \
        ((x & m(0x3333333333333333)) << m(2))
    return x


def _combine_u64(hi32, lo32):
    """(hi, lo) uint32 -> uint64.  The resident word array is stored as
    TWO uint32 arrays instead of one uint64: under x64 emulation a
    uint64 array argument lowers through an X64SplitHigh custom-call
    whose whole-array u32 temporaries (plus a tiled relayout copy) cost
    ~3.4x the array's size in HLO temp HBM — 13.3 GB at the human-10X
    rung's 7.97 GB word array, found by AOT precompile (OOM at compile
    time).  Native u32 arrays gather/slice in place; only the combined
    VALUES (chunk- or token-sized) are u64."""
    return ((hi32.astype(jnp.uint64) << jnp.uint64(32))
            | lo32.astype(jnp.uint64))


@functools.partial(
    jax.jit,
    static_argnames=("k", "read_chunk", "cap_tok", "group", "nc"),
    donate_argnames=("tokbuf",))
def _fill_tokens_range(wlo, whi, lengths, bvec, tokbuf, f, counts, ovf,
                       c0, k: int, read_chunk: int, cap_tok: int,
                       group: int, nc: int):
    """Chunks [c0, c0+nc) of one token sweep (see _fill_tokens_sweep).

    The whole-sweep single dispatch ran ~104 s at human-10X scale and
    reproducibly CRASHED the tunnel's TPU worker (two attempts, same
    point, 2026-08-20); bounded-range dispatches keep each device
    program ~10-15 s, donate the token buffer (no in/out double
    buffering of the multi-GB carry), and give the stall watchdog
    mid-sweep progress.  Chunk iteration order is identical, so the
    sweep output is bit-identical to the single-dispatch form.

    wlo/whi: uint32[R * (Wpr + 1)] resident word-packed reads — FLAT
             low/high halves of pack_code_words' uint64 words (see
             _combine_u64).  Flat 1-D keeps the linear T(1024) layout:
             a 2-D [R, Wpr+1] array gets the (8,128) tile layout, and
             phase B's flat gather then pays a whole-array de-tiling
             copy (~6 GB at human scale, found by AOT precompile).
    lengths: int32[R], R a multiple of read_chunk
    bvec:    uint64[group + 1] ascending boundaries (final = SENTK
             terminator; padded tail ranges [SENTK, SENTK) are empty)
    tokbuf/f/counts/ovf: sweep carry from the previous range dispatch
             (zeros / empty at c0 = 0); tokbuf is donated.

    Returns the advanced carry (fill, counts, tokbuf, ovf):
      fill   int32 total live tokens appended so far
      counts int32[C, group] live windows per (read chunk, range)
      tokbuf int32[cap_tok]: per chunk, ranges 0..group-1 back to back,
             each run in ascending slot (= (rid, pos)) order
      ovf    bool
    """
    R = lengths.shape[0]
    Wpr1 = wlo.shape[0] // R
    L = 32 * (Wpr1 - 1)
    W = L - k + 1
    Rc = read_chunk
    C = R // Rc
    Wsz = Rc * W
    G = group
    assert R % Rc == 0 and Wsz <= (1 << SLOT_BITS) and G <= MAX_GROUP
    assert cap_tok >= Wsz

    slot_lane = jnp.arange(Wsz, dtype=jnp.int32)

    def body(c, carry):
        f, counts, buf, ovf = carry
        rows0 = c * Rc
        wc = _combine_u64(
            jax.lax.dynamic_slice(whi, (rows0 * Wpr1,),
                                  (Rc * Wpr1,)).reshape(Rc, Wpr1),
            jax.lax.dynamic_slice(wlo, (rows0 * Wpr1,),
                                  (Rc * Wpr1,)).reshape(Rc, Wpr1))
        lens_c = jax.lax.dynamic_slice(lengths, (rows0,), (Rc,))
        canon, valid = _extract_canonical_words(wc[:, :-1], lens_c, k)
        rangeid = jnp.full(canon.shape, -1, jnp.int32)
        for g in range(G + 1):
            rangeid = rangeid + (canon >= bvec[g]).astype(jnp.int32)
        rangeid = jnp.where(valid & (rangeid >= 0) & (rangeid < G),
                            rangeid, DEAD_ID)
        packed = (rangeid.reshape(-1) << SLOT_BITS) | slot_lane
        packed = jnp.sort(packed)    # unique keys: plain sort, 4B/slot
        starts = [jnp.sum(packed < (g << SLOT_BITS)).astype(jnp.int32)
                  for g in range(G + 1)]
        row = jnp.stack([starts[g + 1] - starts[g] for g in range(G)])
        counts = counts.at[c].set(row)
        live = starts[G]
        ovf = ovf | (f + Wsz > cap_tok)
        fw = jnp.minimum(f, cap_tok - Wsz)
        buf = jax.lax.dynamic_update_slice(buf, packed & SLOT_MASK, (fw,))
        return f + live, counts, buf, ovf

    init = (f.astype(jnp.int32), counts, tokbuf, ovf)
    return jax.lax.fori_loop(c0, c0 + nc, body, init)


FILL_CHUNK_BATCH = 128


def _fill_tokens_sweep(wlo, whi, lengths, bvec, k: int, read_chunk: int,
                       cap_tok: int, group: int,
                       chunk_batch: int = 0, progress=None):
    """One full token sweep as a sequence of bounded range dispatches.

    Same contract as the old single-dispatch _fill_tokens; each dispatch
    is blocked on before the next is enqueued (bounds device buffer
    lifetimes — TPU allocates at enqueue time) and reports progress so
    the ladder's stall watchdog sees output during long sweeps."""
    chunk_batch = chunk_batch or FILL_CHUNK_BATCH
    R = int(lengths.shape[0])
    C = R // read_chunk
    f = jnp.int32(0)
    counts = jnp.zeros((C, group), jnp.int32)
    tokbuf = jnp.zeros((cap_tok,), jnp.int32)
    ovf = jnp.bool_(False)
    c0 = 0
    while c0 < C:
        nc = min(chunk_batch, C - c0)
        f, counts, tokbuf, ovf = _fill_tokens_range(
            wlo, whi, lengths, bvec, tokbuf, f, counts, ovf,
            jnp.int32(c0), k=k, read_chunk=read_chunk, cap_tok=cap_tok,
            group=group, nc=nc)
        f = jax.block_until_ready(f)
        c0 += nc
        if progress is not None and c0 < C:
            progress("fill_chunks", done=c0, total=C, fill=int(f))
    return f, counts, tokbuf, ovf


@functools.partial(
    jax.jit,
    static_argnames=("k", "read_chunk", "cap", "lower", "upper", "wpr1"))
def _part_from_tokens(wlo, whi, tokbuf, src_starts, run_lens, nk_offset,
                      k: int, read_chunk: int, cap: int,
                      lower: int, upper: int, wpr1: int = 0):
    """Build one part from its token runs and run the counting tail.

    wlo/whi:    uint32[R * wpr1] FLAT resident word-packed reads
                (low/high halves, see _combine_u64 and _fill_tokens's
                layout note); wpr1 = words per read incl. the pad column
    tokbuf:     int32[cap_tok] token buffer from _fill_tokens
    src_starts: int32[C] start of this part's run in tokbuf, per chunk
    run_lens:   int32[C] run lengths (counts[:, g])
    nk_offset:  int32 global rank of this part's first k-mer

    The caller guarantees sum(run_lens) <= cap (known exactly from the
    count matrix before dispatch — no in-program overflow path).
    """
    Wpr1 = wpr1
    R = wlo.shape[0] // Wpr1
    L = 32 * (Wpr1 - 1)
    W = L - k + 1
    Rc = read_chunk
    C = src_starts.shape[0]

    out_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(run_lens)[:-1]])
    total = jnp.sum(run_lens)
    # broadcast per-run constants to slots without gathers: scatter the
    # telescoping delta at each run's output offset, then cumsum.  Runs
    # with length 0 land their delta on the next run's offset; the sums
    # telescope to the same per-slot value.
    base = src_starts - out_off
    crow = jnp.arange(C, dtype=jnp.int32) * Rc
    dbase = jnp.concatenate([base[:1], base[1:] - base[:-1]])
    dcrow = jnp.concatenate([crow[:1], crow[1:] - crow[:-1]])
    zero = jnp.zeros((cap,), jnp.int32)
    base_slot = jnp.cumsum(zero.at[out_off].add(dbase, mode="drop"))
    crow_slot = jnp.cumsum(zero.at[out_off].add(dcrow, mode="drop"))

    slot = jnp.arange(cap, dtype=jnp.int32)
    live = slot < total
    tok_idx = jnp.clip(slot + base_slot, 0, tokbuf.shape[0] - 1)
    tok = jnp.take(tokbuf, tok_idx, mode="clip")
    rl = tok // W
    pos = tok - rl * W
    rid = crow_slot + rl

    # canonical value at (rid, pos): two u64 word gathers + shift math.
    # words are MSB-first, so the 64-bit window starting at base `pos` is
    # (w0 << 2*(pos%32)) | (w1 >> (64 - 2*(pos%32))); the forward k-mer
    # is its top 2k bits and the twin is the 2-bit-group reversal of its
    # complement's low 2k bits — identical to extract_canonical_kmers.
    q0 = pos >> 5
    flat = jnp.clip(rid * Wpr1 + q0, 0, R * Wpr1 - 2)
    w0 = _combine_u64(jnp.take(whi, flat, mode="clip"),
                      jnp.take(wlo, flat, mode="clip"))
    w1 = _combine_u64(jnp.take(whi, flat + 1, mode="clip"),
                      jnp.take(wlo, flat + 1, mode="clip"))
    sh = (2 * (pos & 31)).astype(jnp.uint64)
    v = (w0 << sh) | jnp.where(sh > jnp.uint64(0),
                               w1 >> (jnp.uint64(64) - sh), jnp.uint64(0))
    fwd = v >> jnp.uint64(64 - 2 * k)
    rcv = _rev2_u64(~v) & _mask2k(k)
    km = jnp.minimum(fwd, rcv)

    km = jnp.where(live, km, SENTK)
    rid = jnp.where(live, rid, 0)
    pos = jnp.where(live, pos, 0)
    return _finalize_kmrun(km, rid, pos, nk_offset, lower, upper)


def iter_count_parts_tokens(readset, k: int, lower: int, upper: int,
                            parts: int = 8, group: int = 0,
                            read_chunk: int = 0, cap: int = 0,
                            token_cap: int = 0,
                            token_budget_bytes: int = 2_500_000_000,
                            max_retries: int = 3, slack: float = 1.2,
                            progress=None, start_part: int = 0,
                            nk_offset0: int = 0):
    """Generator of per-part device counting results, token-sweep variant.

    Yields exactly what count_chunked.iter_count_parts yields (same
    dicts, same order, bit-identical arrays) in ceil(parts/group) read
    sweeps, with group auto-sized from `token_budget_bytes` when 0.
    Token-buffer overflow (aggregate skew beyond `slack`) and parts
    larger than `cap` fall back to the proven single-part counter for
    the affected ranges.

    start_part/nk_offset0 resume mid-run: parts < start_part are skipped
    (whole sweeps below it never run) and global ranks continue from
    nk_offset0, which must be the total nk of the skipped parts — the
    checkpoint/restart contract of the ladder's count stage.
    """
    assert k <= 32, "token counting packs one uint64 (k <= 32)"
    # min_len=32 so rc/cap are sized with the SAME floored L the fill
    # kernels use (pack_code_words needs L % 32 == 0)
    rc, cap_auto, bounds = plan_parts(readset, k, parts, read_chunk,
                                      min_len=32)
    if cap == 0:
        cap = cap_auto
    cap = min(cap, COMPILE_CAP)
    n = len(readset)
    L = max(_pow2(max(readset.max_length, k + 1)), 32)
    W = L - k + 1
    if rc * W > (1 << SLOT_BITS):
        raise ValueError(
            f"read_chunk*W = {rc * W} exceeds the {1 << SLOT_BITS} slot "
            "token bound; use iter_count_parts_grouped for reads this "
            "long")
    Rpad = -(-max(n, 1) // rc) * rc
    C = Rpad // rc
    total = int(np.maximum(np.asarray(readset.lengths, np.int64)
                           - (k - 1), 0).sum())
    if group <= 0:
        sweeps = max(1, -(-int(total * slack * 4) // token_budget_bytes))
        group = max(1, -(-parts // sweeps))
    group = min(group, MAX_GROUP, parts)
    if token_cap == 0:
        expected = total * group / parts
        token_cap = int(expected * slack) + rc * W
        token_cap = -(-token_cap // 1024) * 1024
    assert token_cap < 2**31
    assert Rpad * (L // 32 + 1) < 2**31, "word index must fit int32"

    # progress prints during prep: at giant rungs the single-threaded
    # padding/word-packing plus the multi-GB device upload below run
    # SILENTLY for tens of minutes, and the ladder orchestrator's stall
    # watchdog kills a stage that prints nothing — keep it fed
    if progress is not None:
        progress("packing_words", reads=n, Rpad=Rpad, L=L)
    codesb = np.zeros((Rpad, L // 4), np.uint8)
    lengths = np.zeros(Rpad, np.int32)
    codesb[:n] = pack_code_rows(readset.padded_codes(L))
    lengths[:n] = readset.lengths
    words_h = pack_code_words(codesb)
    # split into FLAT u32 halves host-side: u64 device arrays pay a
    # ~3.4x whole-array HLO-temp cost under x64 emulation, and 2-D u32
    # arrays pay a whole-array de-tiling copy at the phase-B gather
    # (see _combine_u64 / _fill_tokens docstrings)
    wpr1 = words_h.shape[1]
    wlo_h = (words_h & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(-1)
    whi_h = (words_h >> np.uint64(32)).astype(np.uint32).reshape(-1)
    del words_h
    if progress is not None:
        progress("uploading_words",
                 bytes=int(wlo_h.nbytes + whi_h.nbytes))
    wlo_d = jax.block_until_ready(jnp.asarray(wlo_h))
    whi_d = jax.block_until_ready(jnp.asarray(whi_h))
    del wlo_h, whi_h
    lengths_d = jnp.asarray(lengths)
    codes_u8_d = None  # lazily uploaded for the fallback path only
    if progress is not None:
        progress("words_resident",
                 bytes=int(wlo_d.nbytes + whi_d.nbytes))

    import time as _time
    nk_off = nk_offset0
    for g0 in range(0, parts, group):
        gn = min(group, parts - g0)
        if g0 + gn <= start_part:
            continue    # whole sweep already consumed by the resume
        t_sweep = _time.time()
        bvec = np.zeros(group + 1, np.uint64)
        for i in range(group + 1):
            b = bounds[min(g0 + i, parts)] if i <= gn else bounds[parts]
            bvec[i] = np.uint64(b) if b < (1 << 64) - 1 else \
                np.uint64((1 << 64) - 1)
        if g0 + gn == parts:
            bvec[gn:] = np.uint64((1 << 64) - 1)
        fill, counts, tokbuf, ovf = _fill_tokens_sweep(
            wlo_d, whi_d, lengths_d, jnp.asarray(bvec), k,
            read_chunk=rc, cap_tok=token_cap, group=group,
            progress=progress)
        counts_h = np.asarray(counts).astype(np.int64)
        ovf_h = bool(ovf)
        part_tot = counts_h[:, :gn].sum(axis=0)
        if progress is not None:
            progress("token_sweep", first=g0, count=gn,
                     fills=part_tot.tolist(), overflow=ovf_h,
                     seconds=round(_time.time() - t_sweep, 1))
        fallback_all = ovf_h
        if not fallback_all:
            live_per_chunk = counts_h.sum(axis=1)
            block_start = np.zeros(C, np.int64)
            block_start[1:] = np.cumsum(live_per_chunk)[:-1]
            within_excl = np.cumsum(counts_h, axis=1) - counts_h
        for i in range(gn):
            p = g0 + i
            if p < start_part:
                continue
            if fallback_all or part_tot[i] > cap:
                # aggregate skew (buffer overflow) or one hot part past
                # the part cap: the proven single-part path with the
                # shared doubled-cap retry loop
                if codes_u8_d is None:
                    codes_u8_d = jnp.asarray(codesb)
                lo = jnp.uint64(bounds[p])
                hi = (SENTK if p == parts - 1
                      else jnp.uint64(bounds[p + 1]))
                res = _count_part_retrying(
                    codes_u8_d, lengths_d, lo, hi, nk_off, k, lower,
                    upper, rc, _grow_cap(cap), max_retries, p)
            else:
                src = (block_start + within_excl[:, i]).astype(np.int32)
                lens_i = counts_h[:, i].astype(np.int32)
                res = _part_from_tokens(
                    wlo_d, whi_d, tokbuf, jnp.asarray(src),
                    jnp.asarray(lens_i), jnp.int32(nk_off),
                    k, read_chunk=rc,
                    cap=min(_bucket(part_tot[i]), cap),
                    lower=lower, upper=upper, wpr1=wpr1)
            nk_off += int(res["nk"])
            yield res
        del tokbuf


def build_kmer_matrix_tokens(readset, k: int, lower: int, upper: int,
                             parts: int = 8, group: int = 0,
                             read_chunk: int = 0, cap: int = 0,
                             token_cap: int = 0):
    """Host A matrix via the token-sweep counter.  Bit-identical to the
    single-shot / chunked / grouped builders for any geometry
    (tests/test_count_tokens.py)."""
    from .count_chunked import build_kmer_matrix_from_parts
    return build_kmer_matrix_from_parts(
        readset, iter_count_parts_tokens(
            readset, k, lower, upper, parts=parts, group=group,
            read_chunk=read_chunk, cap=cap, token_cap=token_cap))
