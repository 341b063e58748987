"""Grouped multi-pass device k-mer counting: one read sweep fills G part
buffers (k <= 32).

The multi-pass counter (count_chunked.py) bounds memory by counting one
canonical-value range per pass, but every pass re-sweeps the ENTIRE read
array: at C. elegans-30X scale (3 Gbp, 50 parts) the 50 re-extractions +
per-chunk sorts are ~80% of the count stage's wall.  This module amortizes
the sweep across a GROUP of G consecutive value ranges: the per-chunk
sentinel-keyed sort already orders live entries by canonical value, so the
entries of each range in the group form a CONTIGUOUS SEGMENT of the sorted
chunk — one dynamic slice + masked ragged append per range routes them to
G separate part buffers at no extra sort cost.  Sweeps drop from P to
ceil(P/G) while per-part results stay bit-identical to count_chunked
(asserted by tests/test_count_grouped.py).

Same DEDUKT/KmerOps partition role as count_chunked (reference
src/KmerOps.cpp:45-120 partitions by hash owner across ranks; here by
value range across passes), with the sweep shared across G ranges.

Shape discipline: the fill program's only sort is the per-chunk sort
(~32M slots, a proven remote-compile shape); the per-part merge sort +
reliable filter live in a SEPARATE finalize program so no program carries
a sort wider than one part buffer (the remote compile helper OOMs past
~1.3*10^8-slot sorts, CLAUDE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .count import KmerMatrix
from .count_chunked import (COMPILE_CAP, SENTK, _count_part_retrying,
                            _grow_cap, _pow2, build_kmer_matrix_from_parts,
                            pack_code_rows, plan_parts, unpack_code_rows)
from .extract import extract_canonical_kmers


@functools.partial(
    jax.jit,
    static_argnames=("k", "read_chunk", "cap", "group"))
def _fill_group(codes, lengths, bounds, k: int, read_chunk: int, cap: int,
                group: int):
    """One sweep over the reads, filling `group` part buffers.

    codes:   uint8[R, L // 4] resident 2-bit-packed read array
             (count_chunked.pack_code_rows), R a multiple of read_chunk
    lengths: int32[R]
    bounds:  uint64[group + 1] ascending range boundaries (dynamic — one
             compile serves every group); range g is [bounds[g],
             bounds[g+1]).  The caller puts SENTK in bounds[group] for the
             final group so k = 32 (span = 2^64) needs no special case —
             no canonical value can equal SENTK (rc(all-T) = 0, so
             min(v, rc) < SENTK always).

    Returns (fills int32[group], bufs, ovf bool[group]) where bufs is a
    `group`-tuple of (bkm uint64[cap], brid int32[cap], bpos int32[cap])
    triples; buffer g holds fills[g] live entries in (canonical value,
    read id, pos)-sorted runs, exactly the entries
    count_chunked._count_part would buffer for that range, in the same
    order.  Separate per-part buffers (not one [group, cap] array) let
    the caller DONATE each triple into its finalize program and free it
    as soon as its part is consumed — at genome scale each triple is
    ~cap * 16 bytes of HBM.
    """
    R, L4 = codes.shape
    L = 4 * L4
    W = L - k + 1
    Rc = read_chunk
    C = R // Rc
    Wsz = Rc * W
    G = group
    assert R % Rc == 0 and cap >= Wsz

    rid_base = jnp.repeat(jnp.arange(Rc, dtype=jnp.int32), W)
    pos_tile = jnp.tile(jnp.arange(W, dtype=jnp.int32), Rc)
    lane = jnp.arange(Wsz, dtype=jnp.int32)
    sent_tail = jnp.full((Wsz,), SENTK, jnp.uint64)
    i32_tail = jnp.zeros((Wsz,), jnp.int32)

    def body(c, carry):
        f, bufs, ovf = carry
        rows0 = c * Rc
        codes_c = unpack_code_rows(
            jax.lax.dynamic_slice(codes, (rows0, 0), (Rc, L4)))
        lens_c = jax.lax.dynamic_slice(lengths, (rows0,), (Rc,))
        canon, valid = extract_canonical_kmers(codes_c, lens_c, k)
        keep = valid & (canon >= bounds[0]) & (canon < bounds[G])
        km = jnp.where(keep, canon, SENTK).reshape(-1)
        # one sentinel-keyed sort serves every range in the group: live
        # entries come out ascending by value with (rid, pos) row-major
        # ties, so range g's entries are the contiguous run
        # [starts[g], starts[g+1]) of the sorted chunk
        km, rid, pos = jax.lax.sort(
            (km, rid_base + rows0, pos_tile), num_keys=1, is_stable=True)
        # starts[g] = live entries below bounds[g] (dead slots are SENTK,
        # never < any boundary incl. the SENTK terminator)
        starts = [jnp.sum(km < bounds[g]).astype(jnp.int32)
                  for g in range(G + 1)]
        # pad by a full window so every dynamic slice is in bounds
        kmp = jnp.concatenate([km, sent_tail])
        ridp = jnp.concatenate([rid, i32_tail])
        posp = jnp.concatenate([pos, i32_tail])
        nbufs = []
        for g in range(G):
            bkm, brid, bpos = bufs[g]
            lg = starts[g + 1] - starts[g]
            wk = jax.lax.dynamic_slice(kmp, (starts[g],), (Wsz,))
            wr = jax.lax.dynamic_slice(ridp, (starts[g],), (Wsz,))
            wp = jax.lax.dynamic_slice(posp, (starts[g],), (Wsz,))
            # slots past lg hold LATER ranges' entries (not sentinels):
            # mask them dead so buffer g only ever sees its own range
            wk = jnp.where(lane < lg, wk, SENTK)
            fg = f[g]
            ovf = ovf.at[g].set(ovf[g] | (fg + Wsz > cap))
            # clamp keeps the write in bounds when overflowing (result
            # discarded by the retry); normally fg + Wsz <= cap
            fw = jnp.minimum(fg, cap - Wsz)
            nbufs.append((jax.lax.dynamic_update_slice(bkm, wk, (fw,)),
                          jax.lax.dynamic_update_slice(brid, wr, (fw,)),
                          jax.lax.dynamic_update_slice(bpos, wp, (fw,))))
            f = f.at[g].add(lg)
        return f, tuple(nbufs), ovf

    init = (jnp.zeros((G,), jnp.int32),
            tuple((jnp.full((cap,), SENTK, jnp.uint64),
                   jnp.zeros((cap,), jnp.int32),
                   jnp.zeros((cap,), jnp.int32)) for _ in range(G)),
            jnp.zeros((G,), bool))
    return jax.lax.fori_loop(0, C, body, init)


@functools.partial(jax.jit, static_argnames=("lower", "upper"),
                   donate_argnums=(0, 1, 2))
def _finalize_part(bkm, brid, bpos, nk_offset, lower: int, upper: int):
    """Merge one part buffer's sorted runs and apply the reliable filter +
    head-rank + dead-compaction — the tail of count_chunked._count_part,
    bit-identical (the stable merge keeps (rid, pos) order on value
    ties because runs are appended in ascending read-id order)."""
    from .count_chunked import _finalize_kmrun
    return _finalize_kmrun(bkm, brid, bpos, nk_offset, lower, upper)


def iter_count_parts_grouped(readset, k: int, lower: int, upper: int,
                             parts: int = 8, group: int = 4,
                             read_chunk: int = 0, cap: int = 0,
                             max_retries: int = 3, slack: float = 1.6,
                             progress=None):
    """Generator of per-part counting results, grouped-sweep variant.

    Yields exactly what count_chunked.iter_count_parts yields (same dicts,
    same order, bit-identical arrays) in ceil(parts/group) read sweeps
    instead of `parts`.  A buffer overflow (composition skew beyond
    `slack`) falls back to the single-part counter for just that group's
    ranges with a doubled cap — the retry path is the proven one.

    progress: optional callable(event: str, **info) for stage logging.
    """
    assert k <= 32, "chunked device counting packs one uint64 (k <= 32)"
    group = max(1, min(group, parts))
    rc, cap_auto, bounds = plan_parts(readset, k, parts, read_chunk,
                                      slack=slack)
    if cap == 0:
        cap = cap_auto
    # first-attempt shapes must respect the remote-compile bound too
    # (see iter_count_parts); the skew fallback fails loudly past it
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

    import time as _time
    nk_off = 0
    for g0 in range(0, parts, group):
        gn = min(group, parts - g0)
        t_sweep = _time.time()
        # pad the boundary vector to the compiled group width with empty
        # ranges [last, last) so one compile serves the tail group too
        bvec = np.zeros(group + 1, np.uint64)
        for i in range(group + 1):
            b = bounds[min(g0 + i, parts)] if i <= gn else bounds[parts]
            # the final boundary is the span (possibly 2^64 at k = 32):
            # represent it as SENTK, which exceeds every canonical value
            bvec[i] = np.uint64(b) if b < (1 << 64) - 1 else \
                np.uint64((1 << 64) - 1)
        if g0 + gn == parts:
            bvec[gn:] = np.uint64((1 << 64) - 1)
        fills, bufs, ovf = _fill_group(
            codes_d, lengths_d, jnp.asarray(bvec), k,
            read_chunk=rc, cap=cap, group=group)
        bufs = list(bufs)
        ovf_h = np.asarray(ovf[:gn])
        if progress is not None:
            progress("sweep", first=g0, count=gn,
                     fills=np.asarray(fills[:gn]).tolist(),
                     overflow=ovf_h.tolist(),
                     seconds=round(_time.time() - t_sweep, 1))
        if ovf_h.any():
            # skewed composition: redo this group's ranges one part at a
            # time on the proven single-part path with doubled caps
            del bufs
            for p in range(g0, g0 + gn):
                lo = jnp.uint64(bounds[p])
                hi = (SENTK if p == parts - 1
                      else jnp.uint64(bounds[p + 1]))
                # doubled starting cap (the group buffer just overflowed
                # at `cap`); the shared retry loop keeps doubling up to
                # the compile bound and fails loudly past it
                res = _count_part_retrying(codes_d, lengths_d, lo, hi,
                                           nk_off, k, lower, upper, rc,
                                           _grow_cap(cap), max_retries, p)
                nk_off += int(res["nk"])
                yield res
            continue
        for i in range(gn):
            tri = bufs[i]
            bufs[i] = None  # sole reference passes to the donating call
            res = _finalize_part(tri[0], tri[1], tri[2],
                                 jnp.int32(nk_off), lower, upper)
            del tri
            nk_off += int(res["nk"])
            yield res
        del bufs


def build_kmer_matrix_grouped(readset, k: int, lower: int, upper: int,
                              parts: int = 8, group: int = 4,
                              read_chunk: int = 0,
                              cap: int = 0) -> KmerMatrix:
    """Host A matrix via the grouped counter.  Bit-identical to
    build_kmer_matrix_device / _chunked for any (parts, group) geometry
    (tests/test_count_grouped.py)."""
    return build_kmer_matrix_from_parts(
        readset, iter_count_parts_grouped(readset, k, lower, upper,
                                          parts=parts, group=group,
                                          read_chunk=read_chunk, cap=cap))
