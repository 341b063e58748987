"""Block-addressed fused X-drop driver: past the uint32 byte-offset cap.

xdrop_device_geom.py addresses the device-resident packed read array with
uint32 BYTE offsets, capping a resident read set at 2^32 packed bytes =
17.2 Gbp — one rung short of the reference's final ladder rung
(clr-human-10x: 31 Gbp, script/job.haswell.clr-human-10x.128n).  This
driver replaces the flat array with BLOCK addressing:

  * the packed codes live in a 2-D [nblk, BLK_BYTES] uint8 array
    (BLK_BYTES = 2^28 -> 1.07 Gbp per block; human-10X = 29 blocks),
  * reads are placed greedily into blocks with `winpad` zero-code margins
    at both block edges, so every window fetch / dynamic slice a kernel
    round can issue stays inside the read's own block (the margins play
    the role the flat layout's array-end padding played; BETWEEN reads,
    neighbours' codes are the same harmless never-scored filler they are
    in the flat layout),
  * per-read addresses are (block id, int32 byte-in-block, 2-bit
    residue); all in-block arithmetic is int32 (BLK_BYTES <= 2^28 keeps
    every intermediate < 2^31) — no uint32 wraparound tricks, no int64.

Wasted space is two margins per block (~5.3 kb bases each) plus at most
one read's length of carry-over per block boundary: < 0.01% at ladder
read lengths.  Variable-length reads are handled by construction (the
roadmap's alternative — a [R, Lmax/4] row matrix — explodes at CLR
length variance).

Alignment semantics are IDENTICAL to xdrop_device_geom (reference
algorithm XDropAligner.cpp:46-206, 232-282): the fused program below is
the same window-build + Pallas kernel + continuation loop, differing
only in how `codes` is indexed.  Exactness vs the numpy oracle incl.
multi-block placement is asserted by tests/test_xdrop_device_blocks.py
(tiny BLK_BYTES forces reads across many blocks on CPU).

This module is developed standalone while a ladder run holds
xdrop_device_geom.py frozen (CLAUDE.md: never edit modules a live run
imports); once the run completes it becomes the production driver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .xdrop_pallas import (PAUSED, P_COLS, P_ROWS, P_ACTIVE, P_GAP, P_MIS,
                           P_UNDEF, P_INIT, P_MAT, P_DROP, P_RESUME, P_QOFF,
                           P_TOFF, P_TANCH, P_DELTA, P_MC0, P_XC0, P_HI3,
                           P_BEST0, P_BEC0, P_BER0, P_BES0, O_BES, O_BEC,
                           O_BER, O_OVF, O_STATUS, O_MC, O_XC, O_HI3,
                           O_BEST, O_ADN, O_ITERS, O_TRIPS)
from .xdrop_geom import Geometry, WIDE, pallas_extend_geom
from .xdrop_tr import TR_NARROW, TrGeometry, pallas_extend_tr

INT_MIN = -(2 ** 31)
MAX_ROUNDS = 64
BLK_BYTES = 1 << 28  # 1.07 Gbp of packed codes per block


def _extend(g, par, qw, tw, state, interpret):
    if isinstance(g, TrGeometry):
        return pallas_extend_tr(g, par, qw, tw, state, interpret)
    return pallas_extend_geom(g, par, qw, tw, state, interpret)


def place_blocks(lengths, winpad: int, blk_bytes: int = BLK_BYTES):
    """Greedy sequential placement of reads into fixed-size packed blocks.

    Returns (nblk, blk[int32 per read], pos[int64 base-in-block per
    read]): reads fill each block in order behind a `margin`-base zero
    pad at both block edges; a read that would spill past the right
    margin starts the next block.  margin >= winpad + 8 guarantees every
    byte a kernel round can touch for read i ([pos-winpad,
    pos+len+winpad+4] in base space, the same envelope the flat layout's
    array-end pads prove) stays inside block blk[i].
    """
    lengths = np.asarray(lengths, np.int64)
    n = len(lengths)
    blkb = blk_bytes * 4  # bases per block
    margin = winpad + 8
    margin += (-margin) % 4  # byte-aligned so packed margins are whole
    usable = blkb - 2 * margin
    if n and int(lengths.max()) > usable:
        raise ValueError(
            f"read of {int(lengths.max())} bases exceeds block capacity "
            f"{usable} (blk_bytes={blk_bytes}, margin={margin})")
    csum = np.zeros(n + 1, np.int64)
    np.cumsum(lengths, out=csum[1:])
    blk = np.empty(n, np.int32)
    pos = np.empty(n, np.int64)
    i0 = 0
    b = 0
    while i0 < n:
        # largest i1 with csum[i1] - csum[i0] <= usable (i1 > i0 is
        # guaranteed by the max-length check above)
        i1 = int(np.searchsorted(csum, csum[i0] + usable, side="right")) - 1
        blk[i0:i1] = b
        pos[i0:i1] = margin + (csum[i0:i1] - csum[i0])
        i0 = i1
        b += 1
    return b, blk, pos


def pack_readset_blocks(readset, winpad: int, blk_bytes: int = BLK_BYTES):
    """Scatter a ReadSet's codes into block layout and 2-bit pack.

    Returns (packed [nblk, blk_bytes] uint8, offBlk int32[n],
    offB int32[n] byte-in-block, offR int32[n] residue).  One block is
    materialized unpacked at a time (blk_bytes*4 host bytes), so the
    host peak is ~1.25x the packed size, not 5x.
    """
    from ..dseq.dna import pack_2bit

    nblk, blk, pos = place_blocks(readset.lengths, winpad, blk_bytes)
    nblk = max(nblk, 1)
    packed = np.zeros((nblk, blk_bytes), np.uint8)
    offs = readset.offsets
    lens = readset.lengths
    for b in range(nblk):
        sel = np.flatnonzero(blk == b)
        buf = np.zeros(blk_bytes * 4, np.uint8)
        if len(sel):
            i0, i1 = int(sel[0]), int(sel[-1]) + 1
            contiguous = bool(
                np.all(offs[i0 + 1:i1]
                       == offs[i0:i1 - 1] + lens[i0:i1 - 1]))
            p0 = int(pos[i0])
            total = int(lens[i0:i1].sum())
            if contiguous:
                o0 = int(offs[i0])
                buf[p0:p0 + total] = readset.codes[o0:o0 + total]
            else:
                for i in range(i0, i1):
                    o, l, p = int(offs[i]), int(lens[i]), int(pos[i])
                    buf[p:p + l] = readset.codes[o:o + l]
        packed[b] = pack_2bit(buf)
    return (packed, blk.astype(np.int32), (pos >> 2).astype(np.int32),
            (pos & 3).astype(np.int32))


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 16))
def _align_batch_fused_blocks(g: Geometry, nitems: int, k: int, codes2d,
                              offBlk, offB, offR, lengths, qidx, tidx,
                              begQ, begT, matv, misv, gapv, dropv,
                              interpret: bool = False):
    """One fused dispatch at geometry `g` over block-addressed codes.

    Contract identical to xdrop_device_geom._align_batch_fused_geom
    (and transitively xdrop_device._align_batch_fused) except `codes2d`
    is [nblk, BLK_BYTES] uint8 and per-read addresses are
    (offBlk int32, offB int32 byte-in-block, offR residue).  Returns
    (P, 11) int32.
    """
    QW, TW, WWIN, BANDW = g.qw, g.tw, g.wwin, g.bandw
    TBACK, PARK, BALIGN, TALIGN = g.tback, g.park, g.balign, g.talign
    P = nitems // 2
    i32 = jnp.int32
    khalf = k >> 1

    offQK = offBlk[qidx]
    offQB = offB[qidx]
    offQR = offR[qidx]
    offTK = offBlk[tidx]
    offTB = offB[tidx]
    offTR = offR[tidx]
    lenQ = lengths[qidx]
    lenT = lengths[tidx]

    def _pcode(kb, ob, l):
        # all int32: ob is a byte offset inside block kb; the placement
        # margins guarantee 0 <= ob + (l >> 2) < BLK_BYTES for every
        # position a round can touch, and BLK_BYTES <= 2^28 keeps the
        # arithmetic far from int32 overflow
        byte = codes2d[kb, ob + (l >> 2)].astype(i32)
        return (byte >> (6 - 2 * (l & 3))) & 3

    def _b(v, pos):
        return v.reshape(v.shape + (1,) * (pos.ndim - 1))

    def qcode(pos):
        return _pcode(_b(offQK, pos), _b(offQB, pos),
                      _b(offQR, pos) + jnp.clip(pos, 0, _b(lenQ, pos) - 1))

    def tcode(pos):
        return _pcode(_b(offTK, pos), _b(offTB, pos),
                      _b(offTR, pos) + jnp.clip(pos, 0, _b(lenT, pos) - 1))

    rc = qcode(begQ + khalf) != tcode(begT + khalf)
    begT_s = jnp.where(rc, lenT - begT - k, begT)

    def teff(pos):
        p = jnp.clip(pos, 0, _b(lenT, pos) - 1)
        fwd = _pcode(_b(offTK, pos), _b(offTB, pos), _b(offTR, pos) + p)
        rev = 3 - _pcode(_b(offTK, pos), _b(offTB, pos),
                         _b(offTR, pos) + (_b(lenT, pos) - 1 - p))
        return jnp.where(_b(rc, pos), rev, fwd)

    koffs = jnp.arange(k, dtype=i32)
    qwd = qcode(begQ[:, None] + koffs[None, :])
    twd = teff(begT_s[:, None] + koffs[None, :])
    inb = (begQ >= 0) & (begQ + k <= lenQ) & (begT >= 0) & (begT + k <= lenT)
    nz = ~((begQ == 0) & (begT == 0))
    seed_ok = (qwd == twd).all(axis=1) & inb & nz

    endQ = begQ + k
    endT_s = begT_s + k

    item = jnp.arange(nitems, dtype=i32)
    pair = item // 2
    is_left = (item % 2) == 0
    cols = jnp.maximum(jnp.where(is_left, begQ[pair] + 1,
                                 lenQ[pair] - endQ[pair] + 1), 1)
    rows = jnp.maximum(jnp.where(is_left, begT_s[pair] + 1,
                                 lenT[pair] - endT_s[pair] + 1), 1)
    tanch = (rows + 255) // 128 * 128 + 128

    maxcr = jnp.maximum(cols, rows)
    min_err = -((1 << 30) // maxcr)
    g_ = jnp.maximum(gapv, min_err)
    m_ = jnp.maximum(misv, min_err)
    undef = INT_MIN - g_ - m_
    init_cell = jnp.where(-g_ > dropv, undef, g_)

    live0 = jnp.repeat(seed_ok, 2)
    work = jnp.where(live0, jnp.minimum(cols, rows), 0)
    order = jnp.argsort(work, stable=True).astype(i32)

    def gg(x):
        return x[order]

    cols_s, rows_s, tanch_s = gg(cols), gg(rows), gg(tanch)
    g_s, m_s, undef_s, init_s = gg(g_), gg(m_), gg(undef), gg(init_cell)
    live_s = gg(live0)
    pair_s, isl_s = gg(pair), gg(is_left)
    begQ_s = begQ[pair_s]
    endQ_i = endQ[pair_s]
    begTs_i = begT_s[pair_s]
    endTs_i = endT_s[pair_s]
    offQK_i = offQK[pair_s]
    offQB_i = offQB[pair_s]
    offQR_i = offQR[pair_s]
    offTK_i = offTK[pair_s]
    offTB_i = offTB[pair_s]
    offTR_i = offTR[pair_s]
    lenQ_i = lenQ[pair_s]
    lenT_i = lenT[pair_s]
    rc_i = rc[pair_s]

    def park_toff(jcb):
        # exact target-window parking (see xdrop_geom.xdrop_pairs_geom)
        return (jcb // TALIGN) * TALIGN - TBACK - PARK

    def rows_of(blk_id, byte_off, local, width: int):
        nb = width // 4 + 1
        sh = jnp.arange(4, dtype=i32) * 2

        def one(kb, ob, l):
            # same in-block int32 discipline as _pcode; the 2-D slice
            # start (kb, ob + l>>2) stays in-bounds by the margins, so
            # XLA's dynamic_slice clamping never shifts real data
            b = jax.lax.dynamic_slice(
                codes2d, (kb, ob + (l >> 2)), (1, nb))[0].astype(i32)
            c = ((b[:, None] >> (6 - sh)[None, :]) & 3).reshape(nb * 4)
            return jax.lax.dynamic_slice(c, (l & 3,), (width,))

        return jax.vmap(one)(blk_id, byte_off, local)

    def build_windows(qoffs, toffs):
        local_q = jnp.where(isl_s, begQ_s - qoffs - (QW - 1),
                            endQ_i + qoffs - 1)
        qrows = rows_of(offQK_i, offQB_i, offQR_i + local_q, QW)
        qw = jnp.where(isl_s[:, None], jnp.flip(qrows, 1), qrows)

        s0 = begTs_i - 1 - tanch_s + toffs
        s1_0 = endTs_i + tanch_s - toffs
        local_t = jnp.where(
            isl_s,
            jnp.where(rc_i, lenT_i - TW - s0, s0),
            jnp.where(rc_i, lenT_i - 1 - s1_0, s1_0 - (TW - 1)))
        trows = rows_of(offTK_i, offTB_i, offTR_i + local_t, TW)
        flip_t = isl_s == rc_i
        trows = jnp.where(flip_t[:, None], jnp.flip(trows, 1), trows)
        tw = jnp.where(rc_i[:, None], 3 - trows, trows)
        return qw.astype(jnp.int8), tw.astype(jnp.int8)

    def loop_cond(cy):
        live, rnd = cy[5], cy[7]
        return jnp.any(live) & (rnd < MAX_ROUNDS)

    def loop_body(cy):
        final, saved, resume, qoffs, toffs, live, state, rnd, ctrs = cy
        qw, tw = build_windows(qoffs, toffs)

        par = jnp.zeros((nitems, 128), i32)
        act = live.astype(i32)
        colmap = [
            (P_COLS, cols_s), (P_ROWS, rows_s), (P_ACTIVE, act),
            (P_GAP, g_s), (P_MIS, m_s), (P_UNDEF, undef_s),
            (P_INIT, init_s),
            (P_MAT, jnp.full(nitems, matv, i32)),
            (P_DROP, jnp.full(nitems, dropv, i32)),
            (P_RESUME, resume), (P_QOFF, qoffs), (P_TOFF, toffs),
            (P_TANCH, tanch_s),
            (P_DELTA, jnp.where(resume > 0, saved[:, 7] - 2, 0)),
            (P_MC0, saved[:, 0]), (P_XC0, saved[:, 1]),
            (P_HI3, saved[:, 2]), (P_BEST0, saved[:, 3]),
            (P_BEC0, saved[:, 4]), (P_BER0, saved[:, 5]),
            (P_BES0, saved[:, 6]),
        ]
        cix = np.array([c for c, _ in colmap])
        cvals = jnp.stack([v for _, v in colmap], axis=1)
        par = par.at[:, cix].set(cvals)

        out, st_out = _extend(g, par, qw, tw, state, interpret)

        final = jnp.where(live[:, None], out[:, :16], final)
        paused = live & (out[:, O_STATUS] == PAUSED)
        newsaved = jnp.stack(
            [out[:, O_MC], out[:, O_XC], out[:, O_HI3], out[:, O_BEST],
             out[:, O_BEC], out[:, O_BER], out[:, O_BES], out[:, O_ADN]],
            axis=1)
        saved = jnp.where(paused[:, None], newsaved, saved)
        resume = jnp.where(paused, 1, resume)
        base_p = (out[:, O_MC] - 1) // 128 * 128
        qoffs = jnp.where(paused, base_p, qoffs)
        base_b = (out[:, O_MC] - 1) // BALIGN * BALIGN
        jcb_r = tanch_s - out[:, O_ADN] + 1 + base_b
        toffs = jnp.where(paused, park_toff(jcb_r), toffs)
        ctrs = ctrs + jnp.array([jnp.sum(out[:, O_ITERS]),
                                 jnp.sum(out[:, O_TRIPS])], jnp.int32)
        return (final, saved, resume, qoffs, toffs, paused, st_out,
                rnd + 1, ctrs)

    init = (
        jnp.zeros((nitems, 16), i32),            # final
        jnp.zeros((nitems, 8), i32),             # saved
        jnp.zeros(nitems, i32),                  # resume
        jnp.zeros(nitems, i32),                  # qoffs
        park_toff(tanch_s - 1),                  # toffs
        live_s,                                  # live
        jnp.zeros((nitems, 2, WWIN), i32),       # continuation state
        jnp.zeros((), i32),                      # round
        jnp.zeros(2, i32),                       # iters/trips totals
    )
    final, _, _, _, _, live_end, _, _, ctrs = jax.lax.while_loop(
        loop_cond, loop_body, init)

    fin = jnp.zeros_like(final).at[order].set(final)
    runaway = jnp.zeros(nitems, bool).at[order].set(live_end)

    ls, lc, lr = fin[0::2, O_BES], fin[0::2, O_BEC], fin[0::2, O_BER]
    rs, rcol, rrow = fin[1::2, O_BES], fin[1::2, O_BEC], fin[1::2, O_BER]
    ovf = ((fin[0::2, O_OVF] | fin[1::2, O_OVF]) != 0) \
        | runaway[0::2] | runaway[1::2]

    begQ_e = begQ - lc
    begT_e = begT_s - lr
    endQ_e = endQ + rcol
    endT_e = endT_s + rrow
    score = ls + rs + matv * k
    outBT = jnp.where(rc, lenT - endT_e, begT_e)
    outET = jnp.where(rc, lenT - begT_e, endT_e)
    z = jnp.zeros(P, i32)
    return jnp.stack([
        jnp.where(seed_ok, score, -1),
        jnp.where(seed_ok, begQ_e, z),
        jnp.where(seed_ok, endQ_e, z),
        jnp.where(seed_ok, outBT, z),
        jnp.where(seed_ok, outET, z),
        (seed_ok & rc).astype(i32),
        (seed_ok & ovf).astype(i32),
        seed_ok.astype(i32),
        fin[0::2, O_ADN] + fin[1::2, O_ADN],
        jnp.full(P, ctrs[0], i32),
        jnp.full(P, ctrs[1], i32),
    ], axis=1)


_SINGLETON = None


def get_device_aligner_blocks(batch: int = 512, interpret: bool = False,
                              blk_bytes: int = BLK_BYTES):
    """Process-wide BlockDeviceAligner (one uploaded read set + one
    compiled program per kernel geometry per batch shape)."""
    global _SINGLETON
    if (_SINGLETON is None or _SINGLETON.batch != batch
            or _SINGLETON.interpret != interpret
            or _SINGLETON.blk_bytes != blk_bytes):
        _SINGLETON = BlockDeviceAligner(batch=batch, interpret=interpret,
                                        blk_bytes=blk_bytes)
    return _SINGLETON


class BlockDeviceAligner:
    """Drop-in replacement for xdrop_device_geom.GeomDeviceAligner with
    block-addressed resident codes (no 17.2 Gbp cap).  Same escalation
    ladder: TR_NARROW -> WIDE -> numpy oracle."""

    def __init__(self, batch: int = 512, interpret: bool = False,
                 primary=TR_NARROW, fallback: Geometry = WIDE,
                 blk_bytes: int = BLK_BYTES):
        self.batch = batch
        self.interpret = interpret
        self.primary = primary
        self.fallback = fallback
        self.blk_bytes = blk_bytes
        self._key = None
        self._dev = None
        self.last_stats = {}

    def _upload(self, readset):
        # stable content identity: id() alone can be recycled after a
        # same-length readset is garbage-collected at the same address
        key = (id(readset), readset.start_id, len(readset),
               int(readset.offsets[-1]) if len(readset) else 0,
               readset.codes.nbytes)
        if self._key == key:
            return
        winpad = max(g.qw + g.tw
                     for g in (self.primary, self.fallback) if g is not None)
        # bucket the block size: small readsets (tests, sub-Gbp runs)
        # get a power-of-two block just big enough instead of a fixed
        # 256 MiB block; large readsets use self.blk_bytes.  Power-of-
        # two bucketing bounds the number of distinct compile shapes.
        margin = winpad + 8
        margin += (-margin) % 4
        need = int(readset.lengths.sum()) // 4 + 2 * margin + \
            int(readset.lengths.max(initial=0)) // 4 + 8
        eff = 1 << 12
        while eff < need and eff < self.blk_bytes:
            eff <<= 1
        eff = min(eff, self.blk_bytes)
        packed, offK, offB, offR = pack_readset_blocks(
            readset, winpad, eff)
        self._dev = dict(
            codes2d=jax.device_put(packed),
            offBlk=jax.device_put(offK),
            offB=jax.device_put(offB),
            offR=jax.device_put(offR),
            lengths=jax.device_put(readset.lengths.astype(np.int32)),
        )
        self._key = key

    def _dispatch(self, geom, B, k, qb, tb, sq, st, mat, mis, gap, dropoff,
                  interpret):
        return _align_batch_fused_blocks(
            geom, 2 * B, int(k), self._dev["codes2d"], self._dev["offBlk"],
            self._dev["offB"], self._dev["offR"], self._dev["lengths"],
            jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(sq),
            jnp.asarray(st), jnp.int32(mat), jnp.int32(mis),
            jnp.int32(gap), jnp.int32(dropoff), interpret)

    def __call__(self, readset, qi, ti, seedQ, seedT, k, mat, mis, gap,
                 dropoff, batch=None, interpret=None):
        from .xdrop_ref import xdrop_align_ref

        n = len(qi)
        out = {f: np.empty(n, np.int32) for f in
               ("score", "begQ", "endQ", "begT", "endT")}
        out["rc"] = np.empty(n, bool)
        if n == 0:
            return out
        self._upload(readset)
        B = batch or self.batch
        interp = self.interpret if interpret is None else interpret
        s0 = readset.start_id
        lens = readset.lengths
        qidx = (np.asarray(qi) - s0).astype(np.int32)
        tidx = (np.asarray(ti) - s0).astype(np.int32)

        # true-extension work scheduling (see xdrop_device.DeviceAligner)
        lq = lens[qidx].astype(np.int64)
        lt = lens[tidx].astype(np.int64)
        sq = np.asarray(seedQ, np.int64)
        st_ = np.asarray(seedT, np.int64)
        offs = readset.offsets
        k2 = int(k) >> 1
        qmid = readset.codes[offs[qidx] + np.minimum(sq + k2, lq - 1)]
        tmid = readset.codes[offs[tidx] + np.minimum(st_ + k2, lt - 1)]
        st_eff = np.where(qmid != tmid, lt - st_ - int(k), st_)
        work = np.minimum(sq, st_eff) + \
            np.minimum(lq - sq, lt - st_eff)
        order = np.argsort(work, kind="stable")

        def run_pass(geom, indices):
            """Dispatch `indices` through `geom` in B-sized padded
            batches (pair count rounded up to SUB/2 so nitems is a
            multiple of the kernel block)."""
            half = geom.sub // 2
            Bp = -(-B // half) * half
            res = []
            with jax.enable_x64(False):
                for lo in range(0, len(indices), B):
                    sel = indices[lo:lo + B]
                    Pn = len(sel)
                    qb = np.zeros(Bp, np.int32)
                    tb = np.zeros(Bp, np.int32)
                    sqb = np.full(Bp, -1, np.int32)
                    stb = np.full(Bp, -1, np.int32)
                    qb[:Pn] = qidx[sel]
                    tb[:Pn] = tidx[sel]
                    sqb[:Pn] = seedQ[sel]
                    stb[:Pn] = seedT[sel]
                    res.append((sel, self._dispatch(
                        geom, Bp, k, qb, tb, sqb, stb, mat, mis, gap,
                        dropoff, interp)))
            return res

        fields = ("score", "begQ", "endQ", "begT", "endT")

        def harvest(results):
            ovf_idx = []
            for sel, res in results:
                arr = np.asarray(res)[:len(sel)]
                for j, f in enumerate(fields):
                    out[f][sel] = arr[:, j]
                out["rc"][sel] = arr[:, 5] != 0
                ovf_idx.extend(sel[np.flatnonzero(arr[:, 6])])
                ctrs["antidiags"] += int(arr[:, 8].sum())
                ctrs["inner_iters"] += int(arr[0, 9]) if len(arr) else 0
                ctrs["outer_trips"] += int(arr[0, 10]) if len(arr) else 0
            return np.array(ovf_idx, np.int64)

        ctrs = dict(antidiags=0, inner_iters=0, outer_trips=0)

        ovf1 = harvest(run_pass(self.primary, order))
        ovf2 = ovf1
        if len(ovf1) and self.fallback is not None:
            ovf2 = harvest(run_pass(self.fallback, ovf1))
        for i in ovf2:
            ref = xdrop_align_ref(
                readset.read_codes(int(qidx[i])),
                readset.read_codes(int(tidx[i])),
                int(seedQ[i]), int(seedT[i]), k, mat, mis, gap, dropoff)
            for f in fields:
                out[f][i] = ref[f]
            out["rc"][i] = ref["rc"]
        self.last_stats = dict(pairs=n, overflow_narrow=len(ovf1),
                               overflow_wide=len(ovf2), **ctrs)
        return out
