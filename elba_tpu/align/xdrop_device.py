"""Device-resident batched X-drop driver: one dispatch per batch.

The v2 kernel (xdrop_pallas.py) runs at ~3,100 pairs/s on a v5e, but the
host-driven batch loop around it measured at ~440 pairs/s: per-call
sequence uploads, ~10 tunnel round-trips per batch (window build, kernel,
state scatter, result fetch), and a fresh window-builder compile per read-
length bucket (127 cached builder shapes after one ladder run).

This driver removes all of that:

* The read set's flat code array is 2-bit PACKED (4 bases/byte,
  dna.pack_2bit) and uploaded ONCE, so batches ship only pair indices
  and seeds (a few KB).  Packing quarters the HBM footprint and traffic
  of window gathers and lifts the int32-indexing capacity to ~8.6 Gbp
  (the C. elegans-scale rungs ship 2.2-3.0 Gbp of reads, past the
  unpacked int32 limit).  Per-read offsets ship SPLIT as (byte offset,
  in-byte remainder) so no int32 code-space offset is ever formed; the
  window builder slices packed bytes and unpacks in-program.
* Window building, kernel invocation, and the continuation-round loop all
  run inside ONE jitted program (`lax.while_loop` around the Pallas call):
  zero host round-trips between rounds, one dispatch per batch.
* Windows are gathered from the flat code array by global offset, so there
  are no per-length-bucket shapes: one compiled program serves every
  batch.  (One Mosaic compile per batch geometry `2*batch` items.)

Semantics are identical to xdrop_pallas.xdrop_pairs_pallas (reference
algorithm: XDropAligner.cpp:46-206, 232-282); the integer math is all
int32, matching the kernel, and bit-exactness vs the oracle is asserted by
tests/test_xdrop_device.py and re-checked on-chip by bench.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .xdrop_pallas import (BANDW, PAUSED, QW, TW, TWR, WWIN, P_COLS, P_ROWS,
                           P_ACTIVE, P_GAP, P_MIS, P_UNDEF, P_INIT, P_MAT,
                           P_DROP, P_RESUME, P_QOFF, P_TOFF, P_TANCH,
                           P_DELTA, P_MC0, P_XC0, P_HI3, P_BEST0, P_BEC0,
                           P_BER0, P_BES0, O_BES, O_BEC, O_BER, O_OVF,
                           O_STATUS, O_MC, O_XC, O_HI3, O_BEST, O_ADN,
                           pallas_extend)

INT_MIN = -(2 ** 31)
MAX_ROUNDS = 64


def _wtoff(tb):
    # park the live target slice near the window tail (it drifts downward)
    return jnp.maximum((tb + 3 * BANDW - TW) // 128 * 128, 0)


@functools.partial(jax.jit, static_argnums=(0, 1, 14))
def _align_batch_fused(nitems: int, k: int, codes, offB, offR, lengths,
                       qidx, tidx, begQ, begT, matv, misv, gapv, dropv,
                       interpret: bool = False):
    """One fused dispatch: geometry + seed check + window build + kernel +
    continuation rounds for `nitems`/2 pairs.  All int32.

    `codes` is the 2-bit PACKED flat code array (uint8, 4 bases/byte,
    MSB-first — dna.pack_2bit layout).  Per-read start offsets arrive
    SPLIT as (`offB`, `offR`) = (code_offset >> 2, code_offset & 3): the
    byte index stays < 2^31 up to ~8.6 Gbp, whereas a flat int32
    code-space offset wraps negative past 2.147 Gbp (that overflow
    silently failed every seed check for reads past the boundary — the
    C. elegans-30X rung lost the last 28.5% of its genome to it).
    All in-read positions are < 2^31, so `offR + pos` is int32-safe and
    two's-complement `>> 2` / `& 3` recover (byte, bit) exactly, for
    negative window overhang too.

    Returns (P, 8) int32: score, begQ, endQ, begT, endT, rc, overflow,
    seed_ok.
    """
    P = nitems // 2
    i32 = jnp.int32
    khalf = k >> 1

    offQB = offB[qidx]
    offQR = offR[qidx]
    offTB = offB[tidx]
    offTR = offR[tidx]
    lenQ = lengths[qidx]
    lenT = lengths[tidx]

    def _pcode(ob, l):
        """code at local (code-space) position l of the read whose packed
        byte offset is ob; l already includes the &3 remainder."""
        byte = codes[ob + (l >> 2)].astype(i32)
        return (byte >> (6 - 2 * (l & 3))) & 3

    def _b(v, pos):
        """broadcast a per-pair (P,) vector against a (P, ...) pos array"""
        return v.reshape(v.shape + (1,) * (pos.ndim - 1))

    def qcode(pos):
        """q code at read-coordinate pos (clipped inside the read)."""
        return _pcode(_b(offQB, pos),
                      _b(offQR, pos) + jnp.clip(pos, 0, _b(lenQ, pos) - 1))

    def tcode(pos):
        return _pcode(_b(offTB, pos),
                      _b(offTR, pos) + jnp.clip(pos, 0, _b(lenT, pos) - 1))

    # strand guess from the seed midpoint (reference XDropAligner.cpp:248)
    rc = qcode(begQ + khalf) != tcode(begT + khalf)
    begT_s = jnp.where(rc, lenT - begT - k, begT)

    def teff(pos):
        """t code on the effective (possibly revcomp'd) strand."""
        p = jnp.clip(pos, 0, _b(lenT, pos) - 1)
        fwd = _pcode(_b(offTB, pos), _b(offTR, pos) + p)
        rev = 3 - _pcode(_b(offTB, pos),
                         _b(offTR, pos) + (_b(lenT, pos) - 1 - p))
        return jnp.where(_b(rc, pos), rev, fwd)

    # exact seed verification (reference :250-254)
    koffs = jnp.arange(k, dtype=i32)
    qwd = qcode(begQ[:, None] + koffs[None, :])
    twd = teff(begT_s[:, None] + koffs[None, :])
    inb = (begQ >= 0) & (begQ + k <= lenQ) & (begT >= 0) & (begT + k <= lenT)
    nz = ~((begQ == 0) & (begT == 0))
    seed_ok = (qwd == twd).all(axis=1) & inb & nz

    endQ = begQ + k
    endT_s = begT_s + k

    # ---- per-item geometry: [left, right] interleaved -------------------
    item = jnp.arange(nitems, dtype=i32)
    pair = item // 2
    is_left = (item % 2) == 0
    cols = jnp.maximum(jnp.where(is_left, begQ[pair] + 1,
                                 lenQ[pair] - endQ[pair] + 1), 1)
    rows = jnp.maximum(jnp.where(is_left, begT_s[pair] + 1,
                                 lenT[pair] - endT_s[pair] + 1), 1)
    tanch = (rows + 255) // 128 * 128 + 128

    # per-item clamped scores (reference XDropAligner.cpp:61-67);
    # 2^31 // (2*maxcr) == 2^30 // maxcr exactly (the divisor is even)
    maxcr = jnp.maximum(cols, rows)
    min_err = -((1 << 30) // maxcr)
    g_ = jnp.maximum(gapv, min_err)
    m_ = jnp.maximum(misv, min_err)
    undef = INT_MIN - g_ - m_
    init_cell = jnp.where(-g_ > dropv, undef, g_)

    # work-sorted item order: kernel blocks of SUB items run in lockstep,
    # so homogeneous blocks waste fewer iterations.  min(cols, rows)
    # estimates the TRUE extension length (a genuine dovetail overlap
    # extends until the shorter remaining sequence ends); max() is only
    # an upper bound and mixes short true extensions into long blocks
    live0 = jnp.repeat(seed_ok, 2)
    work = jnp.where(live0, jnp.minimum(cols, rows), 0)
    order = jnp.argsort(work, stable=True).astype(i32)

    def g(x):
        return x[order]

    cols_s, rows_s, tanch_s = g(cols), g(rows), g(tanch)
    g_s, m_s, undef_s, init_s = g(g_), g(m_), g(undef), g(init_cell)
    live_s = g(live0)
    pair_s, isl_s = g(pair), g(is_left)
    begQ_s = begQ[pair_s]
    endQ_i = endQ[pair_s]
    begTs_i = begT_s[pair_s]
    endTs_i = endT_s[pair_s]
    offQB_i = offQB[pair_s]
    offQR_i = offQR[pair_s]
    offTB_i = offTB[pair_s]
    offTR_i = offTR[pair_s]
    lenQ_i = lenQ[pair_s]
    lenT_i = lenT[pair_s]
    rc_i = rc[pair_s]

    def rows_of(byte_off, local, width: int):
        """Fetch a contiguous `width`-code run per item from the packed
        array.  The start is (per-read byte offset, local code position):
        slice width//4+1 bytes at byte_off + (local >> 2), unpack
        (MSB-first), then slice `width` codes at local&3.  `local` may be
        negative (window overhang into the WINPAD slack); arithmetic
        shift/mask floor correctly and the summed byte index stays >= 0.
        The +1-byte overread is covered by the trailing safety byte."""
        nb = width // 4 + 1
        sh = jnp.arange(4, dtype=i32) * 2

        def one(ob, l):
            b = jax.lax.dynamic_slice(
                codes, (ob + (l >> 2),), (nb,)).astype(i32)
            c = ((b[:, None] >> (6 - sh)[None, :]) & 3).reshape(nb * 4)
            return jax.lax.dynamic_slice(c, (l & 3,), (width,))

        return jax.vmap(one)(byte_off, local)

    def build_windows(qoffs, toffs):
        """QS[j] = q_item[qoff + j - 1]; TSR[j] = t_item[tanch - toff - j].
          left : q_item[x] = q[begQ-1-x],  t_item[x] = t_eff[begT_s-1-x]
          right: q_item[x] = q[endQ+x],    t_item[x] = t_eff[endT_s+x]

        Every window is a CONTIGUOUS run of the flat code array up to a
        reversal and a complement, so it is fetched as a gather of
        (1, width) slices and flipped/complemented per item afterwards --
        the elementwise-gather formulation measured 2x slower on real
        coverage-shuffled pairs (random fine-grained HBM reads) while the
        kernel's substep counts were identical.  The code array carries
        WINPAD zero slack on both ends so no slice start ever clamps
        (per-item overhang beyond a read is <= max(QW, TW + 386); see
        DeviceAligner._upload).  Out-of-sequence lanes hold neighbor/pad
        codes instead of the old edge-clamped codes: the kernel's band
        bounds (new_min >= adn+2-rows, new_max <= cols) keep every
        semantically consumed cell in-sequence, so results are identical
        (asserted bit-for-bit by tests/test_xdrop_device.py)."""
        local_q = jnp.where(isl_s, begQ_s - qoffs - (QW - 1),
                            endQ_i + qoffs - 1)
        qrows = rows_of(offQB_i, offQR_i + local_q, QW)
        qw = jnp.where(isl_s[:, None], jnp.flip(qrows, 1), qrows)

        # target slice start by (is_left, rc); s0/s1_0 are the local
        # source indices at window lane 0 of the ascending/descending runs
        s0 = begTs_i - 1 - tanch_s + toffs
        s1_0 = endTs_i + tanch_s - toffs
        local_t = jnp.where(
            isl_s,
            jnp.where(rc_i, lenT_i - TW - s0, s0),
            jnp.where(rc_i, lenT_i - 1 - s1_0, s1_0 - (TW - 1)))
        trows = rows_of(offTB_i, offTR_i + local_t, TW)
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

        out, st_out = pallas_extend(par, qw, tw, state, interpret)

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
        tb_p = (tanch_s - out[:, O_ADN] + 1 + base_p) // 128 * 128
        toffs = jnp.where(paused, _wtoff(tb_p), toffs)
        # diagnostic totals: kernel inner iterations / outer trips, summed
        # over rounds (per-block values appear SUB times each)
        from .xdrop_pallas import O_ITERS, O_TRIPS
        ctrs = ctrs + jnp.array([jnp.sum(out[:, O_ITERS]),
                                 jnp.sum(out[:, O_TRIPS])], jnp.int32)
        return (final, saved, resume, qoffs, toffs, paused, st_out,
                rnd + 1, ctrs)

    tb0 = (tanch_s - 1) // 128 * 128
    init = (
        jnp.zeros((nitems, 16), i32),            # final
        jnp.zeros((nitems, 8), i32),             # saved
        jnp.zeros(nitems, i32),                  # resume
        jnp.zeros(nitems, i32),                  # qoffs
        _wtoff(tb0),                             # toffs
        live_s,                                  # live
        jnp.zeros((nitems, 2, WWIN), i32),       # continuation state
        jnp.zeros((), i32),                      # round
        jnp.zeros(2, i32),                       # iters/trips totals
    )
    final, _, _, _, _, live_end, _, _, ctrs = jax.lax.while_loop(
        loop_cond, loop_body, init)

    # un-permute back to [left, right] pair interleave
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
        # diagnostic: total antidiagonals actually run (both items) --
        # the kernel's true work unit, for scheduling/throughput analysis
        fin[0::2, O_ADN] + fin[1::2, O_ADN],
        # diagnostic scalars (same value in every row): kernel inner
        # iterations and outer refetch trips summed over all rounds and
        # blocks (x SUB, since per-block counters repeat per item row)
        jnp.full(P, ctrs[0], i32),
        jnp.full(P, ctrs[1], i32),
    ], axis=1)


_SINGLETON = None


def get_device_aligner(batch: int = 512):
    """Process-wide DeviceAligner: callers across the pipeline share one
    instance so the uploaded read set and the compiled program are reused
    (a new batch geometry means a fresh multi-minute remote Mosaic
    compile on the tunneled TPU)."""
    global _SINGLETON
    if _SINGLETON is None or _SINGLETON.batch != batch:
        _SINGLETON = DeviceAligner(batch=batch)
    return _SINGLETON


class DeviceAligner:
    """Callable with the align_batch_pallas signature, but the read set
    lives on device across calls and every batch is a single dispatch.

    Usage: aligner = DeviceAligner(batch=512); then
    aligner(readset, qi, ti, seedQ, seedT, k, mat, mis, gap, dropoff).
    The flat code array is (re)uploaded only when the readset changes.
    """

    def __init__(self, batch: int = 512, interpret: bool = False):
        self.batch = batch
        self.interpret = interpret
        self._key = None
        self._dev = None

    def _upload(self, readset):
        key = (id(readset), len(readset))
        if self._key == key:
            return
        codes = readset.codes
        # WINPAD zero slack on both ends lets the window builder fetch
        # contiguous slices without ever clamping a slice start (window
        # overhang past a read is bounded by max(QW, TW + 386))
        winpad = QW + TW
        tail = winpad + ((-(len(codes) + 2 * winpad)) % 128)
        codes = np.concatenate([np.zeros(winpad, np.uint8), codes,
                                np.zeros(tail, np.uint8)])
        # 2-bit pack (4 bases/byte): 4x HBM capacity/traffic; +1 safety
        # byte covers rows_of's one-byte overread at the extreme start
        from ..dseq.dna import pack_2bit
        packed = np.concatenate([pack_2bit(codes), np.zeros(1, np.uint8)])
        assert packed.size < 2 ** 31, \
            "packed code array must fit int32 indexing (~8.6 Gbp)"
        # offsets ship split as (byte, remainder): a flat int32 code-space
        # offset wraps past 2.147 Gbp, the byte index is safe to ~8.6 Gbp
        off = readset.offsets.astype(np.int64) + winpad
        self._dev = dict(
            codes=jax.device_put(packed),
            offB=jax.device_put((off >> 2).astype(np.int32)),
            offR=jax.device_put((off & 3).astype(np.int32)),
            lengths=jax.device_put(readset.lengths.astype(np.int32)),
        )
        self._key = key

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
        s0 = readset.start_id
        lens = readset.lengths
        qidx = (np.asarray(qi) - s0).astype(np.int32)
        tidx = (np.asarray(ti) - s0).astype(np.int32)

        # batch pairs whose EXTENSION work is similar: kernel blocks of
        # SUB items run in lockstep, so homogeneous batches waste fewer
        # frozen iterations and pause in the same continuation round.
        # The proxy is the TRUE dovetail-extension estimate from the seed
        # geometry -- left extension min(begQ, begT') plus right extension
        # min of the seed-to-end remainders, on the strand the kernel will
        # pick (same midpoint-base rule, XDropAligner.cpp:248).  Read
        # length alone degenerates at uniform read length; seed-to-end
        # UPPER bounds mix short true extensions into long blocks.
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

        results = []   # (sel, device result) — fetched after all dispatch
        with jax.enable_x64(False):
            for lo in range(0, n, B):
                sel = order[lo:lo + B]
                Pn = len(sel)
                qb = np.zeros(B, np.int32)
                tb = np.zeros(B, np.int32)
                sq = np.full(B, -1, np.int32)
                st = np.full(B, -1, np.int32)
                qb[:Pn] = qidx[sel]
                tb[:Pn] = tidx[sel]
                sq[:Pn] = seedQ[sel]
                st[:Pn] = seedT[sel]
                res = _align_batch_fused(
                    2 * B, int(k), self._dev["codes"],
                    self._dev["offB"], self._dev["offR"],
                    self._dev["lengths"],
                    jnp.asarray(qb), jnp.asarray(tb),
                    jnp.asarray(sq), jnp.asarray(st),
                    jnp.int32(mat), jnp.int32(mis), jnp.int32(gap),
                    jnp.int32(dropoff),
                    self.interpret if interpret is None else interpret)
                results.append((sel, res))

        fields = ("score", "begQ", "endQ", "begT", "endT")
        for sel, res in results:
            arr = np.asarray(res)[:len(sel)]
            for j, f in enumerate(fields):
                out[f][sel] = arr[:, j]
            out["rc"][sel] = arr[:, 5] != 0
            # overflow (band wider than the kernel's 128 lanes, or round
            # runaway): recompute with the numpy oracle
            for r in np.flatnonzero(arr[:, 6]):
                i = sel[r]
                ref = xdrop_align_ref(
                    readset.read_codes(int(qidx[i])),
                    readset.read_codes(int(tidx[i])),
                    int(seedQ[i]), int(seedT[i]), k, mat, mis, gap, dropoff)
                for f in fields:
                    out[f][i] = ref[f]
                out["rc"][i] = ref["rc"]
        return out
