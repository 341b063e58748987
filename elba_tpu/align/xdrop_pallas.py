"""Fused Pallas TPU kernel for X-drop extension.

The JAX while_loop implementation (xdrop_jax.py) is exact but dispatch-
bound: every antidiagonal issues ~30 small XLA ops.  This kernel runs the
entire extension loop inside one Pallas program, with the DP state resident
in VMEM and the per-item control scalars in SMEM -- zero per-iteration
dispatch overhead.

Work decomposition
------------------
Every alignment contributes two *items* (left extension, right extension).
A left extension is converted into a right extension over reversed strings:
  left-extend(Q, T) at (begQ, begT)
    == right-extend(reverse(Q[:begQ]), reverse(T[:begT])) from (0, 0)
so the kernel only implements the forward recurrence
  posQ = c - 1,   posT = ad_no - c - 1          (item-string coordinates)
(cf. the reference's symmetric formulas, XDropAligner.cpp:115-116).

Layout: one grid step processes SUB=8 items.  Antidiagonal buffers are
full column-indexed arrays [SUB, WBUF] (three of them, rotating by
ad_no mod 3).  Mosaic requires lane-dimension accesses to be 128-aligned,
so each iteration loads an ALIGNED 256-lane window around the live band
(window base = min_col-1 rounded down to 128, asserted with
pl.multiple_of); the +-1 column offsets of the DP recurrence become
static in-register lane rolls, and the ad_no-dependent target-string
window is extracted with one dynamic pltpu.roll per item.  Exactness
never depends on band drift -- the only capacity limit is a live band
wider than 128 columns, which sets the item's overflow flag (caller
falls back to the numpy oracle).

Target strings are stored REVERSED around a fixed anchor
(TSR[j] = t_item[TANCH - j], TANCH = lcap + 1) so the antidiagonal's
target slice is an ascending contiguous read whose start stays in bounds
for every live (ad_no, min_col) -- dynamic slices clamp at the edges, so
in-bounds-by-construction is a correctness requirement, not an
optimization.

Item parameter block (int32[NITEMS, 128], column index):
  0: cols (lenQ_ext + 1)     3: gap   (clamped, XDropAligner.cpp:63-65)
  1: rows (lenT_ext + 1)     4: mis   (clamped)
  2: active at start         5: undef sentinel
  7: mat                     6: init cell (gap or undef)
  8: dropoff
Outputs int32[NITEMS, 128]: col 0 best_ext_score, 1 best_ext_col,
2 best_ext_row, 3 overflow flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8        # items per grid step (int32 sublane tile)
BANDW = 128    # live-band capacity in lanes
RING = 1024    # antidiagonal buffers are rings over column space (col % RING)
NEG_BIG = -(2**31) + 2**20


def _kernel(params_ref, qs_ref, tsr_ref, out_ref, ads_ref, sc_ref, *,
            tanch):
    """ads_ref: VMEM (3, SUB, RING + 2*BANDW) rotating antidiagonal ring
    buffers: column c of antidiagonal a lives at ads[a % 3, s, c % RING]
    (compile time must not scale with read length, so the buffers are
    fixed-size rings; ring aliasing is safe because reads never reach
    further than 3 aligned window steps behind the current base, and a
    mirror write keeps [0, BANDW) equal to [RING, RING+BANDW)).
    sc_ref: SMEM (SUB, 12) per-item scalar state:
      0 min_col, 1 max_col, 2 (unused), 3 hi3, 4 best, 5 bec, 6 ber,
      7 bes, 8 active, 9 overflow, 10 cols, 11 rows.
    """
    WWIN = 2 * BANDW  # aligned working window (live band <= BANDW)

    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, WWIN), 1)
    lane1 = lane[0, :BANDW]  # (BANDW,) iota for init/output vectors

    # ---- per-item init ----------------------------------------------------
    for s in range(SUB):
        cols = params_ref[s, 0]
        rows = params_ref[s, 1]
        active = params_ref[s, 2]
        undef = params_ref[s, 5]
        init_cell = params_ref[s, 6]
        # Init only the first working window of each buffer: every later
        # read stays inside a prior write window (the band windows advance
        # by <= 128 aligned steps and reads are extent-masked), so cells
        # beyond [0, 2*BANDW) never need initialization.  Full-width init
        # stores made Mosaic compile time explode with read length.
        lane2 = lane[0]  # (2*BANDW,) iota
        undef_win = jnp.full((2 * BANDW,), 1, jnp.int32) * undef
        ads_ref[2, s, pl.ds(0, 2 * BANDW)] = undef_win
        # antidiag 0: col 0 = 0; antidiag 1: cols 0, 1 = init_cell
        ads_ref[0, s, pl.ds(0, 2 * BANDW)] = jnp.where(lane2 == 0, 0, undef)
        ads_ref[1, s, pl.ds(0, 2 * BANDW)] = jnp.where(
            lane2 <= 1, init_cell, undef)
        sc_ref[s, 0] = 1
        sc_ref[s, 1] = 2
        sc_ref[s, 2] = 0
        sc_ref[s, 3] = 1                # hi3: antidiag 1 covers cols 0..1
        sc_ref[s, 4] = 0
        sc_ref[s, 5] = 0
        sc_ref[s, 6] = 0
        sc_ref[s, 7] = 0
        sc_ref[s, 8] = active * jnp.where((cols > 1) & (rows > 1), 1, 0)
        sc_ref[s, 9] = 0
        sc_ref[s, 10] = cols
        sc_ref[s, 11] = rows

    def nactive():
        n = sc_ref[0, 8]
        for s in range(1, SUB):
            n = n + sc_ref[s, 8]
        return n

    def body(carry):
        ad_no = carry[0]
        r3 = jnp.remainder(ad_no, 3)
        r2 = jnp.remainder(ad_no + 2, 3)
        r1 = jnp.remainder(ad_no + 1, 3)

        rows_a2 = []
        rows_a1 = []
        rows_q = []
        rows_t = []
        basev = []
        slotv = []
        l3v = []
        mcv = []
        xcv = []
        hi2v = []
        for s in range(SUB):
            act = sc_ref[s, 8]
            mc = jnp.where(act > 0, sc_ref[s, 0], 1)
            xc = jnp.where(act > 0, sc_ref[s, 1], 2)
            l3 = mc - 1
            base = pl.multiple_of((l3 // BANDW) * BANDW, BANDW)
            slot = pl.multiple_of(base % RING, BANDW)
            # aligned 256-lane windows over ring slots [slot, slot+WWIN)
            rows_a2.append(ads_ref[r2, s, pl.ds(slot, WWIN)])
            rows_a1.append(ads_ref[r1, s, pl.ds(slot, WWIN)])

            rows_q.append(qs_ref[s, pl.ds(base, WWIN)])
            # target: col c needs TSR[(tanch - ad_no + 1) + c]; extract the
            # unaligned window with an aligned 3-tile load + dynamic roll
            jcb = tanch - ad_no + 1 + base
            tb = pl.multiple_of((jcb // BANDW) * BANDW, BANDW)
            offt = jcb - tb
            t3 = tsr_ref[s, pl.ds(tb, 3 * BANDW)].astype(jnp.int32)
            trow = pltpu.roll(t3.reshape(1, 3 * BANDW),
                              3 * BANDW - offt, 1)[0, :WWIN]
            rows_t.append(trow)
            basev.append(base)
            slotv.append(slot)
            l3v.append(l3)
            mcv.append(mc)
            xcv.append(xc)
            # extent of antidiag ad_no-1 = hi3 stored at end of last iter
            hi2v.append(sc_ref[s, 3])

        a2 = jnp.stack(rows_a2)          # value at col c = lane c-base
        a1 = jnp.stack(rows_a1)
        qv = jnp.stack(rows_q)
        tv = jnp.stack(rows_t)
        basec = jnp.stack(basev).reshape(SUB, 1)
        l3c = jnp.stack(l3v).reshape(SUB, 1)
        mc = jnp.stack(mcv).reshape(SUB, 1)
        xc = jnp.stack(xcv).reshape(SUB, 1)
        hi2 = jnp.stack(hi2v).reshape(SUB, 1)

        # +-1 column offsets as static lane rolls (lane 0 wraps: col base-1
        # is never live because min_col-1 >= base)
        a2m1 = pltpu.roll(a2, 1, 1)
        a1m1 = pltpu.roll(a1, 1, 1)

        gapv = params_ref[:, 3].reshape(SUB, 1)
        misv = params_ref[:, 4].reshape(SUB, 1)
        undefv = params_ref[:, 5].reshape(SUB, 1)
        matv = params_ref[:, 7].reshape(SUB, 1)
        bestv = jnp.stack([sc_ref[s, 4] for s in range(SUB)]).reshape(SUB, 1)
        dropv = params_ref[:, 8].reshape(SUB, 1)

        c = basec + lane
        inner = (c >= mc) & (c < xc)

        sub = jnp.where(qv == tv, matv, misv)
        temp = jnp.maximum(jnp.maximum(a2m1, a2) + gapv, a1m1 + sub)
        live = temp >= bestv - dropv
        cell = jnp.where(live & inner, temp, undefv)

        gval = ad_no * gapv
        bcond = gval > bestv - dropv
        b0 = jnp.where(bcond & (l3c == 0), gval, undefv)
        b1 = jnp.where(bcond & (ad_no == xc), gval, undefv)
        ad3 = jnp.where(c == l3c, b0, cell)
        ad3 = jnp.where(c == xc, b1, ad3)

        ad_best = jnp.maximum(
            gval.reshape(SUB),
            jnp.max(jnp.where(inner & live, temp, NEG_BIG), axis=1))

        upd = inner & (temp > bestv)
        lastc = jnp.max(jnp.where(upd, c, -1), axis=1)
        last_temp = jnp.max(
            jnp.where(upd & (c == lastc.reshape(SUB, 1)), temp, NEG_BIG),
            axis=1)

        # ---- band scans (advance / retract), reference :143-155 ----------
        keep = (c <= xc) & (ad3 == undefv) & \
            (c - 1 <= hi2) & (a2m1 == undefv)
        stop = (~keep) & (c >= mc)
        first_stop = jnp.min(jnp.where(stop, c, 2**30), axis=1)

        okd = (c >= l3c) & (c <= xc - 1) & \
            ((ad3 != undefv) | (a2 != undefv))
        dmax = jnp.max(jnp.where(okd, c, l3c - 1), axis=1)

        # int32 (not bool): Mosaic cannot squeeze bool vectors to scalars
        ovf_now = jnp.where(xc - l3c + 1 > BANDW, 1, 0).reshape(SUB)

        # ---- write back ---------------------------------------------------
        for s in range(SUB):
            act = sc_ref[s, 8]

            @pl.when(act > 0)
            def _(s=s, ad3=ad3, slotv=slotv):
                slot = slotv[s]
                ads_ref[r3, s, pl.ds(slot, WWIN)] = ad3[s, :]

                # ring wraparound: the pad [RING, RING+BANDW) must mirror
                # [0, BANDW) -- copy the window's upper half down when the
                # write lands at the top of the ring
                @pl.when(slot >= RING - BANDW)
                def _():
                    ads_ref[r3, s, pl.ds(0, BANDW)] = ad3[s, BANDW:]
                sc_ref[s, 3] = sc_ref[s, 1]              # hi3 = creation max
                best_old = sc_ref[s, 4]
                hit = lastc[s] >= 0
                sc_ref[s, 5] = jnp.where(hit, lastc[s], sc_ref[s, 5])
                sc_ref[s, 6] = jnp.where(hit, ad_no - lastc[s], sc_ref[s, 6])
                sc_ref[s, 7] = jnp.where(hit, last_temp[s], sc_ref[s, 7])
                sc_ref[s, 4] = jnp.maximum(best_old, ad_best[s])
                new_min0 = jnp.minimum(first_stop[s], sc_ref[s, 3] + 1)
                new_min0 = jnp.maximum(new_min0, sc_ref[s, 0])
                new_max0 = jnp.maximum(dmax[s] + 1, l3v[s]) + 1
                new_min = jnp.maximum(new_min0,
                                      ad_no + 2 - sc_ref[s, 11])
                new_max = jnp.minimum(new_max0, sc_ref[s, 10])
                sc_ref[s, 0] = new_min
                sc_ref[s, 1] = new_max
                ov = sc_ref[s, 9] | ovf_now[s]
                sc_ref[s, 9] = ov
                sc_ref[s, 8] = jnp.where(
                    (new_min < new_max) & (ov == 0), 1, 0)

        if globals().get("_DEBUG"):
            pl.debug_print(
                "ad={} mc={} xc={} best={} bes={} act={} t64={} a2_64={} a1_64={} q64={} t_64={}",
                ad_no, sc_ref[1, 0], sc_ref[1, 1], sc_ref[1, 4], sc_ref[1, 7],
                sc_ref[1, 8], temp[1, 64], a2[1, 64], a1[1, 64], qv[1, 64],
                tv[1, 64])

        return (ad_no + 1, nactive())

    jax.lax.while_loop(lambda cy: cy[1] > 0, body,
                       (jnp.int32(2), nactive()))

    for s in range(SUB):
        v = jnp.where(lane1 == 0, sc_ref[s, 7], 0)
        v = jnp.where(lane1 == 1, sc_ref[s, 5], v)
        v = jnp.where(lane1 == 2, sc_ref[s, 6], v)
        v = jnp.where(lane1 == 3, sc_ref[s, 9], v)
        out_ref[s, :BANDW] = v


@functools.partial(jax.jit, static_argnums=(3, 4))
def _xdrop_extend_items_x32(params, qs, tsr, lcap: int,
                            interpret: bool = False):
    """Run the extension kernel over a worklist of items.

    params: int32[N, 128]  (see module docstring; N multiple of SUB)
    qs:     int8[N, WQ]    query item strings, QS[s, j] = q_item[j-1]
    tsr:    int8[N, WT]    reversed target item strings
    lcap:   max item string length (static)
    Returns int32[N, 128] outputs.
    """
    N = params.shape[0]
    def rup(x, m=128):
        return ((x + m - 1) // m) * m
    WBUF = RING + 2 * BANDW
    grid = (N // SUB,)
    out = pl.pallas_call(
        functools.partial(_kernel, tanch=lcap + 129),
        grid=grid,
        in_specs=[
            pl.BlockSpec((SUB, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, qs.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, tsr.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((3, SUB, WBUF), jnp.int32),
            pltpu.SMEM((SUB, 12), jnp.int32),
        ],
        interpret=interpret,
    )(params, qs, tsr)
    return out


def xdrop_extend_items(params, qs, tsr, lcap: int, interpret: bool = False):
    # The kernel is entirely 32-bit; trace it with x64 disabled so weak-typed
    # literals never promote to int64 (Mosaic has no 64-bit support and its
    # int64->int32 convert lowering recurses forever).
    with jax.enable_x64(False):
        return _xdrop_extend_items_x32(params, qs, tsr, lcap, interpret)


# ---------------------------------------------------------------------------
# pair-level driver: pairs -> items -> kernel -> combined results
# ---------------------------------------------------------------------------

INT_MIN = -(2**31)


def _prep_items(q, t, lenQ, lenT, begQ, begT, k, mat, mis, gap, dropoff,
                bandw=BANDW):
    """Vectorized numpy prep: strand detection, seed verification, and the
    two extension items per pair (reference xdrop_aligner setup,
    XDropAligner.cpp:232-268)."""
    P, L = q.shape
    ar = np.arange(P)

    inb = (begQ >= 0) & (begQ + k <= lenQ) & (begT >= 0) & (begT + k <= lenT)
    nz = ~((begQ == 0) & (begT == 0))
    bq = np.clip(begQ, 0, L - 1)
    bt = np.clip(begT, 0, L - 1)
    rc = q[ar, np.clip(bq + (k >> 1), 0, L - 1)] != \
        t[ar, np.clip(bt + (k >> 1), 0, L - 1)]

    # strand-effective target
    j = np.arange(L)
    ridx = np.clip(lenT[:, None] - 1 - j[None, :], 0, L - 1)
    t_rc = (3 - np.take_along_axis(t, ridx, axis=1)).astype(t.dtype)
    t_eff = np.where(rc[:, None], t_rc, t)
    begT_s = np.where(rc, lenT - begT - k, begT)

    offs = np.arange(k)
    qw = np.take_along_axis(q, np.clip(bq[:, None] + offs[None, :], 0, L - 1),
                            axis=1)
    tw = np.take_along_axis(
        t_eff, np.clip(begT_s[:, None] + offs[None, :], 0, L - 1), axis=1)
    seed_ok = (qw == tw).all(axis=1) & inb & nz

    endQ = begQ + k
    endT_s = begT_s + k

    # item geometry: [left, right] per pair, interleaved item order
    cols = np.empty(2 * P, np.int64)
    rows = np.empty(2 * P, np.int64)
    cols[0::2] = begQ + 1
    rows[0::2] = begT_s + 1
    cols[1::2] = lenQ - endQ + 1
    rows[1::2] = lenT - endT_s + 1
    cols = np.maximum(cols, 1)
    rows = np.maximum(rows, 1)

    lcap = int(max(cols.max(), rows.max()))
    # round the item capacity up to a power of two so the kernel compiles
    # for a handful of shapes only (compile results are disk-cached)
    lcap = max(512, 1 << int(np.ceil(np.log2(lcap))))
    tanch = lcap + 129

    def rup(x, m=128):
        return ((x + m - 1) // m) * m

    WQ = rup(lcap + 2) + 2 * bandw
    WT = rup(2 * lcap + 130) + 4 * bandw

    # item strings (see kernel docstring for the index algebra):
    # QS[j] = item_q[j-1]; TSR[j] = item_t[tanch - j]
    jq = np.arange(WQ)[None, :]
    jt = np.arange(WT)[None, :]
    qs = np.empty((2 * P, WQ), np.int8)
    tsr = np.empty((2 * P, WT), np.int8)
    qs[0::2] = np.take_along_axis(
        q, np.clip(begQ[:, None] - jq, 0, L - 1), axis=1)
    tsr[0::2] = np.take_along_axis(
        t_eff, np.clip(begT_s[:, None] - 1 - tanch + jt, 0, L - 1), axis=1)
    qs[1::2] = np.take_along_axis(
        q, np.clip(endQ[:, None] + jq - 1, 0, L - 1), axis=1)
    tsr[1::2] = np.take_along_axis(
        t_eff, np.clip(endT_s[:, None] + tanch - jt, 0, L - 1), axis=1)

    # per-item clamped scores (reference :61-67)
    ln = 2 * np.maximum(cols, rows)
    min_err = -((2**31) // ln)
    g = np.maximum(gap, min_err)
    m = np.maximum(mis, min_err)
    undef = (INT_MIN - g - m).astype(np.int64)
    init_cell = np.where(-g > dropoff, undef, g)

    n_items = max(16, 1 << int(np.ceil(np.log2(len(cols)))))
    npad = n_items - len(cols)
    params = np.zeros((n_items, 128), np.int32)
    params[: 2 * P, 0] = cols
    params[: 2 * P, 1] = rows
    params[: 2 * P, 2] = np.repeat(seed_ok, 2)
    params[: 2 * P, 3] = g
    params[: 2 * P, 4] = m
    params[: 2 * P, 5] = undef
    params[: 2 * P, 6] = init_cell
    params[: 2 * P, 7] = mat
    params[: 2 * P, 8] = dropoff
    if npad:
        qs = np.concatenate([qs, np.zeros((npad, WQ), np.int8)])
        tsr = np.concatenate([tsr, np.zeros((npad, WT), np.int8)])
        params[2 * P:, 5] = -1  # harmless undef for padding items

    meta = dict(rc=rc, seed_ok=seed_ok, begT_s=begT_s, endT_s=endT_s,
                endQ=endQ, lcap=lcap)
    return params, qs, tsr, meta


def xdrop_pairs_pallas(q, t, lenQ, lenT, begQ, begT, k, mat, mis, gap,
                       dropoff, interpret=False):
    """Pallas-kernel equivalent of xdrop_jax.xdrop_batch on numpy inputs.
    Returns dict of numpy arrays (score/begQ/endQ/begT/endT/rc/overflow)."""
    import jax.numpy as jnp

    P = q.shape[0]
    params, qs, tsr, meta = _prep_items(
        q, t, lenQ.astype(np.int64), lenT.astype(np.int64),
        begQ.astype(np.int64), begT.astype(np.int64),
        k, mat, mis, gap, dropoff)
    out = np.asarray(xdrop_extend_items(
        jnp.asarray(params), jnp.asarray(qs), jnp.asarray(tsr),
        int(meta["lcap"]), interpret))

    ls, lc, lr = out[0:2 * P:2, 0], out[0:2 * P:2, 1], out[0:2 * P:2, 2]
    rs, rcol, rrow = out[1:2 * P:2, 0], out[1:2 * P:2, 1], out[1:2 * P:2, 2]
    ovf = (out[0:2 * P:2, 3] | out[1:2 * P:2, 3]) != 0

    seed_ok = meta["seed_ok"]
    rc = meta["rc"]
    begT_s, endT_s, endQ = meta["begT_s"], meta["endT_s"], meta["endQ"]

    begQ_e = begQ - lc
    begT_e = begT_s - lr
    endQ_e = endQ + rcol
    endT_e = endT_s + rrow
    score = ls + rs + mat * k
    outBT = np.where(rc, lenT - endT_e, begT_e)
    outET = np.where(rc, lenT - begT_e, endT_e)
    z = np.zeros(P, np.int64)
    return dict(
        score=np.where(seed_ok, score, -1).astype(np.int32),
        begQ=np.where(seed_ok, begQ_e, z).astype(np.int32),
        endQ=np.where(seed_ok, endQ_e, z).astype(np.int32),
        begT=np.where(seed_ok, outBT, z).astype(np.int32),
        endT=np.where(seed_ok, outET, z).astype(np.int32),
        rc=np.where(seed_ok, rc, False),
        overflow=seed_ok & ovf,
    )


def align_batch_pallas(readset, qi, ti, seedQ, seedT, k, mat, mis, gap,
                       dropoff, batch: int = 1024, interpret: bool = False):
    """Readset-level batch driver (same interface as
    xdrop_jax.align_batch_jax): gathers padded pair sequences, runs the
    fused kernel in length-sorted batches, re-runs overflow pairs with the
    numpy oracle."""
    from .xdrop_ref import xdrop_align_ref

    n = len(qi)
    out = {f: np.empty(n, np.int32) for f in
           ("score", "begQ", "endQ", "begT", "endT")}
    out["rc"] = np.empty(n, bool)
    if n == 0:
        return out

    lens = readset.lengths
    s0 = readset.start_id
    pairlen = lens[qi - s0] + lens[ti - s0]
    order = np.argsort(pairlen, kind="stable")

    for lo in range(0, n, batch):
        sel = order[lo:lo + batch]
        qidx = (qi[sel] - s0).astype(np.int64)
        tidx = (ti[sel] - s0).astype(np.int64)
        P = len(sel)
        Lmax = int(max(lens[qidx].max(), lens[tidx].max()))
        qb = np.zeros((P, Lmax), np.int8)
        tb = np.zeros((P, Lmax), np.int8)
        for r in range(P):
            qb[r, :lens[qidx[r]]] = readset.read_codes(int(qidx[r]))
            tb[r, :lens[tidx[r]]] = readset.read_codes(int(tidx[r]))
        res = xdrop_pairs_pallas(
            qb, tb, lens[qidx].astype(np.int32), lens[tidx].astype(np.int32),
            seedQ[sel].astype(np.int32), seedT[sel].astype(np.int32),
            int(k), int(mat), int(mis), int(gap), int(dropoff),
            interpret=interpret)

        for r in np.flatnonzero(res["overflow"]):
            ref = xdrop_align_ref(
                readset.read_codes(int(qidx[r])),
                readset.read_codes(int(tidx[r])),
                int(seedQ[sel][r]), int(seedT[sel][r]),
                k, mat, mis, gap, dropoff)
            for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
                res[f][r] = ref[f]

        for f in out:
            out[f][sel] = res[f]
    return out
