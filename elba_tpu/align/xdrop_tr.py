"""Transposed-layout Pallas X-drop kernel (v5): band columns on sublanes,
128 items on lanes.

The v3/v4 kernels put ITEMS on sublanes and band COLUMNS on lanes
([16, wwin] blocks).  Three per-antidiagonal costs don't shrink with the
v4 band narrowing in that layout:

  * cross-band reductions (first_stop / dmax / maxupd) reduce across
    LANES: ~8 shuffle steps per reduction regardless of band width;
  * per-item scalar state updates are [16, 1] vectors — one vreg op
    serves only 16 items;
  * every elementwise op serves 16 items.

Transposed ([wwin sublanes, 128 item lanes] blocks), the same recurrence
serves 128 items per op: band reductions become sublane reductions
(~6 ops per 128 items vs ~8 lane-shuffle steps per 16), per-item state
lives in [1, 128] lane vectors, and the target register's
per-antidiagonal drift is a static sublane roll-down.

Layout-specific mechanics:

  * Window refs are TRANSPOSED ([tw, 128] int32; int8 would impose a
    32-row sublane tile on dynamic slices).  A refetch slices the item's
    own COLUMN at the 8-aligned (sublane-tile) floor; the 0..7 remainder
    folds in with an 8-variant masked static sublane roll (each piece
    validated to lower on v5e before this module was written).
  * treg[s, l] holds the code for column base_l + s at the fetch-time
    antidiagonal MINUS the static headroom H = trr - wwin: reads go
    through sublane offset H, one antidiagonal = one roll-down, and the
    budget per refetch is exactly H.
  * Pause detection and all register bookkeeping are [1, 128] lane-
    vector ops; only the column fetch itself runs in per-item scalar
    sections, fully gated by pl.when into VMEM scratch staging, so
    non-fetching items cost two scalar reads per outer trip.
  * Re-anchoring shifts per-item columns by 8-aligned deltas: masked
    static sublane rolls (wwin/8 variants), mirroring v4's lane shifts.

Semantics identical to xdrop_geom/xdrop_pallas (reference algorithm
XDropAligner.cpp:46-206): integer-exact, band overflow flagged for the
caller's escalation ladder, pause/resume continuation over window
rounds.  `pallas_extend_tr` keeps the item-major interface of
xdrop_geom.pallas_extend_geom (transposes are once-per-round XLA
relayouts), so the fused device driver serves both kernel families.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xdrop_pallas import (
    DONE, PAUSED, NEG_BIG,
    P_COLS, P_ROWS, P_ACTIVE, P_GAP, P_MIS, P_UNDEF, P_INIT, P_MAT,
    P_DROP, P_RESUME, P_QOFF, P_TOFF, P_TANCH, P_DELTA, P_MC0, P_XC0,
    P_HI3, P_BEST0, P_BEC0, P_BER0, P_BES0,
    O_BES, O_BEC, O_BER, O_OVF, O_STATUS, O_MC, O_XC, O_HI3, O_BEST,
    O_ADN, O_ITERS, O_TRIPS,
)

INT_MIN = -(2**31)


def _ceil128(x: int) -> int:
    return -(-x // 128) * 128


@dataclasses.dataclass(frozen=True)
class TrGeometry:
    items: int = 128         # items per grid block (lane count)
    unroll: int = 16         # antidiagonals per inner while iteration
    refetch_batch: int = 16  # pending refetches before an outer trip
    bandw: int = 32          # live-band capacity in sublanes
    wwin: int = 64           # column-window sublanes (mult of 8, >= 2*bandw)
    trr: int = 192           # target register sublanes (mult of 8)
    qwin: int = 2048         # guaranteed query progress per round

    def __post_init__(self):
        assert self.items == 128, "items = lane count"
        assert self.wwin % 8 == 0 and self.trr % 8 == 0
        assert self.wwin >= 2 * self.bandw and self.bandw % 8 == 0
        assert self.tback >= 8

    # driver-facing aliases so the fused/host drivers treat Tr and lane
    # geometries uniformly (sub = item padding multiple)
    @property
    def sub(self) -> int:
        return self.items

    @property
    def tback(self) -> int:
        # target-register roll budget per refetch (reads sit at this
        # static sublane offset)
        return self.trr - self.wwin

    @property
    def qw(self) -> int:
        # +8 fetch slack: column fetches start at the 8-aligned floor
        return _ceil128(self.qwin + self.wwin + 8)

    @property
    def tw(self) -> int:
        return _ceil128(self.qwin + self.wwin + self.tback + self.bandw
                        + 8)

    # driver-facing generalization hooks (see xdrop_geom.Geometry)
    @property
    def park(self) -> int:
        return self.tw - self.trr - 8

    @property
    def balign(self) -> int:
        return 8

    @property
    def talign(self) -> int:
        return 1


TR = TrGeometry()
# Default production geometry: the 2026-08-19 on-chip sweep
# (tools/sweep_geom.py, 4kb bench shape) measured unroll=64 best —
# 14,683 pairs/s vs 11,015 at unroll=16 and 13,206 at unroll=128
# (deeper unrolls shrink while-loop overhead until wasted post-pause
# antidiagonal work dominates).
TR_NARROW = TrGeometry(unroll=64)


def _make_kernel(g: TrGeometry):
    ITEMS, UNROLL, REFETCH_BATCH = g.items, g.unroll, g.refetch_batch
    BANDW, WWIN, TRR = g.bandw, g.wwin, g.trr
    QW, TW = g.qw, g.tw
    H = g.tback       # static read offset into treg / roll budget
    QF = WWIN + 8     # q column fetch width (8-aligned start + remainder)
    # pack_ref rows (vector state -> per-item scalars bounce)
    (B_QS8, B_TS8, B_RQ, B_RT, B_FETCH) = range(5)

    def _kernel(params_ref, qw_ref, tw_ref, st_in_ref, out_ref, st_out_ref,
                pack_ref, fq_ref, ft_ref):
        # params_ref: [32, ITEMS] (param rows x item lanes)
        # qw_ref/tw_ref: [QW/TW, ITEMS] int32 transposed windows
        # st refs: [2 * WWIN, ITEMS]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ITEMS), 1)
        srow = jax.lax.broadcasted_iota(jnp.int32, (WWIN, ITEMS), 0)
        orow = jax.lax.broadcasted_iota(jnp.int32, (16, ITEMS), 0)

        def row(cix):
            return params_ref[cix, :].reshape(1, ITEMS)

        colsv = row(P_COLS)
        rowsv = row(P_ROWS)
        gapv = row(P_GAP)
        misv = row(P_MIS)
        undefv = row(P_UNDEF)
        initv = row(P_INIT)
        matv = row(P_MAT)
        dropv = row(P_DROP)
        resv = row(P_RESUME)
        qoffv = row(P_QOFF)
        toffv = row(P_TOFF)
        tanchv = row(P_TANCH)

        # ---- state init (fresh vs resumed), all [1, ITEMS] lane vectors --
        res = resv != 0
        mc0 = jnp.where(res, row(P_MC0), 1)
        xc0 = jnp.where(res, row(P_XC0), 2)
        hi30 = jnp.where(res, row(P_HI3), 1)
        best0 = jnp.where(res, row(P_BEST0), 0)
        cadn0 = jnp.where(res, row(P_BEC0) + row(P_BER0), 0)
        cc0 = jnp.where(res, row(P_BEC0), 0)
        cbes0 = jnp.where(res, row(P_BES0), 0)
        adn0 = row(P_DELTA) + 2
        act0 = row(P_ACTIVE) * jnp.where(
            (colsv > 1) & (rowsv > 1) & (mc0 < xc0), 1, 0)
        ovf0 = jnp.zeros((1, ITEMS), jnp.int32)
        base0 = (mc0 - 1) // 8 * 8

        fresh1 = jnp.where(srow == 0, 0, undefv)
        fresh2 = jnp.where(srow <= 1, initv, undefv)
        a1_0 = jnp.where(res, st_in_ref[:WWIN, :], fresh1)
        a2_0 = jnp.where(res, st_in_ref[WWIN:, :], fresh2)

        qreg0 = jnp.zeros((WWIN, ITEMS), jnp.int32)
        treg0 = jnp.zeros((TRR, ITEMS), jnp.int32)
        zc = jnp.zeros((1, ITEMS), jnp.int32)
        noev = jnp.full((WWIN, ITEMS), -1, jnp.int32)

        def inner_cond(cy):
            act, needf = cy[8], cy[12]
            na, nf = jnp.sum(act), jnp.sum(needf)
            return (na > 0) & (nf < REFETCH_BATCH) & (nf < na)

        def inner_body(cy):
            for _ in range(UNROLL):
                cy = _substep(cy)
            return cy[:20] + (cy[20] + 1, cy[21])

        def _substep(cy):
            (adn, mc, xc, hi3, best, cadn, cc, cbes, act, ovf, offt, base,
             needf, paused, a1, a2, qreg, treg, ladn, lbes, iters,
             trips) = cy
            actb = (act > 0) & (needf == 0)
            l3 = mc - 1
            c = base + srow
            cltxc = c < xc
            cgemc = c >= mc
            inner_m = cgemc & cltxc
            bd = best - dropv

            # col-1 neighbors: one sublane down
            a2m1 = pltpu.roll(a2, 1, 0)
            a1m1 = pltpu.roll(a1, 1, 0)
            trow = treg[H:H + WWIN, :]

            sub = jnp.where(qreg == trow, matv, misv)
            temp = jnp.maximum(jnp.maximum(a2m1, a2) + gapv, a1m1 + sub)
            live = temp >= bd
            cell = jnp.where(live & inner_m, temp, undefv)

            gval = adn * gapv
            bcond = gval > bd
            b0 = jnp.where(bcond & (l3 == 0), gval, undefv)
            b1 = jnp.where(bcond & (adn == xc), gval, undefv)
            ceqxc = c == xc
            ad3 = jnp.where(c == l3, b0, cell)
            ad3 = jnp.where(ceqxc, b1, ad3)

            upd = inner_m & (temp > best)
            maxupd = jnp.max(jnp.where(upd, temp, NEG_BIG), axis=0,
                             keepdims=True)
            upd2 = upd & actb
            ladn_n = jnp.where(upd2, adn, ladn)
            lbes_n = jnp.where(upd2, temp, lbes)

            keep = (cltxc | ceqxc) & (ad3 == undefv) & \
                (c - 1 <= hi3) & (a2m1 == undefv)
            stop = (~keep) & cgemc
            first_stop = jnp.min(jnp.where(stop, c, 2**30), axis=0,
                                 keepdims=True)

            okd = (c >= l3) & cltxc & ((ad3 != undefv) | (a2 != undefv))
            dmax = jnp.max(jnp.where(okd, c, l3 - 1), axis=0, keepdims=True)
            ovf_now = jnp.where(xc - l3 + 1 > BANDW, 1, 0)

            best_n = jnp.where(
                actb, jnp.maximum(best, jnp.maximum(gval, maxupd)), best)
            hi3_n = jnp.where(actb, xc, hi3)
            new_min0 = jnp.maximum(jnp.minimum(first_stop, xc + 1), mc)
            new_max0 = jnp.maximum(dmax + 1, l3) + 1
            new_min = jnp.maximum(new_min0, adn + 2 - rowsv)
            new_max = jnp.minimum(new_max0, colsv)
            mc_n = jnp.where(actb, new_min, mc)
            xc_n = jnp.where(actb, new_max, xc)
            ovf_n = jnp.where(actb, ovf | ovf_now, ovf)
            act_n = jnp.where(
                actb, jnp.where((new_min < new_max) & (ovf_n == 0), 1, 0),
                act)
            adn_n = jnp.where(actb, adn + 1, adn)

            a1_n = jnp.where(actb, a2, a1)
            a2_n = jnp.where(actb, ad3, a2)
            treg_n = jnp.where(actb, pltpu.roll(treg, 1, 0), treg)
            offt_n = jnp.where(actb, offt - 1, offt)

            needf_n = jnp.where(
                actb,
                jnp.where((act_n > 0) & ((mc_n - base > WWIN - BANDW)
                                         | (offt_n <= 0)), 1, 0),
                needf)

            return (adn_n, mc_n, xc_n, hi3_n, best_n, cadn, cc, cbes,
                    act_n, ovf_n, offt_n, base, needf_n, paused, a1_n,
                    a2_n, qreg, treg_n, ladn_n, lbes_n, iters, trips)

        def merge_champ(cadn, cc, cbes, ladn, lbes, base):
            m_adn = jnp.max(ladn, axis=0, keepdims=True)
            has = m_adn >= 0
            at = ladn == m_adn
            m_cl = jnp.max(jnp.where(at, srow, -1), axis=0, keepdims=True)
            m_bes = jnp.max(jnp.where(at & (srow == m_cl), lbes, NEG_BIG),
                            axis=0, keepdims=True)
            cadn = jnp.where(has, m_adn, cadn)
            cc = jnp.where(has, base + m_cl, cc)
            cbes = jnp.where(has, m_bes, cbes)
            return cadn, cc, cbes

        def outer_cond(cy):
            return jnp.sum(cy[8]) > 0

        def outer_body(cy):
            (adn, mc, xc, hi3, best, cadn, cc, cbes, act, ovf, offt, base,
             needf, paused, a1, a2, qreg, treg, ladn, lbes, iters,
             trips) = cy

            cadn, cc, cbes = merge_champ(cadn, cc, cbes, ladn, lbes, base)
            ladn = noev

            # re-anchor to the advanced 8-aligned base; per-item delta is
            # a multiple of 8 in (0, wwin]
            nbase = (mc - 1) // 8 * 8
            refm = (act > 0) & (needf > 0)
            delta = jnp.where(refm, nbase - base, 0)

            def shift(x, d):
                rolled = pltpu.roll(x, WWIN - d, 0)
                return jnp.where(srow < WWIN - d, rolled, undefv)

            def reanchor(x):
                out = x
                for m in range(1, WWIN // 8 + 1):
                    out = jnp.where(delta == m * 8, shift(x, m * 8), out)
                return out

            a1 = reanchor(a1)
            a2 = reanchor(a2)
            base = jnp.where(refm, nbase, base)

            # ---- refetch prep, all lane-vector math ----------------------
            qs = base - qoffv
            jcb = tanchv - adn + 1 + base
            tst = jcb - toffv - H
            pausev = refm & ((qs < 0) | (qs > QW - QF) | (tst < 0) |
                             (tst > TW - TRR - 8))
            fetchm = refm & (~pausev)
            qs_c = jnp.clip(qs, 0, QW - QF)
            ts_c = jnp.clip(tst, 0, TW - TRR - 8)
            qs8 = qs_c // 8 * 8
            ts8 = ts_c // 8 * 8

            pk = jnp.where(orow == B_QS8, qs8, 0)
            pk = jnp.where(orow == B_TS8, ts8, pk)
            pk = jnp.where(orow == B_RQ, qs_c - qs8, pk)
            pk = jnp.where(orow == B_RT, ts_c - ts8, pk)
            pk = jnp.where(orow == B_FETCH, fetchm.astype(jnp.int32), pk)
            pack_ref[:, :] = pk

            # ---- per-item column fetch into scratch (gated) --------------
            # Non-fetching items cost one scalar read; fetchers slice
            # their window column at the 8-aligned floor and fold the
            # remainder in with masked static sublane rolls.
            for s in range(ITEMS):
                @pl.when(pack_ref[B_FETCH, s] > 0)
                def _(s=s):
                    qs8_s = pl.multiple_of(pack_ref[B_QS8, s], 8)
                    ts8_s = pl.multiple_of(pack_ref[B_TS8, s], 8)
                    rq = pack_ref[B_RQ, s]
                    rt = pack_ref[B_RT, s]
                    qcol0 = qw_ref[pl.ds(qs8_s, QF), s].reshape(QF, 1)
                    qcol = qcol0
                    for rv in range(1, 8):
                        qcol = jnp.where(rq == rv,
                                         pltpu.roll(qcol0, QF - rv, 0),
                                         qcol)
                    tcol0 = tw_ref[pl.ds(ts8_s, TRR), s].reshape(TRR, 1)
                    tcol = tcol0
                    for rv in range(1, 8):
                        tcol = jnp.where(rt == rv,
                                         pltpu.roll(tcol0, TRR - rv, 0),
                                         tcol)
                    fq_ref[:, s:s + 1] = qcol[:WWIN, :]
                    ft_ref[:, s:s + 1] = tcol

            # one masked merge per register (instead of 128 per-item
            # full-register selects)
            qreg = jnp.where(fetchm, fq_ref[:, :], qreg)
            treg = jnp.where(fetchm, ft_ref[:, :], treg)
            offt = jnp.where(fetchm, H, offt)
            needf = jnp.where(fetchm, 0, needf)
            act = jnp.where(pausev, 0, act)
            needf = jnp.where(pausev, 0, needf)
            paused = jnp.where(pausev, 1, paused)

            return jax.lax.while_loop(
                inner_cond, inner_body,
                (adn, mc, xc, hi3, best, cadn, cc, cbes, act, ovf, offt,
                 base, needf, paused, a1, a2, qreg, treg, ladn, lbes,
                 iters, trips + 1))

        final = jax.lax.while_loop(
            outer_cond, outer_body,
            (adn0, mc0, xc0, hi30, best0, cadn0, cc0, cbes0, act0, ovf0,
             zc, base0, act0, zc, a1_0, a2_0,
             qreg0, treg0, noev, jnp.zeros((WWIN, ITEMS), jnp.int32),
             zc, zc))
        (adn_f, mc_f, xc_f, hi3_f, best_f, cadn_f, cc_f, cbes_f, _, ovf_f,
         _, base_f, _, paused_f, a1_f, a2_f, _, _, ladn_f, lbes_f,
         iters_f, trips_f) = final

        cadn_f, cc_f, cbes_f = merge_champ(cadn_f, cc_f, cbes_f, ladn_f,
                                           lbes_f, base_f)
        bec_f = cc_f
        ber_f = cadn_f - cc_f
        bes_f = cbes_f

        st_out_ref[:WWIN, :] = a1_f
        st_out_ref[WWIN:, :] = a2_f
        status = jnp.where(paused_f > 0, PAUSED, DONE)
        v = jnp.where(orow == O_BES, bes_f, 0)
        v = jnp.where(orow == O_BEC, bec_f, v)
        v = jnp.where(orow == O_BER, ber_f, v)
        v = jnp.where(orow == O_OVF, ovf_f, v)
        v = jnp.where(orow == O_STATUS, status, v)
        v = jnp.where(orow == O_MC, mc_f, v)
        v = jnp.where(orow == O_XC, xc_f, v)
        v = jnp.where(orow == O_HI3, hi3_f, v)
        v = jnp.where(orow == O_BEST, best_f, v)
        v = jnp.where(orow == O_ADN, adn_f, v)
        v = jnp.where(orow == O_ITERS, iters_f, v)
        v = jnp.where(orow == O_TRIPS, trips_f, v)
        out_ref[:, :] = v

    return _kernel


@functools.lru_cache(maxsize=None)
def _get_kernel(g: TrGeometry):
    return _make_kernel(g)


def pallas_extend_tr(g: TrGeometry, params, qw, tw, st_in,
                     interpret: bool = False):
    """Kernel invocation at transposed geometry `g`, with the same
    item-major interface as xdrop_geom.pallas_extend_geom: params
    [N, >=32] int32, qw/tw [N, g.qw/g.tw] (any int dtype), st
    [N, 2, wwin].  The transposes to/from the kernel's column-major
    blocks are once-per-round XLA relayouts."""
    ITEMS = g.items
    N = params.shape[0]
    assert N % ITEMS == 0, \
        f"item count {N} not a multiple of {ITEMS} (grid floor)"
    nb = N // ITEMS

    def t2(x, w):
        # [N, w] -> [nb * w, ITEMS]
        return jnp.swapaxes(x.reshape(nb, ITEMS, w), 1, 2) \
            .reshape(nb * w, ITEMS)

    par_t = t2(params[:, :32].astype(jnp.int32), 32)
    qw_t = t2(qw.astype(jnp.int32), g.qw)
    tw_t = t2(tw.astype(jnp.int32), g.tw)
    st_t = t2(st_in.reshape(N, 2 * g.wwin), 2 * g.wwin)

    out_t, st_out_t = pl.pallas_call(
        _get_kernel(g),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((32, ITEMS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g.qw, ITEMS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g.tw, ITEMS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * g.wwin, ITEMS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((16, ITEMS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * g.wwin, ITEMS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * 16, ITEMS), jnp.int32),
            jax.ShapeDtypeStruct((nb * 2 * g.wwin, ITEMS), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, ITEMS), jnp.int32),
            pltpu.VMEM((g.wwin, ITEMS), jnp.int32),
            pltpu.VMEM((g.trr, ITEMS), jnp.int32),
        ],
        interpret=interpret,
    )(par_t, qw_t, tw_t, st_t)

    def ut(x, w):
        # [nb * w, ITEMS] -> [N, w]
        return jnp.swapaxes(x.reshape(nb, w, ITEMS), 1, 2) \
            .reshape(N, w)

    out = jnp.pad(ut(out_t, 16), ((0, 0), (0, 112)))
    st_out = ut(st_out_t, 2 * g.wwin).reshape(N, 2, g.wwin)
    return out, st_out
