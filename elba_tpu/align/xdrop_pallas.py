"""Fused Pallas TPU kernel for X-drop extension, chunked-continuation form.

The JAX while_loop implementation (xdrop_jax.py) is exact but dispatch-
bound: every antidiagonal issues ~30 small XLA ops.  This kernel runs the
whole extension loop inside one Pallas program with the DP state in VMEM
and per-item control scalars in SMEM -- no per-iteration dispatch.

Work decomposition
------------------
Every alignment contributes two *items* (left extension, right extension).
A left extension is a right extension over reversed strings:
  left-extend(Q, T) at (begQ, begT)
    == right-extend(reverse(Q[:begQ]), reverse(T[:begT])) from (0, 0)
so the kernel implements only the forward recurrence
  posQ = c - 1,  posT = adn - c - 1            (item-string coordinates)
(cf. the reference's symmetric formulas, XDropAligner.cpp:115-116).

Shape discipline (the hard-won part)
------------------------------------
Mosaic compile time explodes superlinearly with VMEM buffer byte-width, so
EVERY buffer here is fixed-size regardless of read length:

* Antidiagonal buffers are rings over column space (col % RING) with a
  mirror write so ring wraparound is invisible; reads stay within 3
  aligned window-steps of the live band, which the extent masks make safe.
* Sequences are fed as fixed windows (QWIN columns of guaranteed
  progress).  When an item's band would leave its windows, the item
  *pauses*: the kernel emits its scalar state and its two live
  antidiagonal windows, and the host driver re-invokes the kernel with
  fresh windows (a handful of rounds for the longest reads).  Each item
  carries its own antidiagonal offset, so fresh and resumed items share
  one lockstep loop.

The target string is stored reversed around a per-item anchor
(TW[j] = t_item[tanch - (toff + j)]) so the antidiagonal's target slice is
one ascending 128-aligned read plus a dynamic in-register roll.

Exactness: integer-identical to the oracle (align/xdrop_ref.py) for every
live band up to BANDW=128 columns wide; wider bands set the overflow flag
and the caller falls back to the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 16       # items per grid step (int32 sublane tile)
UNROLL = 16    # antidiagonals per inner while iteration (overhead amortization)
REFETCH_BATCH = 6  # items waiting on a register refetch before the block
                   # leaves the inner loop (frozen items idle, exactly)
BANDW = 128    # live-band capacity in lanes
WWIN = 2 * BANDW
TWR = 5 * BANDW  # target register width (rolls 1 lane per antidiagonal)
QWIN = 2048    # query columns of progress guaranteed per round
QW = QWIN + WWIN              # query window width
TW = QWIN + WWIN + 3 * BANDW  # target window width (drifts both ways)
NEG_BIG = -(2**31) + 2**20
DONE, PAUSED = 0, 1

# params columns
(P_COLS, P_ROWS, P_ACTIVE, P_GAP, P_MIS, P_UNDEF, P_INIT, P_MAT, P_DROP,
 P_RESUME, P_QOFF, P_TOFF, P_TANCH, P_DELTA, P_MC0, P_XC0, P_HI3,
 P_BEST0, P_BEC0, P_BER0, P_BES0) = range(21)
# sc (SMEM) columns
(S_STATUS, S_PAUSE) = range(2)
# output columns
(O_BES, O_BEC, O_BER, O_OVF, O_STATUS, O_MC, O_XC, O_HI3, O_BEST,
 O_ADN, O_ITERS, O_TRIPS) = range(12)


def _align(x):
    return (x // BANDW) * BANDW


def _kernel(params_ref, qw_ref, tw_ref, st_in_ref, out_ref, st_out_ref,
            sc_ref, pack_ref):
    """v3: two-level loop with an all-vector inner antidiagonal loop.

    The v1 kernel re-sliced each item's sequence windows and updated SMEM
    scalars EVERY antidiagonal -- 8 serial scalar sections per iteration
    dominated the runtime.  v2 moved every piece of per-item state into
    [SUB, 1] vector lanes and the sequence rows into registers:

    * qreg [SUB, WWIN]: query codes for columns [base, base+WWIN)
    * treg [SUB, TWR]:  target codes pre-rolled so lane l holds the code
      for column base+l at the current antidiagonal; advancing one
      antidiagonal is a STATIC roll by +1 (the target index drifts by
      exactly one per antidiagonal)

    v3 strips the remaining per-antidiagonal fat (~30% of the substep's
    vector ops):

    * band re-anchoring (the select-over-static-shifts of a1/a2) moves to
      the outer loop: a nonzero shift coincides with the needf exit, so
      shifting once per outer trip is equivalent and the common-case
      substep pays two plain selects instead of ~30 ops;
    * best-extension tracking (the reference's "last cell whose score
      beats the running best" quirk, XDropAligner.cpp:132-138) no longer
      reduces across lanes every antidiagonal.  Each lane records its
      latest qualifying event (antidiagonal number + score); because
      antidiagonal numbers are strictly monotone, the per-item champion
      (adn, col, score) can be folded in at outer trips and once at the
      end -- later events always beat earlier ones, and within one
      antidiagonal the highest lane wins, exactly the reference's scan
      order.

    The inner while_loop exits when an item's band leaves its registers
    (base advance or treg roll budget exhausted); the outer loop folds
    champions, re-anchors, refetches JUST that item's registers with
    scalar dynamic slices (guarded per item), checks window exhaustion
    (pause), and resumes.  Outer trips happen every ~100+ antidiagonals
    per item instead of every antidiagonal."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, WWIN), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)

    def col(cix):
        return params_ref[:, cix].reshape(SUB, 1)

    colsv = col(P_COLS)
    rowsv = col(P_ROWS)
    gapv = col(P_GAP)
    misv = col(P_MIS)
    undefv = col(P_UNDEF)
    initv = col(P_INIT)
    matv = col(P_MAT)
    dropv = col(P_DROP)
    resv = col(P_RESUME)

    # ---- state init (fresh vs resumed), all [SUB, 1] vectors -------------
    res = resv != 0
    mc0 = jnp.where(res, col(P_MC0), 1)
    xc0 = jnp.where(res, col(P_XC0), 2)
    hi30 = jnp.where(res, col(P_HI3), 1)
    best0 = jnp.where(res, col(P_BEST0), 0)
    # champion = the best-extension event (bec, ber, bes) in merged form
    # (adn = ber + bec is the event's antidiagonal; monotone, so any later
    # event strictly beats it)
    cadn0 = jnp.where(res, col(P_BEC0) + col(P_BER0), 0)
    cc0 = jnp.where(res, col(P_BEC0), 0)
    cbes0 = jnp.where(res, col(P_BES0), 0)
    adn0 = col(P_DELTA) + 2
    act0 = col(P_ACTIVE) * jnp.where(
        (colsv > 1) & (rowsv > 1) & (mc0 < xc0), 1, 0)
    ovf0 = jnp.zeros((SUB, 1), jnp.int32)
    base0 = (mc0 - 1) // BANDW * BANDW

    # fresh: antidiag 0 = {col0: 0}; antidiag 1 = {col0,1: init_cell};
    # resumed: the saved windows
    fresh1 = jnp.where(lane == 0, 0, undefv)
    fresh2 = jnp.where(lane <= 1, initv, undefv)
    a1_0 = jnp.where(res, st_in_ref[:, 0, :], fresh1)
    a2_0 = jnp.where(res, st_in_ref[:, 1, :], fresh2)

    for s in range(SUB):
        sc_ref[s, S_STATUS] = DONE
        sc_ref[s, S_PAUSE] = 0

    qreg0 = jnp.zeros((SUB, WWIN), jnp.int32)
    treg0 = jnp.zeros((SUB, TWR), jnp.int32)
    zc = jnp.zeros((SUB, 1), jnp.int32)
    noev = jnp.full((SUB, WWIN), -1, jnp.int32)

    def inner_cond(cy):
        """Exit to the outer (refetch) loop only when REFETCH_BATCH items
        are waiting, or every still-active item is.  A frozen item is
        merely idle -- its state is gated -- so batching refetches is
        exact.  With one exit per item event (v3.0), blocks of real-data
        items with independent refetch phases tripped ~SUB times more
        often than the per-item cadence and the outer-trip cost doubled
        the kernel time; identical-geometry synthetic items hid this by
        aligning their events."""
        act, needf = cy[8], cy[12]
        na, nf = jnp.sum(act), jnp.sum(needf)
        return (na > 0) & (nf < REFETCH_BATCH) & (nf < na)

    def inner_body(cy):
        """UNROLL antidiagonals per while iteration: an empty Mosaic
        while iteration costs ~0.9us on v5e (measured), so the loop
        overhead is amortized across several antidiagonal sub-steps.
        Items that finish / need a register refetch mid-group freeze via
        the gate (delta events are ~1 in 128 antidiagonals, so the
        wasted frozen slots are a few percent)."""
        for _ in range(UNROLL):
            cy = _substep(cy)
        return cy[:19] + (cy[19] + 1, cy[20])

    def _substep(cy):
        (adn, mc, xc, hi3, best, cadn, cc, cbes, act, ovf, offt5, base,
         needf, a1, a2, qreg, treg, ladn, lbes, iters, trips) = cy
        actb = (act > 0) & (needf == 0)
        l3 = mc - 1
        c = base + lane
        cltxc = c < xc
        cgemc = c >= mc
        inner_m = cgemc & cltxc
        bd = best - dropv

        # +-1 column offsets as a static lane roll (lane 0 wraps: col
        # base-1 is never live because min_col-1 >= base)
        a2m1 = pltpu.roll(a2, 1, 1)
        a1m1 = pltpu.roll(a1, 1, 1)
        trow = treg[:, :WWIN]

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

        # best-extension events: LAST column in scan order whose score
        # beats the previous global best (reference quirk, :132-138).
        # Recorded per lane; folded into the champion at outer trips.
        # (upd cells satisfy temp > best >= best - dropoff, so they are a
        # subset of the live cells for any dropoff >= 0.)
        upd = inner_m & (temp > best)
        maxupd = jnp.max(jnp.where(upd, temp, NEG_BIG), axis=1,
                         keepdims=True)
        upd2 = upd & actb
        ladn_n = jnp.where(upd2, adn, ladn)
        lbes_n = jnp.where(upd2, temp, lbes)

        # ---- band scans (advance / retract), reference :143-155 ----------
        keep = (cltxc | ceqxc) & (ad3 == undefv) & \
            (c - 1 <= hi3) & (a2m1 == undefv)
        stop = (~keep) & cgemc
        first_stop = jnp.min(jnp.where(stop, c, 2**30), axis=1,
                             keepdims=True)

        okd = (c >= l3) & cltxc & ((ad3 != undefv) | (a2 != undefv))
        dmax = jnp.max(jnp.where(okd, c, l3 - 1), axis=1, keepdims=True)
        ovf_now = jnp.where(xc - l3 + 1 > BANDW, 1, 0)

        # ---- state update (all [SUB, 1] selects) --------------------------
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
            actb, jnp.where((new_min < new_max) & (ovf_n == 0), 1, 0), act)
        adn_n = jnp.where(actb, adn + 1, adn)

        # frozen (inactive/paused) items keep their windows for state_out
        a1_n = jnp.where(actb, a2, a1)
        a2_n = jnp.where(actb, ad3, a2)
        treg_n = jnp.where(actb, pltpu.roll(treg, 1, 1), treg)
        offt5_n = jnp.where(actb, offt5 - 1, offt5)

        # exit to the outer loop when a still-active item's registers no
        # longer cover its band (query base advanced past the 128-aligned
        # anchor / target roll budget exhausted); items frozen earlier in
        # the unroll group keep their pending flag
        needf_n = jnp.where(
            actb,
            jnp.where((act_n > 0) & ((mc_n - base > BANDW)
                                     | (offt5_n <= 0)), 1, 0),
            needf)

        return (adn_n, mc_n, xc_n, hi3_n, best_n, cadn, cc, cbes,
                act_n, ovf_n, offt5_n, base, needf_n, a1_n, a2_n,
                qreg, treg_n, ladn_n, lbes_n, iters, trips)

    def merge_champ(cadn, cc, cbes, ladn, lbes, base):
        """Fold the per-lane event registers into the per-item champion.
        Every recorded event is strictly newer (higher adn) than the
        current champion, and within one antidiagonal the reference's
        column-scan order keeps the highest column -- so take the max-adn
        lane, highest lane on ties."""
        m_adn = jnp.max(ladn, axis=1, keepdims=True)
        has = m_adn >= 0
        at = ladn == m_adn
        m_cl = jnp.max(jnp.where(at, lane, -1), axis=1, keepdims=True)
        m_bes = jnp.max(jnp.where(at & (lane == m_cl), lbes, NEG_BIG),
                        axis=1, keepdims=True)
        cadn = jnp.where(has, m_adn, cadn)
        cc = jnp.where(has, base + m_cl, cc)
        cbes = jnp.where(has, m_bes, cbes)
        return cadn, cc, cbes

    def outer_cond(cy):
        return jnp.sum(cy[8]) > 0

    def outer_body(cy):
        (adn, mc, xc, hi3, best, cadn, cc, cbes, act, ovf, offt5, base,
         needf, a1, a2, qreg, treg, ladn, lbes, iters, trips) = cy

        # fold best-extension events (recorded against the OLD base) into
        # the champions, then clear the event registers
        cadn, cc, cbes = merge_champ(cadn, cc, cbes, ladn, lbes, base)
        ladn, lbes = noev, lbes

        # re-anchor the band registers to the advanced 128-aligned base
        # (v2 did this inline every substep; a nonzero shift coincides
        # with the needf exit, so once per outer trip is equivalent)
        nbase = (mc - 1) // BANDW * BANDW
        refm = (act > 0) & (needf > 0)
        delta = jnp.where(refm, nbase - base, 0)

        def shift(x, d):
            rolled = pltpu.roll(x, WWIN - d, 1)
            return jnp.where(lane < WWIN - d, rolled, undefv)

        def reanchor(x):
            out = jnp.where(delta == 128, shift(x, 128), x)
            return jnp.where(delta == 256, shift(x, 256), out)

        a1 = reanchor(a1)
        a2 = reanchor(a2)
        base = jnp.where(refm, nbase, base)

        # vector state -> scalars via a VMEM bounce (scalar VMEM stores are
        # illegal in Mosaic; scalar loads are fine)
        pk = jnp.where(lane128 == 0, mc, 0)
        pk = jnp.where(lane128 == 1, adn, pk)
        pk = jnp.where(lane128 == 2, act, pk)
        pk = jnp.where(lane128 == 3, needf, pk)
        pack_ref[:, :] = pk

        # ---- per-item refetch (only items whose flag is set) -------------
        for s in range(SUB):
            mc_s = pack_ref[s, 0]
            adn_s = pack_ref[s, 1]
            fetch = (pack_ref[s, 2] > 0) & (pack_ref[s, 3] > 0)
            base_s = _align(mc_s - 1)
            qoff_s = params_ref[s, P_QOFF]
            toff_s = params_ref[s, P_TOFF]
            tanch_s = params_ref[s, P_TANCH]
            qs = base_s - qoff_s
            jcb = tanch_s - adn_s + 1 + base_s
            tb5 = _align(jcb) - 2 * BANDW
            ts5 = tb5 - toff_s
            pause = (qs < 0) | (qs > QW - WWIN) | (ts5 < 0) | \
                (ts5 > TW - TWR)

            @pl.when(fetch & pause)
            def _(s=s):
                sc_ref[s, S_STATUS] = PAUSED
                sc_ref[s, S_PAUSE] = 1

            qs_c = pl.multiple_of(jnp.clip(qs, 0, QW - WWIN), BANDW)
            ts_c = pl.multiple_of(jnp.clip(ts5, 0, TW - TWR), BANDW)
            qrow = qw_ref[s, pl.ds(qs_c, WWIN)].astype(
                jnp.int32).reshape(1, WWIN)
            t5 = tw_ref[s, pl.ds(ts_c, TWR)].astype(
                jnp.int32).reshape(1, TWR)
            # pre-roll so lane l holds the target code for column base+l
            # at antidiagonal adn; one antidiagonal = one static +1 roll
            offt5_s = jcb - (toff_s + ts_c)
            t5r = pltpu.roll(t5, TWR - offt5_s, 1)

            do = fetch & (~pause)
            m = (rown == s) & do
            qreg = jnp.where(m, qrow, qreg)
            treg = jnp.where(m, t5r, treg)
            base = jnp.where(m, base_s, base)
            offt5 = jnp.where(m, offt5_s, offt5)
            needf = jnp.where(m, 0, needf)

        # fold pause flags back into the vector state
        pv = zc
        for s in range(SUB):
            pv = jnp.where(rown == s, sc_ref[s, S_PAUSE], pv)
        act = jnp.where(pv > 0, 0, act)
        needf = jnp.where(pv > 0, 0, needf)
        for s in range(SUB):
            sc_ref[s, S_PAUSE] = 0

        return jax.lax.while_loop(
            inner_cond, inner_body,
            (adn, mc, xc, hi3, best, cadn, cc, cbes, act, ovf, offt5,
             base, needf, a1, a2, qreg, treg, ladn, lbes, iters, trips))

    final = jax.lax.while_loop(
        outer_cond, outer_body,
        (adn0, mc0, xc0, hi30, best0, cadn0, cc0, cbes0, act0, ovf0,
         zc, base0, act0, a1_0, a2_0, qreg0, treg0, noev,
         jnp.zeros((SUB, WWIN), jnp.int32), zc, zc))
    (adn_f, mc_f, xc_f, hi3_f, best_f, cadn_f, cc_f, cbes_f, _, ovf_f,
     _, base_f, _, a1_f, a2_f, _, _, ladn_f, lbes_f, iters_f,
     trips_f) = final

    # events recorded since the last outer-trip fold
    cadn_f, cc_f, cbes_f = merge_champ(cadn_f, cc_f, cbes_f, ladn_f,
                                       lbes_f, base_f)
    bec_f = cc_f
    ber_f = cadn_f - cc_f
    bes_f = cbes_f

    # ---- emit outputs + continuation state --------------------------------
    st_out_ref[:, 0, :] = a1_f
    st_out_ref[:, 1, :] = a2_f
    status = zc
    for s in range(SUB):
        status = jnp.where(rown == s, sc_ref[s, S_STATUS], status)
    v = jnp.where(lane128 == O_BES, bes_f, 0)
    v = jnp.where(lane128 == O_BEC, bec_f, v)
    v = jnp.where(lane128 == O_BER, ber_f, v)
    v = jnp.where(lane128 == O_OVF, ovf_f, v)
    v = jnp.where(lane128 == O_STATUS, status, v)
    v = jnp.where(lane128 == O_MC, mc_f, v)
    v = jnp.where(lane128 == O_XC, xc_f, v)
    v = jnp.where(lane128 == O_HI3, hi3_f, v)
    v = jnp.where(lane128 == O_BEST, best_f, v)
    v = jnp.where(lane128 == O_ADN, adn_f, v)
    v = jnp.where(lane128 == O_ITERS, iters_f, v)
    v = jnp.where(lane128 == O_TRIPS, trips_f, v)
    out_ref[:, :] = v


def pallas_extend(params, qw, tw, st_in, interpret: bool = False):
    """Raw (unjitted) kernel invocation: callable from inside larger jitted
    programs (the device-resident driver in xdrop_device.py fuses window
    building + this kernel + continuation bookkeeping into one dispatch)."""
    N = params.shape[0]
    grid = (N // SUB,)
    out, st_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((SUB, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, QW), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, TW), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, 2, WWIN), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SUB, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, 2, WWIN), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 128), jnp.int32),
            jax.ShapeDtypeStruct((N, 2, WWIN), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((SUB, 16), jnp.int32),
            pltpu.VMEM((SUB, 128), jnp.int32),
        ],
        interpret=interpret,
    )(params, qw, tw, st_in)
    return out, st_out


_extend_rounds_x32 = functools.partial(jax.jit, static_argnums=(4,))(
    pallas_extend)


def xdrop_extend_items_rounds(params, qw, tw, st_in, interpret=False):
    # the kernel is all-32-bit; trace with x64 disabled (int64 in a Mosaic
    # kernel makes the convert-type lowering recurse forever)
    with jax.enable_x64(False):
        if params.shape[1] < 128:   # narrow host transfer, pad on device
            params = jnp.pad(jnp.asarray(params),
                             ((0, 0), (0, 128 - params.shape[1])))
        return _extend_rounds_x32(params, qw, tw, st_in, interpret)


INT_MIN = -(2**31)


def xdrop_pairs_pallas(q, t, lenQ, lenT, begQ, begT, k, mat, mis, gap,
                       dropoff, interpret=False):
    """Pallas equivalent of xdrop_jax.xdrop_batch on numpy inputs.
    Returns dict of numpy arrays (score/begQ/endQ/begT/endT/rc/overflow).

    Drives the chunked kernel: items that pause (band leaving the
    sequence windows) are re-invoked with fresh windows until done.
    """
    P, L = q.shape
    lenQ = lenQ.astype(np.int64)
    lenT = lenT.astype(np.int64)
    begQ = begQ.astype(np.int64)
    begT = begT.astype(np.int64)
    ar = np.arange(P)

    inb = (begQ >= 0) & (begQ + k <= lenQ) & (begT >= 0) & (begT + k <= lenT)
    nz = ~((begQ == 0) & (begT == 0))
    bq = np.clip(begQ, 0, L - 1)
    bt = np.clip(begT, 0, L - 1)
    rc = q[ar, np.clip(bq + (k >> 1), 0, L - 1)] != \
        t[ar, np.clip(bt + (k >> 1), 0, L - 1)]

    j = np.arange(L)
    ridx = np.clip(lenT[:, None] - 1 - j[None, :], 0, L - 1)
    t_rc = (3 - np.take_along_axis(t, ridx, axis=1)).astype(t.dtype)
    t_eff = np.where(rc[:, None], t_rc, t)
    begT_s = np.where(rc, lenT - begT - k, begT)

    offs = np.arange(k)
    qwd = np.take_along_axis(q, np.clip(bq[:, None] + offs[None, :], 0, L - 1),
                             axis=1)
    twd = np.take_along_axis(
        t_eff, np.clip(begT_s[:, None] + offs[None, :], 0, L - 1), axis=1)
    seed_ok = (qwd == twd).all(axis=1) & inb & nz

    endQ = begQ + k
    endT_s = begT_s + k

    # item geometry: [left, right] interleaved
    n_items = 2 * P
    cols = np.empty(n_items, np.int64)
    rows = np.empty(n_items, np.int64)
    cols[0::2] = begQ + 1
    rows[0::2] = begT_s + 1
    cols[1::2] = lenQ - endQ + 1
    rows[1::2] = lenT - endT_s + 1
    cols = np.maximum(cols, 1)
    rows = np.maximum(rows, 1)

    # per-item reversed-target anchor: > rows, 128-aligned slack
    tanch = (rows + 255) // 128 * 128 + 128

    # per-item clamped scores (reference XDropAligner.cpp:61-67)
    ln = 2 * np.maximum(cols, rows)
    min_err = -((2**31) // ln)
    g_ = np.maximum(gap, min_err)
    m_ = np.maximum(mis, min_err)
    undef = (INT_MIN - g_ - m_).astype(np.int64)
    init_cell = np.where(-g_ > dropoff, undef, g_)

    # device-resident sequences: shipped once; every round's windows are
    # built by jitted gathers on device (host<->device traffic per round is
    # only the small param/state blocks)
    q_dev = jnp.asarray(q)
    teff_dev = jnp.asarray(t_eff.astype(np.int8))
    begQ_dev = jnp.asarray(begQ)
    endQ_dev = jnp.asarray(endQ)
    begTs_dev = jnp.asarray(begT_s)
    endTs_dev = jnp.asarray(endT_s)
    tanch_dev = jnp.asarray(tanch)

    @jax.jit
    def _build_windows_dev(item_ids, qoffs, toffs):
        """QS[j] = q_item[j-1]; TSR[j] = t_item[tanch - j].
          left : q_item[x] = q[begQ-1-x], t_item[x] = t_eff[begT_s-1-x]
          right: q_item[x] = q[endQ+x],   t_item[x] = t_eff[endT_s+x]"""
        pair = item_ids // 2
        is_left = (item_ids % 2) == 0
        xs = qoffs[:, None] + jnp.arange(QW)[None, :] - 1
        src_q = jnp.where(is_left[:, None],
                          begQ_dev[pair][:, None] - 1 - xs,
                          endQ_dev[pair][:, None] + xs)
        qwv = jnp.take_along_axis(q_dev[pair],
                                  jnp.clip(src_q, 0, L - 1), axis=1)
        xt = tanch_dev[item_ids][:, None] - (toffs[:, None] +
                                             jnp.arange(TW)[None, :])
        src_t = jnp.where(is_left[:, None],
                          begTs_dev[pair][:, None] - 1 - xt,
                          endTs_dev[pair][:, None] + xt)
        twv = jnp.take_along_axis(teff_dev[pair],
                                  jnp.clip(src_t, 0, L - 1), axis=1)
        return qwv.astype(jnp.int8), twv.astype(jnp.int8)

    def build_windows(item_ids, qoffs, toffs, npad):
        ii = np.zeros(npad, np.int64)
        qo = np.zeros(npad, np.int64)
        to = np.zeros(npad, np.int64)
        ii[:len(item_ids)] = item_ids
        qo[:len(item_ids)] = qoffs
        to[:len(item_ids)] = toffs
        return _build_windows_dev(jnp.asarray(ii), jnp.asarray(qo),
                                  jnp.asarray(to))

    def window_toff(tb):
        # tb drifts downward (one per antidiagonal); park the live slice
        # near the window's tail
        return np.maximum((tb + 3 * BANDW - TW) // 128 * 128, 0)

    # ---- continuation rounds ---------------------------------------------
    qoffs = np.zeros(n_items, np.int64)
    tb0 = (tanch - 1) // 128 * 128
    toffs = window_toff(tb0)
    resume = np.zeros(n_items, np.int32)
    saved = np.zeros((n_items, 8), np.int64)
    # continuation band state stays device-resident across rounds
    state_dev = jnp.zeros((n_items, 2, WWIN), jnp.int32)
    final = np.zeros((n_items, 10), np.int64)
    live = np.flatnonzero(np.repeat(seed_ok, 2))
    # schedule items by extension size: kernel blocks of SUB items run in
    # lockstep, so homogeneous blocks waste fewer iterations
    work = np.maximum(cols, rows)
    live = live[np.argsort(work[live], kind="stable")]

    # ONE padded shape per batch geometry: npad is derived from the item
    # count (2 * pairs), NOT the live count, so every batch of the same
    # size shares one compiled kernel -- a new shape costs a full remote
    # Mosaic compile (tens of minutes for the unrolled kernel), while a
    # padded (inactive) item block exits its while loop immediately
    npad = max(SUB, 1 << int(np.ceil(np.log2(max(n_items, 1)))))
    rounds = 0
    while len(live) > 0 and rounds < 64:
        rounds += 1
        nsel = len(live)
        par = np.zeros((npad, 32), np.int32)
        par[:nsel, P_COLS] = cols[live]
        par[:nsel, P_ROWS] = rows[live]
        par[:nsel, P_ACTIVE] = 1
        par[:nsel, P_GAP] = g_[live]
        par[:nsel, P_MIS] = m_[live]
        par[:nsel, P_UNDEF] = undef[live]
        par[:nsel, P_INIT] = init_cell[live]
        par[:nsel, P_MAT] = mat
        par[:nsel, P_DROP] = dropoff
        par[:nsel, P_RESUME] = resume[live]
        par[:nsel, P_QOFF] = qoffs[live]
        par[:nsel, P_TOFF] = toffs[live]
        par[:nsel, P_TANCH] = tanch[live]
        par[:nsel, P_DELTA] = np.where(resume[live] > 0,
                                       saved[live, 7] - 2, 0)
        par[:nsel, P_MC0] = saved[live, 0]
        par[:nsel, P_XC0] = saved[live, 1]
        par[:nsel, P_HI3] = saved[live, 2]
        par[:nsel, P_BEST0] = saved[live, 3]
        par[:nsel, P_BEC0] = saved[live, 4]
        par[:nsel, P_BER0] = saved[live, 5]
        par[:nsel, P_BES0] = saved[live, 6]

        qwv, twv = build_windows(live, qoffs[live], toffs[live], npad)
        # every device op uses the power-of-two padded shape: arbitrary
        # nsel-shaped ops would each trigger a fresh (remote) mini-compile
        live_dev = jnp.asarray(
            np.concatenate([live,
                            np.full(npad - nsel, n_items, np.int64)]))
        sti = state_dev[jnp.clip(live_dev, 0, n_items - 1)]

        out, st_out = xdrop_extend_items_rounds(
            jnp.asarray(par), qwv, twv, sti, interpret)
        # out-of-range pad indices are dropped by the scatter
        state_dev = state_dev.at[live_dev].set(st_out)
        # only the first 10 output lanes are meaningful; slice device-side
        # to keep the per-round host transfer small
        out = np.asarray(out[:, :16])[:nsel]

        final[live, :] = out[:, :10]
        paused = out[:, O_STATUS] == PAUSED
        still = live[paused]
        if len(still):
            idx = np.flatnonzero(paused)
            saved[still, 0] = out[idx, O_MC]
            saved[still, 1] = out[idx, O_XC]
            saved[still, 2] = out[idx, O_HI3]
            saved[still, 3] = out[idx, O_BEST]
            saved[still, 4] = out[idx, O_BEC]
            saved[still, 5] = out[idx, O_BER]
            saved[still, 6] = out[idx, O_BES]
            saved[still, 7] = out[idx, O_ADN]
            resume[still] = 1
            base_p = (out[idx, O_MC] - 1) // 128 * 128
            qoffs[still] = base_p
            tb_p = (tanch[still] - out[idx, O_ADN] + 1 + base_p) \
                // 128 * 128
            toffs[still] = window_toff(tb_p)
        live = still

    ls, lc, lr = final[0::2, O_BES], final[0::2, O_BEC], final[0::2, O_BER]
    rs, rcol, rrow = final[1::2, O_BES], final[1::2, O_BEC], \
        final[1::2, O_BER]
    ovf = ((final[0::2, O_OVF] | final[1::2, O_OVF]) != 0)
    if rounds >= 64 and len(live):
        ovf = ovf.copy()
        ovf[np.unique(live // 2)] = True  # runaway: fall back to oracle

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
        Pn = len(sel)
        # fixed batch geometry: tail batches pad to the full batch size
        # (and read lengths to a power-of-two bucket) so every batch
        # reuses one compiled kernel shape
        Lmax = int(max(lens[qidx].max(), lens[tidx].max()))
        Lmax = max(512, 1 << int(np.ceil(np.log2(Lmax))))
        qb = np.zeros((batch, Lmax), np.int8)
        tb = np.zeros((batch, Lmax), np.int8)
        lq = np.zeros(batch, np.int32)
        lt = np.zeros(batch, np.int32)
        sq = np.full(batch, -1, np.int32)
        st = np.full(batch, -1, np.int32)
        for r in range(Pn):
            qb[r, :lens[qidx[r]]] = readset.read_codes(int(qidx[r]))
            tb[r, :lens[tidx[r]]] = readset.read_codes(int(tidx[r]))
        lq[:Pn] = lens[qidx]
        lt[:Pn] = lens[tidx]
        sq[:Pn] = seedQ[sel]
        st[:Pn] = seedT[sel]
        res = xdrop_pairs_pallas(
            qb, tb, lq, lt, sq, st,
            int(k), int(mat), int(mis), int(gap), int(dropoff),
            interpret=interpret)
        res = {f: v[:Pn] for f, v in res.items()}

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
