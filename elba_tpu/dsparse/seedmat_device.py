"""Device-resident SharedSeeds SpGEMM (B = A A^T), chunked.

The whole multiply runs as ONE jitted XLA program: a while_loop walks the
instance array in fixed-size chunks, expands each chunk's semiring
products, and merges them into a sorted fixed-capacity accumulator under
the SharedSeeds add (count sum, first seed, fold-last seed) -- the TPU
equivalent of the reference's streaming CombBLAS SpGEMM
(Mult_AnXBn_DoubleBuff, SharedSeeds.cpp:4-10) with MAX_ALLTOALL_MEM-style
memory bounding (KmerOps.hpp:10-12).

TPU-shaped design (informed by on-chip microbenchmarks; see git history):

* products are enumerated by OFFSET within the k-mer-sorted instance
  array: partner o of instance i is simply instance i+o of the same group,
  so the expansion is static shifted slices -- ZERO gathers and no
  searchsorted (a 33M-element searchsorted costs ~6s on v5e; a gather
  ~0.5s; a shifted slice is free)
* the (q, t) pair key is sorted as two int32 columns with ONE variadic
  2-key stable sort (jax.lax.sort carries payloads through the sort
  network at ~0.06s per payload per 33M, vs ~0.5s per post-argsort
  gather), so any read count < 2^31 works -- no composite-key cap
* seed payloads are packed two-positions-per-int32 (positions < 2^15;
  longer reads use the host path)
* compaction back into the fixed accumulator is another stable sort by
  the dead flag (cheaper than multi-array scatter)
* chunk boundaries may split k-mer groups: the accumulator merge is
  order-preserving (buffer entries precede chunk entries under stable
  sort), so the first/fold-last seed semantics survive splitting
* overflowing the accumulator is counted and reported, never silent;
  callers retry with doubled capacity

All state stays in HBM; the only host traffic is the one-time upload and
the final stats scalars / compacted result fetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kmers.count import KmerMatrix
from ..kmers.count_chunked import COMPILE_CAP, _pow2

SENT = np.int32(2**31 - 1)  # sentinel (q, t) for empty slots; sorts last
PACK = 15                   # position packing: s = (pq << PACK) | pt


def _live_window(chunk_slots: int, chunk_inst: int) -> int:
    """Static bound on LIVE products per chunk: a whole k-mer group of
    size c yields c(c-1)/2 live q<t products of its c*(U-1) slots
    (<= 1/2), or c^2 of c*(2U-1) when full (<= U/(2U-1) ~ 0.507); a
    chunk cuts at most two groups (group size <= upper), so half the
    slots plus one instance-width of slack always covers the live run."""
    return chunk_slots // 2 + chunk_inst


def _out_cap_max(chunk_slots: int, chunk_inst: int) -> int:
    """Largest accumulator capacity whose flush merge sort (out_cap +
    pending capacity >= live window + 1024) stays under the remote
    compile helper's survivable shape (COMPILE_CAP; CLAUDE.md).
    Overflow retries double up to this and then fail loudly — an
    unclamped doubling minted a ~134M-slot sort that SIGKILLs the
    helper."""
    return max(COMPILE_CAP - (_live_window(chunk_slots, chunk_inst) + 1024),
               1 << 14)


def _grow_out_cap(out_cap: int, chunk_slots: int, chunk_inst: int,
                  context: str) -> int:
    cap_max = _out_cap_max(chunk_slots, chunk_inst)
    if out_cap >= cap_max:
        raise RuntimeError(
            f"{context}: accumulator overflow at the compile-bound "
            f"capacity {out_cap} (chunk slots {chunk_slots}); "
            f"raise min_shared/partition the input instead")
    return min(2 * out_cap, cap_max)


def _pend_cap_for(out_cap: int, chunk_slots: int, chunk_inst: int,
                  total_chunks: int = 0) -> int:
    """Pending-buffer capacity: a few live windows' worth (so flushes
    amortize over several chunks), scaled to the problem rather than
    always maximal — every flush (including the final one) sorts the
    FULL static capacity, so an oversized pending just sorts empty
    slots.  When the caller knows the run's chunk count, pending never
    exceeds the whole run's live products."""
    wl = _live_window(chunk_slots, chunk_inst)
    want = max(4 * wl, 2 * out_cap, 1 << 20)
    if total_chunks > 0:
        want = min(want, total_chunks * wl + 1024)
    cap = min(COMPILE_CAP - out_cap, max(want, wl + 1024))
    assert cap >= wl + 1024, (out_cap, chunk_slots, chunk_inst)
    return cap


def _live_pos_max(pos, nnz) -> int:
    """Max seed position over LIVE slots only: compacted dead slots
    keep real window-position payloads up to L - k, so a full-array max
    would spuriously reject readsets the packed-seed path handles."""
    idx = jnp.arange(pos.shape[0], dtype=jnp.int32)
    return int(jnp.max(jnp.where(idx < nnz, pos, 0)))


def _reduce_compact(mt, mq, mw, m0, m1, out_cap: int,
                    two_seeds: bool = True):
    """SharedSeeds add over the (t, q)-sorted merge array + compaction of
    the group heads into the fixed accumulator.  Per group: summed count,
    first element's first seed (the head's own s0), last element's last
    seed (the tail's own s1).

    The reduction is gather/segment-op/scan-free -- those are the v5e's
    expensive or compile-heavy primitives (segment op ~0.4s + [gid]
    gather ~0.5s per 33M; a tuple associative_scan compiles for >30 min
    at 33M).  Instead:

    * group count at head h = excl[next head] - excl[h] where excl is the
      EXCLUSIVE int32 prefix sum of w.  The prefix may wrap past 2^31
      (total products exceed int32 at genome scale) but neighboring-head
      differences are exact modulo 2^32 because every true group sum is
      tiny, so plain wrapping int32 cumsum (XLA's cheap path) suffices.
    * fold-last seed of the group at head h = s1 of the element JUST
      BEFORE the next head = roll-right(s1) read at the next head.
    * "next head" values come for free after compaction: heads are
      contiguous, so the next compacted SLOT is the next head; the final
      live slot instead takes the global total / the last live element's
      s1 (one scalar dynamic read).

    With two_seeds=False the fold-last seed is skipped: one payload fewer
    in the head-compaction sort (and the caller skips it in the merge
    sort), ~15% off the whole multiply; s1 then mirrors s0.  Use when the
    consumer only reads seeds[0] (as the reference's aligner does,
    PairwiseAlignment.cpp:90).

    Returns (nheads int64, compacted (t, q, w, s0, s1))."""
    bound = jnp.concatenate(
        [jnp.ones(1, bool), (mt[1:] != mt[:-1]) | (mq[1:] != mq[:-1])])
    head = bound & (mt != SENT)
    csum = jnp.cumsum(mw)                 # int32, wraps by design
    excl = csum - mw

    # compact the group heads to the front: non-head slots get
    # (SENT, SENT) keys so a stable 2-key re-sort moves them to the back
    # while keeping heads in (t, q) order (live read ids are < SENT)
    if two_seeds:
        s1prev = jnp.concatenate([m1[:1], m1[:-1]])  # [0] never read
        nt, nq, nex, n0, n1p = jax.lax.sort(
            (jnp.where(head, mt, SENT), jnp.where(head, mq, SENT),
             excl, m0, s1prev), num_keys=2, is_stable=True)
        n1p = n1p[:out_cap]
    else:
        nt, nq, nex, n0 = jax.lax.sort(
            (jnp.where(head, mt, SENT), jnp.where(head, mq, SENT),
             excl, m0), num_keys=2, is_stable=True)
    nt, nq, nex = nt[:out_cap], nq[:out_cap], nex[:out_cap]
    n0 = n0[:out_cap]

    nheads = jnp.sum(head).astype(jnp.int64)
    nlive = jnp.sum(mt != SENT)
    slot = jnp.arange(out_cap, dtype=jnp.int64)
    is_last = slot == nheads - 1
    # slicing to out_cap before the rolls is safe: slot nheads-1 is
    # overridden by is_last, slots past nheads are dead, and when
    # nheads > out_cap the whole result is discarded by the caller's
    # overflow retry
    nxt_ex = jnp.concatenate([nex[1:], nex[:1]])
    nw = jnp.where(is_last, csum[-1], nxt_ex) - nex
    if two_seeds:
        nxt_s1 = jnp.concatenate([n1p[1:], n1p[:1]])
        last_s1 = jax.lax.dynamic_index_in_dim(
            m1, jnp.maximum(nlive - 1, 0), keepdims=False)
        n1 = jnp.where(is_last, last_s1, nxt_s1)
    else:
        n1 = n0
    return nheads, (nt, nq, nw, n0, n1)


def _empty_state(out_cap: int, pend_cap: int = 0):
    """Accumulator + pending-product state.

    The accumulator (t, q, w, s0, s1) holds reduced pairs in (t, q)
    order; the pending buffer (pt, pq, ps) holds COMPACTED RAW products
    (weight 1, seed ps) awaiting a flush.  Raw products are much cheaper
    to park (one 1-key compaction sort, 3 int32 arrays) than to merge
    (two (out_cap + pend_cap)-slot sorts), so the expensive accumulator
    re-sort amortizes over every chunk the pending buffer can hold."""
    z = lambda fill, n: jnp.full((n,), fill, jnp.int32)
    return (z(SENT, out_cap), z(SENT, out_cap), z(0, out_cap),
            z(-1, out_cap), z(-1, out_cap),
            jnp.int64(0),                     # overflow count
            z(SENT, pend_cap), z(SENT, pend_cap), z(-1, pend_cap),
            jnp.int32(0))                     # pending fill


def _flush_pending(state, out_cap: int, two_seeds: bool):
    """Merge the pending raw products into the accumulator (the
    expensive step: one 2-key merge sort + the head-compaction sort of
    _reduce_compact over out_cap + pend_cap slots)."""
    bt, bq, bw, bs0, bs1, ovf, pt, pq, ps, pfill = state
    pend_cap = pt.shape[0]
    alive_p = jnp.arange(pend_cap, dtype=jnp.int32) < pfill
    mt = jnp.concatenate([bt, jnp.where(alive_p, pt, SENT)])
    mq = jnp.concatenate([bq, jnp.where(alive_p, pq, SENT)])
    mw = jnp.concatenate([bw, alive_p.astype(jnp.int32)])
    m0 = jnp.concatenate([bs0, ps])
    if two_seeds:
        m1 = jnp.concatenate([bs1, ps])
        mt, mq, mw, m0, m1 = jax.lax.sort(
            (mt, mq, mw, m0, m1), num_keys=2, is_stable=True)
    else:
        m1 = None
        mt, mq, mw, m0 = jax.lax.sort(
            (mt, mq, mw, m0), num_keys=2, is_stable=True)
    nheads, new = _reduce_compact(mt, mq, mw, m0, m1, out_cap, two_seeds)
    ovf = ovf + jnp.maximum(nheads - out_cap, 0)
    slot = jnp.arange(out_cap, dtype=jnp.int64)
    alive = slot < nheads
    acc = (jnp.where(alive, new[0], SENT),
           jnp.where(alive, new[1], SENT),
           jnp.where(alive, new[2], 0),
           jnp.where(alive, new[3], -1),
           jnp.where(alive, new[4], -1))
    empty = jnp.full((pend_cap,), SENT, jnp.int32)
    return acc + (ovf, empty, empty, jnp.full((pend_cap,), -1, jnp.int32),
                  jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=("chunk_inst", "out_cap", "pend_cap", "min_shared",
                     "full", "upper", "two_seeds"))
def _spgemm_device(rows, pos, gid, total_inst,
                   chunk_inst: int, out_cap: int, pend_cap: int,
                   min_shared: int,
                   full: bool, upper: int, two_seeds: bool = True):
    """The full chunked multiply as one XLA program.

    rows/pos: int32[pad] instance arrays sorted by k-mer group, with a
              `upper`-slot halo of sentinel group ids on BOTH sides
    gid:      int32[pad] group id per instance (halo slots get distinct
              negative ids so no halo pair ever matches)
    total_inst: int32 scalar, true instance count

    Returns dict of accumulator arrays (t-major sorted, SENT-padded) and
    stats (nnz at min_shared, distinct pairs, overflow count).
    """
    nchunks = (total_inst + chunk_inst - 1) // chunk_inst

    def cond(carry):
        return carry[0] < nchunks

    def body(carry):
        i, state = carry
        return i + 1, _chunk_step(rows, pos, gid, total_inst, i, state,
                                  chunk_inst, out_cap, full, upper,
                                  two_seeds)

    _, state = jax.lax.while_loop(
        cond, body, (jnp.int32(0), _empty_state(out_cap, pend_cap)))
    bt, bq, bw, bs0, bs1, ovf = _flush_pending(state, out_cap,
                                               two_seeds)[:6]
    nnz = jnp.sum((bt != SENT) & (bw >= min_shared))
    npairs = jnp.sum(bt != SENT)
    return dict(t=bt, q=bq, numshared=bw, s0=bs0, s1=bs1,
                stats=dict(nnz=nnz, pairs=npairs, overflow=ovf))


def _chunk_step(rows, pos, gid, total_inst, i, state,
                chunk_inst: int, out_cap: int, full: bool, upper: int,
                two_seeds: bool = True):
    """Expand chunk i's semiring products, compact the live ones with a
    cheap 1-key sort, and park them in the pending buffer; flush the
    pending buffer through the expensive accumulator merge only when the
    next chunk would not fit (shared by the one-dispatch program and the
    multi-dispatch driver below).

    Order semantics are unchanged: the compaction sort is stable on the
    target id, so same-(t, q) products keep their canonical (kmer, a, b)
    order; appends keep chunk order; the flush concatenates accumulator
    first.  First/fold-last seed folds therefore see products in exactly
    the order the every-chunk merge gave them (bit-identity asserted by
    the device-vs-host tests)."""
    CI = chunk_inst
    U = upper
    offsets = (list(range(-(U - 1), U)) if full
               else list(range(1, U)))
    span = len(offsets)
    Wl = _live_window(CI * span, CI)
    i0 = i * CI  # window start in the padded array (halo offset U-1)
    rw = jax.lax.dynamic_slice(rows, (i0,), (CI + 2 * U,))
    pw = jax.lax.dynamic_slice(pos, (i0,), (CI + 2 * U,))
    gw = jax.lax.dynamic_slice(gid, (i0,), (CI + 2 * U,))
    # center = slots [U-1, U-1+CI): instance a of each product
    ca = U - 1
    qi = rw[ca:ca + CI]
    pq = pw[ca:ca + CI]
    ga = gw[ca:ca + CI]
    glob = i0 + jnp.arange(CI, dtype=jnp.int32)
    in_range = glob < total_inst

    tcols, scols, vcols = [], [], []
    for o in offsets:
        tj = rw[ca + o:ca + o + CI]
        pt = pw[ca + o:ca + o + CI]
        same = gw[ca + o:ca + o + CI] == ga
        ok = same & in_range
        if not full:
            ok = ok & (qi < tj)
        tcols.append(jnp.where(ok, tj, SENT))
        scols.append((pq << PACK) | pt)
        vcols.append(ok)
    # [CI, span] i-major layout = the host's (kmer, a, b) canonical
    # product order, preserved by the stable sorts below
    ct = jnp.stack(tcols, axis=1).reshape(-1)
    cs = jnp.stack(scols, axis=1).reshape(-1)
    cv = jnp.stack(vcols, axis=1).reshape(-1)
    cq = jnp.where(cv, jnp.repeat(qi, span), SENT)
    live = jnp.sum(cv, dtype=jnp.int32)

    # 1-key stable compaction: live products to the front in (t, then
    # product order); 3 int32 arrays instead of the 4-5 of a full merge
    ct, cq, cs = jax.lax.sort((ct, cq, cs), num_keys=1, is_stable=True)
    ct, cq, cs = ct[:Wl], cq[:Wl], cs[:Wl]

    pfill = state[9]
    # live <= Wl by construction (_live_window); count any violation as
    # overflow so the retry path screams instead of silently dropping
    state = state[:5] + (state[5] + jnp.maximum(live - Wl, 0).astype(
        jnp.int64),) + state[6:]

    def flush_then_append(st):
        return _append_pending(
            _flush_pending(st, out_cap, two_seeds), ct, cq, cs, live, Wl)

    def append_only(st):
        return _append_pending(st, ct, cq, cs, live, Wl)

    pend_cap = state[6].shape[0]
    return jax.lax.cond(pfill + Wl > pend_cap, flush_then_append,
                        append_only, state)


def _append_pending(state, ct, cq, cs, live, Wl: int):
    bt, bq, bw, bs0, bs1, ovf, pt, pq, ps, pfill = state
    fw = jnp.minimum(pfill, pt.shape[0] - Wl)
    pt = jax.lax.dynamic_update_slice(pt, ct, (fw,))
    pq = jax.lax.dynamic_update_slice(pq, cq, (fw,))
    ps = jax.lax.dynamic_update_slice(ps, cs, (fw,))
    return (bt, bq, bw, bs0, bs1, ovf, pt, pq, ps, pfill + live)


@functools.partial(
    jax.jit,
    static_argnames=("chunk_inst", "out_cap", "full", "upper", "steps",
                     "two_seeds"),
    donate_argnums=(5,))
def _spgemm_stage(rows, pos, gid, total_inst, start, state,
                  chunk_inst: int, out_cap: int, full: bool, upper: int,
                  steps: int, two_seeds: bool = True):
    """Run `steps` chunks starting at chunk index `start`, carrying the
    device-resident accumulator state across dispatches.  Splitting the
    multiply into several SHORT dispatches keeps each remote execution
    brief (long single executions through the tunnel are crash-prone) and
    makes the multiply checkpointable mid-run."""
    nchunks = (total_inst + chunk_inst - 1) // chunk_inst

    def cond(carry):
        i, _ = carry
        return (i < start + steps) & (i < nchunks)

    def body(carry):
        i, st = carry
        return i + 1, _chunk_step(rows, pos, gid, total_inst, i, st,
                                  chunk_inst, out_cap, full, upper,
                                  two_seeds)

    _, state = jax.lax.while_loop(cond, body, (start, state))
    return state


@functools.partial(jax.jit, static_argnames=("min_shared", "two_seeds"),
                   donate_argnums=(0,))
def _finalize_state(state, min_shared: int, two_seeds: bool = True):
    out_cap = state[0].shape[0]
    bt, bq, bw, bs0, bs1, ovf = _flush_pending(state, out_cap,
                                               two_seeds)[:6]
    nnz = jnp.sum((bt != SENT) & (bw >= min_shared))
    npairs = jnp.sum(bt != SENT)
    return dict(t=bt, q=bq, numshared=bw, s0=bs0, s1=bs1,
                stats=dict(nnz=nnz, pairs=npairs, overflow=ovf))


def _run_spgemm(rows, pos, gid, total_inst, *, chunk_inst: int,
                out_cap: int, pend_cap: int, min_shared: int, full: bool,
                upper: int, stage_chunks: int = 0, total_chunks: int = 0,
                two_seeds: bool = True):
    """Dispatch policy wrapper: stage_chunks == 0 runs the whole multiply
    as one XLA program (`_spgemm_device`); stage_chunks > 0 runs it as a
    host loop of short `_spgemm_stage` dispatches with the accumulator
    left on device between them."""
    if stage_chunks > 0:
        assert total_chunks > 0, \
            "staged dispatch needs total_chunks (0 would silently " \
            "skip the whole multiply)"
    if stage_chunks <= 0:
        return _spgemm_device(rows, pos, gid, total_inst,
                              chunk_inst=chunk_inst, out_cap=out_cap,
                              pend_cap=pend_cap,
                              min_shared=min_shared, full=full, upper=upper,
                              two_seeds=two_seeds)
    state = _empty_state(out_cap, pend_cap)
    start = 0
    while start < total_chunks:
        state = _spgemm_stage(rows, pos, gid, total_inst,
                              jnp.int32(start), state,
                              chunk_inst=chunk_inst, out_cap=out_cap,
                              full=full, upper=upper, steps=stage_chunks,
                              two_seeds=two_seeds)
        start += stage_chunks
    return _finalize_state(state, min_shared=min_shared,
                           two_seeds=two_seeds)


def upload_kmer_matrix(A: KmerMatrix, upper: int = 0,
                       chunk_inst: int = 1 << 22, counts=None):
    """One-time host->device upload of the instance arrays with group ids
    and halo padding (padded to power-of-two shapes so repeated calls
    share one compiled program).  Returns (device dict, total products,
    inferred upper bound, chunk size).  `counts` (np.bincount of A.cols)
    may be passed in to avoid recomputing it."""
    assert A.num_reads < 2**31, "int32 read ids"
    if counts is None:
        counts = np.bincount(A.cols, minlength=A.num_kmers).astype(np.int64)
    total = int((counts * counts).sum())
    if upper == 0:
        upper = int(counts.max()) if len(counts) else 1
    assert upper <= 256, "device path supports upper_freq <= 256"
    if A.nnz:
        assert int(A.pos.max()) < (1 << PACK), \
            "positions >= 2^15: use the host path (build_seed_matrix)"

    chunk_inst = min(chunk_inst, _pow2(max(A.nnz, 1 << 10)))
    nchunks = max(-(-A.nnz // chunk_inst), 1)
    # every chunk's [i*CI, i*CI + CI + 2*upper) window must stay in bounds
    npad = _pow2(nchunks * chunk_inst + 2 * upper)
    rows = np.zeros(npad, np.int32)
    pos = np.zeros(npad, np.int32)
    # halo group ids are distinct negatives: no halo pair ever matches
    gid = -np.arange(2, npad + 2, dtype=np.int64).astype(np.int32)
    off = upper - 1
    rows[off:off + A.nnz] = A.rows
    pos[off:off + A.nnz] = A.pos
    # group id of each instance = its kmer rank
    gid[off:off + A.nnz] = A.cols
    dev = dict(rows=jnp.asarray(rows), pos=jnp.asarray(pos),
               gid=jnp.asarray(gid),
               total_inst=jnp.asarray(A.nnz, jnp.int32))
    return dev, total, upper, chunk_inst


def build_seed_matrix_device(A: KmerMatrix, min_shared: int = 2,
                             full: bool = True, chunk_inst: int = 0,
                             out_cap: int = 0, max_retries: int = 3,
                             upper: int = 0, stage_chunks: int = 0):
    """Device-resident B = A A^T.  Returns (result, total_products) where
    result holds compacted device arrays (t-major order; slots with
    t == SENT empty) plus a 'stats' dict.  Accumulator overflow triggers a
    doubled-capacity retry (capped), mirroring the drop-detect-retry
    contract of the distributed exchanges."""
    counts = (np.bincount(A.cols, minlength=A.num_kmers).astype(np.int64)
              if A.num_kmers else np.zeros(0, np.int64))
    if upper == 0:
        upper = int(counts.max()) if len(counts) else 1
    span = max(2 * upper - 1 if full else upper - 1, 1)
    if chunk_inst == 0:
        # span product slots per instance: budget ~2^25 slots per chunk.
        # Smaller chunks suit the pending design: the cheap 1-key
        # compaction runs per chunk while the expensive flush amortizes
        # over however many chunks the pending buffer holds.
        chunk_inst = max((1 << 25) // span, 1 << 18)
    dev, total, upper, chunk_inst = upload_kmer_matrix(A, upper, chunk_inst,
                                                       counts=counts)
    if out_cap == 0:
        # distinct pairs are usually << products; a capped default keeps
        # the flush merge small and the retry loop covers undershoot
        out_cap = _pow2(max(min(4 * A.nnz, 1 << 24), 1 << 14))
    chunk_slots = chunk_inst * span
    out_cap = min(out_cap, _out_cap_max(chunk_slots, chunk_inst))
    nchunks = max(-(-A.nnz // chunk_inst), 1)
    for _ in range(max_retries):
        res = _run_spgemm(dev["rows"], dev["pos"], dev["gid"],
                          dev["total_inst"],
                          chunk_inst=chunk_inst, out_cap=out_cap,
                          pend_cap=_pend_cap_for(out_cap, chunk_slots,
                                                 chunk_inst, nchunks),
                          min_shared=min_shared, full=full, upper=upper,
                          stage_chunks=stage_chunks, total_chunks=nchunks)
        if int(res["stats"]["overflow"]) == 0:
            return res, total
        out_cap = _grow_out_cap(out_cap, chunk_slots, chunk_inst,
                                "build_seed_matrix_device")
    raise RuntimeError(
        f"device SpGEMM accumulator overflow at out_cap={out_cap}")


@functools.partial(jax.jit, static_argnames=("upper", "npad"))
def _relayout_from_count(rid, pos, rank, nnz, upper: int, npad: int):
    """Re-layout the device counting result into the SpGEMM's halo-padded
    instance arrays, entirely on device.  Dead tail slots and the halo get
    DISJOINT negative group ids (dead: -(i+2) for slot i < N; halo/back:
    -(npad + i + 2)) so no spurious same-group pair can form."""
    N = rid.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    gid_in = jnp.where(idx < nnz, rank, -(idx + 2))
    off = upper - 1
    base = -(jnp.arange(npad, dtype=jnp.int32) + npad + 2)
    rows = jnp.zeros(npad, jnp.int32).at[off:off + N].set(rid)
    pos_p = jnp.zeros(npad, jnp.int32).at[off:off + N].set(pos)
    gid_p = base.at[off:off + N].set(gid_in)
    return rows, pos_p, gid_p


def spgemm_from_device_count(count_res, upper: int, min_shared: int = 2,
                             full: bool = False, out_cap: int = 0,
                             max_retries: int = 3, stage_chunks: int = 0,
                             two_seeds: bool = True):
    """Chained device path: counting result -> SpGEMM without fetching the
    instance arrays to the host.  Returns the device B result dict.
    two_seeds=False skips the fold-last seed payload in the hot sorts
    (s1 mirrors s0) -- use when only seeds[0] is consumed downstream."""
    assert upper <= 256
    if _live_pos_max(count_res["pos"], count_res["nnz"]) >= (1 << PACK):
        raise ValueError(
            "seed positions >= 2^15: the packed-seed device SpGEMM "
            "supports reads shorter than 32k bases; use the host path")
    N = int(count_res["rid"].shape[0])
    span = max(2 * upper - 1 if full else upper - 1, 1)
    CI = max((1 << 25) // span, 1 << 18)
    CI = min(CI, _pow2(max(N, 1 << 10)))
    nchunks_max = -(-N // CI)
    npad = _pow2(nchunks_max * CI + 2 * upper)
    rows, pos_p, gid_p = _relayout_from_count(
        count_res["rid"], count_res["pos"], count_res["rank"],
        count_res["nnz"], upper, npad)
    total_inst = count_res["nnz"].astype(jnp.int32)
    if out_cap == 0:
        out_cap = _pow2(max(min(4 * N, 1 << 24), 1 << 14))
    out_cap = min(out_cap, _out_cap_max(CI * span, CI))
    # live chunk count for the staged host loop (one tiny scalar fetch)
    nchunks = max(-(-int(count_res["nnz"]) // CI), 1) if stage_chunks \
        else nchunks_max
    for _ in range(max_retries):
        res = _run_spgemm(rows, pos_p, gid_p, total_inst,
                          chunk_inst=CI, out_cap=out_cap,
                          pend_cap=_pend_cap_for(out_cap, CI * span, CI,
                                                 nchunks_max),
                          min_shared=min_shared, full=full, upper=upper,
                          stage_chunks=stage_chunks, total_chunks=nchunks,
                          two_seeds=two_seeds)
        if int(res["stats"]["overflow"]) == 0:
            return res
        out_cap = _grow_out_cap(out_cap, CI * span, CI,
                                "spgemm_from_device_count")
    raise RuntimeError(
        f"device SpGEMM accumulator overflow at out_cap={out_cap}")


@functools.partial(jax.jit, static_argnames=("two_seeds",))
def _flush_state(state, two_seeds: bool = True):
    """Standalone pending flush (checkpoint boundaries)."""
    return _flush_pending(state, state[0].shape[0], two_seeds)


def _host_prefix(state):
    """Fetch a FLUSHED state's live prefix as numpy arrays.  Slicing to
    the live pair count before fetching matters: the tunnel moves
    ~20-25 MB/s device->host and the capacity is mostly empty."""
    n = int(jnp.sum(state[0] != SENT))
    return dict(t=np.asarray(state[0][:n]), q=np.asarray(state[1][:n]),
                w=np.asarray(state[2][:n]), s0=np.asarray(state[3][:n]),
                s1=np.asarray(state[4][:n]),
                overflow=int(state[5]))


def state_to_host(state, two_seeds: bool = True):
    """Flush and fetch the accumulator's live prefix — the
    checkpointable representation of a partially-consumed multiply."""
    return _host_prefix(_flush_state(state, two_seeds))


def _state_from_host(host, out_cap: int, pend_cap: int):
    """Rebuild the device state from a checkpoint prefix (pending empty)."""
    n = len(host["t"])
    assert n <= out_cap, (n, out_cap)
    pad = lambda a, fill: np.concatenate(
        [a.astype(np.int32), np.full(out_cap - n, fill, np.int32)])
    z = lambda fill: jnp.full((pend_cap,), fill, jnp.int32)
    return (jnp.asarray(pad(host["t"], SENT)),
            jnp.asarray(pad(host["q"], SENT)),
            jnp.asarray(pad(host["w"], 0)),
            jnp.asarray(pad(host["s0"], -1)),
            jnp.asarray(pad(host["s1"], -1)),
            jnp.int64(int(host.get("overflow", 0))),
            z(SENT), z(SENT), z(-1), jnp.int32(0))


def spgemm_from_count_parts(parts_fn, upper: int, min_shared: int = 2,
                            full: bool = False, out_cap: int = 0,
                            max_retries: int = 3, stage_chunks: int = 0,
                            two_seeds: bool = True, resume=None,
                            ci_slots: int = 1 << 25,
                            pend_slots: int = 0):
    """Chained device SpGEMM over MULTI-PASS counting results
    (kmers.count_chunked.iter_count_parts): the accumulator state carries
    across parts, so total instance memory is bounded by ONE part while
    the multiply still covers the whole A.  Parts hold disjoint ascending
    k-mer rank ranges, so no product crosses parts and the buffer-first
    stable merge preserves the canonical (kmer, a, b) product order —
    the result is bit-identical to spgemm_from_device_count on the
    single-shot counting result (tests/test_count_chunked.py).

    parts_fn: ZERO-ARG callable returning a fresh part iterator; it is
    re-invoked when an accumulator overflow forces a doubled-capacity
    retry.

    resume (optional dict) makes the multiply checkpointable against
    tunnel/worker crashes (the accumulator otherwise lives only on
    device):
      state: host prefix from `state_to_host` to seed the accumulator
             (parts_fn must then yield only the unconsumed parts)
      every: save cadence in parts
      save:  callable(consumed_count, host_state) invoked after every
             `every` consumed parts (flush + live-prefix fetch)
    Flush boundaries do not affect the result bits (the reduction is
    order-preserving over the canonical product order), so a resumed
    run stays bit-identical.  An accumulator overflow while resuming
    raises instead of retrying — the caller must clear its checkpoint
    and restart the whole multiply at the doubled capacity.
    """
    assert upper <= 256
    span = max(2 * upper - 1 if full else upper - 1, 1)
    # chunk-size budget; the effective CI_max locks at the FIRST part's
    # shape (later, larger parts just run more chunks of that CI), so
    # the pending capacity — part of the carried state's shape — is
    # sized to the workload, not the worst case
    # ci_slots sizes the per-chunk product-expansion buffer AND (via
    # _pend_cap_for) the pending buffer that the flush merge sorts
    # together with the accumulator: at rungs where a large resident
    # read-word array (human-10X: 8 GB) leaves little HBM, shrinking
    # ci_slots is the lever that keeps the flush-merge transient
    # ((out_cap + pend_cap) * ~40 B) inside the budget at the cost of
    # more, shorter stage dispatches.
    CI_budget = max(ci_slots // span, 1 << 18)
    CI_max = CI_budget
    chunk_slots_max = CI_max * span
    if out_cap:
        out_cap = min(out_cap, _out_cap_max(chunk_slots_max, CI_max))
    assert resume is None or out_cap > 0, \
        "resume needs a deterministic explicit out_cap"
    for _ in range(max_retries):
        state = None
        overflowed = False
        consumed = 0
        for part in parts_fn():
            if _live_pos_max(part["pos"], part["nnz"]) >= (1 << PACK):
                raise ValueError(
                    "seed positions >= 2^15: the packed-seed device "
                    "SpGEMM supports reads shorter than 32k bases; use "
                    "the host path")
            N = int(part["km"].shape[0])
            if state is None:
                CI_max = min(CI_budget, _pow2(max(N, 1 << 10)))
                chunk_slots_max = CI_max * span
            CI = min(CI_max, _pow2(max(N, 1 << 10)))
            npad = _pow2(-(-N // CI) * CI + 2 * upper)
            rows, pos_p, gid_p = _relayout_from_count(
                part["rid"], part["pos"], part["rank"], part["nnz"],
                upper, npad)
            if out_cap == 0:
                out_cap = _pow2(max(min(4 * N, 1 << 24), 1 << 14))
                out_cap = min(out_cap, _out_cap_max(chunk_slots_max,
                                                    CI_max))
            if state is None:
                pend_cap = _pend_cap_for(out_cap, chunk_slots_max, CI_max)
                if pend_slots:
                    # tight-HBM override: pending defaults to 2*out_cap
                    # for flush amortization; a small explicit pending
                    # trades more (smaller) flush merges for ~2 GB less
                    # transient sort footprint (human-10X)
                    wl = _live_window(chunk_slots_max, CI_max)
                    pend_cap = min(max(pend_slots, wl + 1024),
                                   COMPILE_CAP - out_cap)
                if resume is not None and resume.get("state") is not None:
                    state = _state_from_host(resume["state"], out_cap,
                                             pend_cap)
                else:
                    state = _empty_state(out_cap, pend_cap)
            total_inst = part["nnz"].astype(jnp.int32)
            nchunks = max(-(-int(part["nnz"]) // CI), 1)
            # the part's instance arrays are fully consumed by the
            # relayout; dropping them BEFORE the stage dispatches frees
            # their HBM (~0.6 GB at 33.5M-cap parts) for the flush merge
            del part
            steps = stage_chunks if stage_chunks > 0 else nchunks
            start = 0
            while start < nchunks:
                state = _spgemm_stage(rows, pos_p, gid_p, total_inst,
                                      jnp.int32(start), state,
                                      chunk_inst=CI, out_cap=out_cap,
                                      full=full, upper=upper, steps=steps,
                                      two_seeds=two_seeds)
                start += steps
            del rows, pos_p, gid_p
            # Drain the dispatch pipeline before pulling the next part:
            # TPU buffers are allocated at ENQUEUE time, so without this
            # barrier the next part's (or next grouped sweep's) multi-GB
            # buffers allocate while this part's donated/dropped buffers
            # are still held by in-flight executions — at chr1 scale
            # (107 x 128M-slot parts) that overlap OOMs the 16GB HBM.
            # Device work is serialized, so blocking costs nothing.
            jax.block_until_ready(state)
            # state[5] is the running overflow count: bail to the
            # doubled cap EARLY instead of finishing (and then
            # re-running) every remaining part — at 100+ parts the
            # difference is hours.  Detection is at FLUSH granularity:
            # overflow is only counted when _flush_pending merges the
            # pending buffer into the accumulator, so the bail can lag
            # the overflowing part by however many chunks the pending
            # buffer holds (correctness is unaffected — finalize always
            # flushes — only the wasted re-run work grows by that lag).
            # The scalar fetch is free (just synced).
            if int(state[5]) > 0:
                overflowed = True
                break
            consumed += 1
            if (resume is not None and resume.get("every")
                    and resume.get("save")
                    and consumed % resume["every"] == 0):
                # flush first so the kept state does the work too (flush
                # boundaries don't change the result bits)
                state = _flush_state(state, two_seeds)
                if int(state[5]) > 0:
                    overflowed = True
                    break
                resume["save"](consumed, _host_prefix(state))
        if not overflowed:
            if state is None:   # parts_fn yielded nothing
                if resume is not None and resume.get("state") is not None:
                    state = _state_from_host(
                        resume["state"], out_cap,
                        _pend_cap_for(out_cap, chunk_slots_max, CI_max))
                else:
                    state = _empty_state(out_cap or (1 << 14))
            res = _finalize_state(state, min_shared=min_shared,
                                  two_seeds=two_seeds)
            state = None        # donated to the finalize program
            if int(res["stats"]["overflow"]) == 0:
                return res
        del state
        if resume is not None:
            raise RuntimeError(
                "spgemm_from_count_parts: accumulator overflow while "
                "resuming — clear the checkpoint and restart the "
                "multiply at a larger capacity")
        out_cap = _grow_out_cap(out_cap, chunk_slots_max, CI_max,
                                "spgemm_from_count_parts")
    raise RuntimeError(
        f"device SpGEMM accumulator overflow at out_cap={out_cap}")


def device_result_to_host(res, min_shared: int = 2):
    """Fetch the compacted B as numpy SoA (q, t, numshared, seeds).

    The accumulator is head-compacted, so only the first `pairs` slots are
    occupied; slice on device before fetching (the tunnel moves ~20-25
    MB/s device->host, so fetching the mostly-empty full capacity would
    add tens of seconds for nothing)."""
    n = int(res["stats"]["pairs"])
    t = np.asarray(res["t"][:n])
    keep = np.flatnonzero((t != SENT) & (np.asarray(res["numshared"][:n])
                                         >= min_shared))
    s0 = np.asarray(res["s0"][:n])[keep]
    s1 = np.asarray(res["s1"][:n])[keep]
    return {"q": np.asarray(res["q"][:n])[keep], "t": t[keep],
            "numshared": np.asarray(res["numshared"][:n])[keep],
            "seedQ0": s0 >> PACK, "seedT0": s0 & ((1 << PACK) - 1),
            "seedQ1": s1 >> PACK, "seedT1": s1 & ((1 << PACK) - 1)}
