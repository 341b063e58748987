"""Device-resident SharedSeeds SpGEMM (B = A A^T), chunked.

The whole multiply runs as ONE jitted XLA program: a while_loop walks the
global product index space in fixed-size chunks, expands each chunk's
semiring products (segment cross products within k-mer groups), and merges
them into a sorted fixed-capacity accumulator under the SharedSeeds add
(count sum, first seed, fold-last seed) -- the TPU equivalent of the
reference's streaming CombBLAS SpGEMM (Mult_AnXBn_DoubleBuff,
SharedSeeds.cpp:4-10) with MAX_ALLTOALL_MEM-style memory bounding
(KmerOps.hpp:10-12).

Design points:
* no key-width cap: pairs are (q, t) int32 columns sorted with two stable
  passes (t-major = the canonical column-major order), so any read count
  < 2^31 works -- the round-1 n^2 < 2^31 composite-key cap is gone
* chunk boundaries may split k-mer groups: the accumulator merge is
  order-preserving (buffer entries precede chunk entries under stable
  sort), so the first/fold-last seed semantics survive splitting
* fixed shapes end to end: products per chunk and accumulator capacity are
  static; overflowing the accumulator is counted and reported, never
  silent; callers retry with a bigger capacity
* all state stays in HBM; the only host traffic is the initial upload and
  the final stats scalars / compacted result fetch
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kmers.count import KmerMatrix

SENT = np.int32(2**31 - 1)  # sentinel (q, t) for empty slots; sorts last


def _sort_by_pair(t, q, payloads):
    """Stable sort by (t, q): column-major canonical order without a wide
    composite key (two stable int32 passes)."""
    o = jnp.argsort(q, stable=True)
    t, q = t[o], q[o]
    payloads = [p[o] for p in payloads]
    o = jnp.argsort(t, stable=True)
    return t[o], q[o], [p[o] for p in payloads]


def _reduce_sorted(t, q, w, s0q, s0t, s1q, s1t):
    """SharedSeeds add over a (t, q)-sorted run: per group, summed count,
    first element's first seed, last element's last seed.  Returns
    (head mask, reduced values aligned at head positions)."""
    n = t.shape[0]
    bound = jnp.concatenate(
        [jnp.ones(1, bool), (t[1:] != t[:-1]) | (q[1:] != q[:-1])])
    gid = jnp.cumsum(bound.astype(jnp.int32)) - 1
    wsum = jax.ops.segment_sum(w, gid, num_segments=n)[gid]
    tail = jnp.concatenate([bound[1:], jnp.ones(1, bool)])
    l1q = jax.ops.segment_max(
        jnp.where(tail, s1q, -1), gid, num_segments=n)[gid]
    l1t = jax.ops.segment_max(
        jnp.where(tail, s1t, -1), gid, num_segments=n)[gid]
    head = bound & (t != SENT)
    return head, wsum, s0q, s0t, l1q, l1t


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "out_cap", "min_shared", "full"))
def _spgemm_device(rows, pos, gcum, gstarts, gcounts, total,
                   chunk: int, out_cap: int, min_shared: int, full: bool):
    """The full chunked multiply as one XLA program.

    rows/pos: int32[nnz_pad] instance arrays sorted by k-mer group
    gcum:     int64[K_pad] cumulative c^2 per group (padded with repeats)
    gstarts/gcounts: int32[K_pad] group extents
    total:    int64 scalar, true number of products

    Returns dict of accumulator arrays (t-major sorted, SENT-padded) and
    stats (nnz at min_shared, overflow count, products done).
    """
    C = chunk

    def empty_state():
        z = lambda fill: jnp.full((out_cap,), fill, jnp.int32)
        return (z(SENT), z(SENT), z(0), z(-1), z(-1), z(-1), z(-1),
                jnp.int64(0))  # t, q, w, s0q, s0t, s1q, s1t, overflow

    def chunk_step(i, state):
        bt, bq, bw, bs0q, bs0t, bs1q, bs1t, ovf = state
        off = i.astype(jnp.int64) * C
        tg = off + jnp.arange(C, dtype=jnp.int64)
        grp = jnp.searchsorted(gcum, tg, side="right")
        grp = jnp.minimum(grp, gcum.shape[0] - 1).astype(jnp.int32)
        c = jnp.maximum(gcounts[grp], 1)
        base = gcum[grp] - c.astype(jnp.int64) ** 2
        local = (tg - base).astype(jnp.int32)
        a = local // c
        b = local % c
        li = gstarts[grp] + a
        ri = gstarts[grp] + b
        qi = rows[li]
        ti = rows[ri]
        pq = pos[li]
        pt = pos[ri]
        valid = tg < total
        if not full:
            valid = valid & (qi < ti)
        qi = jnp.where(valid, qi, SENT)
        ti = jnp.where(valid, ti, SENT)

        # merge raw products into the sorted accumulator: buffer entries
        # come FIRST in the concat so the stable sort preserves the
        # canonical merge order (earlier products before later ones)
        mt = jnp.concatenate([bt, ti])
        mq = jnp.concatenate([bq, qi])
        mw = jnp.concatenate([bw, jnp.where(valid, 1, 0).astype(jnp.int32)])
        m0q = jnp.concatenate([bs0q, pq])
        m0t = jnp.concatenate([bs0t, pt])
        m1q = jnp.concatenate([bs1q, pq])
        m1t = jnp.concatenate([bs1t, pt])

        mt, mq, (mw, m0q, m0t, m1q, m1t) = _sort_by_pair(
            mt, mq, [mw, m0q, m0t, m1q, m1t])
        head, wsum, s0q, s0t, s1q, s1t = _reduce_sorted(
            mt, mq, mw, m0q, m0t, m1q, m1t)

        # scatter-compact the group heads back into the accumulator
        idx = jnp.cumsum(head.astype(jnp.int32)) - 1
        dst = jnp.where(head & (idx < out_cap), idx, out_cap)
        def put(src, fill):
            buf = jnp.full((out_cap,), fill, jnp.int32)
            return buf.at[dst].set(src, mode="drop")
        new = (put(mt, SENT), put(mq, SENT), put(wsum, 0),
               put(s0q, -1), put(s0t, -1), put(s1q, -1), put(s1t, -1))
        ovf = ovf + jnp.sum(head & (idx >= out_cap)).astype(jnp.int64)
        return new + (ovf,)

    nchunks = ((total + C - 1) // C).astype(jnp.int64)

    def cond(carry):
        return carry[0] < nchunks

    def body(carry):
        i, state = carry
        return i + 1, chunk_step(i, state)

    _, state = jax.lax.while_loop(cond, body, (jnp.int64(0), empty_state()))
    bt, bq, bw, bs0q, bs0t, bs1q, bs1t, ovf = state
    nnz = jnp.sum((bt != SENT) & (bw >= min_shared))
    npairs = jnp.sum(bt != SENT)
    return dict(t=bt, q=bq, numshared=bw, seedQ0=bs0q, seedT0=bs0t,
                seedQ1=bs1q, seedT1=bs1t,
                stats=dict(nnz=nnz, pairs=npairs, overflow=ovf))


def _pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


def upload_kmer_matrix(A: KmerMatrix):
    """One-time host->device upload of the instance arrays and group
    extents (padded to power-of-two shapes so repeated calls share one
    compiled program)."""
    assert A.num_reads < 2**31, "int32 read ids"
    counts = np.bincount(A.cols, minlength=A.num_kmers).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    sizes = counts * counts
    gcum = np.cumsum(sizes)
    total = int(gcum[-1]) if len(gcum) else 0

    npad = _pow2(max(A.nnz, 8))
    kpad = _pow2(max(A.num_kmers, 8))
    rows = np.zeros(npad, np.int32)
    pos = np.zeros(npad, np.int32)
    rows[:A.nnz] = A.rows
    pos[:A.nnz] = A.pos
    gcum_p = np.full(kpad, total, np.int64)
    gstarts_p = np.zeros(kpad, np.int32)
    gcounts_p = np.zeros(kpad, np.int32)
    gcum_p[:A.num_kmers] = gcum
    gstarts_p[:A.num_kmers] = starts
    gcounts_p[:A.num_kmers] = counts

    dev = dict(rows=jnp.asarray(rows), pos=jnp.asarray(pos),
               gcum=jnp.asarray(gcum_p), gstarts=jnp.asarray(gstarts_p),
               gcounts=jnp.asarray(gcounts_p),
               total=jnp.asarray(total, jnp.int64))
    return dev, total


def build_seed_matrix_device(A: KmerMatrix, min_shared: int = 2,
                             full: bool = True, chunk: int = 1 << 25,
                             out_cap: int = 0, max_retries: int = 3):
    """Device-resident B = A A^T.  Returns (result, total_products) where
    result holds compacted device arrays (t-major order; slots with
    t == SENT empty) plus a 'stats' dict.  Accumulator overflow triggers a
    doubled-capacity retry (capped), mirroring the drop-detect-retry
    contract of the distributed exchanges."""
    dev, total = upload_kmer_matrix(A)
    if out_cap == 0:
        out_cap = _pow2(max(4 * A.nnz, 1 << 14))
    chunk = min(chunk, _pow2(max(total, 1 << 10)))
    for _ in range(max_retries):
        res = _spgemm_device(dev["rows"], dev["pos"], dev["gcum"],
                             dev["gstarts"], dev["gcounts"], dev["total"],
                             chunk=chunk, out_cap=out_cap,
                             min_shared=min_shared, full=full)
        if int(res["stats"]["overflow"]) == 0:
            return res, total
        out_cap *= 2
    raise RuntimeError(
        f"device SpGEMM accumulator overflow at out_cap={out_cap // 2}")


def device_result_to_host(res, min_shared: int = 2):
    """Fetch the compacted B as numpy SoA (q, t, numshared, seeds)."""
    t = np.asarray(res["t"])
    keep = np.flatnonzero((t != SENT) & (np.asarray(res["numshared"])
                                         >= min_shared))
    return {k: np.asarray(res[k])[keep]
            for k in ("q", "t", "numshared", "seedQ0", "seedT0",
                      "seedQ1", "seedT1")}
