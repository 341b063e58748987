"""Device-side SharedSeeds SpGEMM (B = A A^T) expansion.

Same sorted-join algorithm as seedmat.py but expressed in jnp so the
expansion + segment reduction run on the TPU.  Host involvement is one
counting pass for the exact output size (two-phase sizing); the expansion,
key sort, and SharedSeeds reduction are one jitted program.

Used by bench.py for the SpGEMM nnz/s metric and as the building block for
the device-resident pipeline; falls back to int32 keys when read counts
permit (n^2 < 2^31), which is the fast path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kmers.count import KmerMatrix


@functools.partial(jax.jit, static_argnums=(5, 6))
def _expand_reduce(rows, pos, gcum, gstarts, gcounts, total: int, n: int):
    """Expand all within-kmer-group ordered pairs and reduce by (q, t).

    rows/pos: instance arrays sorted by kmer group
    gcum: cumulative c^2 per group; gstarts/gcounts: group extents
    Returns per-slot arrays of length `total` with head flags.
    """
    t = jnp.arange(total, dtype=jnp.int32)
    grp = jnp.searchsorted(gcum, t, side="right")
    local = t - (gcum[grp] - gcounts[grp] * gcounts[grp])
    c = gcounts[grp]
    a = local // c
    b = local % c
    li = gstarts[grp] + a
    ri = gstarts[grp] + b

    qi = rows[li]
    ti = rows[ri]
    pq = pos[li]
    pt = pos[ri]

    key = ti * jnp.int32(n) + qi  # column-major composite (n^2 < 2^31)
    order = jnp.argsort(key, stable=True)
    key = key[order]
    qi, ti, pq, pt = qi[order], ti[order], pq[order], pt[order]

    bound = jnp.concatenate(
        [jnp.ones(1, bool), key[1:] != key[:-1]])
    gid = jnp.cumsum(bound.astype(jnp.int32)) - 1
    shared = jax.ops.segment_sum(
        jnp.ones(total, jnp.int32), gid, num_segments=total)[gid]
    tail = jnp.concatenate([bound[1:], jnp.ones(1, bool)])
    s1q = jax.ops.segment_max(
        jnp.where(tail, pq, -1), gid, num_segments=total)[gid]
    s1t = jax.ops.segment_max(
        jnp.where(tail, pt, -1), gid, num_segments=total)[gid]
    head = bound & (shared >= 2)
    return dict(head=head, q=qi, t=ti, numshared=shared,
                seedQ0=pq, seedT0=pt, seedQ1=s1q, seedT1=s1t)


def build_seed_matrix_device(A: KmerMatrix, min_shared: int = 2):
    """Returns (device result dict, total products).  Requires
    num_reads^2 < 2^31 (int32 composite keys)."""
    n = A.num_reads
    assert n * n < 2**31, "int32 key space exceeded; use the host path"
    counts = np.bincount(A.cols, minlength=A.num_kmers).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    sizes = counts.astype(np.int64) ** 2
    total = int(sizes.sum())
    gcum = np.cumsum(sizes).astype(np.int32)
    res = _expand_reduce(
        jnp.asarray(A.rows.astype(np.int32)),
        jnp.asarray(A.pos.astype(np.int32)),
        jnp.asarray(gcum), jnp.asarray(starts), jnp.asarray(counts),
        total, n)
    return res, total
