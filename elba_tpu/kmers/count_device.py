"""Device-resident reliable-k-mer counting (k <= 32).

The DEDUKT-role fast path on real TPU hardware: canonical extraction
(kmers/extract.py, jitted) + ONE variadic stable sort of
(kmer, readid, pos) + segment counting + reliable filter + sort-on-
deadness compaction, all in a single XLA program.  A v5e sorts 33M
int64 keys in ~0.1s, so genome-scale instance sets (~10^8) count in
seconds; the only host traffic is the padded 2-bit codes up (~1 byte/base
at ~56 MB/s through the tunnel) and the compacted A triples down.

Same reliable set and canonical instance order (kmer, readid, pos) as the
numpy and native paths — asserted by tests/test_kmers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .count import KmerMatrix
from .extract import extract_canonical_kmers

SENTK = jnp.uint64(0xFFFFFFFFFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k", "lower", "upper"))
def _count_device(codes, lengths, k: int, lower: int, upper: int):
    canon, valid = extract_canonical_kmers(codes, lengths, k)
    R, W = canon.shape
    km = jnp.where(valid.reshape(-1), canon.reshape(-1), SENTK)
    rid = jnp.repeat(jnp.arange(R, dtype=jnp.int32), W)
    pos = jnp.tile(jnp.arange(W, dtype=jnp.int32), R)

    km, rid, pos = jax.lax.sort((km, rid, pos), num_keys=1, is_stable=True)
    n = km.shape[0]
    bound = jnp.concatenate([jnp.ones(1, bool), km[1:] != km[:-1]])
    gid = jnp.cumsum(bound.astype(jnp.int32)) - 1
    cnt = jax.ops.segment_sum(
        jnp.ones(n, jnp.int32), gid, num_segments=n)[gid]
    rel = (km != SENTK) & (cnt >= lower) & (cnt <= upper)
    head = bound & rel
    # k-mer rank among reliable groups, per instance
    rank = jnp.cumsum(head.astype(jnp.int32)) - 1

    # compact reliable instances to the front, preserving order
    dead = (~rel).astype(jnp.int32)
    _, km2, rid2, pos2, rank2 = jax.lax.sort(
        (dead, km, rid, pos, rank), num_keys=1, is_stable=True)
    nnz = jnp.sum(rel)
    nk = jnp.sum(head)
    return dict(km=km2, rid=rid2, pos=pos2, rank=rank2, nnz=nnz, nk=nk)


def _pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


def count_device_raw(readset, k: int, lower: int, upper: int):
    """Run the device counting program WITHOUT fetching the instance
    arrays -- the chained device SpGEMM consumes them in place
    (dsparse/seedmat_device.spgemm_from_device_count), avoiding a
    multi-GB host roundtrip through the tunnel."""
    assert k <= 32, "device counting packs one uint64 (k <= 32)"
    n = len(readset)
    L = _pow2(max(readset.max_length, k + 1))
    Rpad = max(-(-n // 1024) * 1024, 8) if n > 4096 else _pow2(max(n, 8))
    codes = np.zeros((Rpad, L), np.uint8)
    lengths = np.zeros(Rpad, np.int32)
    codes[:n] = readset.padded_codes(L)
    lengths[:n] = readset.lengths
    res = _count_device(jnp.asarray(codes), jnp.asarray(lengths),
                        k, lower, upper)
    return res


def build_kmer_matrix_device(readset, k: int, lower: int,
                             upper: int) -> KmerMatrix:
    """Count on device; returns the A matrix on host (compacted fetch)."""
    assert k <= 32, "device counting packs one uint64 (k <= 32)"
    n = len(readset)
    L = _pow2(max(readset.max_length, k + 1))
    # reads pad to a multiple of 1024 (not a power of two): the flattened
    # instance sort is ~24 bytes/element double-buffered, so a 2x row
    # padding at genome scale would blow HBM
    Rpad = max(-(-n // 1024) * 1024, 8) if n > 4096 else _pow2(max(n, 8))
    codes = np.zeros((Rpad, L), np.uint8)
    lengths = np.zeros(Rpad, np.int32)
    codes[:n] = readset.padded_codes(L)
    lengths[:n] = readset.lengths

    res = _count_device(jnp.asarray(codes), jnp.asarray(lengths),
                        k, lower, upper)
    nnz = int(res["nnz"])
    nk = int(res["nk"])
    rows = np.asarray(res["rid"][:nnz]).astype(np.int64) + readset.start_id
    cols = np.asarray(res["rank"][:nnz]).astype(np.int64)
    pos = np.asarray(res["pos"][:nnz]).astype(np.int32)
    km = np.asarray(res["km"][:nnz])
    # unique reliable k-mers in rank order = first occurrence per group
    first = np.ones(nnz, bool)
    if nnz:
        first[1:] = km[1:] != km[:-1]
    kmers = km[first]
    assert len(kmers) == nk
    return KmerMatrix(rows=rows, cols=cols, pos=pos, kmers=kmers,
                      num_reads=n, num_kmers=nk)
