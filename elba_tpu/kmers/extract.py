"""Windowed canonical k-mer extraction on device.

A k-mer (k <= 32) is packed into a uint64 with base 0 in the *high* 2 bits
of the used 2k-bit field (low-aligned overall).  Numeric comparison of two
packed k-mers then equals lexicographic comparison of their base strings,
matching the reference's representative choice GetRep = min(kmer, twin)
(reference src/Kmer.cpp:200-205, operator< at :119-131, MSB-first packing at
:68-87 -- same ordering, different alignment).

The canonical (representative) k-mer of a window is min(forward, revcomp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2,))
def extract_canonical_kmers(codes: jnp.ndarray, lengths: jnp.ndarray, k: int):
    """Extract canonical k-mers from padded code rows.

    codes:   uint8[R, L] 2-bit codes, padded arbitrarily past each length
    lengths: int[R]
    k:       static k-mer size (<= 32)

    Returns (canon, valid):
      canon: uint64[R, W] canonical packed k-mer per window (W = L - k + 1)
      valid: bool[R, W]   window fully inside the read
    """
    R, L = codes.shape
    W = L - k + 1
    if W <= 0:
        return (jnp.zeros((R, 0), jnp.uint64), jnp.zeros((R, 0), bool))
    c64 = codes.astype(jnp.uint64)
    fwd = jnp.zeros((R, W), dtype=jnp.uint64)
    rc = jnp.zeros((R, W), dtype=jnp.uint64)
    for j in range(k):
        col = c64[:, j:j + W]
        fwd = fwd | (col << jnp.uint64(2 * (k - 1 - j)))
        rc = rc | ((jnp.uint64(3) - col) << jnp.uint64(2 * j))
    canon = jnp.minimum(fwd, rc)
    pos = jnp.arange(W, dtype=lengths.dtype)[None, :]
    valid = pos <= (lengths[:, None] - k)
    return canon, valid


def pack_kmers_ref(seq_codes: np.ndarray, k: int) -> np.ndarray:
    """Numpy oracle: packed forward k-mers of one read (for tests)."""
    n = len(seq_codes) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        out |= seq_codes[j:j + n].astype(np.uint64) << np.uint64(2 * (k - 1 - j))
    return out


def canonical_ref(seq_codes: np.ndarray, k: int) -> np.ndarray:
    """Numpy oracle: canonical k-mers of one read."""
    fwd = pack_kmers_ref(seq_codes, k)
    rc_seq = (3 - seq_codes[::-1]).astype(np.uint8)
    rc_all = pack_kmers_ref(rc_seq, k)
    # window i of the forward strand corresponds to window n-1-i of revcomp
    rc = rc_all[::-1]
    return np.minimum(fwd, rc)


@functools.partial(jax.jit, static_argnums=(2,))
def extract_canonical_kmers2(codes: jnp.ndarray, lengths: jnp.ndarray,
                             k: int):
    """Two-word canonical k-mers for 32 < k <= 64 (reference supports
    KMER_SIZE < 96 via Kmer<2,3>, Kmer.hpp:95-97; 65..95 on device is
    extract_canonical_kmers3 below).

    hi packs bases[0:32] MSB-first; lo packs bases[32:k] MSB-first into the
    high bits of the remaining word, so (hi, lo) numeric order equals
    lexicographic base order.

    Returns (canon_hi, canon_lo, valid) with shapes [R, W].
    """
    R, L = codes.shape
    W = L - k + 1
    if W <= 0:
        z = jnp.zeros((R, 0), jnp.uint64)
        return z, z, jnp.zeros((R, 0), bool)
    c64 = codes.astype(jnp.uint64)
    fhi = jnp.zeros((R, W), jnp.uint64)
    flo = jnp.zeros((R, W), jnp.uint64)
    rhi = jnp.zeros((R, W), jnp.uint64)
    rlo = jnp.zeros((R, W), jnp.uint64)
    for j in range(k):
        col = c64[:, j:j + W]
        comp = jnp.uint64(3) - col
        if j < 32:
            fhi = fhi | (col << jnp.uint64(2 * (31 - j)))
        else:
            flo = flo | (col << jnp.uint64(2 * (31 - (j - 32))))
        # twin base i comes from position k-1-i complemented; build the
        # twin directly: twin[i] = 3 - base[k-1-i] => base j lands at twin
        # index k-1-j
        ti = k - 1 - j
        if ti < 32:
            rhi = rhi | (comp << jnp.uint64(2 * (31 - ti)))
        else:
            rlo = rlo | (comp << jnp.uint64(2 * (31 - (ti - 32))))
    twin_less = (rhi < fhi) | ((rhi == fhi) & (rlo < flo))
    chi = jnp.where(twin_less, rhi, fhi)
    clo = jnp.where(twin_less, rlo, flo)
    pos = jnp.arange(W, dtype=lengths.dtype)[None, :]
    valid = pos <= (lengths[:, None] - k)
    return chi, clo, valid


@functools.partial(jax.jit, static_argnums=(2,))
def extract_canonical_kmers3(codes: jnp.ndarray, lengths: jnp.ndarray,
                             k: int):
    """Three-word canonical k-mers for 64 < k < 96 on device — the
    reference's Kmer<3> range (Kmer.hpp:95-97).  Same packing discipline
    as extract_canonical_kmers2: word w packs bases[32w:32w+32] MSB-first
    (the final word's tail bases sit in its high bits), so the word
    tuple's numeric order equals lexicographic base order.

    Returns (canon_w0, canon_w1, canon_w2, valid) with shapes [R, W].
    """
    R, L = codes.shape
    W = L - k + 1
    if W <= 0:
        z = jnp.zeros((R, 0), jnp.uint64)
        return z, z, z, jnp.zeros((R, 0), bool)
    c64 = codes.astype(jnp.uint64)
    f = [jnp.zeros((R, W), jnp.uint64) for _ in range(3)]
    r = [jnp.zeros((R, W), jnp.uint64) for _ in range(3)]
    for j in range(k):
        col = c64[:, j:j + W]
        comp = jnp.uint64(3) - col
        f[j >> 5] = f[j >> 5] | (col << jnp.uint64(2 * (31 - (j & 31))))
        ti = k - 1 - j
        r[ti >> 5] = r[ti >> 5] | (comp << jnp.uint64(2 * (31 - (ti & 31))))
    twin_less = (r[0] < f[0]) | \
        ((r[0] == f[0]) & ((r[1] < f[1]) |
                           ((r[1] == f[1]) & (r[2] < f[2]))))
    canon = [jnp.where(twin_less, rw, fw) for rw, fw in zip(r, f)]
    pos = jnp.arange(W, dtype=lengths.dtype)[None, :]
    valid = pos <= (lengths[:, None] - k)
    return canon[0], canon[1], canon[2], valid


def canonical_ref2(seq_codes: np.ndarray, k: int):
    """Numpy oracle for two-word canonical k-mers; returns [n, 2]."""
    n = len(seq_codes) - k + 1
    out = np.zeros((max(n, 0), 2), dtype=np.uint64)
    rc = (3 - seq_codes[::-1]).astype(np.uint8)
    for p in range(n):
        fwd = seq_codes[p:p + k]
        twin = rc[len(seq_codes) - k - p:len(seq_codes) - p]
        best = min(tuple(fwd), tuple(twin))
        hi = lo = 0
        for j, c in enumerate(best):
            if j < 32:
                hi |= int(c) << (2 * (31 - j))
            else:
                lo |= int(c) << (2 * (31 - (j - 32)))
        out[p] = (hi, lo)
    return out


def extract_canonical_np(codes: np.ndarray, lengths: np.ndarray, k: int):
    """Vectorized numpy extraction (same algorithm as the jit version).

    The single-host counting path sorts on host anyway, so extracting on
    host avoids a device round-trip; the device extraction is used where
    the consumer stays on device (the distributed SPMD step)."""
    R, L = codes.shape
    W = L - k + 1
    if W <= 0:
        return np.zeros((R, 0), np.uint64), np.zeros((R, 0), bool)
    c64 = codes.astype(np.uint64)
    fwd = np.zeros((R, W), np.uint64)
    rc = np.zeros((R, W), np.uint64)
    for j in range(k):
        col = c64[:, j:j + W]
        fwd |= col << np.uint64(2 * (k - 1 - j))
        rc |= (np.uint64(3) - col) << np.uint64(2 * j)
    canon = np.minimum(fwd, rc)
    valid = np.arange(W)[None, :] <= (lengths[:, None] - k)
    return canon, valid


def extract_canonical_words_np(codes: np.ndarray, lengths: np.ndarray,
                               k: int):
    """Generic multi-word canonical extraction for 2 < k < 96 (the
    reference's full range, Kmer.hpp:95-97: TKmer = Kmer<1|2|3> by
    KMER_SIZE).  Word w packs bases [32w, 32w+32) MSB-first, so tuple
    comparison of the word vectors equals lexicographic base comparison.

    Returns (words, valid): words is a list of nwords uint64[R, W] arrays.
    """
    nw = (k + 31) // 32
    R, L = codes.shape
    W = L - k + 1
    if W <= 0:
        z = [np.zeros((R, 0), np.uint64) for _ in range(nw)]
        return z, np.zeros((R, 0), bool)
    c64 = codes.astype(np.uint64)
    fwd = [np.zeros((R, W), np.uint64) for _ in range(nw)]
    rc = [np.zeros((R, W), np.uint64) for _ in range(nw)]
    for j in range(k):
        col = c64[:, j:j + W]
        comp = np.uint64(3) - col
        w, b = divmod(j, 32)
        fwd[w] |= col << np.uint64(2 * (31 - b))
        tw, tb = divmod(k - 1 - j, 32)
        rc[tw] |= comp << np.uint64(2 * (31 - tb))
    # lexicographic word-tuple compare: twin < fwd ?
    twin_less = np.zeros((R, W), bool)
    decided = np.zeros((R, W), bool)
    for w in range(nw):
        lt = rc[w] < fwd[w]
        ne = rc[w] != fwd[w]
        twin_less |= (~decided) & lt
        decided |= ne
    words = [np.where(twin_less, rc[w], fwd[w]) for w in range(nw)]
    valid = np.arange(W)[None, :] <= (lengths[:, None] - k)
    return words, valid


def canonical_ref_words(seq_codes: np.ndarray, k: int) -> np.ndarray:
    """Per-read numpy oracle for the generic multi-word extraction;
    returns uint64[n, nwords]."""
    nw = (k + 31) // 32
    n = len(seq_codes) - k + 1
    out = np.zeros((max(n, 0), nw), np.uint64)
    rcseq = (3 - seq_codes[::-1]).astype(np.uint8)
    for p in range(max(n, 0)):
        fwd = tuple(int(c) for c in seq_codes[p:p + k])
        twin = tuple(int(c) for c in rcseq[len(seq_codes) - k - p:
                                           len(seq_codes) - p])
        best = min(fwd, twin)
        for j, c in enumerate(best):
            w, b = divmod(j, 32)
            out[p, w] |= np.uint64(c) << np.uint64(2 * (31 - b))
    return out


def extract_canonical_np2(codes: np.ndarray, lengths: np.ndarray, k: int):
    """Two-word numpy extraction for 32 < k <= 64."""
    R, L = codes.shape
    W = L - k + 1
    if W <= 0:
        z = np.zeros((R, 0), np.uint64)
        return z, z, np.zeros((R, 0), bool)
    c64 = codes.astype(np.uint64)
    fhi = np.zeros((R, W), np.uint64)
    flo = np.zeros((R, W), np.uint64)
    rhi = np.zeros((R, W), np.uint64)
    rlo = np.zeros((R, W), np.uint64)
    for j in range(k):
        col = c64[:, j:j + W]
        comp = np.uint64(3) - col
        if j < 32:
            fhi |= col << np.uint64(2 * (31 - j))
        else:
            flo |= col << np.uint64(2 * (31 - (j - 32)))
        ti = k - 1 - j
        if ti < 32:
            rhi |= comp << np.uint64(2 * (31 - ti))
        else:
            rlo |= comp << np.uint64(2 * (31 - (ti - 32)))
    twin_less = (rhi < fhi) | ((rhi == fhi) & (rlo < flo))
    chi = np.where(twin_less, rhi, fhi)
    clo = np.where(twin_less, rlo, flo)
    valid = np.arange(W)[None, :] <= (lengths[:, None] - k)
    return chi, clo, valid
