"""Multi-pass (memory-bounded) device counting vs the single-shot
counter: the partition over k-mer value ranges must reproduce the
single-shot canonical order, reliable set, and ranks bit-for-bit for any
pass geometry, and the chained SpGEMM over parts must equal the
single-count SpGEMM."""

import numpy as np
import pytest

from elba_tpu.dseq.dna import ReadSet
from elba_tpu.kmers.count_device import (build_kmer_matrix_device,
                                         count_device_raw)
from elba_tpu.kmers.count_chunked import (build_kmer_matrix_chunked,
                                          count_device_chunked,
                                          iter_count_parts)
from tests.conftest import random_dna


def _random_readset(rng, n_reads, lo, hi):
    lens = rng.integers(lo, hi, n_reads)
    return ReadSet.from_sequences(
        ["".join("ACGT"[c] for c in random_dna(rng, int(m)))
         for m in lens])


def _overlapping_readset(rng, genome_len=2000, n_reads=40, read_len=300):
    g = random_dna(rng, genome_len)
    seqs = []
    for _ in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len))
        s = g[p:p + read_len].copy()
        if rng.random() < 0.5:  # strand flip
            s = (3 - s[::-1]).astype(np.uint8)
        seqs.append("".join("ACGT"[c] for c in s))
    return ReadSet.from_sequences(seqs)


@pytest.mark.parametrize("parts,read_chunk", [(1, 8), (2, 16), (4, 8),
                                              (8, 4), (16, 64)])
def test_chunked_matches_single_shot(rng, parts, read_chunk):
    rs = _overlapping_readset(rng)
    k, lower, upper = 17, 2, 8
    A0 = build_kmer_matrix_device(rs, k, lower, upper)
    A1 = build_kmer_matrix_chunked(rs, k, lower, upper, parts=parts,
                                   read_chunk=read_chunk)
    assert A0.num_kmers == A1.num_kmers
    assert np.array_equal(A0.rows, A1.rows)
    assert np.array_equal(A0.cols, A1.cols)
    assert np.array_equal(A0.pos, A1.pos)
    assert np.array_equal(A0.kmers, A1.kmers)


def test_chunked_various_k(rng):
    rs = _random_readset(rng, 30, 20, 120)
    for k in (5, 31, 32):
        A0 = build_kmer_matrix_device(rs, k, 1, 1000)
        A1 = build_kmer_matrix_chunked(rs, k, 1, 1000, parts=4,
                                       read_chunk=8)
        assert np.array_equal(A0.rows, A1.rows)
        assert np.array_equal(A0.cols, A1.cols)
        assert np.array_equal(A0.pos, A1.pos)
        assert np.array_equal(A0.kmers, A1.kmers)


def test_tiny_cap_retries(rng):
    """An undersized part buffer must retry (doubling), not corrupt."""
    rs = _overlapping_readset(rng, genome_len=800, n_reads=20,
                              read_len=200)
    k = 17
    A0 = build_kmer_matrix_device(rs, k, 2, 8)
    # cap barely above one append window forces overflow retries
    W = 512 - k + 1
    A1 = build_kmer_matrix_chunked(rs, k, 2, 8, parts=2, read_chunk=4,
                                   cap=4 * W + 64)
    assert np.array_equal(A0.rows, A1.rows)
    assert np.array_equal(A0.cols, A1.cols)


def test_spgemm_from_parts_matches_single(rng):
    from elba_tpu.dsparse.seedmat_device import (spgemm_from_device_count,
                                                 spgemm_from_count_parts,
                                                 device_result_to_host)
    rs = _overlapping_readset(rng, genome_len=3000, n_reads=60,
                              read_len=400)
    k, lower, upper = 17, 2, 8
    single = count_device_raw(rs, k, lower, upper)
    b0 = device_result_to_host(
        spgemm_from_device_count(single, upper, min_shared=2, full=False),
        min_shared=2)
    b1 = device_result_to_host(
        spgemm_from_count_parts(
            lambda: iter_count_parts(rs, k, lower, upper, parts=4,
                                     read_chunk=8),
            upper, min_shared=2, full=False),
        min_shared=2)
    assert len(b0["q"]) > 0
    for f in b0:
        assert np.array_equal(b0[f], b1[f]), f
    # a tiny accumulator forces the early-bail overflow retry (doubling
    # until the pair set fits); the result must still be bit-identical
    b2 = device_result_to_host(
        spgemm_from_count_parts(
            lambda: iter_count_parts(rs, k, lower, upper, parts=4,
                                     read_chunk=8),
            upper, min_shared=2, full=False, out_cap=64, max_retries=12),
        min_shared=2)
    for f in b0:
        assert np.array_equal(b0[f], b2[f]), f
