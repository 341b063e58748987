"""Token-sweep counting vs the single-part multi-pass counter and the
single-shot counter: the 4-byte-token sweeps plus the gather-based
canonical re-derivation must reproduce every per-part result bit-for-bit
for any (parts, group) geometry, including tail sweeps, fallback paths,
and the chained SpGEMM consumer."""

import numpy as np
import pytest

from elba_tpu.dseq.dna import ReadSet
from elba_tpu.kmers.count_device import (build_kmer_matrix_device,
                                         count_device_raw)
from elba_tpu.kmers.count_chunked import iter_count_parts
from elba_tpu.kmers.count_tokens import (build_kmer_matrix_tokens,
                                         iter_count_parts_tokens)
from tests.conftest import random_dna


def _overlapping_readset(rng, genome_len=2000, n_reads=40, read_len=300):
    g = random_dna(rng, genome_len)
    seqs = []
    for _ in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len))
        s = g[p:p + read_len].copy()
        if rng.random() < 0.5:
            s = (3 - s[::-1]).astype(np.uint8)
        seqs.append("".join("ACGT"[c] for c in s))
    return ReadSet.from_sequences(seqs)


def _cmp_parts(rs, k, lower, upper, parts, group, read_chunk, cap=0,
               token_cap=0):
    ref = list(iter_count_parts(rs, k, lower, upper, parts=parts,
                                read_chunk=read_chunk, cap=cap))
    got = list(iter_count_parts_tokens(rs, k, lower, upper, parts=parts,
                                       group=group, read_chunk=read_chunk,
                                       cap=cap, token_cap=token_cap))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        nnz = int(a["nnz"])
        assert nnz == int(b["nnz"])
        assert int(a["nk"]) == int(b["nk"])
        for f in ("km", "rid", "pos", "rank"):
            assert np.array_equal(np.asarray(a[f][:nnz]),
                                  np.asarray(b[f][:nnz])), f


@pytest.mark.parametrize("parts,group,read_chunk", [
    (1, 1, 8), (4, 4, 8), (4, 2, 16), (8, 4, 8), (8, 3, 8),
    (16, 5, 64), (5, 4, 8), (3, 8, 8), (7, 62, 8)])
def test_tokens_match_chunked_parts(rng, parts, group, read_chunk):
    rs = _overlapping_readset(rng)
    _cmp_parts(rs, 17, 2, 8, parts, group, read_chunk)


def test_tokens_matrix_matches_single_shot(rng):
    rs = _overlapping_readset(rng, genome_len=3000, n_reads=60,
                              read_len=400)
    k, lower, upper = 17, 2, 8
    A0 = build_kmer_matrix_device(rs, k, lower, upper)
    A1 = build_kmer_matrix_tokens(rs, k, lower, upper, parts=6, group=4,
                                  read_chunk=8)
    assert A0.num_kmers == A1.num_kmers
    assert np.array_equal(A0.rows, A1.rows)
    assert np.array_equal(A0.cols, A1.cols)
    assert np.array_equal(A0.pos, A1.pos)
    assert np.array_equal(A0.kmers, A1.kmers)


def test_tokens_various_k(rng):
    """k = 32 exercises the full-width mask and the SENTK terminator
    bound; small k exercises narrow windows in the word gather."""
    lens = rng.integers(20, 120, 30)
    rs = ReadSet.from_sequences(
        ["".join("ACGT"[c] for c in random_dna(rng, int(m)))
         for m in lens])
    for k in (5, 31, 32):
        A0 = build_kmer_matrix_device(rs, k, 1, 1000)
        A1 = build_kmer_matrix_tokens(rs, k, 1, 1000, parts=4, group=3,
                                      read_chunk=8)
        assert np.array_equal(A0.rows, A1.rows)
        assert np.array_equal(A0.cols, A1.cols)
        assert np.array_equal(A0.pos, A1.pos)
        assert np.array_equal(A0.kmers, A1.kmers)


def test_tokens_overflow_falls_back(rng):
    """An undersized token buffer must fall back to the single-part
    retry path and still produce exact results."""
    rs = _overlapping_readset(rng, genome_len=800, n_reads=20,
                              read_len=200)
    k = 17
    A0 = build_kmer_matrix_device(rs, k, 2, 8)
    W = 512 - k + 1
    A1 = build_kmer_matrix_tokens(rs, k, 2, 8, parts=2, group=2,
                                  read_chunk=4, token_cap=4 * W + 64)
    assert np.array_equal(A0.rows, A1.rows)
    assert np.array_equal(A0.cols, A1.cols)


def test_tokens_hot_part_falls_back(rng):
    """A part bigger than the part cap (but a healthy token buffer) must
    take the per-part fallback for just that part."""
    rs = _overlapping_readset(rng, genome_len=800, n_reads=20,
                              read_len=200)
    k = 17
    ref = list(iter_count_parts(rs, k, 2, 8, parts=3, read_chunk=4))
    W = 512 - k + 1
    # cap below the expected per-part load forces part_tot[i] > cap on at
    # least one part; the proven single-part path has its own retry caps
    got = list(iter_count_parts_tokens(rs, k, 2, 8, parts=3, group=3,
                                       read_chunk=4, cap=6 * W))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        nnz = int(a["nnz"])
        assert nnz == int(b["nnz"])
        for f in ("km", "rid", "pos", "rank"):
            assert np.array_equal(np.asarray(a[f][:nnz]),
                                  np.asarray(b[f][:nnz])), f


def test_tokens_feed_chained_spgemm(rng):
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
            lambda: iter_count_parts_tokens(rs, k, lower, upper,
                                            parts=6, group=4,
                                            read_chunk=8),
            upper, min_shared=2, full=False),
        min_shared=2)
    assert len(b0["q"]) > 0
    for f in b0:
        assert np.array_equal(b0[f], b1[f]), f


def test_windowed_extractor_matches_rolling(rng):
    """The rolled-window extractor (static-shift word views) must equal
    extract_canonical_kmers bit-for-bit on valid windows, including the
    k = 32 full-width edge."""
    import jax.numpy as jnp
    from elba_tpu.kmers.count_chunked import pack_code_rows
    from elba_tpu.kmers.count_tokens import (_extract_canonical_words,
                                             pack_code_words)
    from elba_tpu.kmers.extract import extract_canonical_kmers

    R, L = 12, 256
    lens = rng.integers(33, L + 1, R).astype(np.int32)
    codes = np.zeros((R, L), np.uint8)
    for i in range(R):
        codes[i, :lens[i]] = random_dna(rng, int(lens[i]))
    words = pack_code_words(pack_code_rows(codes))
    for k in (5, 17, 31, 32):
        ref, vref = extract_canonical_kmers(jnp.asarray(codes),
                                            jnp.asarray(lens), k)
        got, vgot = _extract_canonical_words(
            jnp.asarray(words[:, :-1]), jnp.asarray(lens), k)
        assert np.array_equal(np.asarray(vref), np.asarray(vgot))
        v = np.asarray(vref)
        assert np.array_equal(np.asarray(ref)[v], np.asarray(got)[v]), k


def test_tokens_multi_sweep_budget(rng):
    """A tiny token budget must force several sweeps (group auto-sizing)
    and still reproduce the reference parts exactly."""
    rs = _overlapping_readset(rng)
    k = 17
    ref = list(iter_count_parts(rs, k, 2, 8, parts=9, read_chunk=8))
    got = list(iter_count_parts_tokens(rs, k, 2, 8, parts=9, group=0,
                                       read_chunk=8,
                                       token_budget_bytes=1 << 16))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        nnz = int(a["nnz"])
        assert nnz == int(b["nnz"])
        for f in ("km", "rid", "pos", "rank"):
            assert np.array_equal(np.asarray(a[f][:nnz]),
                                  np.asarray(b[f][:nnz])), f


def test_spgemm_resume_checkpoint_bitexact(rng):
    """Crash-resume of the chained multiply: seeding the accumulator
    from a mid-run checkpoint (flushed live prefix) and replaying only
    the unconsumed parts must give the same B bit-for-bit."""
    from elba_tpu.dsparse.seedmat_device import (spgemm_from_count_parts,
                                                 device_result_to_host)
    rs = _overlapping_readset(rng, genome_len=3000, n_reads=60,
                              read_len=400)
    k, lower, upper = 17, 2, 8
    P = 6

    def full_fn():
        return iter_count_parts_tokens(rs, k, lower, upper, parts=P,
                                       group=2, read_chunk=8)

    b0 = device_result_to_host(
        spgemm_from_count_parts(full_fn, upper, min_shared=2, full=False,
                                out_cap=1 << 14),
        min_shared=2)

    saves, nks = [], []

    def wrapped():
        for res in full_fn():
            nks.append(int(res["nk"]))
            yield res

    resume = dict(state=None, every=2,
                  save=lambda c, h: saves.append((c, h)))
    b1 = device_result_to_host(
        spgemm_from_count_parts(wrapped, upper, min_shared=2, full=False,
                                out_cap=1 << 14, resume=resume),
        min_shared=2)
    for f in b0:
        assert np.array_equal(b0[f], b1[f]), f  # checkpointing is inert
    assert len(saves) >= 2

    # "crash" after the second checkpoint: resume from its prefix with a
    # tail iterator starting at the consumed-part boundary
    consumed, host = saves[1]
    nk0 = sum(nks[:consumed])

    def tail_fn():
        return iter_count_parts_tokens(rs, k, lower, upper, parts=P,
                                       group=2, read_chunk=8,
                                       start_part=consumed,
                                       nk_offset0=nk0)

    b2 = device_result_to_host(
        spgemm_from_count_parts(tail_fn, upper, min_shared=2, full=False,
                                out_cap=1 << 14,
                                resume=dict(state=host)),
        min_shared=2)
    for f in b0:
        assert np.array_equal(b0[f], b2[f]), f
