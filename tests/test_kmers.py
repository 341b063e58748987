import numpy as np
import jax.numpy as jnp

from elba_tpu.dseq.dna import ReadSet, ascii_to_codes
from elba_tpu.kmers.extract import (extract_canonical_kmers, canonical_ref,
                                    pack_kmers_ref)
from elba_tpu.kmers.count import count_reliable_kmers, build_kmer_matrix
from tests.conftest import random_dna


def brute_force_canonical(seq_codes, k):
    """Independent oracle: canonical kmer as min of the two strings."""
    out = []
    s = seq_codes
    rc = (3 - s[::-1]).astype(np.uint8)
    n = len(s)
    for p in range(n - k + 1):
        fwd = tuple(s[p:p + k])
        twin = tuple(rc[n - k - p:n - p])
        best = min(fwd, twin)
        v = 0
        for c in best:
            v = (v << 2) | int(c)
        out.append(v)
    return np.array(out, dtype=np.uint64)


def test_extract_matches_oracle(rng):
    for k in [3, 5, 17, 31]:
        for n in [k, k + 1, 40, 100]:
            s = random_dna(rng, n)
            expect = brute_force_canonical(s, k)
            assert np.array_equal(canonical_ref(s, k), expect)
            canon, valid = extract_canonical_kmers(
                jnp.asarray(s[None, :]), jnp.asarray([n]), k)
            got = np.asarray(canon)[0][np.asarray(valid)[0]]
            assert np.array_equal(got, expect), (k, n)


def test_canonical_strand_invariance(rng):
    k = 17
    s = random_dna(rng, 60)
    rc = (3 - s[::-1]).astype(np.uint8)
    a = canonical_ref(s, k)
    b = canonical_ref(rc, k)
    assert np.array_equal(np.sort(a), np.sort(b))


def test_short_reads_excluded(rng):
    k = 17
    rs = ReadSet.from_sequences(["ACGT", "A" * 30])
    m = build_kmer_matrix(rs, k, 1, 100)
    # only read 1 contributes windows (read 0 shorter than k)
    assert np.all(m.rows == 1)
    assert m.nnz == 30 - k + 1


def test_counting_matches_dict_oracle(rng):
    k = 7
    lower, upper = 2, 5
    reads = [random_dna(rng, rng.integers(20, 60)) for _ in range(30)]
    # inject a shared motif so some kmers repeat
    motif = random_dna(rng, 12)
    for i in range(0, 30, 3):
        reads[i][:12] = motif
    rs = ReadSet.from_sequences(
        ["".join("ACGT"[c] for c in r) for r in reads])

    # dict oracle over all windows
    from collections import defaultdict
    occ = defaultdict(list)
    for rid, r in enumerate(reads):
        can = brute_force_canonical(r, k)
        for p, v in enumerate(can):
            occ[int(v)].append((rid, p))
    reliable = {v for v, lst in occ.items() if lower <= len(lst) <= upper}

    m = build_kmer_matrix(rs, k, lower, upper)
    assert set(int(x) for x in m.kmers) == reliable
    assert np.all(np.sort(m.kmers) == m.kmers)

    # triples must be exactly all instances of reliable kmers,
    # ordered by (kmer rank, readid, pos)
    expect = []
    for rank, v in enumerate(sorted(reliable)):
        for rid, p in sorted(occ[v]):
            expect.append((rid, rank, p))
    got = list(zip(m.rows.tolist(), m.cols.tolist(), m.pos.tolist()))
    assert got == expect


def test_duplicate_kmer_in_same_read():
    # a kmer appearing twice in the same read yields two (read, kmer) triples
    k = 5
    seq = "ACGTA" + "CC" + "ACGTA"
    rs = ReadSet.from_sequences([seq, seq])  # 4 instances of ACGTA total
    m = build_kmer_matrix(rs, k, 4, 4)
    assert m.num_kmers == 1  # only ACGTA is reliable at [4, 4]
    assert m.nnz == 4
    assert sorted(zip(m.rows.tolist(), m.pos.tolist())) == \
        [(0, 0), (0, 7), (1, 0), (1, 7)]


def test_two_word_extraction_matches_oracle(rng):
    from elba_tpu.kmers.extract import extract_canonical_kmers2, canonical_ref2
    for k in [33, 41, 63]:
        s = random_dna(rng, 150)
        expect = canonical_ref2(s, k)
        chi, clo, valid = extract_canonical_kmers2(
            jnp.asarray(s[None, :]), jnp.asarray([150]), k)
        got = np.stack([np.asarray(chi)[0], np.asarray(clo)[0]], axis=1)
        got = got[np.asarray(valid)[0]]
        assert np.array_equal(got, expect), k


def test_two_word_counting(rng):
    k = 41
    # build reads sharing a long exact region
    core = random_dna(rng, 120)
    reads = []
    for i in range(6):
        pre = random_dna(rng, 10 + i)
        post = random_dna(rng, 15)
        reads.append(np.concatenate([pre, core, post]))
    rs = ReadSet.from_sequences(
        ["".join("ACGT"[c] for c in r) for r in reads])
    m = build_kmer_matrix(rs, k, 6, 6)
    # every kmer fully inside the shared core appears exactly 6 times
    assert m.num_kmers == 120 - k + 1
    assert m.nnz == 6 * (120 - k + 1)
    assert m.kmers.shape == (m.num_kmers, 2)
    # strand invariance: rc all reads -> same canonical kmer set
    rc = [("".join("ACGT"[c] for c in (3 - r[::-1]))) for r in reads]
    m2 = build_kmer_matrix(ReadSet.from_sequences(rc), k, 6, 6)
    assert np.array_equal(
        m.kmers[np.lexsort((m.kmers[:, 1], m.kmers[:, 0]))],
        m2.kmers[np.lexsort((m2.kmers[:, 1], m2.kmers[:, 0]))])


def test_multi_word_extraction_matches_oracle(rng):
    from elba_tpu.kmers.extract import (extract_canonical_words_np,
                                        canonical_ref_words,
                                        extract_canonical_np2)
    for k in [33, 63, 65, 79, 95]:
        s = random_dna(rng, 200)
        expect = canonical_ref_words(s, k)
        words, valid = extract_canonical_words_np(
            s[None, :], np.array([200]), k)
        got = np.stack([w[0] for w in words], axis=1)[valid[0]]
        assert np.array_equal(got, expect), k
    # the generic path must agree with the dedicated two-word kernel
    s = random_dna(rng, 150)
    chi, clo, valid2 = extract_canonical_np2(s[None, :], np.array([150]), 41)
    words, _ = extract_canonical_words_np(s[None, :], np.array([150]), 41)
    assert np.array_equal(words[0], chi) and np.array_equal(words[1], clo)


def test_three_word_counting(rng):
    k = 95
    core = random_dna(rng, 200)
    reads = []
    for i in range(5):
        pre = random_dna(rng, 8 + 3 * i)
        post = random_dna(rng, 12)
        reads.append(np.concatenate([pre, core, post]))
    rs = ReadSet.from_sequences(
        ["".join("ACGT"[c] for c in r) for r in reads])
    m = build_kmer_matrix(rs, k, 5, 5)
    assert m.num_kmers == 200 - k + 1
    assert m.nnz == 5 * (200 - k + 1)
    assert m.kmers.shape == (m.num_kmers, 3)
    # strand invariance
    rc = [("".join("ACGT"[c] for c in (3 - r[::-1]))) for r in reads]
    m2 = build_kmer_matrix(ReadSet.from_sequences(rc), k, 5, 5)
    o1 = np.lexsort(tuple(m.kmers.T[::-1]))
    o2 = np.lexsort(tuple(m2.kmers.T[::-1]))
    assert np.array_equal(m.kmers[o1], m2.kmers[o2])


def test_three_word_pipeline_smoke(rng):
    """Tiny error-free assembly at k=65 exercises A -> B -> R -> contigs
    through the multi-word path."""
    from elba_tpu.params import PipelineParams
    # params accept the reference's full range
    PipelineParams(k=95, lower_freq=2, upper_freq=8)
    genome = random_dna(rng, 3000)
    reads = [genome[i * 400:i * 400 + 800] for i in range(6)]
    rs = ReadSet.from_sequences(
        ["".join("ACGT"[c] for c in r) for r in reads])
    m = build_kmer_matrix(rs, 65, 2, 8)
    assert m.num_kmers > 0
    from elba_tpu.dsparse.seedmat import build_seed_matrix
    B = build_seed_matrix(m, min_shared=2, full=False)
    # each adjacent pair shares a 400bp window -> candidates exist
    assert B.nnz >= 5


def test_native_counting_matches_numpy(rng):
    from elba_tpu.kmers.count import (build_kmer_matrix,
                                      count_reliable_kmers_native)
    from elba_tpu.native.loader import native_available
    if not native_available():
        import pytest
        pytest.skip("no native toolchain")
    for k, L, U in [(7, 2, 8), (17, 2, 6), (31, 3, 12)]:
        reads = []
        core = random_dna(rng, 300)
        for i in range(15):
            r = random_dna(rng, 200)
            r[40:140] = core[i * 10:i * 10 + 100]
            reads.append("".join("ACGT"[c] for c in r))
        rs = ReadSet.from_sequences(reads)
        m_np = build_kmer_matrix(rs, k, L, U, native=False)
        m_nat = count_reliable_kmers_native(rs, k, L, U)
        assert m_nat is not None
        assert m_nat.num_kmers == m_np.num_kmers, k
        assert np.array_equal(m_nat.kmers, m_np.kmers), k
        assert np.array_equal(m_nat.rows, m_np.rows), k
        assert np.array_equal(m_nat.cols, m_np.cols), k
        assert np.array_equal(m_nat.pos, m_np.pos), k


def test_native_counting_sharded_start_id(rng):
    from elba_tpu.kmers.count import count_reliable_kmers_native
    from elba_tpu.native.loader import native_available
    if not native_available():
        import pytest
        pytest.skip("no native toolchain")
    reads = ["".join("ACGT"[c] for c in random_dna(rng, 100))
             for _ in range(4)] * 2
    rs = ReadSet.from_sequences(reads, start_id=100)
    m = count_reliable_kmers_native(rs, 9, 2, 8)
    assert m is not None and m.nnz > 0
    assert m.rows.min() >= 100


def test_device_counting_matches_numpy(rng):
    from elba_tpu.kmers.count import build_kmer_matrix
    from elba_tpu.kmers.count_device import build_kmer_matrix_device
    for k, L, U in [(7, 2, 8), (17, 2, 6), (31, 2, 12)]:
        reads = []
        core = random_dna(rng, 300)
        for i in range(12):
            r = random_dna(rng, 150 + 7 * i)
            r[30:130] = core[i * 10:i * 10 + 100]
            reads.append("".join("ACGT"[c] for c in r))
        rs = ReadSet.from_sequences(reads)
        m_np = build_kmer_matrix(rs, k, L, U, native=False)
        m_dev = build_kmer_matrix_device(rs, k, L, U)
        assert m_dev.num_kmers == m_np.num_kmers, k
        assert np.array_equal(m_dev.kmers, m_np.kmers), k
        assert np.array_equal(m_dev.rows, m_np.rows), k
        assert np.array_equal(m_dev.cols, m_np.cols), k
        assert np.array_equal(m_dev.pos, m_np.pos), k


def test_bloom_prefilter_bit_identical(rng, monkeypatch):
    """The Bloom repeat prefilter (count._bloom_repeat_mask, the
    reference's KmerOps pass-1 Bloom role) must not change the counted
    output by a single bit, for both one-word and multi-word k."""
    import elba_tpu.kmers.count as cnt
    from elba_tpu.dseq.dna import codes_to_ascii

    reads = []
    genome = rng.integers(0, 4, 3000, dtype=np.uint8)
    for s in range(0, 2500, 100):
        seg = genome[s:s + 500].copy()
        m = rng.random(500) < 0.05  # errors make singleton k-mers
        seg[m] = (seg[m] + rng.integers(1, 4, int(m.sum()))) % 4
        reads.append(codes_to_ascii(seg))
    rs = ReadSet.from_sequences(reads)

    for k in (31, 41):
        base = build_kmer_matrix(rs, k, 2, 50, native=False)
        monkeypatch.setattr(cnt, "_BLOOM_MIN_INSTANCES", 0)
        filt = build_kmer_matrix(rs, k, 2, 50, native=False)
        monkeypatch.undo()
        assert np.array_equal(base.rows, filt.rows)
        assert np.array_equal(base.cols, filt.cols)
        assert np.array_equal(base.pos, filt.pos)
        assert np.array_equal(base.kmers, filt.kmers)
        assert base.num_kmers == filt.num_kmers


def test_three_word_extraction_matches_host_oracle(rng):
    """Device Kmer<3> extraction (64 < k < 96) vs the host generic
    multi-word extractor (itself oracle-verified above)."""
    from elba_tpu.kmers.extract import (extract_canonical_kmers3,
                                        extract_canonical_words_np)

    for k in (65, 80, 95):
        codes = rng.integers(0, 4, size=(3, 140), dtype=np.uint8)
        lengths = np.array([140, 100, k - 1], np.int32)
        w0, w1, w2, valid = extract_canonical_kmers3(
            jnp.asarray(codes), jnp.asarray(lengths), k)
        ref_words, ref_valid = extract_canonical_words_np(codes, lengths, k)
        assert np.array_equal(np.asarray(valid), ref_valid)
        for got, ref in zip((w0, w1, w2), ref_words):
            assert np.array_equal(np.asarray(got)[ref_valid],
                                  ref[ref_valid]), k
