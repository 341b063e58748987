import numpy as np

from elba_tpu.dseq.dna import ReadSet
from elba_tpu.kmers.count import build_kmer_matrix
from elba_tpu.dsparse.seedmat import build_seed_matrix
from tests.conftest import random_dna


def brute_force_B(A):
    """Dict-oracle SharedSeeds SpGEMM: for every read pair, every pair of
    instances of a shared kmer contributes one seed; merge order is
    (kmer rank, readid, pos)."""
    from collections import defaultdict
    bykmer = defaultdict(list)
    for r, c, p in zip(A.rows, A.cols, A.pos):
        bykmer[int(c)].append((int(r), int(p)))
    cells = defaultdict(list)
    for c in sorted(bykmer):
        inst = bykmer[c]  # already in (readid, pos) order
        for (r1, p1) in inst:
            for (r2, p2) in inst:
                cells[(r1, r2)].append((p1, p2))
    return cells


def test_seed_matrix_matches_oracle(rng):
    k = 7
    reads = []
    motifs = [random_dna(rng, 30) for _ in range(4)]
    for i in range(12):
        r = random_dna(rng, 80)
        m = motifs[i % 4]
        r[10:40] = m
        reads.append("".join("ACGT"[c] for c in r))
    rs = ReadSet.from_sequences(reads)
    A = build_kmer_matrix(rs, k, 2, 8)
    B = build_seed_matrix(A, min_shared=2, full=True)

    cells = brute_force_B(A)
    expect = {kv: seeds for kv, seeds in cells.items() if len(seeds) >= 2}

    got = {}
    m = B.mat
    for i in range(m.nnz):
        got[(int(m.rows[i]), int(m.cols[i]))] = (
            int(m.vals["numshared"][i]),
            (int(m.vals["seedQ0"][i]), int(m.vals["seedT0"][i])),
            (int(m.vals["seedQ1"][i]), int(m.vals["seedT1"][i])))

    assert set(got) == set(expect)
    for kv, seeds in expect.items():
        ns, s0, s1 = got[kv]
        assert ns == len(seeds)
        assert s0 == seeds[0]     # first in merge order
        assert s1 == seeds[-1]    # last in merge order (fold semantics)


def test_seed_matrix_symmetry_and_diagonal(rng):
    k = 5
    reads = ["ACGTACGTACGTACGTACGT", "ACGTACGTACGTACGTACGT"]
    rs = ReadSet.from_sequences(reads)
    A = build_kmer_matrix(rs, k, 1, 100)
    B = build_seed_matrix(A, min_shared=2, full=True).mat
    keys = set(zip(B.rows.tolist(), B.cols.tolist()))
    for (i, j) in keys:
        assert (j, i) in keys
    assert (0, 0) in keys  # diagonal retained, as in the reference's B


def test_upper_only_subset(rng):
    k = 7
    reads = []
    for i in range(6):
        r = random_dna(rng, 60)
        reads.append("".join("ACGT"[c] for c in r))
    reads.append(reads[0])
    rs = ReadSet.from_sequences(reads)
    A = build_kmer_matrix(rs, k, 2, 8)
    full = build_seed_matrix(A, min_shared=2, full=True).mat
    up = build_seed_matrix(A, min_shared=2, full=False).mat
    fullkeys = set(zip(full.rows.tolist(), full.cols.tolist()))
    upkeys = set(zip(up.rows.tolist(), up.cols.tolist()))
    assert upkeys == {(i, j) for (i, j) in fullkeys if i < j}


def _compare_device_vs_host(A, host, **kw):
    from elba_tpu.dsparse.seedmat_device import (build_seed_matrix_device,
                                                 device_result_to_host)
    res, total = build_seed_matrix_device(A, **kw)
    got = device_result_to_host(res)
    # accumulator is t-major (column-major) sorted = host canonical order
    assert len(got["q"]) == host.nnz
    assert np.array_equal(got["q"], host.rows)
    assert np.array_equal(got["t"], host.cols)
    for f in ("numshared", "seedQ0", "seedT0", "seedQ1", "seedT1"):
        assert np.array_equal(got[f], host.vals[f]), f
    return total


def _motif_readset(rng, nreads=12, readlen=80):
    reads = []
    motifs = [random_dna(rng, 30) for _ in range(4)]
    for i in range(nreads):
        r = random_dna(rng, readlen)
        r[10:40] = motifs[i % 4]
        reads.append("".join("ACGT"[c] for c in r))
    return ReadSet.from_sequences(reads)


def test_device_seedmat_matches_host(rng):
    rs = _motif_readset(rng)
    A = build_kmer_matrix(rs, 7, 2, 8)
    host = build_seed_matrix(A, min_shared=2, full=True).mat
    _compare_device_vs_host(A, host)


def test_device_seedmat_chunked_matches_host(rng):
    """Chunk boundaries split k-mer groups mid-way; the order-preserving
    accumulator merge must keep count + first/fold-last seed semantics."""
    rs = _motif_readset(rng, nreads=16)
    A = build_kmer_matrix(rs, 7, 2, 10)
    host = build_seed_matrix(A, min_shared=2, full=True).mat
    _compare_device_vs_host(A, host, chunk_inst=64)
    assert A.nnz > 64  # really exercised multiple chunks


def test_device_seedmat_upper_only(rng):
    rs = _motif_readset(rng)
    A = build_kmer_matrix(rs, 7, 2, 8)
    host = build_seed_matrix(A, min_shared=2, full=False).mat
    _compare_device_vs_host(A, host, full=False)


def test_device_seedmat_overflow_retry(rng):
    """A tiny accumulator must retry with doubled capacity, not truncate."""
    from elba_tpu.dsparse.seedmat_device import build_seed_matrix_device
    import elba_tpu.dsparse.seedmat_device as sd
    rs = _motif_readset(rng)
    A = build_kmer_matrix(rs, 7, 2, 8)
    host = build_seed_matrix(A, min_shared=2, full=True).mat
    res, _ = build_seed_matrix_device(A, out_cap=1 << 14)
    got = sd.device_result_to_host(res)
    assert len(got["q"]) == host.nnz


def test_device_seedmat_staged_dispatch_matches_host(rng):
    """stage_chunks > 0 splits the multiply into several short dispatches
    with device-resident state (tunnel crash resilience); the result must
    be identical to the single-dispatch program."""
    rs = _motif_readset(rng, nreads=16)
    A = build_kmer_matrix(rs, 7, 2, 10)
    host = build_seed_matrix(A, min_shared=2, full=True).mat
    _compare_device_vs_host(A, host, chunk_inst=64, stage_chunks=1)
    _compare_device_vs_host(A, host, chunk_inst=64, stage_chunks=3)


def test_device_seedmat_beyond_int32_keyspace(rng):
    """Read-id space with n^2 >= 2^31 (the round-1 cap) must work: ids are
    sorted as two int32 columns, never composed into one key."""
    from elba_tpu.dsparse.seedmat_device import (build_seed_matrix_device,
                                                 device_result_to_host)
    from elba_tpu.kmers.count import KmerMatrix
    n = 1_000_000  # n^2 = 10^12 >> 2^31
    # 3 kmers each shared by reads spread over the full id range
    rows = np.array([5, 999_999, 123, 777_777, 50_000,
                     1, 999_998, 456_789], np.int64)
    cols = np.array([0, 0, 1, 1, 1, 2, 2, 2], np.int64)
    pos = np.arange(8, dtype=np.int32) * 10
    order = np.lexsort((pos, rows, cols))
    A = KmerMatrix(rows=rows[order], cols=cols[order], pos=pos[order],
                   kmers=np.arange(3, dtype=np.uint64),
                   num_reads=n, num_kmers=3)
    host = build_seed_matrix(A, min_shared=2, full=True).mat
    res, _ = build_seed_matrix_device(A)
    got = device_result_to_host(res)
    assert np.array_equal(got["q"], host.rows)
    assert np.array_equal(got["t"], host.cols)
    assert np.array_equal(got["numshared"], host.vals["numshared"])


def test_chunked_expansion_matches_unchunked(rng):
    k = 7
    reads = []
    motifs = [random_dna(rng, 30) for _ in range(4)]
    for i in range(12):
        r = random_dna(rng, 80)
        r[10:40] = motifs[i % 4]
        reads.append("".join("ACGT"[c] for c in r))
    rs = ReadSet.from_sequences(reads)
    A = build_kmer_matrix(rs, k, 2, 8)
    big = build_seed_matrix(A, min_shared=2, full=True).mat
    small = build_seed_matrix(A, min_shared=2, full=True,
                              max_products=64).mat
    assert np.array_equal(big.rows, small.rows)
    assert np.array_equal(big.cols, small.cols)
    for f in big.vals:
        assert np.array_equal(big.vals[f], small.vals[f]), f


def test_seed_matrix_device_wrapper_matches_host(rng):
    from elba_tpu.dsparse.seedmat import (device_spgemm_suitable,
                                          seed_matrix_device)
    rs = _motif_readset(rng)
    A = build_kmer_matrix(rs, 7, 2, 8)
    assert device_spgemm_suitable(A, 8)
    host = build_seed_matrix(A, min_shared=2, full=False)
    dev = seed_matrix_device(A, min_shared=2, full=False)
    assert np.array_equal(dev.mat.rows, host.mat.rows)
    assert np.array_equal(dev.mat.cols, host.mat.cols)
    for f in host.mat.vals:
        assert np.array_equal(dev.mat.vals[f], host.mat.vals[f]), f


def test_chained_device_count_spgemm_matches_host(rng):
    """count_device_raw -> spgemm_from_device_count (no host roundtrip of
    the instance arrays) must equal the host A -> B chain."""
    from elba_tpu.dsparse.seedmat import seed_matrix_from_device_result
    from elba_tpu.dsparse.seedmat_device import spgemm_from_device_count
    from elba_tpu.kmers.count_device import count_device_raw

    rs = _motif_readset(rng, nreads=14)
    A = build_kmer_matrix(rs, 7, 2, 8)
    host = build_seed_matrix(A, min_shared=2, full=False)

    cres = count_device_raw(rs, 7, 2, 8)
    assert int(cres["nnz"]) == A.nnz and int(cres["nk"]) == A.num_kmers
    bres = spgemm_from_device_count(cres, upper=8, min_shared=2,
                                    full=False)
    B = seed_matrix_from_device_result(bres, len(rs))
    assert np.array_equal(B.mat.rows, host.mat.rows)
    assert np.array_equal(B.mat.cols, host.mat.cols)
    for f in host.mat.vals:
        assert np.array_equal(B.mat.vals[f], host.mat.vals[f]), f


def test_chained_device_spgemm_two_seeds_false(rng):
    """two_seeds=False (the ladder's perf path) must match the host chain
    on everything except the fold-last seed, which mirrors seed 0."""
    from elba_tpu.dsparse.seedmat import seed_matrix_from_device_result
    from elba_tpu.dsparse.seedmat_device import spgemm_from_device_count
    from elba_tpu.kmers.count_device import count_device_raw

    rs = _motif_readset(rng, nreads=14)
    A = build_kmer_matrix(rs, 7, 2, 8)
    host = build_seed_matrix(A, min_shared=2, full=False)

    cres = count_device_raw(rs, 7, 2, 8)
    bres = spgemm_from_device_count(cres, upper=8, min_shared=2,
                                    full=False, two_seeds=False,
                                    stage_chunks=2)
    B = seed_matrix_from_device_result(bres, len(rs))
    assert np.array_equal(B.mat.rows, host.mat.rows)
    assert np.array_equal(B.mat.cols, host.mat.cols)
    for f in ("numshared", "seedQ0", "seedT0"):
        assert np.array_equal(B.mat.vals[f], host.mat.vals[f]), f
    assert np.array_equal(B.mat.vals["seedQ1"], B.mat.vals["seedQ0"])
    assert np.array_equal(B.mat.vals["seedT1"], B.mat.vals["seedT0"])


def test_out_cap_retry_clamped_to_compile_bound():
    """Overflow retries must never mint a flush-sort shape past the
    remote compile helper's survivable size (out_cap + pending, where
    pending must hold at least one live window)."""
    import pytest
    from elba_tpu.dsparse.seedmat_device import (_grow_out_cap,
                                                 _live_window,
                                                 _out_cap_max,
                                                 _pend_cap_for)
    from elba_tpu.kmers.count_chunked import COMPILE_CAP

    chunk_slots = 1 << 25
    ci = chunk_slots // 34
    cap_max = _out_cap_max(chunk_slots, ci)
    assert cap_max + _live_window(chunk_slots, ci) <= COMPILE_CAP
    # the flush sort (out_cap + pend_cap) stays at/below the bound and
    # pending always has room for one compacted chunk window
    pend = _pend_cap_for(cap_max, chunk_slots, ci)
    assert cap_max + pend <= COMPILE_CAP
    assert pend >= _live_window(chunk_slots, ci) + 1024
    # doubling clamps to cap_max rather than overshooting
    assert _grow_out_cap(cap_max // 2 + 1, chunk_slots, ci, "t") == cap_max
    # at the bound, the retry fails loudly instead of compiling
    with pytest.raises(RuntimeError, match="compile-bound"):
        _grow_out_cap(cap_max, chunk_slots, ci, "t")


def test_pos_guard_ignores_dead_slots():
    """The packed-seed pos >= 2^15 guard must consider LIVE entries only:
    compacted dead slots carry window positions up to L - k."""
    import jax.numpy as jnp
    from elba_tpu.dsparse.seedmat_device import (_live_pos_max,
                                                 spgemm_from_device_count)

    pos = jnp.asarray(np.array([5, 9, 40000, 50000], np.int32))
    assert _live_pos_max(pos, jnp.int32(2)) == 9
    # end-to-end: two reads sharing one k-mer at small positions, with
    # dead tail slots holding >= 2^15 position payloads
    count_res = dict(
        km=jnp.asarray(np.array([7, 7, 99, 99], np.uint64)),
        rid=jnp.asarray(np.array([0, 1, 2, 3], np.int32)),
        pos=pos,
        rank=jnp.asarray(np.array([0, 0, 1, 1], np.int32)),
        nnz=jnp.int32(2), nk=jnp.int32(1))
    res = spgemm_from_device_count(count_res, upper=4, min_shared=1,
                                   full=False)
    n = int(res["stats"]["pairs"])
    assert n == 1
    assert int(res["q"][0]) == 0 and int(res["t"][0]) == 1


def test_spgemm_empty_parts_iterator():
    """No parts -> empty B result, not a TypeError on a None state."""
    from elba_tpu.dsparse.seedmat_device import spgemm_from_count_parts

    res = spgemm_from_count_parts(lambda: iter(()), upper=8)
    assert int(res["stats"]["pairs"]) == 0
    assert int(res["stats"]["nnz"]) == 0


def test_staged_dispatch_requires_total_chunks(rng):
    """stage_chunks > 0 with the default total_chunks=0 must fail loudly
    instead of silently skipping the multiply."""
    import pytest
    import jax.numpy as jnp
    from elba_tpu.dsparse.seedmat_device import _run_spgemm

    z = jnp.zeros(1024, jnp.int32)
    with pytest.raises(AssertionError, match="total_chunks"):
        _run_spgemm(z, z, z, jnp.int32(0), chunk_inst=256, out_cap=256,
                    pend_cap=2048, min_shared=2, full=False, upper=4,
                    stage_chunks=2)
