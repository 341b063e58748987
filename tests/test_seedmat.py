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


def test_device_seedmat_matches_host(rng):
    from elba_tpu.dsparse.seedmat_device import build_seed_matrix_device
    k = 7
    reads = []
    motifs = [random_dna(rng, 30) for _ in range(4)]
    for i in range(12):
        r = random_dna(rng, 80)
        r[10:40] = motifs[i % 4]
        reads.append("".join("ACGT"[c] for c in r))
    rs = ReadSet.from_sequences(reads)
    A = build_kmer_matrix(rs, k, 2, 8)
    host = build_seed_matrix(A, min_shared=2, full=True).mat

    res, total = build_seed_matrix_device(A)
    res = {f: np.asarray(v) for f, v in res.items()}
    sel = np.flatnonzero(res["head"])
    # device emits column-major heads like the host canonical order
    assert len(sel) == host.nnz
    order = np.argsort(res["t"][sel] * A.num_reads + res["q"][sel])
    sel = sel[order]
    assert np.array_equal(res["q"][sel], host.rows)
    assert np.array_equal(res["t"][sel], host.cols)
    for df, hf in [("numshared", "numshared"), ("seedQ0", "seedQ0"),
                   ("seedT0", "seedT0"), ("seedQ1", "seedQ1"),
                   ("seedT1", "seedT1")]:
        assert np.array_equal(res[df][sel], host.vals[hf]), df


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
