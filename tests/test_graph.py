"""Transitive reduction, connected components, pruning, contigs."""

import numpy as np

from elba_tpu.dsparse.coo import COOMatrix
from elba_tpu.dsparse.minplus import minplus_spgemm, INF
from elba_tpu.graph.cc import connected_components
from elba_tpu.graph.tr import transitive_reduction, symmetricize
from elba_tpu.graph.prune import find_bad_reads, find_contained_reads
from elba_tpu.graph.contigs import generate_contigs, read_to_contigs
from elba_tpu.dseq.dna import ReadSet


def mk_overlap_matrix(n, edges):
    """edges: list of (i, j, dict-of-fields). Builds an upper-style R."""
    defaults = dict(begQ=0, begT=0, endQ=0, endT=0, lenQ=1000, lenT=1000,
                    score=500, rc=False, passed=True, containedQ=False,
                    containedT=False, direction=-1, directionT=-1,
                    suffix=0, suffixT=0, seedQ=0, seedT=0)
    rows, cols, vals = [], [], {k: [] for k in defaults}
    for (i, j, fields) in edges:
        rows.append(i)
        cols.append(j)
        for k, dv in defaults.items():
            vals[k].append(fields.get(k, dv))
    types = dict(direction=np.int8, directionT=np.int8, rc=bool, passed=bool,
                 containedQ=bool, containedT=bool)
    out = {k: np.array(v, dtype=types.get(k, np.int32))
           for k, v in vals.items()}
    return COOMatrix(np.array(rows, np.int64), np.array(cols, np.int64),
                     out, (n, n)).sorted()


def overlap_edge(suffix, suffixT, direction, directionT):
    return dict(suffix=suffix, suffixT=suffixT, direction=direction,
                directionT=directionT)


def test_cc_basic():
    # two components {0,1,2}, {3,4}; 5 isolated
    rows = np.array([0, 1, 3])
    cols = np.array([1, 2, 4])
    a, n = connected_components(rows, cols, 6)
    assert n == 3
    assert a[0] == a[1] == a[2]
    assert a[3] == a[4]
    assert a[5] not in (a[0], a[3])
    # labels ordered by root (min vertex) order
    assert a[0] == 0 and a[3] == 1 and a[5] == 2


def test_cc_random_vs_union_find(rng):
    n = 200
    m = 300
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    a, nc = connected_components(rows, cols, n)

    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for i, j in zip(rows, cols):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    lab = [find(i) for i in range(n)]
    # same partition
    import itertools
    for i, j in itertools.combinations(range(0, n, 7), 2):
        assert (a[i] == a[j]) == (lab[i] == lab[j])
    assert nc == len(set(lab))


def test_minplus_spgemm_composition():
    # chain 0 -> 1 -> 2: path entry at (0, 2)
    # edge (0,1): dir 1 (t=0,h=1), suffix 100
    # edge (1,2): dir 1, suffix 50; t2=0 != h1=1 -> valid
    # slot = 2*t1 + h2 = 2*0 + 1 = 1, value 150
    R = mk_overlap_matrix(3, [
        (0, 1, overlap_edge(100, 90, 1, 2)),
        (1, 2, overlap_edge(50, 40, 1, 2)),
    ])
    N = minplus_spgemm(R, R)
    assert N.nnz == 1
    assert (int(N.rows[0]), int(N.cols[0])) == (0, 2)
    sp = N.vals["suffix_paths"][0]
    assert sp[1] == 150
    assert sp[0] == INF and sp[2] == INF and sp[3] == INF


def test_minplus_blocks_incompatible():
    # t2 == h1 -> no composition
    R = mk_overlap_matrix(3, [
        (0, 1, overlap_edge(100, 90, 1, 2)),   # h1 = 1
        (1, 2, overlap_edge(50, 40, 3, 3)),    # t2 = 1 == h1 -> blocked
    ])
    N = minplus_spgemm(R, R)
    assert N.nnz == 0


def test_transitive_reduction_chain():
    """0->1->2 with shortcut 0->2: the shortcut is transitive and removed.

    Layout: reads along a genome, 0 at 0, 1 at 400, 2 at 800, each 1000
    long. dir 1 = forward suffix overlap.
    """
    e01 = overlap_edge(400, 400, 1, 2)
    e12 = overlap_edge(400, 400, 1, 2)
    e02 = overlap_edge(800, 800, 1, 2)
    R = mk_overlap_matrix(3, [(0, 1, e01), (1, 2, e12), (0, 2, e02)])
    S = transitive_reduction(R)
    keys = set(zip(S.rows.tolist(), S.cols.tolist()))
    # symmetric output, shortcut removed
    assert keys == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_transitive_reduction_keeps_required():
    # only a chain, nothing transitive
    R = mk_overlap_matrix(3, [
        (0, 1, overlap_edge(400, 400, 1, 2)),
        (1, 2, overlap_edge(400, 400, 1, 2)),
    ])
    S = transitive_reduction(R)
    keys = set(zip(S.rows.tolist(), S.cols.tolist()))
    assert keys == {(0, 1), (1, 0), (1, 2), (2, 1)}


def _tr_via_materialized_n(R):
    """The pre-optimization formulation: materialize N = P.S with
    minplus_spgemm, loop P = N until the mark set stabilizes.  Kept as
    the executable spec for transitive_reduction's masked marking."""
    from elba_tpu.params import TR_FUZZ
    S = symmetricize(R)
    n = np.int64(S.shape[0])
    t_keys = np.zeros(0, dtype=np.int64)
    P = S
    while True:
        prev = len(t_keys)
        N = minplus_spgemm(P, S)
        P = N
        if N.nnz:
            dirs = S.vals["direction"]
            has_dir = dirs != -1
            nidx = N.lookup(S.rows, S.cols)
            path = np.full(S.nnz, INF, dtype=np.int64)
            sel = (nidx >= 0) & has_dir
            path[sel] = N.vals["suffix_paths"][nidx[sel],
                                               dirs[sel].astype(np.int64)]
            fuzzed = S.vals["suffix"].astype(np.int64) + TR_FUZZ
            transitive = has_dir & (fuzzed >= path)
            marks = S.key()[np.flatnonzero(transitive)]
            marks_t = S.rows[transitive] * n + S.cols[transitive]
            t_keys = np.unique(np.concatenate([t_keys, marks, marks_t]))
        if len(t_keys) == prev:
            break
    S = S.select(~np.isin(S.key(), t_keys))
    return S.select(S.vals["direction"] != -1)


def test_transitive_reduction_random_vs_materialized(rng):
    """Masked marking == N-materializing marking on random graphs."""
    for trial in range(8):
        n = int(rng.integers(6, 40))
        m = int(rng.integers(n, 4 * n))
        seen = set()
        edges = []
        for _ in range(m):
            i, j = rng.integers(0, n, 2)
            if i == j or (min(i, j), max(i, j)) in seen:
                continue
            seen.add((min(i, j), max(i, j)))
            edges.append((min(i, j), max(i, j), overlap_edge(
                int(rng.integers(0, 1500)), int(rng.integers(0, 1500)),
                int(rng.integers(-1, 4)), int(rng.integers(-1, 4)))))
        if not edges:
            continue
        R = mk_overlap_matrix(n, edges)
        S0 = _tr_via_materialized_n(R)
        S1 = transitive_reduction(R)
        assert np.array_equal(S0.rows, S1.rows)
        assert np.array_equal(S0.cols, S1.cols)
        for f in S0.vals:
            assert np.array_equal(S0.vals[f], S1.vals[f]), f


def test_symmetricize_swaps_fields():
    R = mk_overlap_matrix(2, [(0, 1, dict(suffix=7, suffixT=9, direction=1,
                                          directionT=2, lenQ=100, lenT=200))])
    S = symmetricize(R)
    assert S.nnz == 2
    idx = {(int(S.rows[i]), int(S.cols[i])): i for i in range(2)}
    t = idx[(1, 0)]
    assert S.vals["suffix"][t] == 9
    assert S.vals["suffixT"][t] == 7
    assert S.vals["direction"][t] == 2
    assert S.vals["lenQ"][t] == 200


def test_find_bad_and_contained():
    edges = [
        (0, 1, dict(passed=True)),
        (0, 2, dict(passed=True)),
        (1, 3, dict(passed=False)),
        (3, 4, dict(passed=False)),
        (2, 4, dict(passed=True, containedQ=True)),
    ]
    R = mk_overlap_matrix(5, edges)
    bad = find_bad_reads(R, 0.65)
    # read 3: deg 2, passed 0 -> 1/3 <= 0.65 -> bad
    # read 4: deg 2, passed 1 -> 2/3 -> not bad? 0.667 > 0.65 -> kept
    # read 1: deg 2, passed 1 -> 2/3 -> kept
    assert 3 in bad.tolist()
    assert 4 not in bad.tolist() and 1 not in bad.tolist()
    contained = find_contained_reads(R)
    assert contained.tolist() == [2]


def test_contig_generation_linear_chain():
    """Three reads tiling a genome; contig must reconstruct the genome.

    genome length 1800; reads: r0 = [0,1000), r1 = [400,1400),
    r2 = [800,1800). Overlaps (all forward):
      r0-r1: suffix = 400 (r1 extends 400 past r0), suffixT = 400
      r1-r2: same.
    Walk starts at r0 (degree 1): contributes prefix suffixT(r0->r1)=400,
    then r1 prefix 400, then r2 full 1000 -> total 1800 = genome.
    """
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 1800, dtype=np.uint8)
    seqs = ["".join("ACGT"[c] for c in genome[s:s + 1000])
            for s in (0, 400, 800)]
    rs = ReadSet.from_sequences(seqs)

    e01 = overlap_edge(400, 400, 1, 2)
    e12 = overlap_edge(400, 400, 1, 2)
    R = mk_overlap_matrix(3, [(0, 1, e01), (1, 2, e12)])
    S = symmetricize(R)
    contigs = generate_contigs(S, rs)
    assert len(contigs) == 1
    expect = "".join("ACGT"[c] for c in genome)
    assert contigs[0] == expect


def test_contig_generation_rc_member():
    """Middle read reverse-complemented: strand bits must flip its bases.

    r1 is the revcomp of genome[400:1400].  The overlap fields are computed
    through the real pipeline in the e2e test; here we hand-encode:
      r0 -> r1: rc overlap, direction tail=0? Use dir encoding from
      extend_overlap: FIRST_TO_SECOND rc -> direction 0, directionT 0.
    Walking r0 -> r1 -> r2 with strand bit = (dir >> 1) & 1.
    """
    rng = np.random.default_rng(8)
    genome = rng.integers(0, 4, 1800, dtype=np.uint8)
    r0 = genome[0:1000]
    r1 = (3 - genome[400:1400][::-1]).astype(np.uint8)
    r2 = genome[800:1800]
    rs = ReadSet.from_sequences(
        ["".join("ACGT"[c] for c in r) for r in (r0, r1, r2)])

    # r0 (fwd) vs r1 (rc): r0 extends left of the rc read -> in forward
    # orientation of the pair, direction = rc? 0 : 1 with rc=True -> 0
    e01 = overlap_edge(400, 400, 0, 0)
    # r1 (rc) vs r2 (fwd): rc pair again; r1's tail continues into r2.
    # In the chain walk only suffixT and the tail bit of the edge matter:
    # tail bit of r1's outgoing edge must be 1 (r1 is reversed).
    e12 = overlap_edge(400, 400, 3, 3)
    R = mk_overlap_matrix(3, [(0, 1, e01), (1, 2, e12)])
    S = symmetricize(R)
    contigs = generate_contigs(S, rs)
    assert len(contigs) == 1
    expect = "".join("ACGT"[c] for c in genome)
    assert contigs[0] == expect


def test_read_to_contigs_branch_removal():
    # star: vertex 0 connected to 1,2,3 (degree 3 -> branch, removed)
    edges = [(0, i, overlap_edge(1, 1, 1, 2)) for i in (1, 2, 3)]
    R = mk_overlap_matrix(4, edges)
    S = symmetricize(R)
    a, nc = read_to_contigs(S)
    assert nc == 4  # all isolated after branch removal


def test_chimera_pileup_and_trim():
    from elba_tpu.graph.chimera import (read_pileups, trimmed_interval,
                                        prune_chimeras, MIN_SPAN)
    # read 1 covered [0,4000) by two overlaps, read 2 only briefly
    edges = [
        (0, 1, dict(begT=0, endT=3000, lenT=4000)),
        (2, 1, dict(begT=1000, endT=4000, lenT=4000)),
        (0, 2, dict(begT=100, endT=200, lenT=4000)),
    ]
    R = mk_overlap_matrix(3, edges)
    lengths = np.array([4000, 4000, 4000])
    piles = read_pileups(R, lengths)
    assert piles[1][0] == 1 and piles[1][1500] == 2 and piles[1][3500] == 1
    # densest window: extending past col 3000 (coverage drops to 1) lowers
    # the running average, so the best window ends at 2999
    assert trimmed_interval(piles[1], 1) == (0, 2999)
    # threshold 2 run is [1000, 3000) = 2000bp < MIN_SPAN -> no window
    assert trimmed_interval(piles[1], 2) is None
    # literal reference behavior returns the trailing run
    assert trimmed_interval(piles[1], 1, literal=True) == (0, 3999)
    # read 2: only a 100bp window -> chimera candidate
    bad = prune_chimeras(R, lengths, threshold=1)
    assert 2 in bad.tolist() and 1 not in bad.tolist()


def test_partitioned_contigs_match_single_part():
    from elba_tpu.graph.contigs import (generate_contigs,
                                        generate_contigs_partitioned,
                                        greedy_partition_contigs)
    rng = np.random.default_rng(9)
    # three independent chains of different sizes
    genome = rng.integers(0, 4, 6000, dtype=np.uint8)
    seqs, edges, base = [], [], 0
    for chain_len, g0 in [(4, 0), (3, 2200), (2, 4200)]:
        for i in range(chain_len):
            seqs.append("".join("ACGT"[c]
                                for c in genome[g0 + i * 400:
                                                g0 + i * 400 + 1000]))
        for i in range(chain_len - 1):
            edges.append((base + i, base + i + 1,
                          overlap_edge(400, 400, 1, 2)))
        base += chain_len
    rs = ReadSet.from_sequences(seqs)
    R = mk_overlap_matrix(len(seqs), edges)
    S = symmetricize(R)

    single = generate_contigs(S, rs)
    parts = generate_contigs_partitioned(S, rs, 3)
    merged = [c for plist in parts for c in plist]
    assert sorted(merged) == sorted(single)
    assert len(merged) == 3
    # greedy packing puts the three contigs on three different parts
    assign = greedy_partition_contigs(np.array([4, 3, 2]), 3)
    assert sorted(assign.tolist()) == [0, 1, 2]


def test_transitive_mask_native_vs_numpy(rng):
    """The OpenMP marking kernel (native/trmark.cpp) produces exactly the
    numpy masked-marking mask on larger random symmetric graphs."""
    from elba_tpu.graph.tr import _transitive_mask, _transitive_mask_native
    for trial in range(4):
        n = int(rng.integers(200, 600))
        m = int(rng.integers(4 * n, 10 * n))
        seen = set()
        edges = []
        for _ in range(m):
            i, j = rng.integers(0, n, 2)
            if i == j or (min(i, j), max(i, j)) in seen:
                continue
            seen.add((min(i, j), max(i, j)))
            edges.append((min(i, j), max(i, j), overlap_edge(
                int(rng.integers(0, 1500)), int(rng.integers(0, 1500)),
                int(rng.integers(-1, 4)), int(rng.integers(-1, 4)))))
        S = symmetricize(mk_overlap_matrix(n, edges))
        native = _transitive_mask_native(S)
        assert native is not None
        assert np.array_equal(native, _transitive_mask(S))
