"""Distributed TR marking vs the single-device transitive reduction."""

import numpy as np
import jax
import jax.numpy as jnp

from elba_tpu.graph.tr import symmetricize, transitive_reduction
from elba_tpu.parallel.mesh import make_mesh2d
from elba_tpu.parallel.dist_tr import DistTRConfig, build_distributed_tr_step
from tests.test_graph import mk_overlap_matrix, overlap_edge


def chain_with_shortcuts(n, rng):
    """Linear chain 0-1-2-...-(n-1) with forward overlaps + random 2-hop
    shortcuts (transitive)."""
    edges = []
    for i in range(n - 1):
        edges.append((i, i + 1, overlap_edge(400, 400, 1, 2)))
    shortcuts = []
    for i in range(0, n - 2, 3):
        edges.append((i, i + 2, overlap_edge(800, 800, 1, 2)))
        shortcuts.append((i, i + 2))
    return mk_overlap_matrix(n, edges), shortcuts


def test_dist_tr_marks_match_single_device(rng):
    n = 24
    R, shortcuts = chain_with_shortcuts(n, rng)
    S = symmetricize(R)
    S_reduced = transitive_reduction(R)
    expected_kept = set(zip(S_reduced.rows.tolist(), S_reduced.cols.tolist()))

    ndev = 4
    mesh = make_mesh2d(jax.devices()[:ndev])
    pr, pc = mesh.devices.shape
    nproc = pr * pc
    cap = 64
    cfg = DistTRConfig(n=n, block_cap=cap, join_cap=4096, max_degree=16)

    # distribute S entries to their 2D block owners
    rows_per = -(-n // pr)
    cols_per = -(-n // pc)
    keys = np.full((nproc, cap), 2**62, np.int64)
    dirs = np.full((nproc, cap), -1, np.int8)
    sufs = np.zeros((nproc, cap), np.int32)
    fill = np.zeros(nproc, int)
    for e in range(S.nnz):
        i, j = int(S.rows[e]), int(S.cols[e])
        d = (i // rows_per) * pc + (j // cols_per)
        keys[d, fill[d]] = i * n + j
        dirs[d, fill[d]] = S.vals["direction"][e]
        sufs[d, fill[d]] = S.vals["suffix"][e]
        fill[d] += 1

    step = build_distributed_tr_step(mesh, cfg)
    marks, stats = step(jnp.asarray(keys), jnp.asarray(dirs),
                        jnp.asarray(sufs))
    marks = np.asarray(marks).reshape(nproc, cap)

    # surviving edges = unmarked entries with a direction; symmetricize the
    # marks like the reference (I += I^T) before comparing
    marked_keys = set()
    for d in range(nproc):
        for s in range(cap):
            if keys[d, s] < 2**62 and marks[d, s]:
                i, j = divmod(int(keys[d, s]), n)
                marked_keys.add((i, j))
                marked_keys.add((j, i))
    kept = set()
    for e in range(S.nnz):
        ij = (int(S.rows[e]), int(S.cols[e]))
        if ij not in marked_keys and S.vals["direction"][e] != -1:
            kept.add(ij)

    assert kept == expected_kept
    # sanity: the shortcuts were actually marked
    for (i, j) in shortcuts:
        assert (i, j) not in kept


def _route_blocks(S, mesh, n, cap):
    pr, pc = mesh.devices.shape
    nproc = pr * pc
    rows_per = -(-n // pr)
    cols_per = -(-n // pc)
    keys = np.full((nproc, cap), 2**62, np.int64)
    dirs = np.full((nproc, cap), -1, np.int8)
    sufs = np.zeros((nproc, cap), np.int32)
    fill = np.zeros(nproc, int)
    for e in range(S.nnz):
        i, j = int(S.rows[e]), int(S.cols[e])
        d = (i // rows_per) * pc + (j // cols_per)
        keys[d, fill[d]] = i * n + j
        dirs[d, fill[d]] = S.vals["direction"][e]
        sufs[d, fill[d]] = S.vals["suffix"][e]
        fill[d] += 1
    return keys, dirs, sufs


def test_dist_tr_join_overflow_reported(rng):
    """Panel partners beyond the static max_degree bound must be COUNTED
    (join_overflow stat), never silently dropped."""
    n = 12
    # star: vertex 0 overlaps every other vertex -> middle-vertex degree 11
    edges = [(0, j, overlap_edge(400, 400, 1, 2)) for j in range(1, n)]
    S = symmetricize(mk_overlap_matrix(n, edges))
    mesh = make_mesh2d(jax.devices()[:4])
    keys, dirs, sufs = _route_blocks(S, mesh, n, cap=32)

    small = build_distributed_tr_step(
        mesh, DistTRConfig(n=n, block_cap=32, join_cap=4096, max_degree=4))
    _, stats = small(jnp.asarray(keys), jnp.asarray(dirs), jnp.asarray(sufs))
    assert int(stats["join_overflow"]) > 0

    big = build_distributed_tr_step(
        mesh, DistTRConfig(n=n, block_cap=32, join_cap=4096, max_degree=16))
    _, stats2 = big(jnp.asarray(keys), jnp.asarray(dirs), jnp.asarray(sufs))
    assert int(stats2["join_overflow"]) == 0


def test_dist_tr_random_graphs_match_single_device(rng):
    """Random overlap graphs, several trials: the distributed marking +
    mark symmetricization must keep exactly the host TR's edge set."""
    mesh = make_mesh2d(jax.devices()[:8])
    for trial in range(4):
        n = int(rng.integers(12, 40))
        m = int(rng.integers(n, 3 * n))
        edges = []
        seen = set()
        for _ in range(m):
            i, j = sorted(rng.integers(0, n, 2).tolist())
            if i == j or (i, j) in seen:
                continue
            seen.add((i, j))
            d = int(rng.integers(0, 4))
            dT = int(rng.integers(0, 4))
            edges.append((i, j, overlap_edge(int(rng.integers(50, 2000)),
                                             int(rng.integers(50, 2000)),
                                             d, dT)))
        if not edges:
            continue
        R = mk_overlap_matrix(n, edges)
        S = symmetricize(R)
        expected = transitive_reduction(R)
        expected_kept = set(zip(expected.rows.tolist(),
                                expected.cols.tolist()))

        cap = 256
        keys, dirs, sufs = _route_blocks(S, mesh, n, cap)
        step = build_distributed_tr_step(
            mesh, DistTRConfig(n=n, block_cap=cap, join_cap=0,
                               max_degree=64))
        marks, stats = step(jnp.asarray(keys), jnp.asarray(dirs),
                            jnp.asarray(sufs))
        assert int(stats["join_overflow"]) == 0
        marks = np.asarray(marks).reshape(keys.shape)

        marked = set()
        for d in range(keys.shape[0]):
            for s in range(cap):
                if keys[d, s] < 2**62 and marks[d, s]:
                    i, j = divmod(int(keys[d, s]), n)
                    marked.add((i, j))
                    marked.add((j, i))
        kept = set()
        for e in range(S.nnz):
            ij = (int(S.rows[e]), int(S.cols[e]))
            if ij not in marked and S.vals["direction"][e] != -1:
                kept.add(ij)
        assert kept == expected_kept, trial


def test_distributed_cc_matches_single_device(rng):
    import jax
    from elba_tpu.parallel.mesh import make_mesh2d
    from elba_tpu.parallel.dist_cc import distributed_cc
    from elba_tpu.graph.cc import connected_components

    mesh = make_mesh2d(jax.devices()[:8])
    for trial in range(3):
        n = int(rng.integers(20, 120))
        m = int(rng.integers(10, 200))
        rows = rng.integers(0, n, m)
        cols = rng.integers(0, n, m)
        a1, c1 = connected_components(rows, cols, n)
        a2, c2 = distributed_cc(mesh, n, rows, cols)
        assert c1 == c2
        assert np.array_equal(a1, a2)


def test_distributed_cc_long_chain(rng):
    """Chains need the pointer-jumping path to converge quickly."""
    import jax
    from elba_tpu.parallel.mesh import make_mesh2d
    from elba_tpu.parallel.dist_cc import distributed_cc
    from elba_tpu.graph.cc import connected_components

    mesh = make_mesh2d(jax.devices()[:4])
    n = 300
    rows = np.arange(n - 1)
    cols = np.arange(1, n)
    a1, c1 = connected_components(rows, cols, n)
    a2, c2 = distributed_cc(mesh, n, rows, cols)
    assert c2 == 1 and np.array_equal(a1, a2)
