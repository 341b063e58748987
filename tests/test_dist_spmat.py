"""DistSpMat (general 2D-sharded semiring matrix) vs host oracles.

Every operation is checked against a brute-force numpy oracle on random
sparse matrices, on 1-, 4- and 8-device meshes (the golden property:
same result at any mesh shape — CombBLAS SpParMat's contract)."""

import numpy as np
import jax

from elba_tpu.parallel.mesh import make_mesh2d
from elba_tpu.dsparse.dist_spmat import ARITH, DistSpMat, Semiring


def mesh_of(ndev):
    return make_mesh2d(jax.devices()[:ndev])


def rand_coo(rng, n, m, nnz, vmax=9):
    keys = rng.choice(n * m, size=min(nnz, n * m), replace=False)
    rows, cols = keys // m, keys % m
    vals = rng.integers(1, vmax + 1, len(keys)).astype(np.int64)
    return rows.astype(np.int64), cols.astype(np.int64), vals


def host_spgemm(n, km, m, A, B, mul, add_ops):
    """Brute-force semiring product; products per output in ascending
    middle-index order (the canonical order DistSpMat guarantees)."""
    from collections import defaultdict
    bmap = defaultdict(list)
    for (k, j, vb) in zip(*B):
        bmap[k].append((j, vb))
    prods = defaultdict(list)
    for (r, k, va) in zip(*A):
        for (j, vb) in bmap.get(k, []):
            prods[(r, j)].append((k, mul(va, vb)))
    out = {}
    for key, plist in prods.items():
        plist.sort()
        vals = [v for _, v in plist]
        red = {}
        for f, op in add_ops.items():
            fv = [v[f] for v in vals]
            red[f] = {"sum": sum, "min": min, "max": max,
                      "first": lambda x: x[0],
                      "last": lambda x: x[-1]}[op](fv)
        out[key] = red
    return out


def check_triples(M, expect):
    """expect: dict (r, c) -> {field: val}"""
    r, c, vals = M.to_triples()
    assert len(r) == len(expect), (len(r), len(expect))
    for i in range(len(r)):
        key = (int(r[i]), int(c[i]))
        assert key in expect
        for f, v in expect[key].items():
            assert int(vals[f][i]) == v, (key, f, int(vals[f][i]), v)


def test_roundtrip_and_nnz(rng):
    n, m = 50, 70
    rows, cols, vals = rand_coo(rng, n, m, 200)
    for ndev in (1, 4, 8):
        M = DistSpMat.from_triples(mesh_of(ndev), n, m, rows, cols,
                                   {"v": vals})
        assert M.nnz == len(rows)
        r2, c2, v2 = M.to_triples()
        order = np.argsort(rows * m + cols)
        np.testing.assert_array_equal(r2, rows[order])
        np.testing.assert_array_equal(c2, cols[order])
        np.testing.assert_array_equal(v2["v"], vals[order])


def test_transpose(rng):
    n, m = 40, 64
    rows, cols, vals = rand_coo(rng, n, m, 150)
    for ndev in (4, 8):
        M = DistSpMat.from_triples(mesh_of(ndev), n, m, rows, cols,
                                   {"v": vals})
        T, stats = M.transpose()
        assert stats["dropped"] == 0
        assert (T.n, T.m) == (m, n)
        r2, c2, v2 = T.to_triples()
        order = np.argsort(cols * n + rows)
        np.testing.assert_array_equal(r2, cols[order])
        np.testing.assert_array_equal(c2, rows[order])
        np.testing.assert_array_equal(v2["v"], vals[order])


def test_spgemm_arith(rng):
    n, km, m = 30, 40, 35
    A = rand_coo(rng, n, km, 150, vmax=5)
    B = rand_coo(rng, km, m, 150, vmax=5)
    expect = host_spgemm(n, km, m, A, B,
                         lambda a, b: {"v": a * b}, {"v": "sum"})
    for ndev in (1, 4, 8):
        mesh = mesh_of(ndev)
        MA = DistSpMat.from_triples(mesh, n, km, A[0], A[1], {"v": A[2]})
        MB = DistSpMat.from_triples(mesh, km, m, B[0], B[1], {"v": B[2]})
        C, stats = MA.spgemm(MB, ARITH, out_cap=1024)
        assert stats["join_overflow"] == 0
        assert stats["out_overflow"] == 0
        check_triples(C, expect)


MINPLUS = Semiring(mul=lambda a, b: {"v": a["v"] + b["v"]},
                   add={"v": "min"}, zero={"v": 0})

# SharedSeeds shape: count sum, first seed, last seed (canonical
# middle-ascending product order)
SHSEED = Semiring(
    mul=lambda a, b: {"w": a["v"] * 0 + 1, "s0": a["v"] * 1000 + b["v"],
                      "s1": a["v"] * 1000 + b["v"]},
    add={"w": "sum", "s0": "first", "s1": "last"},
    zero={"w": 0, "s0": 0, "s1": 0})


def test_spgemm_minplus(rng):
    n, km, m = 25, 30, 25
    A = rand_coo(rng, n, km, 120, vmax=20)
    B = rand_coo(rng, km, m, 120, vmax=20)
    expect = host_spgemm(n, km, m, A, B,
                         lambda a, b: {"v": a + b}, {"v": "min"})
    for ndev in (4, 8):
        mesh = mesh_of(ndev)
        MA = DistSpMat.from_triples(mesh, n, km, A[0], A[1], {"v": A[2]})
        MB = DistSpMat.from_triples(mesh, km, m, B[0], B[1], {"v": B[2]})
        C, stats = MA.spgemm(MB, MINPLUS, out_cap=1024)
        assert stats["out_overflow"] == 0
        check_triples(C, expect)


def test_spgemm_first_last_deterministic(rng):
    """first/last adds must be mesh-invariant (canonical product order)."""
    n = 20
    A = rand_coo(rng, n, n, 100, vmax=9)
    expect = host_spgemm(
        n, n, n, A, A,
        lambda a, b: {"w": 1, "s0": a * 1000 + b, "s1": a * 1000 + b},
        {"w": "sum", "s0": "first", "s1": "last"})
    results = []
    for ndev in (1, 4, 8):
        mesh = mesh_of(ndev)
        M = DistSpMat.from_triples(mesh, n, n, A[0], A[1], {"v": A[2]})
        C, _ = M.spgemm(M, SHSEED, out_cap=2048)
        check_triples(C, expect)
        results.append(C.to_triples())
    for r in results[1:]:
        for f in results[0][2]:
            np.testing.assert_array_equal(results[0][2][f], r[2][f])


def test_spgemm_overflow_reported(rng):
    n = 16
    # dense column k=0: every row has (r, 0), so row 0 of B=A.A^T^... use
    # A (n x 1 all-ones) times itself transposed: n^2 products, middle
    # degree n > max_degree
    rows = np.arange(n, dtype=np.int64)
    cols = np.zeros(n, np.int64)
    vals = np.ones(n, np.int64)
    mesh = mesh_of(4)
    MA = DistSpMat.from_triples(mesh, n, 1, rows, cols, {"v": vals})
    MB, _ = MA.transpose()
    # product capacity is panel_slots * max_degree (average-degree
    # multiplier); the dense middle column yields 64 products/device
    # against a 16-slot panel, so max_degree=1 must report overflow
    C, stats = MA.spgemm(MB, ARITH, out_cap=1024, max_degree=1)
    assert stats["join_overflow"] > 0
    # out_cap too small must be reported, never silent
    C2, stats2 = MA.spgemm(MB, ARITH, out_cap=8, max_degree=32)
    assert stats2["out_overflow"] > 0


def test_ewise_and_prune(rng):
    n, m = 30, 30
    rows, cols, vals = rand_coo(rng, n, m, 120)
    r2, c2, v2 = rand_coo(rng, n, m, 120)
    mesh = mesh_of(8)
    MA = DistSpMat.from_triples(mesh, n, m, rows, cols, {"v": vals})
    MB = DistSpMat.from_triples(mesh, n, m, r2, c2, {"v": v2})

    ka = {(int(r), int(c)): int(v) for r, c, v in zip(rows, cols, vals)}
    kb = {(int(r), int(c)): int(v) for r, c, v in zip(r2, c2, v2)}

    # intersection with product values
    C = MA.ewise_mult(MB, lambda a, b: {"v": a["v"] * b["v"]})
    expect = {k: {"v": ka[k] * kb[k]} for k in ka.keys() & kb.keys()}
    check_triples(C, expect)

    # negated mask: A entries NOT in B
    D = MA.ewise_mult(MB, lambda a, b: a, negate=True)
    expect = {k: {"v": ka[k]} for k in ka.keys() - kb.keys()}
    check_triples(D, expect)

    # prune by predicate
    P = MA.prune(lambda v: v["v"] > 5)
    expect = {k: {"v": v} for k, v in ka.items() if v <= 5}
    check_triples(P, expect)


def test_reduce_rows(rng):
    n, m = 40, 30
    rows, cols, vals = rand_coo(rng, n, m, 150)
    dense = np.zeros(n, np.int64)
    np.add.at(dense, rows, vals)
    mx = np.full(n, np.iinfo(np.int64).min)
    np.maximum.at(mx, rows, vals)
    for ndev in (4, 8):
        M = DistSpMat.from_triples(mesh_of(ndev), n, m, rows, cols,
                                   {"v": vals})
        np.testing.assert_array_equal(M.reduce_rows("v", "sum"), dense)
        got = M.reduce_rows("v", "max")
        np.testing.assert_array_equal(got[dense > 0], mx[dense > 0])


def test_apply(rng):
    n = 20
    rows, cols, vals = rand_coo(rng, n, n, 60)
    M = DistSpMat.from_triples(mesh_of(4), n, n, rows, cols, {"v": vals})
    M2 = M.apply(lambda v: {"v": v["v"] * 10})
    _, _, v2 = M2.to_triples()
    order = np.argsort(rows * n + cols)
    np.testing.assert_array_equal(v2["v"], vals[order] * 10)
