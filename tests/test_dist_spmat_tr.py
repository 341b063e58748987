"""Transitive reduction expressed ON the general DistSpMat algebra.

This is the reference's actual TR structure — an iterated DISTRIBUTED
semiring SpGEMM plus EWise mark/removal steps on the same 2D-sharded
matrix type (TransitiveReduction.cpp:45-80 over CombBLAS SpParMat) —
rebuilt from the reusable facility and checked golden-equal to the host
`transitive_reduction` on random overlap graphs at several mesh shapes.

(The production distributed pipeline keeps the specialized fused program
in parallel/dist_tr.py; this test proves the general algebra expresses
the same computation.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from elba_tpu.dsparse.dist_spmat import DistSpMat, Semiring
from elba_tpu.graph.tr import symmetricize, transitive_reduction
from elba_tpu.params import TR_FUZZ
from elba_tpu.parallel.mesh import make_mesh2d
from tests.test_graph import mk_overlap_matrix, overlap_edge

INF = np.int64(2 ** 61)  # "no path"; far above any suffix sum


def _tr_mul(a, b):
    """Direction-composing min-plus multiply (TransitiveReduction.hpp:78-110):
    valid when both sides have arrows and head(left) != tail(right);
    the product lands in suffix_paths slot 2*tail(left) + head(right)."""
    d1, d2 = a["dir"], b["dir"]
    t1, h1 = (d1 >> 1) & 1, d1 & 1
    t2, h2 = (d2 >> 1) & 1, d2 & 1
    ok = (d1 >= 0) & (d2 >= 0) & (t2 != h1)
    slot = 2 * t1 + h2
    val = a["suf"] + b["suf"]
    return {f"p{s}": jnp.where(ok & (slot == s), val, INF)
            for s in range(4)}


TRSR = Semiring(mul=_tr_mul,
                add={f"p{s}": "min" for s in range(4)},
                zero={f"p{s}": int(INF) for s in range(4)})


def _mark_mul(a, b):
    """GreaterThanSR over F = S + FUZZ vs the path matrix N."""
    path = b["p0"]
    for s in (1, 2, 3):
        path = jnp.where(a["dir"] == s, b[f"p{s}"], path)
    mark = (a["dir"] >= 0) & (a["suf"] + TR_FUZZ >= path)
    return {"dir": a["dir"], "suf": a["suf"], "mark": mark.astype(jnp.int64)}


def tr_on_dist_spmat(S_host, n, mesh, max_degree=64, out_cap=4096):
    """The full TR fixpoint on DistSpMat; returns the kept (i, j) set."""
    dirs = S_host.vals["direction"].astype(np.int64)
    sufs = S_host.vals["suffix"].astype(np.int64)
    S = DistSpMat.from_triples(mesh, n, n, S_host.rows, S_host.cols,
                               {"dir": dirs, "suf": sufs}, cap=out_cap)
    P = S
    removed = S.apply(lambda v: dict(v))  # running S with marks removed
    total_marked = 0
    for _ in range(8):  # host loop w/ convergence vote, reference :45-80
        N, stats = P.spgemm(S, TRSR, out_cap=out_cap,
                            max_degree=max_degree)
        assert stats["join_overflow"] == 0, stats
        assert stats["out_overflow"] == 0, stats
        M = removed.ewise_mult(N, _mark_mul)
        marks = M.prune(lambda v: v["mark"] == 0)
        nmarks = marks.nnz
        if nmarks == 0:
            break
        # symmetricize the marks (I += I^T, reference :69-74), then remove
        marks_t, tstats = marks.transpose(out_cap=out_cap)
        assert tstats["dropped"] == 0
        removed = removed.ewise_mult(marks, lambda a, b: a, negate=True)
        removed = removed.ewise_mult(marks_t, lambda a, b: a, negate=True)
        total_marked += nmarks
        # P = N with direction -1: the next round's products are all
        # invalid, so the loop converges exactly like the reference
        # (MinPlusSR.multiply guard, TransitiveReduction.hpp:95)
        P = N.apply(lambda v: {"dir": v["p0"] * 0 - 1, "suf": v["p0"] * 0})
    final = removed.prune(lambda v: v["dir"] < 0)
    r, c, _ = final.to_triples()
    return set(zip(r.tolist(), c.tolist()))


def random_overlap_graph(rng):
    n = int(rng.integers(12, 40))
    m = int(rng.integers(n, 3 * n))
    edges, seen = [], set()
    for _ in range(m):
        i, j = sorted(rng.integers(0, n, 2).tolist())
        if i == j or (i, j) in seen:
            continue
        seen.add((i, j))
        edges.append((i, j, overlap_edge(int(rng.integers(50, 2000)),
                                         int(rng.integers(50, 2000)),
                                         int(rng.integers(0, 4)),
                                         int(rng.integers(0, 4)))))
    return n, edges


def test_tr_on_general_algebra_matches_host(rng):
    for trial in range(4):
        n, edges = random_overlap_graph(rng)
        if not edges:
            continue
        R = mk_overlap_matrix(n, edges)
        S = symmetricize(R)
        expected = transitive_reduction(R)
        expected_kept = set(zip(expected.rows.tolist(),
                                expected.cols.tolist()))
        for ndev in (4, 8):
            mesh = make_mesh2d(jax.devices()[:ndev])
            kept = tr_on_dist_spmat(S, n, mesh)
            assert kept == expected_kept, (trial, ndev)


def test_tr_chain_with_shortcut(rng):
    """Deterministic sanity: a 2-hop shortcut over a chain is removed."""
    n = 8
    edges = [(i, i + 1, overlap_edge(400, 400, 1, 2))
             for i in range(n - 1)]
    edges.append((0, 2, overlap_edge(800, 800, 1, 2)))
    R = mk_overlap_matrix(n, edges)
    S = symmetricize(R)
    expected = transitive_reduction(R)
    expected_kept = set(zip(expected.rows.tolist(),
                            expected.cols.tolist()))
    assert (0, 2) not in expected_kept  # the shortcut is transitive
    mesh = make_mesh2d(jax.devices()[:4])
    kept = tr_on_dist_spmat(S, n, mesh)
    assert kept == expected_kept
