"""Offline graph-cleaning ladder (tools/graph_clean.py) vs constructed
graphs with known tips / bubbles / bridges / stars (role parity with
/root/reference/asmtools/{remove_tips,find_bubbles,bridge_removal,
star_resolution}.py)."""

import sys

sys.path.insert(0, "/root/repo")

from tools.graph_clean import (PafGraph, clean, pop_bubbles,
                               remove_bridges, remove_tips, resolve_stars)


def E(*pairs):
    return [dict(q=a, t=b) for a, b in pairs]


def test_remove_tips():
    # chain 1-2-3-B, tip T hanging off branch B (B also starts 4-5)
    edges = E(("1", "2"), ("2", "3"), ("3", "B"), ("B", "T"),
              ("B", "4"), ("4", "5"))
    G = PafGraph(edges)
    assert remove_tips(G) == 1
    assert G.degree("T") == 0
    # the long chain ends are degree-1 but attach to degree-2: kept
    assert G.degree("1") == 1 and G.degree("5") == 1


def test_pop_bubbles():
    # two parallel chains u-a-b-v and u-c-v between branches u, v;
    # side arms give u and v degree >= 3
    edges = E(("u", "a"), ("a", "b"), ("b", "v"),
              ("u", "c"), ("c", "v"),
              ("u", "x1"), ("x1", "x2"), ("v", "y1"), ("y1", "y2"))
    G = PafGraph(edges)
    nb, pairs = pop_bubbles(G, maxlen=20)
    assert pairs == 1
    assert nb >= 1  # one side's interior cut
    # endpoints keep their side arms
    assert "x1" in G.adj["u"] and "y1" in G.adj["v"]
    # exactly one of the two parallel paths survives
    thru_ab = "a" in G.adj["u"] and "b" in G.adj["a"] and "v" in G.adj["b"]
    thru_c = "c" in G.adj["u"] and "v" in G.adj["c"]
    assert thru_ab != thru_c


def test_remove_bridges():
    # two branch vertices p, q joined by bridge m (degree 2); each branch
    # has two solid walks of length >= 2 plus the bridge arm
    edges = E(("p", "m"), ("q", "m"),
              ("p", "a1"), ("a1", "a2"), ("a2", "a3"),
              ("p", "b1"), ("b1", "b2"), ("b2", "b3"),
              ("q", "c1"), ("c1", "c2"), ("c2", "c3"),
              ("q", "d1"), ("d1", "d2"), ("d2", "d3"))
    G = PafGraph(edges)
    assert remove_bridges(G, walklen=2) == 1
    assert G.degree("m") == 0
    assert G.degree("p") == 2 and G.degree("q") == 2


def test_resolve_stars_spur_cut():
    # star centre s with three degree-2 neighbours n1,n2,n3; overlap
    # evidence joins only n1-n2 among them -> n3 is the spurious arm
    # and loses its edges (reference: star_vert's edges deleted)
    edges = E(("s", "n1"), ("s", "n2"), ("s", "n3"),
              ("n1", "o1"), ("n2", "o2"), ("n3", "o3"))
    G = PafGraph(edges)
    R = PafGraph(E(("n1", "n2"),
                   ("n1", "z"), ("n2", "z2"), ("n3", "z3")))
    assert resolve_stars(G, R) == 1
    assert G.degree("n3") == 0
    assert "n1" in G.adj["s"] and "n2" in G.adj["s"]


def test_resolve_stars_no_or_full_evidence_keeps():
    edges = E(("s", "n1"), ("s", "n2"), ("s", "n3"),
              ("n1", "o1"), ("n2", "o2"), ("n3", "o3"))
    # no overlap evidence among the arms: ambiguous, keep
    G = PafGraph(edges)
    R = PafGraph(E(("n1", "z"), ("n2", "z2"), ("n3", "z3")))
    assert resolve_stars(G, R) == 0
    assert G.degree("s") == 3
    # all three arms mutually supported: keep too
    G2 = PafGraph(edges)
    R2 = PafGraph(E(("n1", "n2"), ("n2", "n3"), ("n1", "n3")))
    assert resolve_stars(G2, R2) == 0
    assert G2.degree("s") == 3


def test_clean_ladder_end_to_end():
    edges = E(
        # main chain with a tip at branch B
        ("1", "2"), ("2", "3"), ("3", "B"), ("B", "T"), ("B", "4"),
        ("4", "5"), ("5", "u"),
        # bubble between u and v
        ("u", "a"), ("a", "b"), ("b", "v"), ("u", "c"), ("c", "v"),
        ("v", "6"), ("6", "7"),
    )
    G, stats = clean(edges, maxlen=20, walklen=2, iterate=True)
    assert stats["tips"] == 1
    assert stats["bubble_pairs"] == 1
    assert stats["edges_out"] < stats["edges_in"]
    # remaining graph is a single linear chain: every vertex deg <= 2
    assert all(len(n) <= 2 for n in G.adj.values())
