#!/usr/bin/env python
"""Offline string-graph cleaning: tips, bubbles, bridges, stars.

Role-parity with the reference's asmtools graph-cleaning scripts
(/root/reference/asmtools/remove_tips.py, find_bubbles.py,
bubble_identification.py, bridge_removal.py, star_resolution.py), which
operate on GML exports of the string graph with igraph.  This tool works
directly on the PAF files the pipeline already writes ({prefix}.string.paf
and optionally {prefix}.overlap.paf for star resolution), with no igraph
dependency, and can emit a cleaned PAF for re-chaining with
tools/paf_graph.py.

Semantics (undirected view; the reference's GML graphs are symmetrized
digraphs, so in-degree == undirected degree):

  * tips (remove_tips.py:16-20): delete every edge joining a degree-1
    vertex to a degree>=3 branch vertex.
  * bubbles (find_bubbles.py:20-79): for every linear chain (interior
    all degree-2) of <= maxlen vertices between two branch vertices, if
    an alternate path of <= maxlen hops connects the chain's endpoints
    while avoiding its interior, the interior vertices are bubble
    vertices; all their edges are deleted.  bubble_identification.py's
    convergent-walk-pair report is subsumed (pairs of chains between the
    same endpoints are exactly bubbles whose alternate path is another
    chain) and reported separately as `bubble_pairs`.
  * bridges (bridge_removal.py:38-64): a bridge is a degree-2 vertex
    adjacent to two distinct branch vertices each of whose outgoing
    walks include >= 2 walks of length >= walklen; its two edges are
    deleted (it "bridges" two otherwise-solid linear stretches).
  * stars (star_resolution.py:17-52): a star is a degree-3 vertex whose
    three neighbours all have degree 2; if the OVERLAP graph contains
    exactly 2 edges among those neighbours, the neighbour not covered by
    them is the spurious arm and the star centre's edges are deleted.

Usage:
  python tools/graph_clean.py elba.string.paf [--overlap elba.overlap.paf]
      [--maxlen 20] [--walklen 5] [--out cleaned.string.paf] [--iterate]
"""

import argparse
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.paf_graph import load_paf  # noqa: E402


class PafGraph:
    """Undirected simple graph over read names, tracking the PAF lines
    that realize each edge so cleaned graphs can be re-emitted."""

    def __init__(self, edges):
        self.adj = defaultdict(set)
        self.lines = defaultdict(list)
        for i, e in enumerate(edges):
            q, t = e["q"], e["t"]
            if q == t:
                continue
            self.adj[q].add(t)
            self.adj[t].add(q)
            self.lines[frozenset((q, t))].append(i)
        self.edges = edges

    def degree(self, v):
        return len(self.adj[v])

    def remove_edge(self, u, v):
        self.adj[u].discard(v)
        self.adj[v].discard(u)
        self.lines.pop(frozenset((u, v)), None)

    def remove_vertex_edges(self, v):
        for u in list(self.adj[v]):
            self.remove_edge(u, v)

    def n_edges(self):
        return len(self.lines)

    def live_line_indices(self):
        out = []
        for idxs in self.lines.values():
            out.extend(idxs)
        return sorted(out)


def remove_tips(G):
    """Delete edges between degree-1 roots and degree>=3 branches."""
    cut = []
    for v in list(G.adj):
        if G.degree(v) != 1:
            continue
        (u,) = G.adj[v]
        if G.degree(u) >= 3:
            cut.append((v, u))
    for v, u in cut:
        G.remove_edge(v, u)
    return len(cut)


def _linear_chains(G, maxlen):
    """Chains [branch, d2, d2, ..., end] from each branch vertex through
    each degree-2 neighbour run (find_bubbles.py:get_linear_chains)."""
    chains = []
    for b in list(G.adj):
        if G.degree(b) < 3:
            continue
        for h in list(G.adj[b]):
            last, chain, valid = b, [b], True
            cur = h
            while G.degree(cur) == 2:
                if len(chain) >= maxlen - 1:
                    valid = False
                    break
                chain.append(cur)
                u, v = G.adj[cur]
                nxt = u if u != last else v
                last = chain[-1]
                cur = nxt
            chain.append(cur)
            if valid:
                chains.append(chain)
    return chains


def _alternate_path(G, s, t, avoid, maxlen):
    """BFS s->t in <= maxlen hops avoiding `avoid` (find_bubbles.py)."""
    visited = set(avoid)
    visited.add(s)
    frontier = [s]
    for _ in range(maxlen - 1):
        if not frontier:
            return False
        nxt = []
        for u in frontier:
            for v in G.adj[u]:
                if v == t:
                    return True
                if v not in visited:
                    visited.add(v)
                    nxt.append(v)
        frontier = nxt
    return False


def pop_bubbles(G, maxlen):
    """Mark + cut interior vertices of chains with an alternate path.

    Returns (n_bubble_vertices, n_convergent_pairs)."""
    chains = [c for c in _linear_chains(G, maxlen) if len(c) > 2]
    # convergent-pair report (bubble_identification.py:identify_bubbles)
    by_ends = defaultdict(list)
    for c in chains:
        by_ends[frozenset((c[0], c[-1]))].append(c)
    pairs = sum(1 for cs in by_ends.values() if len(cs) >= 2)

    bubble_vs = set()
    seen_pairs = set()
    for c in chains:
        u, v = c[0], c[-1]
        key = frozenset((u, v))
        if key in seen_pairs:
            continue
        seen_pairs.add(key)
        interior = set(c[1:-1])
        if _alternate_path(G, u, v, interior, maxlen):
            bubble_vs |= interior
    for v in bubble_vs:
        G.remove_vertex_edges(v)
    return len(bubble_vs), pairs


def remove_bridges(G, walklen):
    """Cut isolated bridge vertices (bridge_removal.py)."""
    # bridges: vertices adjacent to >= 2 distinct degree-3 vertices
    succ_of_triples = defaultdict(int)
    for v in list(G.adj):
        if G.degree(v) == 3:
            for u in G.adj[v]:
                succ_of_triples[u] += 1
    bridges = [v for v, k in succ_of_triples.items() if k >= 2]

    def solid(branch):
        if G.degree(branch) < 3:
            return False
        cnt = 0
        for h in G.adj[branch]:
            last, cur, n = branch, h, 0
            while G.degree(cur) == 2 and n < walklen:
                n += 1
                u, v = G.adj[cur]
                cur, last = (u if u != last else v), cur
            if n >= walklen:
                cnt += 1
        return cnt >= 2

    cut = []
    for b in bridges:
        if G.degree(b) != 2:
            continue
        u, v = G.adj[b]
        if solid(u) and solid(v):
            cut.append(b)
    for b in cut:
        G.remove_vertex_edges(b)
    return len(cut)


def resolve_stars(G, R):
    """Cut spurious star arms using the overlap graph R
    (star_resolution.py).

    The reference's igraph overlap graph is a symmetrized digraph, so
    its `len(star_arcs) == 2` test means exactly ONE overlap pair among
    the star's three neighbours; the neighbour outside that pair is the
    spurious arm (star_vert) and ITS edges are deleted."""
    stars = [v for v in list(G.adj)
             if G.degree(v) == 3
             and all(G.degree(u) == 2 for u in G.adj[v])]
    cut = []
    for s in stars:
        neighs = set(G.adj[s])
        within = {frozenset((a, b)) for a in neighs for b in R.adj[a]
                  if b in neighs and a < b}
        if len(within) == 1:
            covered = set(next(iter(within)))
            spur = neighs - covered
            if len(spur) == 1:
                cut.append(spur.pop())
    for v in cut:
        G.remove_vertex_edges(v)
    return len(cut)


def clean(string_edges, overlap_edges=None, maxlen=20, walklen=5,
          iterate=False):
    """Run the full cleaning ladder; returns (graph, stats)."""
    G = PafGraph(string_edges)
    R = PafGraph(overlap_edges) if overlap_edges is not None else None
    stats = defaultdict(int)
    stats["edges_in"] = G.n_edges()
    while True:
        before = G.n_edges()
        stats["tips"] += remove_tips(G)
        nb, npairs = pop_bubbles(G, maxlen)
        stats["bubble_vertices"] += nb
        stats["bubble_pairs"] += npairs
        stats["bridges"] += remove_bridges(G, walklen)
        if R is not None:
            stats["stars"] += resolve_stars(G, R)
        if not iterate or G.n_edges() == before:
            break
    stats["edges_out"] = G.n_edges()
    return G, dict(stats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("string_paf")
    ap.add_argument("--overlap", help="overlap PAF for star resolution")
    ap.add_argument("--maxlen", type=int, default=20,
                    help="max bubble chain length (vertices)")
    ap.add_argument("--walklen", type=int, default=5,
                    help="min solid walk length for bridge removal")
    ap.add_argument("--out", help="write the cleaned string PAF here")
    ap.add_argument("--iterate", action="store_true",
                    help="repeat the ladder until no edge is removed")
    args = ap.parse_args()

    string_edges = load_paf(args.string_paf)
    overlap_edges = load_paf(args.overlap) if args.overlap else None
    G, stats = clean(string_edges, overlap_edges, args.maxlen,
                     args.walklen, args.iterate)
    for k, v in stats.items():
        print(f"{k}\t{v}")

    if args.out:
        keep = set(G.live_line_indices())
        with open(args.string_paf) as f, open(args.out, "w") as out:
            li = 0
            for line in f:
                if len(line.rstrip("\n").split("\t")) < 13:
                    continue
                if li in keep:
                    out.write(line)
                li += 1
        print(f"wrote\t{args.out}")


if __name__ == "__main__":
    main()
