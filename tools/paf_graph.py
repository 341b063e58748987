#!/usr/bin/env python
"""Independent serial string-graph builder and contig chainer over PAF
output (the reference's assembly_graph.py / asmtools/assemble_gml.py
cross-validation path, without the igraph dependency).

Reads a string-graph PAF ({prefix}.string.paf), rebuilds the graph, walks
chains from degree-1 nodes and reports contig count + chain lengths --
an implementation-independent check on the distributed contig generation.

Usage: python tools/paf_graph.py elba.string.paf
"""

import sys
from collections import defaultdict


def load_paf(path):
    edges = []
    with open(path) as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            if len(p) < 13:
                continue
            edges.append(dict(q=p[0], lq=int(p[1]), bq=int(p[2]),
                              eq=int(p[3]), strand=p[4], t=p[5],
                              lt=int(p[6]), bt=int(p[7]), et=int(p[8]),
                              score=int(p[9]), passed=p[12] == "1"))
    return edges


def analyze(path):
    edges = load_paf(path)
    adj = defaultdict(set)
    for e in edges:
        adj[e["q"]].add(e["t"])
        adj[e["t"]].add(e["q"])

    deg = {v: len(n) for v, n in adj.items()}
    branches = {v for v, d in deg.items() if d > 2}
    # remove branches, walk chains
    chains = []
    visited = set(branches)
    for v in sorted(adj):
        if v in visited or deg[v] != 1:
            continue
        chain = [v]
        visited.add(v)
        cur = v
        while True:
            nxt = [u for u in sorted(adj[cur]) if u not in visited]
            if not nxt:
                break
            cur = nxt[0]
            visited.add(cur)
            chain.append(cur)
        chains.append(chain)
    isolated = [v for v in adj if v not in visited and deg[v] == 0]
    return dict(nodes=len(adj), edges=len(edges), branches=len(branches),
                chains=len(chains),
                chain_sizes=sorted((len(c) for c in chains), reverse=True))


if __name__ == "__main__":
    info = analyze(sys.argv[1])
    for k, v in info.items():
        print(f"{k}\t{v}")
