"""Contig generation from the string graph (reference
ContigGeneration.cpp:347-461).

  1. branch removal: vertices with degree > 2 are deleted from a copy of S
  2. connected components on the branchless graph -> read-to-contig map
  3. contigs with >= 2 reads are kept, sorted by size descending
  4. (distributed) contigs are bin-packed onto parts and the induced
     subgraph + read sequences routed to the owner; single-part here,
     multi-part routing lives in elba_tpu.parallel
  5. per contig: walk the chain from a degree-1 root, each read
     contributing a prefix of length suffixT with strand = tail bit of the
     outgoing edge; the final read contributes its whole length with
     strand = 1 - head bit of the last edge.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..dseq.dna import ReadSet
from ..dsparse.coo import COOMatrix
from .cc import connected_components


def read_to_contigs(S: COOMatrix):
    """Branch removal + CC (reference GetRead2Contigs,
    ContigGeneration.cpp:19-54).  Returns (assignments, num_contigs)."""
    n = S.shape[0]
    deg = np.bincount(S.rows, minlength=n)  # S symmetric: row degree
    branches = np.flatnonzero(deg > 2)
    S2 = S.prune_full(branches)
    return connected_components(S2.rows, S2.cols, n)


def contig_sizes(assignments: np.ndarray, num_contigs: int):
    """(contig_id, size) pairs for contigs with >= 2 reads, sorted by size
    descending (ties by contig id, stable -- the reference's std::sort is
    unstable on ties, ContigGeneration.cpp:126)."""
    sizes = np.bincount(assignments, minlength=num_contigs)
    used = np.flatnonzero(sizes >= 2)
    order = np.argsort(-sizes[used], kind="stable")
    return used[order], sizes[used][order]


def generate_contigs(S: COOMatrix, readset: ReadSet) -> List[str]:
    """Single-part contig generation; returns contig sequences."""
    assignments, ncc = read_to_contigs(S)
    return walk_contigs(S, readset, assignments, ncc)


def walk_contigs(S: COOMatrix, readset: ReadSet, assignments: np.ndarray,
                 ncc: int) -> List[str]:
    """Chain walk given a read-to-contig assignment (the serial tail of
    GenerateContigs, ContigGeneration.cpp:396-458).  Split out so the
    distributed pipeline can feed mesh-computed CC labels."""
    used, sizes = contig_sizes(assignments, ncc)
    if len(used) == 0:
        return []

    used_set = np.zeros(ncc + 1, dtype=bool)
    used_set[used] = True
    keep_read = used_set[assignments]

    # local vertex ids: kept reads in ascending global id order
    global_ids = np.flatnonzero(keep_read)
    local_of_global = -np.ones(S.shape[0], dtype=np.int64)
    local_of_global[global_ids] = np.arange(len(global_ids))

    # induced subgraph entries (i, j both kept); adjacency of local column
    # cur = rows of contig_chains = {r : S(cur, r) != 0}
    sel = keep_read[S.rows] & keep_read[S.cols]
    ei = local_of_global[S.rows[sel]]   # edge source (cur)
    ej = local_of_global[S.cols[sel]]   # edge target (neighbor)
    vals = {k: v[sel] for k, v in S.vals.items()}

    nloc = len(global_ids)
    # group edges by source, neighbors ascending (CSC row order)
    order = np.lexsort((ej, ei))
    ei, ej = ei[order], ej[order]
    vals = {k: v[order] for k, v in vals.items()}
    starts = np.searchsorted(ei, np.arange(nloc))
    ends = np.searchsorted(ei, np.arange(nloc) + 1)
    degree = ends - starts

    visited = np.zeros(nloc, dtype=bool)
    used_roots = set()
    contigs: List[str] = []

    seq_cache = {}

    def ascii_of(gid: int) -> str:
        if gid not in seq_cache:
            seq_cache[gid] = readset.read_ascii(gid - readset.start_id)
        return seq_cache[gid]

    for v in range(nloc):
        if degree[v] != 1 or v in used_roots:
            continue
        chain = []  # (global read id, prefix len, strand)
        lastdir = 0
        cur = v
        while True:
            visited[cur] = True
            nxt = starts[cur]
            end = ends[cur]
            while nxt < end and visited[ej[nxt]]:
                nxt += 1
            if nxt >= end:
                break
            direction = int(vals["direction"][nxt])
            strand = (direction >> 1) & 1
            chain.append((int(global_ids[cur]), int(vals["suffixT"][nxt]),
                          bool(strand)))
            lastdir = direction
            cur = int(ej[nxt])

        readlen = len(ascii_of(int(global_ids[cur])))
        chain.append((int(global_ids[cur]), readlen, bool(1 - (lastdir & 1))))

        parts = []
        for gid, prefix, strand in chain:
            s = ascii_of(gid)
            if strand:
                comp = s.translate(str.maketrans("ACGT", "TGCA"))
                s = comp[::-1]
            parts.append(s[:prefix])
        contigs.append("".join(parts))
        used_roots.add(cur)

    return contigs


def greedy_partition_contigs(sizes: np.ndarray, nparts: int) -> np.ndarray:
    """Greedy min-load bin packing of contigs onto parts, in size order
    (reference GetLocalProcAssignments, ContigGeneration.cpp:184-198:
    each contig goes to the currently least-loaded part)."""
    loads = np.zeros(nparts, dtype=np.int64)
    assign = np.zeros(len(sizes), dtype=np.int64)
    for i, s in enumerate(sizes):
        w = int(np.argmin(loads))
        loads[w] += int(s)
        assign[i] = w
    return assign


def generate_contigs_partitioned(S: COOMatrix, readset: ReadSet,
                                 nparts: int) -> List[List[str]]:
    """Multi-part contig generation (reference GenerateContigs with
    InducedSubgraphs2Procs routing, ContigGeneration.cpp:347-461):
    contigs are bin-packed onto parts by size, each part receives its
    contigs' induced subgraph + read sequences and walks its chains
    independently.  Returns per-part contig lists; concatenating them in
    part order reproduces the reference's global output order
    (rank-ordered MPI_File_write_ordered, main.cpp:487-512).

    In the SPMD setting the routing is the all_to_all of
    parallel/dist_overlap (ids/lens/chars exchange); here the partition +
    per-part walks run host-side, which is also how the reference's final
    chain walk works (serial per rank over tiny data)."""
    assignments, ncc = read_to_contigs(S)
    used, sizes = contig_sizes(assignments, ncc)
    if len(used) == 0:
        return [[] for _ in range(nparts)]

    part_of_contig = greedy_partition_contigs(sizes, nparts)
    contig_part = -np.ones(ncc + 1, dtype=np.int64)
    contig_part[used] = part_of_contig
    read_part = contig_part[assignments]

    out = []
    for p in range(nparts):
        keep = read_part == p
        # induced subgraph on this part's reads
        sel = keep[S.rows] & keep[S.cols]
        Sp = S.select(sel)
        # reuse the single-part walker over the full id space; reads of
        # other parts are isolated there and excluded by the >= 2 filter
        out.append(generate_contigs(Sp, readset))
    return out
