#!/usr/bin/env python
"""Assembly quality evaluation against a reference genome (the QUAST role
of the reference's script/analysis.sh, self-contained: QUAST/minimap2 are
not available in this environment).

Anchors contigs on the reference via exact k-mer matching (both strands)
and reports: contig count, total length, largest contig, N50, and genome
fraction.  A reference span only counts as covered between CONSECUTIVE
sampled anchors whose implied alignment diagonal agrees (tolerance scales
with the gap to absorb indel drift) — a single spurious anchor (repeat
hit, or a hit past a chromosome junction in the concatenated coordinate
space) cannot inflate the fraction.

Usage: python tools/eval_assembly.py contigs.fa genome.fa [k]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from elba_tpu.dseq.dna import ascii_to_codes  # noqa: E402
from elba_tpu.kmers.extract import pack_kmers_ref  # noqa: E402


def read_fasta(path):
    seqs, name = {}, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                name = line[1:].split()[0]
                seqs[name] = []
            elif line:
                seqs[name].append(line)
    return {k: "".join(v) for k, v in seqs.items()}


def n50(lengths):
    s = sorted(lengths, reverse=True)
    half = sum(s) / 2
    acc = 0
    for x in s:
        acc += x
        if acc >= half:
            return x
    return 0


def pack_windows(codes, k, starts):
    """Packed forward k-mers at the given window starts only (the
    evaluator samples ~200 anchors per contig; packing every window of a
    chromosome-size contig costs ~30s per strand for nothing)."""
    idx = starts[:, None] + np.arange(k)[None, :]
    shifts = (2 * (k - 1 - np.arange(k))).astype(np.uint64)
    return np.bitwise_or.reduce(
        codes[idx].astype(np.uint64) << shifts[None, :], axis=1)


def _genome_index(gcodes, k):
    """(sorted k-mer keys, matching first-occurrence-ordered positions).
    Native rolling pack + parallel stable sort when available (~5x the
    numpy pack + stable argsort at 10^8 k-mers); numpy fallback is
    bit-identical."""
    total = len(gcodes) - k + 1
    if total <= 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    from elba_tpu.native.loader import get_lib
    lib = get_lib()
    if lib is not None and k <= 32:
        import ctypes
        keys = np.empty(total, np.uint64)
        pos = np.empty(total, np.int64)
        g = np.ascontiguousarray(gcodes, dtype=np.uint8)
        lib.genome_kmer_index(
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            np.int64(len(g)), np.int64(k),
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return keys, pos
    gk = pack_kmers_ref(gcodes, k)
    order = np.argsort(gk, kind="stable").astype(np.int64)
    return gk[order], order


def evaluate(contigs_path, genome_path, k=31):
    contigs = read_fasta(contigs_path)
    genome = read_fasta(genome_path)
    gcodes = np.concatenate([ascii_to_codes(s) for s in genome.values()])
    glen = len(gcodes)
    # first-occurrence k-mer -> position lookup as a sorted array (a
    # Python dict over a 10^8-k-mer genome costs tens of GB and minutes;
    # stable sort keeps the lowest position first among equal values)
    gk_sorted, order = _genome_index(gcodes, k)

    def lookup(vals):
        """position of each value's first genome occurrence, or -1."""
        if len(gk_sorted) == 0:
            return np.full(len(vals), -1, np.int64)
        idx = np.searchsorted(gk_sorted, vals, side="left")
        idx = np.minimum(idx, len(gk_sorted) - 1)
        hit = gk_sorted[idx] == vals
        return np.where(hit, order[idx], -1)

    covered = np.zeros(glen, dtype=bool)
    anchored = 0
    for name, seq in contigs.items():
        c = ascii_to_codes(seq)
        hits = []
        for strand in range(2):
            cc = c if strand == 0 else (3 - c[::-1]).astype(np.uint8)
            nwin = len(cc) - k + 1
            if nwin <= 0:
                continue
            starts = np.arange(0, nwin, max(1, nwin // 200))
            sample = pack_windows(cc, k, starts)
            gpos = lookup(sample)
            pos = [(int(starts[p]), int(g))
                   for p, g in enumerate(gpos) if g >= 0]
            if len(pos) > len(hits):
                hits = pos
        if hits:
            anchored += 1
            cpos = np.array([c for c, _ in hits], dtype=np.int64)
            gp = np.array([g for _, g in hits], dtype=np.int64)
            o = np.argsort(cpos)
            cpos, gp = cpos[o], gp[o]
            # every anchor covers its own k-mer
            for g in gp:
                covered[max(0, int(g)):min(glen, int(g) + k)] = True
            # the gap between consecutive anchors counts only when their
            # alignment diagonals agree (drift bound: 2% of the contig
            # gap + slack, absorbing indel error without letting one
            # spurious anchor span megabases)
            diag = gp - cpos
            dc = np.diff(cpos)
            ok = np.abs(np.diff(diag)) <= np.maximum(1000,
                                                     dc * 2 // 100 + 64)
            for i in np.flatnonzero(ok):
                lo = max(0, int(min(gp[i], gp[i + 1])))
                hi = min(glen, int(max(gp[i], gp[i + 1])) + k)
                covered[lo:hi] = True

    lens = [len(s) for s in contigs.values()]
    return dict(
        contigs=len(contigs),
        total_len=sum(lens),
        largest=max(lens) if lens else 0,
        n50=n50(lens),
        anchored_contigs=anchored,
        genome_len=glen,
        genome_fraction=round(100.0 * covered.mean(), 2),
    )


if __name__ == "__main__":
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 31
    for key, v in evaluate(sys.argv[1], sys.argv[2], k).items():
        print(f"{key}\t{v}")
