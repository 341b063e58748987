#!/usr/bin/env python
"""Synthetic-read oracle (the reference's runs/simfor.py strategy):
generate a random genome and reads with known positions/strands, write
FASTA + .fai, and emit the TRUE overlap set computed from coordinates --
ground truth for overlap recall/precision of the pipeline.

Usage: python tools/simulate.py out_prefix [--genome-len N] [--reads N]
       [--read-len N] [--error RATE] [--seed S]
Writes: {prefix}.fa, {prefix}.fa.fai, {prefix}.truth.tsv (readA readB
overlap_len), {prefix}.genome.fa
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from elba_tpu.dseq.dna import codes_to_ascii  # noqa: E402


def simulate(prefix, genome_len=100000, nreads=200, read_len=8000,
             error=0.0, seed=0, circular=False):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_len, dtype=np.uint8)

    starts = np.sort(rng.integers(0, genome_len - read_len, nreads))
    strands = rng.integers(0, 2, nreads)

    names, seqs = [], []
    for i in range(nreads):
        seg = genome[starts[i]:starts[i] + read_len]
        if error > 0:
            m = rng.random(read_len) < error
            seg = seg.copy()
            seg[m] = (seg[m] + rng.integers(1, 4, int(m.sum()))) % 4
        if strands[i]:
            seg = (3 - seg[::-1]).astype(np.uint8)
        names.append(f"sim{i}_pos{starts[i]}_strand{strands[i]}")
        seqs.append(codes_to_ascii(seg))

    width = 80
    with open(prefix + ".fa", "w") as f, open(prefix + ".fa.fai", "w") as fi:
        pos = 0
        for name, s in zip(names, seqs):
            header = f">{name}\n"
            f.write(header)
            pos += len(header)
            f.write("\n".join(s[j:j + width]
                              for j in range(0, len(s), width)) + "\n")
            nlines = (len(s) + width - 1) // width
            fi.write(f"{name}\t{len(s)}\t{pos}\t{width}\t{width + 1}\n")
            pos += len(s) + nlines

    with open(prefix + ".genome.fa", "w") as f:
        f.write(">genome\n")
        g = codes_to_ascii(genome)
        for j in range(0, len(g), width):
            f.write(g[j:j + width] + "\n")

    with open(prefix + ".truth.tsv", "w") as f:
        f.write("#readA\treadB\toverlap_len\n")
        # starts are sorted and reads share one length, so read i only
        # overlaps the contiguous run of later reads starting before its
        # end -- bound the inner loop with searchsorted instead of
        # scanning all O(n^2) pairs (same lines, same order)
        ends = np.searchsorted(starts, starts + read_len)
        for i in range(nreads):
            si = starts[i]
            for j in range(i + 1, ends[i]):
                f.write(f"{names[i]}\t{names[j]}\t{si + read_len - starts[j]}\n")
    return names, starts, strands


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix")
    ap.add_argument("--genome-len", type=int, default=100000)
    ap.add_argument("--reads", type=int, default=200)
    ap.add_argument("--read-len", type=int, default=8000)
    ap.add_argument("--error", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    simulate(a.prefix, a.genome_len, a.reads, a.read_len, a.error, a.seed)
    print(f"wrote {a.prefix}.fa (+.fai, .truth.tsv, .genome.fa)")
