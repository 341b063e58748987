#!/usr/bin/env python
"""Seed-matrix semantic checker (the reference's test.py): read a B.mtx
dump (non-brief form with seed pairs) plus the FASTA and verify that for
every stored seed pair the k-mer at begQ equals the k-mer at begT or its
reverse complement -- i.e., the SpGEMM produced genuine shared seeds.

Usage: python tools/check_seeds.py reads.fa B.mtx k
"""

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from elba_tpu.dseq.dna import load_fasta  # noqa: E402


def main(fasta, mtx, k):
    rs = load_fasta(fasta)
    checked = bad = 0
    with open(mtx) as f:
        header = f.readline()
        dims = f.readline()
        for line in f:
            m = re.match(r"(\d+) (\d+) \{\((\d+),(\d+)\)", line)
            if not m:
                continue
            i, j, pq, pt = (int(x) for x in m.groups())
            q = rs.read_codes(i - 1)
            t = rs.read_codes(j - 1)
            kq = q[pq:pq + k]
            kt = t[pt:pt + k]
            ktrc = (3 - kt[::-1]).astype(kt.dtype)
            if not (np.array_equal(kq, kt) or np.array_equal(kq, ktrc)):
                bad += 1
                if bad < 10:
                    print(f"BAD seed at ({i},{j}): posQ={pq} posT={pt}")
            checked += 1
    print(f"checked {checked} seeds, {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], int(sys.argv[3])))
