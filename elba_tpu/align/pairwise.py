"""Pairwise alignment driver: from the seed matrix B to the overlap graph R.

Pair selection: the reference dedupes the symmetric B with a local-upper-
triangle rule that depends on the process grid (PairwiseAlignment.cpp:52).
We instead always align the globally-upper pair (Q = smaller read id),
which coincides with the reference on a single process and makes the
output independent of the mesh shape (a deliberate improvement; load
balance is restored by re-sharding the pair list, not by triangle tricks).

Each pair aligns from SharedSeeds seeds[0] (PairwiseAlignment.cpp:90) and
the result becomes one Overlap nonzero of R (reads x reads, upper
triangle).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..dseq.dna import ReadSet
from ..dsparse.coo import COOMatrix
from ..dsparse.seedmat import SeedMatrix
from .classify import classify_and_fill
from .xdrop_ref import xdrop_align_ref


def _align_batch_ref(readset: ReadSet, qi, ti, seedQ, seedT, k,
                     mat, mis, gap, dropoff):
    n = len(qi)
    out = dict(score=np.empty(n, np.int32), begQ=np.empty(n, np.int32),
               endQ=np.empty(n, np.int32), begT=np.empty(n, np.int32),
               endT=np.empty(n, np.int32), rc=np.empty(n, bool))
    for idx in range(n):
        r = xdrop_align_ref(readset.read_codes(int(qi[idx])),
                            readset.read_codes(int(ti[idx])),
                            int(seedQ[idx]), int(seedT[idx]),
                            k, mat, mis, gap, dropoff)
        for f in out:
            out[f][idx] = r[f]
    return out


def pairwise_alignment(readset: ReadSet, B: SeedMatrix, k: int,
                       mat: int, mis: int, gap: int, dropoff: int,
                       aligner: Optional[Callable] = None) -> COOMatrix:
    """Align every strictly-upper B pair; return R with Overlap values.

    aligner: batch function (readset, qi, ti, seedQ, seedT, k, mat, mis,
    gap, dropoff) -> dict of result arrays; defaults to the batched JAX
    kernel when available, else the numpy oracle.
    """
    m = B.mat
    sel = m.rows < m.cols
    qi = m.rows[sel]
    ti = m.cols[sel]
    seedQ = m.vals["seedQ0"][sel]
    seedT = m.vals["seedT0"][sel]

    if aligner is None:
        import jax
        if jax.default_backend() == "cpu":
            # vmapped while_loop path: fast enough on CPU and avoids
            # Pallas interpret-mode overhead in tests
            from .xdrop_jax import align_batch_jax
            aligner = align_batch_jax
        else:
            # device-resident single-dispatch driver at the transposed
            # narrow geometry (uploads the read set once; band-overflow
            # escalation to the WIDE kernel and then the oracle).  The
            # block-addressed generation is production: identical
            # semantics, no 2^31-byte resident read cap.
            from .xdrop_device_blocks import get_device_aligner_blocks
            aligner = get_device_aligner_blocks()

    res = aligner(readset, qi, ti, seedQ, seedT, k, mat, mis, gap, dropoff)

    lenQ = readset.lengths[qi - readset.start_id].astype(np.int32)
    lenT = readset.lengths[ti - readset.start_id].astype(np.int32)
    vals = classify_and_fill(res["score"], res["begQ"], res["endQ"],
                             res["begT"], res["endT"], res["rc"], lenQ, lenT)
    vals["seedQ"] = seedQ.astype(np.int32)
    vals["seedT"] = seedT.astype(np.int32)
    R = COOMatrix(rows=qi.astype(np.int64), cols=ti.astype(np.int64),
                  vals=vals, shape=m.shape)
    return R.sorted()
