"""Device-resident fused X-drop driver (interpret mode on CPU) vs oracle.

Same exactness bar as test_xdrop_pallas.py but through the single-dispatch
driver (align/xdrop_device.py): flat-code gather window building, in-jit
geometry/seed math, device-side continuation rounds.
"""

import numpy as np

from elba_tpu.align.xdrop_device import DeviceAligner
from elba_tpu.align.xdrop_ref import xdrop_align_ref
from elba_tpu.dseq.dna import ReadSet
from tests.conftest import random_dna, mutate
from tests.test_xdrop import find_shared_seed


def make_readset(seqs, start_id=0):
    codes = np.concatenate([np.asarray(s, np.uint8) for s in seqs])
    lengths = np.array([len(s) for s in seqs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    return ReadSet(codes=codes, offsets=offsets, lengths=lengths,
                   names=[f"r{i}" for i in range(len(seqs))],
                   start_id=start_id)


def run_device(cases, k, mat=1, mis=-1, gap=-1, dropoff=15, batch=None,
               start_id=0):
    """cases: list of (q, t, begQ, begT) — each pair becomes two reads."""
    seqs = []
    qi, ti, sq, st = [], [], [], []
    for q, t, b1, b2 in cases:
        qi.append(len(seqs) + start_id)
        seqs.append(q)
        ti.append(len(seqs) + start_id)
        seqs.append(t)
        sq.append(b1)
        st.append(b2)
    rs = make_readset(seqs, start_id)
    al = DeviceAligner(batch=batch or max(4, len(cases)), interpret=True)
    return al(rs, np.array(qi), np.array(ti), np.array(sq, np.int32),
              np.array(st, np.int32), k, mat, mis, gap, dropoff)


def check(cases, k, **kw):
    got = run_device(cases, k, **kw)
    for i, (q, t, b1, b2) in enumerate(cases):
        ref = xdrop_align_ref(q, t, b1, b2, k, kw.get("mat", 1),
                              kw.get("mis", -1), kw.get("gap", -1),
                              kw.get("dropoff", 15))
        for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
            assert int(got[f][i]) == int(ref[f]), (
                i, f, {x: int(got[x][i]) for x in
                       ("score", "begQ", "endQ", "begT", "endT", "rc")}, ref)


def test_basic_cases(rng):
    k = 17
    s = random_dna(rng, 300)
    t = (3 - s[::-1]).astype(np.uint8)
    cases = [
        (s, s, 100, 100),                 # identical
        (s, t, 50, 300 - 50 - k),         # revcomp
        (s, s, 0, 0),                     # rejected zero-zero seed
        (s, s, 295, 100),                 # out-of-bounds seed
    ]
    got = run_device(cases, k)
    assert got["score"][0] == 300
    assert got["score"][2] == -1 and got["score"][3] == -1
    check(cases, k)


def test_random_overlaps(rng):
    k = 17
    genome = random_dna(rng, 1500)
    cases = []
    while len(cases) < 16:
        a = int(rng.integers(0, 600))
        b = int(rng.integers(0, 600))
        la = int(rng.integers(300, 800))
        lb = int(rng.integers(300, 800))
        q = mutate(rng, genome[a:a + la], 0.03, 0.02)
        t = mutate(rng, genome[b:b + lb], 0.03, 0.02)
        if rng.random() < 0.5:
            t = (3 - t[::-1]).astype(np.uint8)
        seed = find_shared_seed(q, t, k)
        if seed is None:
            continue
        cases.append((q, t, seed[0], seed[1]))
    check(cases, k)
    check(cases, k, dropoff=5)
    # small batches exercise the batching loop + deferred fetch
    check(cases, k, batch=5)
    # sharded readsets address reads by global id
    check(cases, k, start_id=1000)


def test_scoring_variants(rng):
    k = 7
    genome = random_dna(rng, 500)
    cases = []
    while len(cases) < 8:
        q = mutate(rng, genome[:300], 0.05, 0.02)
        t = mutate(rng, genome[60:360], 0.05, 0.02)
        seed = find_shared_seed(q, t, k)
        if seed is None:
            continue
        cases.append((q, t, seed[0], seed[1]))
    for mat, mis, gap, x in [(1, -1, -1, 5), (2, -3, -2, 20), (1, -2, -2, 8)]:
        check(cases, k, mat=mat, mis=mis, gap=gap, dropoff=x)


def test_multi_round_continuation(rng):
    """Extensions spanning many QWIN chunks (10kb) must stay exact through
    the in-jit continuation loop."""
    k = 17
    genome = random_dna(rng, 22000)
    q = mutate(rng, genome[0:10000], 0.02, 0.01)
    t = mutate(rng, genome[1000:11000], 0.02, 0.01)
    seed = find_shared_seed(q, t, k)
    if seed is None:
        q = genome[0:10000]
        t = genome[1000:11000]
        seed = (5000, 4000)
    check([(q, t, seed[0], seed[1]),
           (genome[:3000], genome[:3000], 2900, 2900)], k)
