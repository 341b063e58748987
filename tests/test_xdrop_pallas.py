"""Pallas fused X-drop kernel (interpret mode on CPU) vs the numpy oracle."""

import numpy as np
import pytest

from elba_tpu.align.xdrop_ref import xdrop_align_ref
from elba_tpu.align.xdrop_pallas import xdrop_pairs_pallas
from tests.conftest import random_dna, mutate
from tests.test_xdrop import find_shared_seed


def run_pallas(cases, k, mat=1, mis=-1, gap=-1, dropoff=15):
    """cases: list of (q, t, begQ, begT). Runs them as one batch."""
    P = len(cases)
    L = max(max(len(q), len(t)) for q, t, _, _ in cases)
    q = np.zeros((P, L), np.int8)
    t = np.zeros((P, L), np.int8)
    lq = np.zeros(P, np.int32)
    lt = np.zeros(P, np.int32)
    bq = np.zeros(P, np.int32)
    bt = np.zeros(P, np.int32)
    for i, (qq, tt, b1, b2) in enumerate(cases):
        q[i, :len(qq)] = qq
        t[i, :len(tt)] = tt
        lq[i], lt[i], bq[i], bt[i] = len(qq), len(tt), b1, b2
    return xdrop_pairs_pallas(q, t, lq, lt, bq, bt, k, mat, mis, gap,
                              dropoff, interpret=True)


def check_against_oracle(cases, k, **kw):
    got = run_pallas(cases, k, **kw)
    assert not got["overflow"].any()
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
    got = run_pallas(cases, k)
    assert got["score"][0] == 300
    assert got["score"][2] == -1 and got["score"][3] == -1
    check_against_oracle(cases, k)


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
    check_against_oracle(cases, k)
    check_against_oracle(cases, k, dropoff=5)


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
        check_against_oracle(cases, k, mat=mat, mis=mis, gap=gap, dropoff=x)


def test_odd_batch_padding(rng):
    # batch not a multiple of SUB (pads internally)
    k = 17
    s = random_dna(rng, 400)
    cases = [(s, s, 100, 100), (s, s, 10, 10), (s, s, 383, 383)]
    check_against_oracle(cases, k)


def test_ring_wraparound_long_extension(rng):
    """Extensions longer than the ring (1024 cols) must stay exact."""
    k = 17
    genome = random_dna(rng, 6000)
    q = mutate(rng, genome[0:3000], 0.02, 0.01)
    t = mutate(rng, genome[500:3500], 0.02, 0.01)
    seed = find_shared_seed(q, t, k)
    if seed is None:
        q = genome[0:3000]
        t = genome[500:3500]
        seed = (1500, 1000)
    check_against_oracle([(q, t, seed[0], seed[1]),
                          (genome[:3000], genome[:3000], 2900, 2900)], k)


def test_multi_round_continuation(rng):
    """Extensions spanning many QWIN chunks (10kb) must stay exact."""
    k = 17
    genome = random_dna(rng, 22000)
    q = mutate(rng, genome[0:10000], 0.02, 0.01)
    t = mutate(rng, genome[1000:11000], 0.02, 0.01)
    seed = find_shared_seed(q, t, k)
    if seed is None:
        q = genome[0:10000]
        t = genome[1000:11000]
        seed = (5000, 4000)
    check_against_oracle([(q, t, seed[0], seed[1])], k)
