"""Geometry-parameterized Pallas X-drop kernel (interpret mode) vs oracle.

The NARROW geometry (32-lane band) must be integer-exact for every band
that fits its capacity and must FLAG (never silently corrupt) bands that
do not; the WIDE geometry must reproduce the v3 kernel bit-for-bit.
"""

import numpy as np

from elba_tpu.align.xdrop_ref import xdrop_align_ref
from elba_tpu.align.xdrop_geom import (NARROW, WIDE, Geometry,
                                       xdrop_pairs_geom)
from tests.conftest import random_dna, mutate
from tests.test_xdrop import find_shared_seed


def run_geom(g, cases, k, mat=1, mis=-1, gap=-1, dropoff=15):
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
    return xdrop_pairs_geom(g, q, t, lq, lt, bq, bt, k, mat, mis, gap,
                            dropoff, interpret=True)


def check_against_oracle(g, cases, k, allow_overflow=False, **kw):
    got = run_geom(g, cases, k, **kw)
    if not allow_overflow:
        assert not got["overflow"].any()
    for i, (q, t, b1, b2) in enumerate(cases):
        if got["overflow"][i]:
            continue
        ref = xdrop_align_ref(q, t, b1, b2, k, kw.get("mat", 1),
                              kw.get("mis", -1), kw.get("gap", -1),
                              kw.get("dropoff", 15))
        for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
            assert int(got[f][i]) == int(ref[f]), (
                i, f, {x: int(got[x][i]) for x in
                       ("score", "begQ", "endQ", "begT", "endT", "rc")}, ref)
    return got


def make_overlap_cases(rng, n, k, glen=1500, err=0.03):
    genome = random_dna(rng, glen)
    cases = []
    while len(cases) < n:
        a = int(rng.integers(0, glen // 3))
        b = int(rng.integers(0, glen // 3))
        la = int(rng.integers(300, 800))
        lb = int(rng.integers(300, 800))
        q = mutate(rng, genome[a:a + la], err, err * 0.6)
        t = mutate(rng, genome[b:b + lb], err, err * 0.6)
        if rng.random() < 0.5:
            t = (3 - t[::-1]).astype(np.uint8)
        seed = find_shared_seed(q, t, k)
        if seed is None:
            continue
        cases.append((q, t, seed[0], seed[1]))
    return cases


def test_narrow_basic(rng):
    k = 17
    s = random_dna(rng, 300)
    t = (3 - s[::-1]).astype(np.uint8)
    cases = [
        (s, s, 100, 100),
        (s, t, 50, 300 - 50 - k),
        (s, s, 0, 0),
        (s, s, 295, 100),
    ]
    got = check_against_oracle(NARROW, cases, k)
    assert got["score"][0] == 300
    assert got["score"][2] == -1 and got["score"][3] == -1


def test_narrow_random_overlaps(rng):
    k = 17
    cases = make_overlap_cases(rng, 16, k)
    check_against_oracle(NARROW, cases, k)
    check_against_oracle(NARROW, cases, k, dropoff=5)


def test_narrow_scoring_variants(rng):
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
        check_against_oracle(NARROW, cases, k, mat=mat, mis=mis, gap=gap,
                             dropoff=x)


def test_narrow_long_multi_round(rng):
    """Extensions spanning several QWIN rounds, exercising pause/resume and
    many re-anchor trips at the small band."""
    k = 17
    genome = random_dna(rng, 14000)
    q = mutate(rng, genome[0:6000], 0.02, 0.01)
    t = mutate(rng, genome[700:6700], 0.02, 0.01)
    seed = find_shared_seed(q, t, k)
    if seed is None:
        q = genome[0:6000]
        t = genome[700:6700]
        seed = (3000, 2300)
    check_against_oracle(NARROW, [(q, t, seed[0], seed[1]),
                                  (genome[:3000], genome[:3000], 2900, 2900)],
                         k)


def test_narrow_overflow_flagged_not_wrong(rng):
    """dropoff 60 at unit gap cost needs a ~120-lane band: the narrow
    kernel must flag overflow on wide-band items (the caller falls back),
    never return silently wrong fields."""
    k = 17
    cases = make_overlap_cases(rng, 8, k, err=0.06)
    got = check_against_oracle(NARROW, cases, k, dropoff=60,
                               allow_overflow=True)
    assert got["overflow"].any()  # wide bands must be detected
    # the same cases fit the wide kernel's 128-lane capacity
    check_against_oracle(WIDE, cases, k, dropoff=60)


def test_wide_matches_v3_bitwise(rng):
    from elba_tpu.align.xdrop_pallas import xdrop_pairs_pallas

    k = 17
    cases = make_overlap_cases(rng, 8, k)
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
    a = xdrop_pairs_geom(WIDE, q, t, lq, lt, bq, bt, k, 1, -1, -1, 15,
                         interpret=True)
    b = xdrop_pairs_pallas(q, t, lq, lt, bq, bt, k, 1, -1, -1, 15,
                           interpret=True)
    for f in ("score", "begQ", "endQ", "begT", "endT", "rc", "overflow"):
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


def test_narrow_sub32_geometry(rng):
    """The factory's other sweep candidate (SUB=32) stays exact."""
    g = Geometry(sub=32)
    k = 17
    cases = make_overlap_cases(rng, 8, k)
    check_against_oracle(g, cases, k)
