"""Geometry fused device driver (interpret mode) vs oracle, incl. the
narrow -> wide -> oracle escalation ladder, for BOTH kernel families
(lane-major v4 Geometry and transposed v5 TrGeometry)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from elba_tpu.align.xdrop_device_geom import GeomDeviceAligner
from elba_tpu.align.xdrop_ref import xdrop_align_ref
from elba_tpu.align.xdrop_tr import TR
from elba_tpu.align.xdrop_geom import NARROW
from tests.conftest import random_dna, mutate
from tests.test_xdrop import find_shared_seed
from tests.test_xdrop_device import make_readset

PRIMARIES = [pytest.param(NARROW, id="v4-narrow"),
             pytest.param(TR, id="v5-tr")]


def run_device(cases, k, mat=1, mis=-1, gap=-1, dropoff=15, batch=None,
               start_id=0, **alkw):
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
    al = GeomDeviceAligner(batch=batch or max(4, len(cases)),
                           interpret=True, **alkw)
    got = al(rs, np.array(qi), np.array(ti), np.array(sq, np.int32),
             np.array(st, np.int32), k, mat, mis, gap, dropoff)
    return got, al


def check(cases, k, allow_overflow=False, **kw):
    got, al = run_device(cases, k, **kw)
    if not allow_overflow:
        # the Pallas kernel must do the work itself: a silent fall-through
        # to the oracle (e.g. a zero-block Pallas grid) would still give
        # exact fields but test nothing
        assert al.last_stats["overflow_narrow"] == 0, al.last_stats
    for i, (q, t, b1, b2) in enumerate(cases):
        ref = xdrop_align_ref(q, t, b1, b2, k, kw.get("mat", 1),
                              kw.get("mis", -1), kw.get("gap", -1),
                              kw.get("dropoff", 15))
        for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
            assert int(got[f][i]) == int(ref[f]), (
                i, f, {x: int(got[x][i]) for x in
                       ("score", "begQ", "endQ", "begT", "endT", "rc")}, ref)
    return got, al


@pytest.mark.parametrize("primary", PRIMARIES)
def test_basic_cases(rng, primary):
    k = 17
    s = random_dna(rng, 300)
    t = (3 - s[::-1]).astype(np.uint8)
    cases = [
        (s, s, 100, 100),
        (s, t, 50, 300 - 50 - k),
        (s, s, 0, 0),
        (s, s, 295, 100),
    ]
    got, _ = check(cases, k, primary=primary)
    assert got["score"][0] == 300
    assert got["score"][2] == -1 and got["score"][3] == -1


@pytest.mark.parametrize("primary", PRIMARIES)
def test_random_overlaps(rng, primary):
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
    check(cases, k, primary=primary)
    check(cases, k, dropoff=5, primary=primary)
    check(cases, k, batch=5, primary=primary)   # ragged batch padding
    check(cases, k, start_id=1000, primary=primary)  # global read ids


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


@pytest.mark.parametrize("primary", PRIMARIES)
def test_multi_round_continuation(rng, primary):
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
           (genome[:3000], genome[:3000], 2900, 2900)], k,
          primary=primary)


@pytest.mark.parametrize("primary", PRIMARIES)
def test_escalation_wide_bands(rng, primary):
    """dropoff=60 needs ~120-lane bands: the narrow tier must overflow and
    the wide tier must resolve them exactly (no oracle needed)."""
    k = 17
    genome = random_dna(rng, 1200)
    cases = []
    while len(cases) < 6:
        q = mutate(rng, genome[:700], 0.06, 0.036)
        t = mutate(rng, genome[150:850], 0.06, 0.036)
        seed = find_shared_seed(q, t, k)
        if seed is None:
            continue
        cases.append((q, t, seed[0], seed[1]))
    got, al = check(cases, k, dropoff=60, allow_overflow=True,
                    primary=primary)
    assert al.last_stats["overflow_narrow"] > 0
    assert al.last_stats["overflow_wide"] == 0


def test_production_default_geometry():
    """Pin the driver's DEFAULT primary to the transposed family (what
    bench, pairwise, dist_pipeline and the ladder actually run).  The
    default's unroll=64 makes interpret-mode execution too expensive for
    CI — kernel exactness is covered at unroll=16 above (same kernel
    body, unroll only repeats the substep) and the production config is
    oracle-checked ON CHIP by every bench.py run ("exact" in its JSON)."""
    from elba_tpu.align.xdrop_tr import TR_NARROW, TrGeometry
    al = GeomDeviceAligner()
    assert al.primary is TR_NARROW
    assert isinstance(al.primary, TrGeometry)
    assert al.fallback.bandw == 128  # wide lane-major escalation tier
