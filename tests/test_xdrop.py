"""X-drop aligner: JAX banded kernel vs the numpy oracle, plus semantic
properties on constructed overlaps."""

import numpy as np
import jax.numpy as jnp

from elba_tpu.align.xdrop_ref import xdrop_align_ref
from elba_tpu.align.xdrop_jax import xdrop_batch
from tests.conftest import random_dna, mutate


def run_jax_single(q, t, begQ, begT, k, mat=1, mis=-1, gap=-1, dropoff=15,
                   band=256):
    # pad to a power of two so jit caches across cases
    L = max(len(q), len(t), 8)
    L = 1 << int(np.ceil(np.log2(L)))
    qb = np.zeros((1, L), np.int8)
    tb = np.zeros((1, L), np.int8)
    qb[0, :len(q)] = q
    tb[0, :len(t)] = t
    res = xdrop_batch(jnp.asarray(qb), jnp.asarray(tb),
                      jnp.asarray([len(q)], np.int32),
                      jnp.asarray([len(t)], np.int32),
                      jnp.asarray([begQ], np.int32),
                      jnp.asarray([begT], np.int32),
                      k, mat, mis, gap, dropoff, band)
    out = {f: np.asarray(v)[0] for f, v in res.items()}
    return out


def assert_same(q, t, begQ, begT, k, **kw):
    ref = xdrop_align_ref(q, t, begQ, begT, k,
                          kw.get("mat", 1), kw.get("mis", -1),
                          kw.get("gap", -1), kw.get("dropoff", 15))
    got = run_jax_single(q, t, begQ, begT, k, **kw)
    assert not got["overflow"], "band overflow in test"
    for f in ("score", "begQ", "endQ", "begT", "endT", "rc"):
        assert int(got[f]) == int(ref[f]), (
            f, dict(got={x: int(got[x]) for x in
                         ("score", "begQ", "endQ", "begT", "endT", "rc")},
                    ref=ref))


def find_shared_seed(q, t, k):
    """First exact shared kmer (forward strand) as (posQ, posT)."""
    from elba_tpu.kmers.extract import pack_kmers_ref
    kq = pack_kmers_ref(q, k)
    kt = pack_kmers_ref(t, k)
    lut = {}
    for p, v in enumerate(kt):
        lut.setdefault(int(v), p)
    for p, v in enumerate(kq):
        if int(v) in lut:
            return p, lut[int(v)]
    return None


def test_identical_sequences(rng):
    k = 17
    s = random_dna(rng, 300)
    ref = xdrop_align_ref(s, s, 100, 100, k, 1, -1, -1, 15)
    assert ref["score"] == 300  # perfect match: score = len * mat
    assert ref["begQ"] == 0 and ref["endQ"] == 300
    assert not ref["rc"]
    assert_same(s, s, 100, 100, k)


def test_revcomp_pair(rng):
    k = 17
    s = random_dna(rng, 200)
    t = (3 - s[::-1]).astype(np.uint8)
    seedQ = 50
    seedT = 200 - seedQ - k  # the same kmer on the rc strand
    ref = xdrop_align_ref(s, t, seedQ, seedT, k, 1, -1, -1, 15)
    assert ref["rc"]
    assert ref["score"] == 200
    assert_same(s, t, seedQ, seedT, k)


def test_seed_rejection(rng):
    k = 17
    q = random_dna(rng, 100)
    t = random_dna(rng, 100)
    q[20:20 + k] = t[30:30 + k]
    q[25] = (q[25] + 1) % 4  # break the seed
    ref = xdrop_align_ref(q, t, 20, 30, k, 1, -1, -1, 15)
    assert ref["score"] == -1
    assert_same(q, t, 20, 30, k)
    # zero-zero seed rejection
    assert xdrop_align_ref(q, t, 0, 0, k, 1, -1, -1, 15)["score"] == -1
    # out-of-bounds seed
    assert xdrop_align_ref(q, t, 95, 30, k, 1, -1, -1, 15)["score"] == -1


def test_random_overlaps_match_oracle(rng):
    """Reads drawn from a common genome with mutations: kernel must equal
    the oracle bit-for-bit on every field."""
    k = 17
    genome = random_dna(rng, 1200)
    cases = 0
    for trial in range(25):
        a = int(rng.integers(0, 500))
        b = int(rng.integers(0, 500))
        la = int(rng.integers(300, 700))
        lb = int(rng.integers(300, 700))
        q = mutate(rng, genome[a:a + la], 0.03, 0.02)
        t = mutate(rng, genome[b:b + lb], 0.03, 0.02)
        if rng.random() < 0.5:
            t = (3 - t[::-1]).astype(np.uint8)
        seed = find_shared_seed(q, t, k)
        if seed is None:
            # try rc seed via oracle anyway with arbitrary positions
            continue
        for dropoff in (5, 15):
            assert_same(q, t, seed[0], seed[1], k, dropoff=dropoff)
            cases += 1
    assert cases >= 10


def test_rc_seeds_match_oracle(rng):
    """Seeds found through canonical kmers may be on opposite strands."""
    from elba_tpu.kmers.extract import canonical_ref
    k = 17
    genome = random_dna(rng, 800)
    cases = 0
    for trial in range(20):
        q = mutate(rng, genome[0:600], 0.02, 0.01)
        t = mutate(rng, genome[200:800], 0.02, 0.01)
        if rng.random() < 0.5:
            t = (3 - t[::-1]).astype(np.uint8)
        cq = canonical_ref(q, k)
        ct = canonical_ref(t, k)
        lut = {}
        for p, v in enumerate(ct):
            lut.setdefault(int(v), p)
        hits = [(p, lut[int(v)]) for p, v in enumerate(cq) if int(v) in lut]
        for (pq, pt) in hits[:3]:
            assert_same(q, t, pq, pt, k)
            cases += 1
    assert cases >= 5


def test_scoring_variants(rng):
    k = 7
    genome = random_dna(rng, 400)
    q = mutate(rng, genome[:300], 0.05, 0.02)
    t = mutate(rng, genome[50:350], 0.05, 0.02)
    seed = find_shared_seed(q, t, k)
    if seed is None:
        return
    for (mat, mis, gap, x) in [(1, -1, -1, 5), (2, -3, -2, 20), (1, -2, -2, 8)]:
        assert_same(q, t, seed[0], seed[1], k, mat=mat, mis=mis, gap=gap,
                    dropoff=x)
