"""Block-addressed fused device driver (interpret mode) vs oracle.

Tiny blk_bytes values force reads across many blocks, exercising the
placement margins and the 2-D (block, byte) addressing on CPU; the
production BLK_BYTES=2^28 path differs only in the block size constant.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from elba_tpu.align.xdrop_device_blocks import (
    BlockDeviceAligner, pack_readset_blocks, place_blocks)
from elba_tpu.align.xdrop_ref import xdrop_align_ref
from elba_tpu.align.xdrop_tr import TR
from elba_tpu.align.xdrop_geom import NARROW, WIDE
from tests.conftest import random_dna, mutate
from tests.test_xdrop import find_shared_seed
from tests.test_xdrop_device import make_readset

# winpad for the production tier pair (TR/NARROW primary + WIDE fallback)
WINPAD = max(g.qw + g.tw for g in (TR, WIDE))
# smallest block that holds one ~10kb read between two margins
BLK_TINY = 8192

PRIMARIES = [pytest.param(NARROW, id="v4-narrow"),
             pytest.param(TR, id="v5-tr")]


def run_device(cases, k, mat=1, mis=-1, gap=-1, dropoff=15, batch=None,
               start_id=0, blk_bytes=BLK_TINY, **alkw):
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
    al = BlockDeviceAligner(batch=batch or max(4, len(cases)),
                            interpret=True, blk_bytes=blk_bytes, **alkw)
    got = al(rs, np.array(qi), np.array(ti), np.array(sq, np.int32),
             np.array(st, np.int32), k, mat, mis, gap, dropoff)
    return got, al


def check(cases, k, allow_overflow=False, **kw):
    got, al = run_device(cases, k, **kw)
    if not allow_overflow:
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


def test_place_blocks_invariants(rng):
    lengths = rng.integers(50, 4000, size=200)
    winpad = WINPAD
    blk_bytes = BLK_TINY
    nblk, blk, pos = place_blocks(lengths, winpad, blk_bytes)
    blkb = blk_bytes * 4
    margin = winpad + 8
    margin += (-margin) % 4
    assert nblk > 1  # tiny blocks actually split this set
    # every read's kernel-reachable envelope stays inside its block
    assert (pos - winpad >= 0).all()
    assert (pos + lengths + winpad + 4 <= blkb).all()
    # placement is sequential: block ids are non-decreasing, positions
    # within a block are packed contiguously from the margin
    assert (np.diff(blk) >= 0).all()
    for b in range(nblk):
        sel = np.flatnonzero(blk == b)
        if not len(sel):
            continue
        assert pos[sel[0]] == margin
        gaps = np.diff(pos[sel]) - lengths[sel[:-1]]
        assert (gaps == 0).all()


def test_place_blocks_oversized_read():
    with pytest.raises(ValueError):
        place_blocks(np.array([BLK_TINY * 4]), WINPAD, BLK_TINY)


def test_pack_blocks_roundtrip(rng):
    """Unpacking each read's bytes from its (block, byte, residue)
    address must give back its codes; margins must be zero codes."""
    seqs = [random_dna(rng, int(n)) for n in rng.integers(40, 3000, 60)]
    rs = make_readset(seqs)
    packed, offK, offB, offR = pack_readset_blocks(rs, WINPAD, BLK_TINY)
    assert packed.shape[1] == BLK_TINY
    for i in [0, 1, 7, 30, 59]:
        codes = rs.read_codes(i)
        blkrow = packed[offK[i]]
        got = []
        for j in range(len(codes)):
            p = int(offR[i]) + j
            byte = int(blkrow[int(offB[i]) + (p >> 2)])
            got.append((byte >> (6 - 2 * (p & 3))) & 3)
        assert np.array_equal(np.array(got, np.uint8), codes)


def test_single_block_matches_geom_layout(rng):
    """With the production block size everything lands in block 0 and
    results must match the oracle exactly (sanity for the nblk=1 case)."""
    k = 17
    genome = random_dna(rng, 1200)
    q = mutate(rng, genome[:700], 0.03, 0.02)
    t = mutate(rng, genome[100:800], 0.03, 0.02)
    seed = find_shared_seed(q, t, k)
    if seed is None:
        q, t, seed = genome[:700], genome[100:800], find_shared_seed(
            genome[:700], genome[100:800], k)
    check([(q, t, seed[0], seed[1])], k, blk_bytes=1 << 22, primary=TR)


@pytest.mark.parametrize("primary", PRIMARIES)
def test_multi_block_random_overlaps(rng, primary):
    """16 random pairs with tiny blocks: reads scatter over many blocks
    and every alignment must still be oracle-exact."""
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
    # blk_bytes=4096 leaves ~5.9kb usable bases per block: the 32 reads
    # of 300-800 bases spread over many blocks
    got, al = check(cases, k, primary=primary, blk_bytes=4096)
    assert int(al._dev["offBlk"].max()) > 0
    check(cases, k, batch=5, primary=primary, blk_bytes=4096)  # ragged pad
    check(cases, k, start_id=1000, primary=primary,
          blk_bytes=4096)  # global read ids


@pytest.mark.parametrize("primary", PRIMARIES)
def test_multi_round_continuation_across_blocks(rng, primary):
    """A 10kb overlap (multiple continuation rounds) with each read in
    its own block: window refetches stay block-local and exact."""
    k = 17
    genome = random_dna(rng, 22000)
    q = mutate(rng, genome[0:10000], 0.02, 0.01)
    t = mutate(rng, genome[1000:11000], 0.02, 0.01)
    seed = find_shared_seed(q, t, k)
    if seed is None:
        q = genome[0:10000]
        t = genome[1000:11000]
        seed = (5000, 4000)
    got, al = check([(q, t, seed[0], seed[1]),
                     (genome[:3000], genome[:3000], 2900, 2900)], k,
                    primary=primary)
    assert int(al._dev["offBlk"].max()) > 0


def test_escalation_wide_bands(rng):
    """dropoff=60 overflows the narrow tier; the WIDE tier must resolve
    exactly under block addressing too."""
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
    got, al = check(cases, k, dropoff=60, allow_overflow=True, primary=TR)
    assert al.last_stats["overflow_narrow"] > 0
    assert al.last_stats["overflow_wide"] == 0
