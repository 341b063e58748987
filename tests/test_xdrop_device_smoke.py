"""Fast smoke coverage for the fused device drivers.

The exhaustive interpret-mode suites (test_xdrop_device_geom.py,
test_xdrop_device_blocks.py) are marked `slow` and excluded from the
default gate; this module keeps one tiny exactness case per driver in
the fast gate so a broken driver still fails `pytest -q` immediately.
"""

import numpy as np

from elba_tpu.align.xdrop_device_blocks import BlockDeviceAligner
from elba_tpu.align.xdrop_device_geom import GeomDeviceAligner
from elba_tpu.align.xdrop_ref import xdrop_align_ref
from elba_tpu.align.xdrop_tr import TR
from tests.conftest import mutate, random_dna
from tests.test_xdrop import find_shared_seed
from tests.test_xdrop_device import make_readset

# unroll-16 TR compiles in seconds on XLA CPU; the production TR_NARROW
# (unroll 64) takes ~10 min to compile in interpret mode and is covered
# by the slow suites + the on-chip bench exactness check

K = 17
FIELDS = ("score", "begQ", "endQ", "begT", "endT", "rc")


def _cases(rng, n=1, length=256):
    cases = []
    while len(cases) < n:
        q = random_dna(rng, length)
        t = mutate(rng, q)
        seed = find_shared_seed(q, t, K)
        if seed is not None:
            cases.append((q, t, *seed))
    return cases


def _check(al, rng, length=400):
    cases = _cases(rng, length=length)
    seqs, qi, ti, sq, st = [], [], [], [], []
    for q, t, b1, b2 in cases:
        qi.append(len(seqs))
        seqs.append(q)
        ti.append(len(seqs))
        seqs.append(t)
        sq.append(b1)
        st.append(b2)
    rs = make_readset(seqs)
    got = al(rs, np.array(qi), np.array(ti), np.array(sq, np.int32),
             np.array(st, np.int32), K, 1, -1, -1, 15)
    for i, (q, t, b1, b2) in enumerate(cases):
        ref = xdrop_align_ref(q, t, b1, b2, K, 1, -1, -1, 15)
        for f in FIELDS:
            assert got[f][i] == ref[f], (i, f, got[f][i], ref[f])


def test_geom_driver_smoke(rng):
    _check(GeomDeviceAligner(batch=4, interpret=True, primary=TR), rng)


def test_blocks_driver_smoke(rng):
    # the smallest block that fits the escalation ladder's window
    # margins (usable ~5.9 kb at blk_bytes 2^12) exercises the 2-D
    # block addressing path; multi-block placement is covered by the
    # slow suite (test_xdrop_device_blocks.py)
    _check(BlockDeviceAligner(batch=4, interpret=True, blk_bytes=1 << 12,
                              primary=TR),
           rng)
