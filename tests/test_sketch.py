import numpy as np

from elba_tpu.sketch import HyperLogLog, BloomFilter


def test_hll_estimate_accuracy(rng):
    for true_n in (1000, 50000, 300000):
        hll = HyperLogLog()
        vals = rng.integers(0, 2**63, true_n).astype(np.uint64)
        hll.add(vals)
        est = hll.estimate()
        assert abs(est - true_n) / true_n < 0.1, (true_n, est)


def test_hll_merge_equals_union(rng):
    a_vals = rng.integers(0, 2**63, 20000).astype(np.uint64)
    b_vals = rng.integers(0, 2**63, 20000).astype(np.uint64)
    ha, hb, hu = HyperLogLog(), HyperLogLog(), HyperLogLog()
    ha.add(a_vals)
    hb.add(b_vals)
    hu.add(np.concatenate([a_vals, b_vals]))
    ha.merge(hb)
    assert np.array_equal(ha.registers, hu.registers)


def test_bloom_no_false_negatives(rng):
    bf = BloomFilter(10000, 0.05)
    added = rng.integers(0, 2**63, 5000).astype(np.uint64)
    bf.add(added)
    assert bf.check(added).all()


def test_bloom_false_positive_rate(rng):
    bf = BloomFilter(10000, 0.05)
    added = rng.integers(0, 2**62, 10000).astype(np.uint64)
    bf.add(added)
    probe = rng.integers(2**62, 2**63, 20000).astype(np.uint64)
    fp = bf.check(probe).mean()
    assert fp < 0.12, fp
