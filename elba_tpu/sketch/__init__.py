"""Probabilistic sketches: HyperLogLog cardinality estimation and Bloom
filters (reference include/HyperLogLog.hpp, include/Bloom.hpp).

The default counting path is exact (sort-based) because the TPU substrate
makes exact counting as cheap as sketching, but these components exist for
capability parity and for memory-bounded streaming modes: HLL sizes hash
tables / capacity budgets (reference KmerOps.cpp:45-73), Bloom pre-filters
singleton k-mers (KmerOps.cpp:158-187).

Both are vectorized array programs: HLL registers live in a dense array
with scatter-max updates and merge = elementwise max (an ICI psum-max in
the distributed setting, reference HyperLogLog.cpp:88-92); the Bloom filter
is a bit array with k derived hash probes (double hashing, Bloom.cpp:44-73).
"""

from .hll import HyperLogLog
from .bloom import BloomFilter
