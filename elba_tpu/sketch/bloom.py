"""Bloom filter with double hashing (reference include/Bloom.hpp,
src/Bloom.cpp: k probes at a + i*b over chained 32-bit hashes; sized from
a cardinality estimate and a target false-positive rate)."""

from __future__ import annotations

import math

import numpy as np

from .hll import _mix64


class BloomFilter:
    def __init__(self, entries: int, error: float = 0.05):
        entries = max(int(entries), 1)
        bpe = -math.log(error) / (math.log(2) ** 2)
        self.nbits = max(64, int(entries * bpe))
        self.nhashes = max(1, int(round(math.log(2) * bpe)))
        self.bits = np.zeros((self.nbits + 63) // 64, dtype=np.uint64)

    def _probes(self, values: np.ndarray) -> np.ndarray:
        """[n, nhashes] bit positions via double hashing a + i*b."""
        h = _mix64(np.asarray(values, dtype=np.uint64))
        a = h & np.uint64(0xFFFFFFFF)
        b = h >> np.uint64(32)
        i = np.arange(self.nhashes, dtype=np.uint64)[None, :]
        return ((a[:, None] + i * b[:, None]) % np.uint64(self.nbits))

    def add(self, values: np.ndarray) -> None:
        pos = self._probes(values).reshape(-1)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)

    def check(self, values: np.ndarray) -> np.ndarray:
        pos = self._probes(values)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=1)
