"""HyperLogLog distinct-count estimator (reference HyperLogLog.{hpp,cpp}).

12-bit register index (4096 registers, matching the reference default),
rank = leading-zero count of the remaining 52 hash bits + 1.  add() is a
vectorized scatter-max; merge is elementwise max, which distributes over
mesh axes as an all-reduce(max).
"""

from __future__ import annotations

import numpy as np

_BITS = 12
_NREG = 1 << _BITS


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: a well-distributed 64-bit hash."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


class HyperLogLog:
    def __init__(self):
        self.registers = np.zeros(_NREG, dtype=np.uint8)

    def add_hashed(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - _BITS)).astype(np.int64)
        # low bits forced to 1 so the leading-zero scan terminates
        rest = (h << np.uint64(_BITS)) | np.uint64((1 << _BITS) - 1)
        # rank = leading zeros + 1, via a vectorized bit scan
        rank = np.full(len(h), 1, dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest
        done = np.zeros(len(h), dtype=bool)
        for _ in range(64 - _BITS):
            bit = (cur & mask) != 0
            rank[~done & ~bit] += 1
            done |= bit
            cur = cur << np.uint64(1)
            if done.all():
                break
        np.maximum.at(self.registers, idx, rank)

    def add(self, values: np.ndarray) -> None:
        self.add_hashed(_mix64(values))

    def merge(self, other: "HyperLogLog") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(_NREG)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s = np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m / s
        if e <= 2.5 * m:
            zeros = int(np.sum(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)
