"""COO sparse matrix with struct-of-arrays values.

Canonical order is column-major (col, then row), matching the reference's
DCSC traversal order (so single-process PAF output order agrees with the
reference's writers, main.cpp:524-542).

Values are a dict of parallel arrays (SoA), e.g. the Overlap struct
(reference include/Overlap.hpp:22-28) becomes 16 parallel arrays.  Ops are
numpy-based here; the performance-critical SpGEMM expansions live in
seedmat.py / minplus.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import numpy as np

Values = Dict[str, np.ndarray]


@dataclasses.dataclass
class COOMatrix:
    rows: np.ndarray          # int64[nnz]
    cols: np.ndarray          # int64[nnz]
    vals: Values              # dict of parallel arrays (may be empty = pattern)
    shape: Tuple[int, int]

    @property
    def nnz(self) -> int:
        return len(self.rows)

    def key(self) -> np.ndarray:
        """Column-major composite key."""
        return self.cols * np.int64(self.shape[0]) + self.rows

    def sorted(self) -> "COOMatrix":
        order = np.argsort(self.key(), kind="stable")
        return self.take(order)

    def take(self, idx: np.ndarray) -> "COOMatrix":
        return COOMatrix(self.rows[idx], self.cols[idx],
                         {k: v[idx] for k, v in self.vals.items()}, self.shape)

    def select(self, mask: np.ndarray) -> "COOMatrix":
        return self.take(np.flatnonzero(mask))

    def prune(self, pred_mask: np.ndarray) -> "COOMatrix":
        """Drop nonzeros where pred_mask is True (reference Prune)."""
        return self.select(~pred_mask)

    def prune_full(self, vertex_ids: np.ndarray) -> "COOMatrix":
        """Delete all nonzeros in the given rows AND columns (reference
        PruneFull(v, v): vertex deletion)."""
        if len(vertex_ids) == 0:
            return self
        kill = np.zeros(max(self.shape), dtype=bool)
        kill[vertex_ids] = True
        return self.select(~(kill[self.rows] | kill[self.cols]))

    def transpose(self, value_transform: Optional[Callable[[Values], Values]] = None
                  ) -> "COOMatrix":
        vals = self.vals
        if value_transform is not None:
            vals = value_transform(vals)
        m = COOMatrix(self.cols.copy(), self.rows.copy(), vals,
                      (self.shape[1], self.shape[0]))
        return m.sorted()

    def add_keep_lhs(self, other: "COOMatrix") -> "COOMatrix":
        """Sparse addition where collisions keep the left value (matches
        Overlap::operator+ which returns lhs, reference Overlap.hpp:76-77)."""
        assert self.shape == other.shape
        rows = np.concatenate([self.rows, other.rows])
        cols = np.concatenate([self.cols, other.cols])
        vals = {k: np.concatenate([self.vals[k], other.vals[k]])
                for k in self.vals}
        m = COOMatrix(rows, cols, vals, self.shape)
        key = m.key()
        order = np.argsort(key, kind="stable")  # lhs entries come first on ties
        key = key[order]
        first = np.ones(len(key), dtype=bool)
        if len(key):
            first[1:] = key[1:] != key[:-1]
        return m.take(order[first])

    def row_reduce(self, field: Optional[str] = None, op: str = "sum",
                   length: Optional[int] = None) -> np.ndarray:
        """Reduce over each row -> dense vector (pattern count if field None)."""
        n = length if length is not None else self.shape[0]
        src = (np.ones(self.nnz, dtype=np.int64) if field is None
               else self.vals[field].astype(np.int64))
        if op == "sum":
            return np.bincount(self.rows, weights=src, minlength=n).astype(np.int64)
        if op == "or":
            out = np.zeros(n, dtype=bool)
            np.logical_or.at(out, self.rows, src.astype(bool))
            return out
        raise ValueError(op)

    def col_reduce(self, field: Optional[str] = None, op: str = "sum",
                   length: Optional[int] = None) -> np.ndarray:
        return self.transpose_pattern().row_reduce(field, op, length)

    def transpose_pattern(self) -> "COOMatrix":
        return COOMatrix(self.cols, self.rows, self.vals,
                         (self.shape[1], self.shape[0]))

    def lookup(self, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
        """Index of each (row, col) in this (sorted) matrix, or -1."""
        key = self.key()
        q = cols * np.int64(self.shape[0]) + rows
        idx = np.searchsorted(key, q)
        idx_c = np.clip(idx, 0, max(len(key) - 1, 0))
        found = (len(key) > 0) & (key[idx_c] == q) if len(key) else np.zeros(len(q), bool)
        return np.where(found, idx_c, -1)
