"""Sparse semiring linear algebra on COO shards.

The heart of the framework: 2D-shardable sparse matrices stored as
struct-of-arrays COO (sorted column-major like the reference's DCSC local
shards), with semiring SpGEMM implemented as *sorted join + segment reduce*
instead of hash accumulation -- sorts, scans and gathers are what XLA/TPU
compile well.

Provides the algebra surface ELBA uses from CombBLAS (SURVEY.md section
2.1): semiring SpGEMM, transpose (with value transform), elementwise
apply/mask, prune, prune-full (vertex deletion), row/col reductions, and
matrix addition with keep-lhs collision semantics.
"""

from .coo import COOMatrix
from .seedmat import SeedMatrix, build_seed_matrix
from .minplus import minplus_spgemm, INF
