"""Distributed execution on a 2D JAX device mesh.

Replaces the reference's MPI/CombBLAS runtime (CommGrid + collectives,
SURVEY.md sections 2.3-2.4) with jax.sharding + shard_map:

  * mesh axes ("r", "c") play the role of the sqrt(p) x sqrt(p) CommGrid;
  * the 1D read partition maps to the flat (row-major) device order, so
    the 2D row-block replication of reads is literally
    all_gather(axis="c") and the column-block replication is
    all_gather(axis="r");
  * the k-mer hash exchange is lax.all_to_all over both axes;
  * candidate pairs are routed to their 2D block owner with a second
    all_to_all;
  * reductions ride psum over mesh axes.
"""

from .mesh import make_mesh2d, grid_shape
from .dist_overlap import (
    DistOverlapConfig,
    build_distributed_overlap_step,
)
