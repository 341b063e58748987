"""Rank-ordered parallel writes without MPI-IO.

The reference writes PAF/contig files with MPI_File_write_ordered
(main.cpp:510,549): every rank's bytes appear in rank order in one file.
The multi-host JAX equivalent: each process writes its shard to a part
file, then process 0 concatenates in process order.  Single-process runs
degrade to a plain write.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def write_ordered(data: bytes, path: str,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None,
                  barrier=None) -> None:
    """Write `data` such that the final file holds every process's bytes in
    process order.

    barrier: callable that blocks until all processes reach it (multi-host
    callers pass e.g. multihost_utils.sync_global_devices); defaults to a
    no-op for single-process runs.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count

    if pc == 1:
        with open(path, "wb") as f:
            f.write(data)
        return

    part = f"{path}.part{pi:05d}"
    with open(part, "wb") as f:
        f.write(data)
    if barrier is not None:
        barrier("write_ordered:" + path)
    if pi == 0:
        with open(path, "wb") as out:
            for r in range(pc):
                p = f"{path}.part{r:05d}"
                with open(p, "rb") as f:
                    out.write(f.read())
                os.remove(p)
    if barrier is not None:
        barrier("write_ordered_done:" + path)
