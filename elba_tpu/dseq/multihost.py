"""Multi-host ingest and output skeleton.

The reference's multi-node path (FastaIndex.cpp:107-380, main.cpp:487-551)
does: root parses the .fai, computes the base-balanced greedy partition,
scatters record descriptors, every rank reads its own byte range with
MPI_File_read_at_all, read names are broadcast for PAF output, and the
output files are written with MPI_File_write_ordered.

The JAX-multi-process equivalent composes pieces that already exist:

* every process parses the (small) .fai itself -- no scatter or name
  broadcast is needed because the index file is visible to all hosts
* greedy_partition (dseq/fai.py, the reference's exact rule) assigns a
  contiguous record range per process, balanced by bases
* load_fasta(record_range=...) preads just that byte range and 2-bit
  packs it; the ReadSet carries start_id so global read ids line up
* io.ordered.write_ordered reproduces the rank-ordered single file

Compute then runs the SPMD mesh programs (parallel/dist_pipeline) over the
global mesh -- in multi-host JAX that is the same program, so the
per-process shard boundary is exactly the 1D read partition computed here.
process_index/process_count are injectable so the whole path is testable
by emulation in one process (tests/test_multihost.py), the same way the
reference tests multi-node behavior with more local ranks.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .dna import ReadSet, load_fasta
from .fai import greedy_partition, parse_faidx


def partition_records(fai_path: str, nparts: int):
    """Per-part (start, stop) record ranges under the reference's greedy
    base-balanced rule (FastaIndex.cpp:69-93).  Returns (ranges, displs)
    where displs is the exclusive-scan owner map (read_owner input)."""
    records = parse_faidx(fai_path)
    lengths = [r.length for r in records]
    counts = greedy_partition(lengths, nparts)
    displs = np.zeros(nparts + 1, dtype=np.int64)
    displs[1:] = np.cumsum(counts)
    ranges = [(int(displs[i]), int(displs[i + 1])) for i in range(nparts)]
    return ranges, displs


def load_fasta_sharded(fasta_path: str,
                       process_index: int,
                       process_count: int) -> ReadSet:
    """This process's shard of the reads: parse the index, partition by
    bases, pread only the owned byte range (reference getmydna,
    FastaIndex.cpp:191-290 minus the MPI)."""
    ranges, _ = partition_records(fasta_path + ".fai", process_count)
    lo, hi = ranges[process_index]
    return load_fasta(fasta_path, record_range=(lo, hi))


def global_names(fasta_path: str) -> List[str]:
    """All read names in global id order (the role of bcastnames,
    FastaIndex.cpp:292-380; here every process parses the shared .fai)."""
    return [r.name for r in parse_faidx(fasta_path + ".fai")]


def run_multihost_pipeline(fasta_path: str, params,
                           process_index: Optional[int] = None,
                           process_count: Optional[int] = None,
                           mesh=None, write_outputs: bool = True,
                           barrier=None, contig_id_offset: int = 0):
    """Multi-host driver skeleton: sharded ingest -> distributed SPMD
    pipeline -> rank-ordered output.

    At process_count == 1 this is semantically the single-host pipeline
    run through the distributed path.  Under real multi-host JAX the same
    code runs per process with its own shard; the mesh programs span all
    hosts.  Emulation tests drive it with injected process_index/count.

    Returns (R, S, contigs) of this process's view (global at pc == 1).
    """
    import jax

    from ..io.fasta_out import contigs_fasta_bytes
    from ..io.ordered import write_ordered
    from ..io.paf import paf_lines
    from ..parallel.dist_pipeline import run_distributed_pipeline

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count

    readset = (load_fasta_sharded(fasta_path, pi, pc) if pc > 1
               else load_fasta(fasta_path))
    names = global_names(fasta_path)

    R, S, contigs = run_distributed_pipeline(readset, params, mesh)

    if write_outputs:
        pre = params.output_prefix
        write_ordered("\n".join(paf_lines(R, names)).encode() + b"\n",
                      f"{pre}.overlap.paf", pi, pc, barrier)
        write_ordered("\n".join(paf_lines(S, names)).encode() + b"\n",
                      f"{pre}.string.paf", pi, pc, barrier)
        write_ordered(contigs_fasta_bytes(contigs, contig_id_offset),
                      f"{pre}.contigs.fa", pi, pc, barrier)
    return R, S, contigs
