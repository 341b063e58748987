"""End-to-end single-host assembly pipeline (reference src/main.cpp:75-346).

FASTA -> 2-bit reads -> reliable k-mers -> A -> B = A A^T (SharedSeeds)
-> X-drop alignment -> R -> prune (failed / bad / contained) -> transitive
reduction -> S -> contigs; writes {prefix}.overlap.paf, {prefix}.string.paf,
{prefix}.contigs.fa.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import numpy as np

from .align.pairwise import pairwise_alignment
from .dseq.dna import ReadSet, load_fasta
from .dsparse.coo import COOMatrix
from .dsparse.seedmat import build_seed_matrix
from .graph.contigs import generate_contigs
from .graph.prune import prune_overlap_graph
from .graph.tr import transitive_reduction
from .io.fasta_out import write_contigs_fasta
from .io.paf import write_paf
from .kmers.count import build_kmer_matrix
from .params import PipelineParams


def kmer_histogram(A) -> dict:
    """count -> number of k-mers at that count (reference
    print_kmer_histogram, main.cpp:449-485)."""
    counts = np.bincount(A.cols, minlength=A.num_kmers)
    histo = np.bincount(counts[counts > 0])
    return {int(c): int(n) for c, n in enumerate(histo) if n > 0 and c > 0}


@dataclasses.dataclass
class PipelineResult:
    readset: ReadSet
    A: object
    B: object
    R: COOMatrix
    S: COOMatrix
    contigs: List[str]
    timings: dict


def run_pipeline(fasta_path: str, params: PipelineParams,
                 write_outputs: bool = True,
                 aligner: Optional[Callable] = None,
                 log: Optional[Callable[[str], None]] = print,
                 log_level: int = 1, count_parts: int = 0,
                 count_group: int = 2) -> PipelineResult:
    """log_level mirrors the reference's LOG_LEVEL gating: >=2 prints the
    k-mer histogram and dumps B/R matrices, >=3 also dumps A
    (ELBALogger.cpp:5-43, main.cpp:449-485).

    count_parts: beyond-HBM device counting geometry (0 = auto); on TPU,
    instance sets past the single-shot sort's HBM ceiling count
    multi-pass via token sweeps (kmers/count_tokens.py) chained into the
    device SpGEMM.  count_group is kept for CLI compatibility (the token
    counter sizes its own ranges-per-sweep from the token budget)."""
    from .utils.logging import PhaseTimer
    timer = PhaseTimer(sync=False)
    timings = timer.phases

    def phase(name):
        class _T:
            def __enter__(self):
                timer.start(name)
            def __exit__(self, *a):
                dt = timer.stop()
                if log:
                    log(f"[elba-tpu] {name}: {dt:.3f}s")
        return _T()

    with phase("load_fasta"):
        readset = load_fasta(fasta_path)

    import jax
    on_tpu = jax.default_backend() != "cpu"
    # device counting (one variadic sort on chip, the DEDUKT role) when
    # the flattened instance sort fits HBM; chained straight into the
    # device SpGEMM (no host roundtrip of the instance arrays) when the
    # caller does not need A's triples (histogram/dump logging does)
    windows = len(readset) * max(readset.max_length - params.k + 1, 0)
    dev_count = on_tpu and params.k <= 32 and windows < 180_000_000
    chainable = (params.upper_freq <= 256
                 and readset.max_length < (1 << 15) and log_level < 2)
    chain = dev_count and chainable
    # beyond the single-shot sort's HBM ceiling: multi-pass counting over
    # k-mer value ranges (token sweeps harvest ~dozens of ranges per
    # read sweep), chained part-by-part into the device SpGEMM — bounded
    # memory, bit-identical outputs (kmers/count_tokens.py).  Auto on
    # TPU; an explicit count_parts opts in on any backend.
    multi = (params.k <= 32 and not dev_count and chainable
             and (on_tpu or count_parts > 0))

    count_res = None
    multi_agg = None
    with phase("kmer_matrix"):
        if multi:
            multi_agg = dict(nk=0, nnz=0)
            A = None
        elif chain:
            from .kmers.count import KmerMatrixSummary
            from .kmers.count_device import count_device_raw
            count_res = count_device_raw(readset, params.k,
                                         params.lower_freq,
                                         params.upper_freq)
            A = KmerMatrixSummary(num_reads=len(readset),
                                  num_kmers=int(count_res["nk"]),
                                  nnz=int(count_res["nnz"]))
        elif dev_count:
            from .kmers.count_device import build_kmer_matrix_device
            A = build_kmer_matrix_device(readset, params.k,
                                         params.lower_freq,
                                         params.upper_freq)
        else:
            A = build_kmer_matrix(readset, params.k, params.lower_freq,
                                  params.upper_freq)
    if log and A is not None:
        log(f"[elba-tpu] A: {A.num_reads} reads x {A.num_kmers} reliable "
            f"k-mers, {A.nnz} nnz")
    if log and log_level >= 2:
        histo = kmer_histogram(A)
        log("#count\tnumkmers")
        for c in sorted(histo):
            log(f"{c}\t{histo[c]}")
    if write_outputs and log_level >= 3:
        from .io.mtx import write_mtx_kmer_matrix
        write_mtx_kmer_matrix(A, f"{params.output_prefix}.A.mtx")

    with phase("seed_matrix"):
        # upper-triangle B: the alignment set; the full symmetric B is only
        # needed for mtx dumps (io.mtx can derive it by symmetry)
        from .dsparse.seedmat import (device_spgemm_suitable,
                                      seed_matrix_device,
                                      seed_matrix_from_device_result)
        if multi:
            from .kmers.count import KmerMatrixSummary
            from .kmers.count_tokens import iter_count_parts_tokens
            from .dsparse.seedmat_device import spgemm_from_count_parts
            total_inst = int(np.maximum(
                np.asarray(readset.lengths, np.int64)
                - (params.k - 1), 0).sum())
            parts = count_parts or max(2, -(-total_inst // 60_000_000))
            if log:
                log(f"[elba-tpu] multi-pass token counting: {parts} "
                    f"parts, {total_inst} raw instances")

            def parts_fn():
                multi_agg["nk"] = multi_agg["nnz"] = 0
                for res in iter_count_parts_tokens(
                        readset, params.k, params.lower_freq,
                        params.upper_freq, parts=parts):
                    multi_agg["nk"] += int(res["nk"])
                    multi_agg["nnz"] += int(res["nnz"])
                    yield res

            bres = spgemm_from_count_parts(parts_fn, params.upper_freq,
                                           min_shared=2, full=False,
                                           stage_chunks=4)
            B = seed_matrix_from_device_result(bres, len(readset))
            A = KmerMatrixSummary(num_reads=len(readset),
                                  num_kmers=multi_agg["nk"],
                                  nnz=multi_agg["nnz"])
            if log:
                log(f"[elba-tpu] A: {A.num_reads} reads x {A.num_kmers} "
                    f"reliable k-mers, {A.nnz} nnz")
        elif chain:
            from .dsparse.seedmat_device import spgemm_from_device_count
            bres = spgemm_from_device_count(count_res, params.upper_freq,
                                            min_shared=2, full=False)
            B = seed_matrix_from_device_result(bres, len(readset))
        elif on_tpu and device_spgemm_suitable(A, params.upper_freq):
            B = seed_matrix_device(A, min_shared=2, full=False)
        else:
            B = build_seed_matrix(A, min_shared=2, full=False)
    if log:
        log(f"[elba-tpu] B: {B.nnz} candidate entries")
    if write_outputs and log_level >= 2:
        from .io.mtx import write_mtx_seed_matrix
        write_mtx_seed_matrix(B, f"{params.output_prefix}.B.mtx",
                              brief=False)

    with phase("alignment"):
        R = pairwise_alignment(readset, B, params.k, params.mat, params.mis,
                               params.gap, params.xdrop, aligner=aligner)
    if log:
        log(f"[elba-tpu] R: {R.nnz} alignments, "
            f"{int(R.vals['passed'].sum())} passed")

    if write_outputs:
        with phase("write_overlap_paf"):
            write_paf(R, readset.names, f"{params.output_prefix}.overlap.paf")

    with phase("prune"):
        Rp = prune_overlap_graph(R, params.bad_read_cutoff)

    with phase("transitive_reduction"):
        S = transitive_reduction(Rp)
    if log:
        log(f"[elba-tpu] S: {S.nnz} string-graph edges")

    if write_outputs:
        with phase("write_string_paf"):
            write_paf(S, readset.names, f"{params.output_prefix}.string.paf")

    with phase("contigs"):
        contigs = generate_contigs(S, readset)
    if log:
        log(f"[elba-tpu] {len(contigs)} contigs, "
            f"{sum(len(c) for c in contigs)} bases")

    if write_outputs:
        with phase("write_contigs"):
            write_contigs_fasta(contigs, f"{params.output_prefix}.contigs.fa")

    return PipelineResult(readset=readset, A=A, B=B, R=R, S=S,
                          contigs=contigs, timings=timings)
