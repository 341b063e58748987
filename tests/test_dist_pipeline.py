"""Golden test: the distributed pipeline must equal the single-device
pipeline field-for-field on every mesh shape -- the TPU equivalent of the
reference's multi-rank golden diffing (runtests.sh)."""

import numpy as np
import jax
import pytest

from elba_tpu.dseq.dna import ReadSet, codes_to_ascii
from elba_tpu.params import PipelineParams
from elba_tpu.kmers.count import build_kmer_matrix
from elba_tpu.dsparse.seedmat import build_seed_matrix
from elba_tpu.align.pairwise import pairwise_alignment
from elba_tpu.align.xdrop_jax import align_batch_jax
from elba_tpu.graph.prune import prune_overlap_graph
from elba_tpu.graph.tr import transitive_reduction
from elba_tpu.graph.contigs import generate_contigs
from elba_tpu.parallel.mesh import make_mesh2d
from elba_tpu.parallel.dist_pipeline import (run_distributed_overlap,
                                             run_distributed_pipeline)

PARAMS = PipelineParams(k=13, lower_freq=2, upper_freq=6, xdrop=5)


@pytest.fixture(scope="module")
def workload():
    # 1000bp reads at 500bp stride: neighbors overlap exactly 500 (the
    # classifier minimum) and non-neighbors share no k-mers, so every
    # aligned pair passes and the bad-read pruning keeps all reads
    rng = np.random.default_rng(0xD15)
    genome = rng.integers(0, 4, 8000, dtype=np.uint8)
    seqs = []
    for i, s in enumerate(range(0, 7001, 500)):
        seg = genome[s:s + 1000]
        if i % 3 == 1:
            seg = (3 - seg[::-1]).astype(np.uint8)
        seqs.append(codes_to_ascii(seg))
    rs = ReadSet.from_sequences(seqs)

    A = build_kmer_matrix(rs, PARAMS.k, PARAMS.lower_freq, PARAMS.upper_freq)
    B = build_seed_matrix(A, min_shared=2, full=True)
    R1 = pairwise_alignment(rs, B, PARAMS.k, PARAMS.mat, PARAMS.mis,
                            PARAMS.gap, PARAMS.xdrop,
                            aligner=align_batch_jax)
    return rs, R1


@pytest.mark.parametrize("ndev", [1, 4, 8])
def test_distributed_overlap_matches_single_device(workload, ndev):
    rs, R1 = workload
    mesh = make_mesh2d(jax.devices()[:ndev])
    R2 = run_distributed_overlap(rs, PARAMS, mesh)

    assert R2.nnz == R1.nnz
    assert np.array_equal(R2.rows, R1.rows)
    assert np.array_equal(R2.cols, R1.cols)
    for f in sorted(R1.vals):
        assert np.array_equal(R2.vals[f], R1.vals[f]), f


@pytest.mark.parametrize("ndev", [1, 4, 8])
def test_distributed_pipeline_end_to_end(workload, ndev):
    """The on-mesh graph phase (classify/prune/symmetricize/TR/CC as SPMD
    programs, R never gathered) must be golden-equal to the host graph
    phase for every mesh shape."""
    rs, R1 = workload
    mesh = make_mesh2d(jax.devices()[:ndev])
    Rd, Sd, contigs_d = run_distributed_pipeline(rs, PARAMS, mesh,
                                                 on_mesh=True)

    Rp = prune_overlap_graph(R1, PARAMS.bad_read_cutoff)
    S1 = transitive_reduction(Rp)
    contigs_1 = generate_contigs(S1, rs)

    assert np.array_equal(Rd.rows, R1.rows)
    assert np.array_equal(Rd.cols, R1.cols)
    for f in sorted(R1.vals):
        assert np.array_equal(Rd.vals[f], R1.vals[f]), f
    assert Sd.nnz == S1.nnz
    assert np.array_equal(Sd.rows, S1.rows)
    assert np.array_equal(Sd.cols, S1.cols)
    for f in sorted(S1.vals):
        assert np.array_equal(Sd.vals[f], S1.vals[f]), f
    assert contigs_d == contigs_1
    assert len(contigs_d) >= 1


def test_hll_capacity_estimation(workload):
    from elba_tpu.parallel.dist_pipeline import estimate_capacities_hll
    rs, R1 = workload
    kc, pc_, ac = estimate_capacities_hll(rs, PARAMS, nproc=8)
    # estimated capacities must be sufficient for the real run
    mesh = make_mesh2d(jax.devices()[:8])
    R2 = run_distributed_overlap(rs, PARAMS, mesh, kmer_cap=kc,
                                 pair_cap=pc_, align_cap=ac)
    assert R2.nnz == R1.nnz


def test_distributed_overlap_pallas_aligner(workload):
    """The candidates-only SPMD step + fused Pallas aligner (the real-TPU
    fast path, exercised here in interpret mode) must produce the same R
    as the in-step vmapped kernel."""
    rs, R1 = workload
    mesh = make_mesh2d(jax.devices()[:4])
    R2 = run_distributed_overlap(rs, PARAMS, mesh, use_pallas_align=True)
    assert R2.nnz == R1.nnz
    assert np.array_equal(R2.rows, R1.rows)
    assert np.array_equal(R2.cols, R1.cols)
    for f in sorted(R1.vals):
        assert np.array_equal(R2.vals[f], R1.vals[f]), f


def test_distributed_pipeline_prunes_bad_and_contained(rng):
    """Workload with real pruning work: short reads contained in others
    and a read whose only overlaps are sub-500bp (all alignments BAD ->
    bad-read removal).  On-mesh pruning must match the host path."""
    from elba_tpu.dseq.dna import codes_to_ascii

    genome = rng.integers(0, 4, 8000, dtype=np.uint8)
    seqs = []
    for s in range(0, 7001, 500):
        seqs.append(codes_to_ascii(genome[s:s + 1000]))
    # contained reads: fully inside read 0 / read 4 (different strands)
    seqs.append(codes_to_ascii(genome[100:800]))
    sub = genome[2100:2800]
    seqs.append(codes_to_ascii((3 - sub[::-1]).astype(np.uint8)))
    # bad read: only ~300bp overlaps with the tiling (stride offset 8200
    # is past the last tile start 7000 -> overlaps read 14 (7000:8000) by
    # 0... place it to overlap the last read by 300bp only)
    seqs.append(codes_to_ascii(
        np.concatenate([genome[7700:8000],
                        rng.integers(0, 4, 700, dtype=np.uint8)])))
    rs = ReadSet.from_sequences(seqs)

    A = build_kmer_matrix(rs, PARAMS.k, PARAMS.lower_freq, PARAMS.upper_freq)
    B = build_seed_matrix(A, min_shared=2, full=True)
    R1 = pairwise_alignment(rs, B, PARAMS.k, PARAMS.mat, PARAMS.mis,
                            PARAMS.gap, PARAMS.xdrop,
                            aligner=align_batch_jax)
    Rp = prune_overlap_graph(R1, PARAMS.bad_read_cutoff)
    # the fixture must actually prune something
    assert Rp.nnz < int(R1.vals["passed"].sum()) or \
        len(np.unique(np.concatenate([Rp.rows, Rp.cols]))) < \
        len(np.unique(np.concatenate([R1.rows, R1.cols])))
    S1 = transitive_reduction(Rp)
    contigs_1 = generate_contigs(S1, rs)

    mesh = make_mesh2d(jax.devices()[:4])
    Rd, Sd, contigs_d = run_distributed_pipeline(rs, PARAMS, mesh,
                                                 on_mesh=True)
    assert np.array_equal(Sd.rows, S1.rows)
    assert np.array_equal(Sd.cols, S1.cols)
    for f in sorted(S1.vals):
        assert np.array_equal(Sd.vals[f], S1.vals[f]), f
    assert contigs_d == contigs_1
