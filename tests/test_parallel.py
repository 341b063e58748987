"""Distributed SPMD overlap step on a virtual 8-device CPU mesh, validated
against the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elba_tpu.dseq.dna import ReadSet, codes_to_ascii
from elba_tpu.kmers.count import build_kmer_matrix
from elba_tpu.dsparse.seedmat import build_seed_matrix
from elba_tpu.parallel.mesh import make_mesh2d, grid_shape
from elba_tpu.parallel.dist_overlap import (DistOverlapConfig,
                                            build_distributed_overlap_step)
from elba_tpu.align.xdrop_ref import xdrop_align_ref


def test_grid_shape():
    assert grid_shape(1) == (1, 1)
    assert grid_shape(4) == (2, 2)
    assert grid_shape(8) == (2, 4)
    assert grid_shape(9) == (3, 3)
    assert grid_shape(6) == (2, 3)


def make_workload(rng, nproc, Rb=4, L=256, read_len=200, genome_len=600):
    genome = rng.integers(0, 4, genome_len, dtype=np.uint8)
    n = nproc * Rb
    codes = np.zeros((n, L), np.uint8)
    lengths = np.zeros(n, np.int32)
    starts = (np.arange(n) * (genome_len - read_len)) // max(n - 1, 1)
    for i in range(n):
        codes[i, :read_len] = genome[starts[i]:starts[i] + read_len]
        lengths[i] = read_len
    return codes, lengths


@pytest.mark.parametrize("ndev", [4, 8])
def test_distributed_step_matches_single_device(rng, ndev):
    devs = jax.devices()[:ndev]
    mesh = make_mesh2d(devs)
    Rb, L = 4, 256
    cfg = DistOverlapConfig(
        reads_per_shard=Rb, max_read_len=L, k=7, lower=2, upper=6,
        xdrop=5, band=64, kmer_cap=2048, pair_cap=4096, align_cap=256)
    codes, lengths = make_workload(rng, ndev, Rb=Rb, L=L)

    step = build_distributed_overlap_step(mesh, cfg)
    stats, local = step(jnp.asarray(codes), jnp.asarray(lengths))
    stats = {k: int(v) for k, v in stats.items()}
    assert stats["dropped_kmers"] == 0 and stats["dropped_pairs"] == 0, stats

    # single-device oracle: same reliable-kmer rules and pair count
    rs = ReadSet.from_sequences(
        [codes_to_ascii(codes[i, :lengths[i]]) for i in range(len(lengths))])
    A = build_kmer_matrix(rs, cfg.k, cfg.lower, cfg.upper)
    assert stats["reliable_instances"] == A.nnz

    B = build_seed_matrix(A, min_shared=2, full=False)
    assert stats["candidate_pairs"] == B.nnz

    # every aligned pair's score must match the scalar oracle
    q = np.asarray(local["q"]).reshape(-1)
    t = np.asarray(local["t"]).reshape(-1)
    sc = np.asarray(local["score"]).reshape(-1)
    valid = np.asarray(local["valid"]).reshape(-1)
    bq = np.asarray(local["begQ"]).reshape(-1)
    eq = np.asarray(local["endQ"]).reshape(-1)
    checked = 0
    # dist seeds may differ from single-device seed order; recompute via
    # oracle on the same seed is not available here, so check score bounds
    for i in np.flatnonzero(valid)[:50]:
        assert 0 <= q[i] < len(lengths) and 0 <= t[i] < len(lengths)
        assert q[i] < t[i]
        if sc[i] > 0:
            assert sc[i] <= max(lengths[q[i]], lengths[t[i]])
            assert bq[i] <= eq[i] <= lengths[q[i]]
            checked += 1
    assert checked > 0
    assert stats["aligned"] > 0


def test_distributed_alignment_scores_exact(rng):
    """With error-free overlapping reads the aligned score must equal the
    full overlap length (oracle-exact), regardless of which seed was used."""
    ndev = 8
    mesh = make_mesh2d(jax.devices()[:ndev])
    Rb, L = 2, 256
    cfg = DistOverlapConfig(
        reads_per_shard=Rb, max_read_len=L, k=7, lower=2, upper=8,
        xdrop=5, band=64, kmer_cap=4096, pair_cap=4096, align_cap=128)
    codes, lengths = make_workload(rng, ndev, Rb=Rb, L=L,
                                   read_len=200, genome_len=400)
    step = build_distributed_overlap_step(mesh, cfg)
    stats, local = step(jnp.asarray(codes), jnp.asarray(lengths))
    q = np.asarray(local["q"]).reshape(-1)
    t = np.asarray(local["t"]).reshape(-1)
    sc = np.asarray(local["score"]).reshape(-1)
    valid = np.asarray(local["valid"]).reshape(-1) & (sc > 0)
    starts = (np.arange(len(lengths)) * 200) // max(len(lengths) - 1, 1)
    ok = 0
    for i in np.flatnonzero(valid):
        ov = 200 - abs(int(starts[t[i]]) - int(starts[q[i]]))
        if ov > 7:  # x-drop on exact reads recovers the full overlap
            assert sc[i] == ov, (q[i], t[i], ov, sc[i])
            ok += 1
    assert ok > 0
