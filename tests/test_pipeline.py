"""End-to-end pipeline tests: synthetic-genome oracle (the reference's
simfor.py strategy, SURVEY.md section 4.3) and the in-repo 227-read E. coli
fixture with the seed-matrix semantic check (the reference's test.py)."""

import numpy as np
import pytest

from elba_tpu.dseq.dna import ReadSet, codes_to_ascii, ascii_to_codes
from elba_tpu.params import PipelineParams
from elba_tpu.pipeline import run_pipeline
from elba_tpu.align.pairwise import pairwise_alignment
from elba_tpu.kmers.count import build_kmer_matrix
from elba_tpu.dsparse.seedmat import build_seed_matrix
from elba_tpu.graph.prune import prune_overlap_graph
from elba_tpu.graph.tr import transitive_reduction
from elba_tpu.graph.contigs import generate_contigs


def tiled_reads(rng, genome_len=20000, read_len=2000, stride=500,
                flip=None):
    genome = rng.integers(0, 4, genome_len, dtype=np.uint8)
    seqs = []
    starts = list(range(0, genome_len - read_len + 1, stride))
    for i, s in enumerate(starts):
        r = genome[s:s + read_len]
        if flip and flip(i):
            r = (3 - r[::-1]).astype(np.uint8)
        seqs.append(codes_to_ascii(r))
    return genome, ReadSet.from_sequences(seqs)


def assemble(readset, params):
    A = build_kmer_matrix(readset, params.k, params.lower_freq,
                          params.upper_freq)
    B = build_seed_matrix(A, min_shared=2, full=True)
    R = pairwise_alignment(readset, B, params.k, params.mat, params.mis,
                           params.gap, params.xdrop)
    Rp = prune_overlap_graph(R, params.bad_read_cutoff)
    S = transitive_reduction(Rp)
    contigs = generate_contigs(S, readset)
    return A, B, R, S, contigs


PARAMS = PipelineParams(k=17, lower_freq=2, upper_freq=12, xdrop=5)


def test_perfect_tiling_reconstructs_genome(rng):
    genome, rs = tiled_reads(rng)
    A, B, R, S, contigs = assemble(rs, PARAMS)
    assert len(contigs) == 1
    expect = codes_to_ascii(genome)
    rc = codes_to_ascii((3 - genome[::-1]).astype(np.uint8))
    assert contigs[0] in (expect, rc)


def test_mixed_strand_tiling(rng):
    genome, rs = tiled_reads(rng, flip=lambda i: i % 3 == 1)
    A, B, R, S, contigs = assemble(rs, PARAMS)
    assert len(contigs) == 1
    expect = codes_to_ascii(genome)
    rc = codes_to_ascii((3 - genome[::-1]).astype(np.uint8))
    assert contigs[0] in (expect, rc)


def test_two_separate_genomes(rng):
    g1, rs1 = tiled_reads(rng, genome_len=12000)
    g2, rs2 = tiled_reads(rng, genome_len=14000)
    seqs = [rs1.read_ascii(i) for i in range(len(rs1))] + \
           [rs2.read_ascii(i) for i in range(len(rs2))]
    rs = ReadSet.from_sequences(seqs)
    A, B, R, S, contigs = assemble(rs, PARAMS)
    assert len(contigs) == 2
    lens = sorted(len(c) for c in contigs)
    assert lens == sorted([12000, 14000])
    outs = set(contigs)
    for g in (g1, g2):
        fwd = codes_to_ascii(g)
        rc = codes_to_ascii((3 - g[::-1]).astype(np.uint8))
        assert fwd in outs or rc in outs


def seed_semantic_check(readset, B, k):
    """The reference's test.py invariant: for every stored seed pair the
    k-mer at begQ equals the k-mer at begT or its reverse complement."""
    m = B.mat
    nchecked = 0
    for i in range(min(m.nnz, 2000)):
        q = readset.read_codes(int(m.rows[i]) - readset.start_id)
        t = readset.read_codes(int(m.cols[i]) - readset.start_id)
        pq = int(m.vals["seedQ0"][i])
        pt = int(m.vals["seedT0"][i])
        kq = q[pq:pq + k]
        kt = t[pt:pt + k]
        ktrc = (3 - kt[::-1]).astype(kt.dtype)
        assert np.array_equal(kq, kt) or np.array_equal(kq, ktrc), (i, pq, pt)
        nchecked += 1
    return nchecked


def test_seed_semantics_synthetic(rng):
    genome, rs = tiled_reads(rng, flip=lambda i: i % 2 == 0)
    A = build_kmer_matrix(rs, PARAMS.k, PARAMS.lower_freq, PARAMS.upper_freq)
    B = build_seed_matrix(A, min_shared=2, full=True)
    assert seed_semantic_check(rs, B, PARAMS.k) > 0


@pytest.mark.slow
def test_reference_fixture_e2e(tmp_path, sample_reads):
    """Full pipeline on the reference's reads.fa (227 E. coli reads)."""
    params = PipelineParams(k=17, lower_freq=2, upper_freq=8, xdrop=5,
                            output_prefix=str(tmp_path / "elba"))
    result = run_pipeline("/root/reference/reads.fa", params, log=None)
    # sanity: alignments exist and the string graph is a subgraph of R-sym
    assert result.R.nnz > 0
    assert result.S.nnz > 0
    assert (tmp_path / "elba.overlap.paf").exists()
    assert (tmp_path / "elba.string.paf").exists()
    assert (tmp_path / "elba.contigs.fa").exists()
    # seed matrix semantic invariant on the real data
    assert seed_semantic_check(result.readset, result.B, 17) > 0
    # every string-graph edge has a direction and passed alignment
    assert np.all(result.S.vals["direction"] != -1)
    assert np.all(result.S.vals["passed"])
    # PAF line count matches matrix nnz
    lines = (tmp_path / "elba.overlap.paf").read_text().strip().split("\n")
    assert len(lines) == result.R.nnz
    for line in lines[:5]:
        f = line.split("\t")
        assert len(f) == 13 and f[11] == "255" and f[4] in "+-"
    # byte-identical to the committed golden outputs (cross-round drift pin,
    # the role of the reference's committed ecoli.np*.txt, runtests.sh:1-24)
    import os
    golden = os.path.join(os.path.dirname(__file__), "golden")
    for ext in ("overlap.paf", "string.paf", "contigs.fa"):
        got = (tmp_path / f"elba.{ext}").read_bytes()
        want = open(os.path.join(golden, f"readsfa.{ext}"), "rb").read()
        assert got == want, f"golden drift in {ext}"


def test_pipeline_multipass_counting_matches(tmp_path):
    """run_pipeline with forced multi-pass grouped counting (the beyond-
    HBM TPU path, CPU-exercisable via count_parts) must write byte-equal
    outputs to the default path."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.simulate import simulate
    prefix = str(tmp_path / "mp")
    simulate(prefix, genome_len=25000, nreads=50, read_len=2500,
             error=0.0, seed=11)
    pa = PipelineParams(k=17, lower_freq=2, upper_freq=12, xdrop=5,
                        output_prefix=prefix + ".a")
    pb = PipelineParams(k=17, lower_freq=2, upper_freq=12, xdrop=5,
                        output_prefix=prefix + ".b")
    ra = run_pipeline(prefix + ".fa", pa, log=None)
    rb = run_pipeline(prefix + ".fa", pb, log=None,
                      count_parts=5, count_group=3)
    assert rb.A.num_kmers == ra.A.num_kmers and rb.A.nnz == ra.A.nnz
    assert rb.R.nnz == ra.R.nnz and rb.S.nnz == ra.S.nnz
    for ext in (".overlap.paf", ".string.paf", ".contigs.fa"):
        a = open(prefix + ".a" + ext, "rb").read()
        b = open(prefix + ".b" + ext, "rb").read()
        assert a == b, ext
