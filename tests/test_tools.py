"""Offline tooling: simulation oracle -> pipeline -> independent graph
check -> assembly evaluation, end to end."""

import subprocess
import sys

import numpy as np
import pytest

from elba_tpu.params import PipelineParams
from elba_tpu.pipeline import run_pipeline
from elba_tpu.io.mtx import (write_mtx_seed_matrix, write_mtx_kmer_matrix,
                             write_mtx_overlap_matrix)

sys.path.insert(0, "/root/repo")
from tools.simulate import simulate  # noqa: E402
from tools.paf_graph import analyze  # noqa: E402
from tools.eval_assembly import evaluate  # noqa: E402


@pytest.fixture(scope="module")
def sim_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sim")
    prefix = str(tmp / "sim")
    simulate(prefix, genome_len=30000, nreads=60, read_len=2500,
             error=0.0, seed=3)
    params = PipelineParams(k=17, lower_freq=2, upper_freq=12, xdrop=5,
                            output_prefix=prefix)
    result = run_pipeline(prefix + ".fa", params, log=None)
    return prefix, result


def test_simulated_assembly_reconstructs_genome(sim_run):
    prefix, result = sim_run
    stats = evaluate(prefix + ".contigs.fa", prefix + ".genome.fa", k=31)
    assert stats["contigs"] >= 1
    assert stats["genome_fraction"] > 95.0, stats
    # random 5x sampling can split the assembly; require substantial contigs
    assert stats["largest"] > 8000, stats


def test_eval_spurious_anchor_does_not_inflate_fraction(tmp_path):
    """A contig equal to one genome segment plus ONE distant repeat
    k-mer must cover only its true span: the diagonal-consistency rule
    keeps the far anchor from marking the whole [min, max] range."""
    rng = np.random.default_rng(7)
    bases = "ACGT"
    genome = "".join(bases[i] for i in rng.integers(0, 4, 200_000))
    k = 31
    # plant the SAME 31-mer at a position far from the contig's locus so
    # the contig's sampled anchors include one distant hit
    repeat = genome[1000:1000 + k]
    genome = genome[:150_000] + repeat + genome[150_000 + k:]
    contig = genome[500:10_500]
    gpath, cpath = tmp_path / "g.fa", tmp_path / "c.fa"
    gpath.write_text(f">g\n{genome}\n")
    cpath.write_text(f">c\n{contig}\n")
    stats = evaluate(str(cpath), str(gpath), k=k)
    # true coverage = 10kb of 200kb = 5%; the naive [min, max] span rule
    # would report ~75% (anchors at ~1k and ~150k)
    assert stats["genome_fraction"] < 8.0, stats
    assert stats["anchored_contigs"] == 1


def test_eval_empty_genome_does_not_crash(tmp_path):
    gpath, cpath = tmp_path / "g.fa", tmp_path / "c.fa"
    gpath.write_text(">g\nACGT\n")   # shorter than k: empty index
    cpath.write_text(">c\nACGTACGTACGTACGTACGTACGTACGTACGTACGT\n")
    stats = evaluate(str(cpath), str(gpath), k=31)
    assert stats["genome_fraction"] == 0.0
    assert stats["anchored_contigs"] == 0


def test_truth_overlap_recall(sim_run):
    """Every sufficiently-long true overlap must appear in R."""
    prefix, result = sim_run
    truth = {}
    with open(prefix + ".truth.tsv") as f:
        next(f)
        for line in f:
            a, b, ov = line.split()
            truth[(a, b)] = int(ov)
    names = result.readset.names
    found = set()
    for i in range(result.R.nnz):
        found.add((names[result.R.rows[i]], names[result.R.cols[i]]))
    long_truth = {k for k, ov in truth.items() if ov >= 800}
    recall = len(long_truth & found) / max(len(long_truth), 1)
    assert recall > 0.95, (recall, len(long_truth))


def test_paf_graph_cross_check(sim_run):
    """The independent serial chain walker must agree with the pipeline's
    contig count on the string graph PAF."""
    prefix, result = sim_run
    info = analyze(prefix + ".string.paf")
    assert info["chains"] == len(result.contigs)
    assert sum(info["chain_sizes"]) <= info["nodes"]


def test_mtx_dumps(sim_run, tmp_path):
    prefix, result = sim_run
    write_mtx_kmer_matrix(result.A, str(tmp_path / "A.mtx"))
    write_mtx_seed_matrix(result.B, str(tmp_path / "B.mtx"), brief=False)
    write_mtx_overlap_matrix(result.R, str(tmp_path / "R.mtx"))
    a = (tmp_path / "A.mtx").read_text().splitlines()
    assert a[0].startswith("%%MatrixMarket")
    assert int(a[1].split()[2]) == result.A.nnz

    # run the seed checker tool on the dump
    rc = subprocess.run(
        [sys.executable, "/root/repo/tools/check_seeds.py",
         prefix + ".fa", str(tmp_path / "B.mtx"), "17"],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stdout + rc.stderr
    assert "0 bad" in rc.stdout


def test_native_paf_matches_python(sim_run, tmp_path):
    from elba_tpu.io.paf import write_paf, paf_lines
    import elba_tpu.native.loader as L
    prefix, result = sim_run
    write_paf(result.R, result.readset.names, str(tmp_path / "native.paf"))
    expect = "\n".join(paf_lines(result.R, result.readset.names)) + "\n"
    got = (tmp_path / "native.paf").read_text()
    assert got == expect


def test_write_ordered_multiprocess_emulation(tmp_path):
    from elba_tpu.io.ordered import write_ordered
    path = str(tmp_path / "out.paf")
    # emulate 3 processes; non-root parts land first (the barrier
    # guarantees this ordering in a real multi-host run)
    for pi in (2, 1):
        write_ordered(f"part{pi}\n".encode(), path,
                      process_index=pi, process_count=3)
    write_ordered(b"part0\n", path, process_index=0, process_count=3)
    assert open(path).read() == "part0\npart1\npart2\n"


def _golden_hashes():
    import json, os
    p = os.path.join(os.path.dirname(__file__), "golden", "hashes.json")
    with open(p) as f:
        return json.load(f)


def _sha(path):
    import hashlib
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_sim30k_outputs_match_golden(sim_run):
    """Committed golden hashes pin the WHOLE pipeline's output across
    rounds (the reference's runtests.sh golden-diff role): a regression
    where single-device and distributed paths drift together is caught
    here."""
    prefix, _ = sim_run
    want = _golden_hashes()["sim30k"]
    for ext, h in want.items():
        assert _sha(prefix + ext) == h, f"golden drift in {ext}"


def test_sim20k_err_outputs_match_golden(tmp_path):
    """Noisy-read fixture (1% error): exercises mismatch/indel scoring and
    rc handling through the golden pin."""
    prefix = str(tmp_path / "sim20k_err")
    simulate(prefix, genome_len=20000, nreads=50, read_len=2000,
             error=0.01, seed=11)
    params = PipelineParams(k=17, lower_freq=2, upper_freq=12, xdrop=5,
                            output_prefix=prefix)
    run_pipeline(prefix + ".fa", params, log=None)
    want = _golden_hashes()["sim20k_err"]
    for ext, h in want.items():
        assert _sha(prefix + ext) == h, f"golden drift in {ext}"


def test_ladder_stage_watchdog():
    """The orchestrator's stall watchdog must kill a silent stage (dead
    tunnel connection signature), time out an over-wall stage, and pass
    through a clean exit — each by exact process group, never pattern."""
    from tools.run_ladder import _run_stage_watched
    py = sys.executable
    assert _run_stage_watched([py, "-c", "print('ok')"], 60, 30) == 0
    assert _run_stage_watched([py, "-c", "raise SystemExit(3)"],
                              60, 30) == 3
    rc = _run_stage_watched(
        [py, "-c", "import time; time.sleep(600)"], 120, 4)
    assert rc == "stalled"
    rc = _run_stage_watched(
        [py, "-c",
         "import time\nwhile True: print('x', flush=True); time.sleep(1)"],
        5, 60)
    assert rc == "timeout"
