"""Multi-host skeleton: base-balanced sharded ingest + rank-ordered output,
tested by emulation with injected process_index/process_count (the same
single-node trick as the reference's mpirun -np N golden tests)."""

import numpy as np
import pytest

from elba_tpu.dseq.dna import load_fasta
from elba_tpu.dseq.fai import greedy_partition, parse_faidx, read_owner
from elba_tpu.dseq.multihost import (global_names, load_fasta_sharded,
                                     partition_records,
                                     run_multihost_pipeline)
from elba_tpu.params import PipelineParams


@pytest.fixture(scope="module")
def sim_fa(tmp_path_factory):
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.simulate import simulate
    tmp = tmp_path_factory.mktemp("mh")
    prefix = str(tmp / "mh")
    simulate(prefix, genome_len=20000, nreads=40, read_len=2000,
             error=0.0, seed=9)
    return prefix + ".fa"


def test_partition_is_base_balanced_and_exact(sim_fa):
    records = parse_faidx(sim_fa + ".fai")
    lengths = [r.length for r in records]
    for pc in (2, 3, 5):
        ranges, displs = partition_records(sim_fa + ".fai", pc)
        # exact greedy rule (reference FastaIndex.cpp:69-93)
        counts = greedy_partition(lengths, pc)
        assert [hi - lo for lo, hi in ranges] == counts.tolist()
        # contiguous cover
        assert ranges[0][0] == 0 and ranges[-1][1] == len(records)
        for a, b in zip(ranges[:-1], ranges[1:]):
            assert a[1] == b[0]
        # owner lookup agrees
        for rid in range(len(records)):
            owner = read_owner(displs, rid)
            assert ranges[owner][0] <= rid < ranges[owner][1]


def test_sharded_ingest_reassembles_full_set(sim_fa):
    full = load_fasta(sim_fa)
    pc = 3
    shards = [load_fasta_sharded(sim_fa, pi, pc) for pi in range(pc)]
    assert sum(len(s) for s in shards) == len(full)
    gid = 0
    for s in shards:
        assert s.start_id == gid
        for i in range(len(s)):
            assert np.array_equal(s.read_codes(i), full.read_codes(gid))
            assert s.names[i] == full.names[gid]
            gid += 1
    assert global_names(sim_fa) == full.names


def test_multihost_pipeline_single_process(sim_fa, tmp_path):
    """pc=1 end to end through the multihost driver: outputs written once,
    results equal the distributed pipeline's."""
    params = PipelineParams(k=17, lower_freq=2, upper_freq=12, xdrop=5,
                            output_prefix=str(tmp_path / "mh"))
    R, S, contigs = run_multihost_pipeline(
        sim_fa, params, process_index=0, process_count=1)
    assert R.nnz > 0 and S.nnz > 0 and len(contigs) >= 1
    paf = (tmp_path / "mh.overlap.paf").read_text().strip().split("\n")
    assert len(paf) == R.nnz
    fa = (tmp_path / "mh.contigs.fa").read_text()
    assert fa.count(">contig") == len(contigs)


def test_multihost_ordered_output_emulation(sim_fa, tmp_path):
    """Three emulated processes write their shards; the final files hold
    every part in process order (MPI_File_write_ordered role).  The
    compute fan-in across shards is the multi-host mesh's job; here each
    emulated process writes a known payload through the same code path
    run_multihost_pipeline uses."""
    from elba_tpu.io.ordered import write_ordered
    from elba_tpu.io.fasta_out import contigs_fasta_bytes

    pc = 3
    path = str(tmp_path / "mh3.contigs.fa")
    parts = [contigs_fasta_bytes([f"ACGT{pi}"], id_offset=pi)
             for pi in range(pc)]
    # emulate: non-root processes write their part files first, then the
    # root concatenates (write_ordered's barrier contract)
    for pi in range(1, pc):
        write_ordered(parts[pi], path, process_index=pi, process_count=pc)
    write_ordered(parts[0], path, process_index=0, process_count=pc)
    data = open(path, "rb").read()
    assert data == b"".join(parts)
    assert data.count(b">contig") == pc
    import glob
    assert not glob.glob(path + ".part*")  # parts cleaned up
