import numpy as np
import pytest

from elba_tpu.dseq import (ascii_to_codes, codes_to_ascii, greedy_partition,
                           pack_2bit, unpack_2bit, revcomp_codes, read_owner,
                           ReadSet, parse_faidx)
from tests.conftest import REFERENCE_READS


def test_ascii_roundtrip():
    s = "ACGTACGTNNacgtn"
    codes = ascii_to_codes(s)
    # N/n -> A, lowercase folds to uppercase
    assert codes_to_ascii(codes) == "ACGTACGTAAACGTA"


def test_revcomp():
    codes = ascii_to_codes("ACGT")
    assert codes_to_ascii(revcomp_codes(codes)) == "ACGT"
    codes = ascii_to_codes("AACG")
    assert codes_to_ascii(revcomp_codes(codes)) == "CGTT"


def test_pack_unpack_roundtrip(rng):
    for n in [1, 3, 4, 5, 8, 17, 1000]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        assert np.array_equal(unpack_2bit(pack_2bit(codes), n), codes)


def test_greedy_partition_exact_rule():
    # 10 reads of len 10, 4 parts, avg 25: parts accumulate while
    # bases + next < 25 -> 2 reads each (20 < 25, 30 !< 25), last gets rest
    lens = [10] * 10
    counts = greedy_partition(lens, 4)
    assert counts.tolist() == [2, 2, 2, 4]
    assert counts.sum() == 10


def test_greedy_partition_unbalanced():
    # a huge first read exceeding the per-part average cannot be placed
    # (the reference asserts here too, FastaIndex.cpp:85)
    with pytest.raises(ValueError):
        greedy_partition([100, 1, 1, 1, 1, 1, 1], 2)
    # skewed but feasible
    counts = greedy_partition([5, 5, 5, 40], 2)
    assert counts.sum() == 4 and counts[0] >= 1


def test_read_owner():
    displs = np.array([0, 3, 6, 10])
    assert read_owner(displs, 0) == 0
    assert read_owner(displs, 2) == 0
    assert read_owner(displs, 3) == 1
    assert read_owner(displs, 9) == 2


def test_load_reference_fixture(sample_reads):
    # independent parse of the FASTA
    seqs = {}
    name = None
    with open(REFERENCE_READS) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                name = line[1:].split()[0]
                seqs[name] = []
            else:
                seqs[name].append(line)
    seqs = {k: "".join(v) for k, v in seqs.items()}

    assert len(sample_reads) == len(seqs) == 227
    fai = parse_faidx(REFERENCE_READS + ".fai")
    for i in range(len(sample_reads)):
        nm = sample_reads.names[i]
        expect = seqs[nm].upper().replace("N", "A")
        assert sample_reads.read_ascii(i) == expect
        assert sample_reads.lengths[i] == fai[i].length


def test_readset_from_sequences():
    rs = ReadSet.from_sequences(["ACGT", "GGGTTT"])
    assert len(rs) == 2
    assert rs.read_ascii(1) == "GGGTTT"
    padded = rs.padded_codes()
    assert padded.shape == (2, 6)
    assert np.array_equal(padded[0, :4], ascii_to_codes("ACGT"))
