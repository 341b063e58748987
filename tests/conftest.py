"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (same trick as the
reference's `mpirun -np {1,4,9,16}` single-node testing, runtests.sh)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The container's sitecustomize force-registers the axon TPU backend as the
# default regardless of JAX_PLATFORMS; pin the test session to CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at module boundaries.

    A full-suite run accumulates hundreds of XLA CPU executables; by
    ~test 170/189 the CPU client segfaulted inside backend_compile_and
    _load (observed twice, round 4 — the same test passes in isolation).
    Dropping caches between modules bounds resident compile state; the
    within-module cache (where shapes actually repeat) is untouched.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0xE1BA)


REFERENCE_READS = "/root/reference/reads.fa"


@pytest.fixture(scope="session")
def sample_reads():
    """The in-repo 227-read E. coli sample fixture of the reference."""
    from elba_tpu.dseq.dna import load_fasta
    return load_fasta(REFERENCE_READS)


def random_dna(rng, n):
    return rng.integers(0, 4, size=n, dtype=np.uint8)


def mutate(rng, codes, sub_rate=0.02, indel_rate=0.01):
    """Apply random substitutions and indels; returns mutated codes."""
    out = []
    i = 0
    while i < len(codes):
        r = rng.random()
        if r < indel_rate / 2:
            i += 1  # deletion
            continue
        if r < indel_rate:
            out.append(rng.integers(0, 4))  # insertion
            continue
        if r < indel_rate + sub_rate:
            out.append((codes[i] + rng.integers(1, 4)) % 4)
        else:
            out.append(codes[i])
        i += 1
    return np.array(out, dtype=np.uint8)
