"""Observability: phase timers and per-process logging.

Replaces the reference's MPITimer (barrier-synced max-wall + summed
proc-seconds per phase, MPITimer.hpp:31-47) and Logger (per-rank buffers
gathered to root, Logger.cpp:83-129).  In the JAX setting "processes" are
jax processes (multi-host) and synchronization is a trivial device sync;
single-process runs degrade to plain timers.
"""

from __future__ import annotations

import io
import time
from typing import Dict, List, Optional

import jax


class PhaseTimer:
    """Phase timer reporting wall seconds per phase plus process-seconds
    (wall * num_processes) like the reference's 'total cost'."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.phases: Dict[str, float] = {}
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    def _barrier(self):
        if self.sync:
            try:
                jax.block_until_ready(jax.numpy.zeros(()))
            except Exception:
                pass

    def start(self, name: str):
        self._barrier()
        self._name = name
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        self._barrier()
        dt = time.perf_counter() - self._t0
        self.phases[self._name] = self.phases.get(self._name, 0.0) + dt
        self._name = None
        return dt

    def stop_and_log(self, log=print) -> float:
        name = self._name
        dt = self.stop()
        nproc = jax.process_count()
        if log:
            log(f"[timer] {name}: {dt:.3f}s wall, {dt * nproc:.3f} "
                f"proc-seconds across {nproc} processes")
        return dt

    def report(self) -> str:
        out = io.StringIO()
        total = sum(self.phases.values())
        for name, dt in self.phases.items():
            out.write(f"{name}\t{dt:.3f}s\t{100 * dt / max(total, 1e-9):.1f}%\n")
        out.write(f"total\t{total:.3f}s\n")
        return out.getvalue()


class ProcessLogger:
    """Per-process log buffer; flush() prints a banner plus each
    process's buffered lines (single-host: just this process; multi-host:
    each jax process prints its own under the same banner, which is the
    SPMD equivalent of the reference's gatherv-to-root)."""

    def __init__(self):
        self.buf: List[str] = []

    def __call__(self, msg: str):
        self.buf.append(str(msg))

    def flush(self, label: str, log=print):
        pid = jax.process_index()
        if log:
            log(f"==== {label} ====")
            for line in self.buf:
                log(f"[proc {pid}] {line}")
        self.buf.clear()
