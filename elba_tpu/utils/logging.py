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
    """Per-process log buffer; flush() gathers every process's buffered
    text to process 0, which prints one banner plus each process's lines in
    process order -- the reference's Logger::Flush Gather+Gatherv-to-root
    (Logger.cpp:83-129).  Single-process runs degrade to a plain print."""

    def __init__(self):
        self.buf: List[str] = []

    def __call__(self, msg: str):
        self.buf.append(str(msg))

    def flush(self, label: str, log=print, gather=None):
        """gather: callable(bytes) -> list[bytes] returning every process's
        payload in process order (injected in tests; defaults to
        multihost_utils.process_allgather when process_count > 1)."""
        pid = jax.process_index()
        pc = jax.process_count()
        payload = "\n".join(self.buf).encode()
        self.buf.clear()

        if gather is None:
            if pc == 1:
                gather = lambda b: [b]
            else:
                gather = _allgather_bytes
        texts = gather(payload)

        if pid != 0:
            return
        if log:
            log(f"==== {label} ====")
            for rank, blob in enumerate(texts):
                text = blob.decode()
                if not text:
                    continue
                for line in text.splitlines():
                    log(f"[proc {rank}] {line}")


def _allgather_bytes(payload: bytes):
    """All-gather variable-length byte strings across jax processes
    (the Gather-of-counts + Gatherv-of-bytes pair of the reference, done
    with one padded array allgather)."""
    import numpy as np
    from jax.experimental import multihost_utils

    n = len(payload)
    maxlen = int(multihost_utils.process_allgather(
        np.asarray(n, np.int32)).max())
    buf = np.zeros(maxlen, np.uint8)
    buf[:n] = np.frombuffer(payload, np.uint8)
    lens = multihost_utils.process_allgather(np.asarray(n, np.int32))
    all_bufs = multihost_utils.process_allgather(buf)
    return [all_bufs[r, :int(lens[r])].tobytes()
            for r in range(all_bufs.shape[0])]
