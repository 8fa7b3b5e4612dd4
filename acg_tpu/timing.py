"""Timers and per-operation performance counters.

The reference keeps always-on software counters — per-op (time, count, bytes)
triples updated around every kernel/collective (acg/cg.h:60-98,
acg/cgcuda.h:68-117) — and prints a breakdown with GB/s per op
(acgsolver_fwrite, acg/cg.c:665-845).

On TPU the whole solve is one compiled program, so per-op host timing of the
hot loop is neither possible nor meaningful; instead we:
  * count ops and bytes analytically from the matrix/vector shapes
    (exact, by construction of the loop), and
  * time whole phases (setup, compile, solve) on the host, and
  * leave fine-grained on-device attribution to ``jax.profiler`` traces
    (the nsys/NVTX analogue, see profile.py).
"""

from __future__ import annotations

import dataclasses
import time
from contextlib import contextmanager


def gettime() -> float:
    """Monotonic wall-clock (acg/time.h:56-93 analogue)."""
    return time.perf_counter()


@dataclasses.dataclass
class OpCounter:
    """(time, count, bytes) triple for one op class."""

    t: float = 0.0
    n: int = 0
    bytes: int = 0

    def add(self, t: float = 0.0, n: int = 1, nbytes: int = 0) -> None:
        self.t += t
        self.n += n
        self.bytes += nbytes

    @property
    def gbps(self) -> float:
        return 1.0e-9 * self.bytes / self.t if self.t > 0 else 0.0


class PhaseTimer:
    """Named phase timers for setup stages (read/partition/scatter/...)."""

    def __init__(self) -> None:
        self.phases: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = gettime()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (gettime() - t0)

    def report(self) -> str:
        return "\n".join(f"  {k}: {v:.6f} seconds" for k, v in self.phases.items())
