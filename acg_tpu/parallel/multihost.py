"""Multi-host (multi-process) initialization helpers.

The reference scales across nodes with `mpirun`/`pjsub` launching one MPI
rank per GPU (scripts/mpi_combined.sh, acg-cuda.c:891-1041).  The JAX
analogue is one *process per host* with `jax.distributed.initialize`; the
mesh then spans every host's chips, halo ppermutes ride ICI within a
slice and DCN across slices, and NOTHING else in this framework changes —
`make_mesh()` already uses the global `jax.devices()` list.

Typical launch (per host)::

    ACG_COORDINATOR=host0:1234 ACG_NUM_PROCESSES=2 ACG_PROCESS_ID=$RANK \
        python -m acg_tpu.cli.main A.mtx --comm xla --nparts 16 ...

with ``init_multihost()`` called first (the CLI calls it automatically
when the env vars are present).  On Cloud TPU Pods the arguments are
auto-detected and plain ``jax.distributed.initialize()`` suffices.
"""

from __future__ import annotations

import os

_INITIALIZED = False


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Initialize the JAX distributed runtime if configured.

    Arguments default to the ACG_COORDINATOR / ACG_NUM_PROCESSES /
    ACG_PROCESS_ID environment variables; if none are present and the
    platform cannot auto-detect (non-pod), this is a no-op returning
    False.  Safe to call more than once.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator = coordinator or os.environ.get("ACG_COORDINATOR")
    num_processes = num_processes or _int_env("ACG_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else _int_env("ACG_PROCESS_ID")

    import jax

    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True
    return True


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) — (0, 1) when single-process."""
    import jax

    return jax.process_index(), jax.process_count()
