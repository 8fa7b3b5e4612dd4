"""Communicator abstraction (acg/comm.{h,c} analogue).

The reference hides five backends (MPI, NCCL, RCCL, NVSHMEM, rocSHMEM)
behind ``struct acgcomm`` with a tiny vocabulary: allreduce of 1-2 doubles,
neighbour alltoallv (halo), barrier (comm.h:84-117, SURVEY.md §5.8).  On
TPU there is exactly one backend — XLA collectives compiled into the
program — so this module is the *naming* layer that keeps the reference's
API shape: a ``Comm`` object bound to a mesh axis whose methods emit the
corresponding collective when called under ``shard_map`` (and degrade to
identities for a single device, matching the reference's commsize==1 fast
paths, cgcuda.c:524,857).

The reference's comm *types* remain as aliases so driver scripts written
against ``--comm mpi|nccl|nvshmem`` run unchanged; they all map to XLA.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
from jax import lax

from .mesh import AXIS


class CommType(enum.Enum):
    """acgcommtype analogue (comm.h:84-92).  Everything non-null is XLA."""

    NULL = "none"
    XLA = "xla"

    @classmethod
    def parse(cls, name: str) -> "CommType":
        name = name.lower()
        if name in ("none", "null"):
            return cls.NULL
        # reference backend names accepted for script parity — one backend
        # replaces five (SURVEY.md §5.8)
        if name in ("xla", "mpi", "nccl", "rccl", "nvshmem", "rocshmem"):
            return cls.XLA
        raise ValueError(f"unknown comm type: {name!r}")


@dataclasses.dataclass(frozen=True)
class Comm:
    """A communicator bound to a mesh axis (struct acgcomm analogue).

    Methods must be called inside ``shard_map`` over a mesh that has
    ``axis`` (except with type NULL / size 1, where they are identities
    usable anywhere).
    """

    type: CommType = CommType.NULL
    axis: str = AXIS
    size: int = 1

    @property
    def is_null(self) -> bool:
        return self.type == CommType.NULL or self.size <= 1

    # --- collectives (comm.h:251-365 analogues) -----------------------------

    def allreduce(self, v):
        """Sum a scalar or small stacked vector across the axis
        (acgcomm_allreduce, comm.c:352-408)."""
        if self.is_null:
            return v
        return lax.psum(v, self.axis)

    def barrier(self, token=None):
        """Order-enforcing no-op (acgcomm_barrier, comm.c:316-346).

        The reference barriers with a 0-byte allreduce; the XLA analogue
        threads a zero-valued scalar through a psum so the compiler cannot
        reorder across it.  Returns the token to add to a downstream value.
        """
        t = jnp.zeros((), jnp.float32) if token is None else token
        if self.is_null:
            return t
        return lax.psum(t * 0, self.axis)

    def rank_index(self):
        """This device's position along the axis (acgcomm_rank analogue)."""
        if self.is_null:
            return jnp.zeros((), jnp.int32)
        return lax.axis_index(self.axis)


def make_comm(comm: str | CommType, nparts: int, axis: str = AXIS) -> Comm:
    ct = CommType.parse(comm) if isinstance(comm, str) else comm
    if nparts <= 1:
        ct = CommType.NULL
    return Comm(type=ct, axis=axis, size=nparts)
