"""Device-mesh helpers.

The reference binds one MPI rank per GPU and selects devices by
shared-memory rank (acg-cuda.c:1014-1041).  The JAX analogue is a 1-D
`jax.sharding.Mesh` over however many chips the slice exposes; rows of the
partitioned matrix map to mesh positions.  Multi-host runs use the same
mesh spanning all processes' devices (ICI within a host/slice, DCN across).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "d"  # the single partition axis (row/graph partition)


def make_mesh(nparts: int | None = None, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if nparts is None:
        nparts = len(devs)
    if nparts > len(devs):
        raise ValueError(f"requested {nparts} parts but only {len(devs)} devices")
    return jax.make_mesh((nparts,), (AXIS,), devices=devs[:nparts])


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (P·L,) stacked local vectors: rows over the mesh."""
    return NamedSharding(mesh, P(AXIS))


def slab_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (K, P·L) operator slabs: columns over the mesh."""
    return NamedSharding(mesh, P(None, AXIS))


def stacked_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (P, ...) stacked per-part arrays: leading axis."""
    return NamedSharding(mesh, P(AXIS))
