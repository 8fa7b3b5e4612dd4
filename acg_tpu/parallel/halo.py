"""Halo exchange as XLA collectives (acg/halo.{h,c} + halo.cu analogue).

The reference implements the ghost-entry exchange as an irregular neighbor
alltoallv with explicit pack/unpack kernels and five comm backends
(MPI persistent requests / NCCL grouped send-recv / NVSHMEM put-signal,
halo.c:1456-1623).  On TPU there is one backend — XLA collectives — and two
strategies:

  * ``stencil_halo``: for contiguous partitions of banded matrices the
    ghosts are exactly the hw-wide edges of the neighbouring blocks; the
    exchange is two `ppermute`s (left and right edge slices).  O(surface),
    rides ICI neighbour links; the analogue of aCG's neighbour P2P.
  * ``allgather_halo``: general partitions pack one send buffer per device
    (slot-addressed union of all neighbours' requests — the reference's
    NVSHMEM symmetric-heap max-padding idea, halo.c:883-891) and
    `all_gather` the (P, S) table; each device picks its ghosts by static
    indices.  Simple and static-shaped; an all_to_all refinement can
    replace it without touching callers.

Both run *inside* shard_map, inside the compiled solver loop — the
device-initiated execution model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .mesh import AXIS


def stencil_halo(x_own: jnp.ndarray, hw: int, nparts: int,
                 axis: str = AXIS) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exchange hw-wide edges with ring neighbours.

    Returns (left_ext, right_ext): the last hw entries of the left
    neighbour's block and the first hw of the right neighbour's (zeros at
    the global boundary, matching the generator's boundary masks).
    """
    if nparts == 1:
        z = jnp.zeros((hw,), x_own.dtype)
        return z, z
    # send my right edge to my right neighbour (it becomes their left_ext)
    left_ext = lax.ppermute(x_own[-hw:], axis,
                            perm=[(i, i + 1) for i in range(nparts - 1)])
    # send my left edge to my left neighbour (their right_ext)
    right_ext = lax.ppermute(x_own[:hw], axis,
                             perm=[(i + 1, i) for i in range(nparts - 1)])
    return left_ext, right_ext


def allgather_halo(x_own: jnp.ndarray, send_idx: jnp.ndarray,
                   ghost_src_dev: jnp.ndarray, ghost_src_slot: jnp.ndarray,
                   axis: str = AXIS) -> jnp.ndarray:
    """General halo: pack → all_gather table → pick ghosts.

    ``send_idx`` (S,): local owned indices to export (pack kernel analogue,
    halo.cu:41-92).  ``ghost_src_dev/slot`` (G,): where each ghost slot
    lives in the gathered table (unpack analogue, halo.cu:94-145).
    """
    sendbuf = jnp.take(x_own, send_idx, axis=0)
    table = lax.all_gather(sendbuf, axis)          # (P, S)
    return table[ghost_src_dev, ghost_src_slot]    # (G,)
