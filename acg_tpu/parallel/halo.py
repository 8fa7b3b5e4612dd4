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


def alltoall_halo(x_own: jnp.ndarray, pair_send_idx: jnp.ndarray,
                  ghost_src_dev: jnp.ndarray, ghost_src_pair_slot: jnp.ndarray,
                  axis: str = AXIS) -> jnp.ndarray:
    """General halo as a true neighbour alltoallv (halo.c:687-769 analogue).

    ``pair_send_idx`` (P, M): row q = the local owned indices this device
    packs for device q (static shapes via padding every p→q edge to the
    global max M, the symmetric-heap sizing trick of halo.c:883-891).
    After ``all_to_all``, row q of the received table holds what device q
    sent here; ``ghost_src_dev/ghost_src_pair_slot`` (G,) unpack it.

    Wire volume is P·M per device versus P·S for the all-gather (S = the
    union send buffer ≥ any M); for partitions with many neighbours but
    small pairwise edges this is the bandwidth-optimal strategy, matching
    the reference's point-to-point halo instead of a broadcast.
    """
    sendbuf = jnp.take(x_own, pair_send_idx, axis=0)     # (P, M) pack
    table = lax.all_to_all(sendbuf, axis, split_axis=0,
                           concat_axis=0, tiled=True)    # (P, M) per-sender
    return table[ghost_src_dev, ghost_src_pair_slot]     # (G,) unpack


def ragged_halo(x_own: jnp.ndarray, send_idx: jnp.ndarray,
                input_offsets: jnp.ndarray, send_sizes: jnp.ndarray,
                output_offsets: jnp.ndarray, recv_sizes: jnp.ndarray,
                G: int, axis: str = AXIS) -> jnp.ndarray:
    """Exact-wire-volume halo via `lax.ragged_all_to_all`.

    The true alltoallv of halo.c:687-769, without the max-edge padding the
    static `alltoall_halo` pays: each p→q edge ships exactly
    comm_matrix[p, q] words.  ``send_idx`` (Sr,) packs this device's
    exports grouped by destination (ascending global within each run);
    because the ghost list is sorted (owner, global), the received
    segments land contiguously in ghost order — the collective's output
    IS the ghost buffer (no unpack).  Padded ghost slots keep the zero
    the output buffer was initialised with (inert by the zero-value
    invariant).

    Note: XLA:CPU has no ragged-all-to-all thunk (UNIMPLEMENTED at
    runtime) — callers on the virtual CPU mesh must fall back; on TPU
    this is the bandwidth-optimal general halo."""
    sendbuf = jnp.take(x_own, send_idx, axis=0)          # (Sr,) pack
    out = jnp.zeros((G,), x_own.dtype)
    return lax.ragged_all_to_all(sendbuf, out, input_offsets, send_sizes,
                                 output_offsets, recv_sizes, axis_name=axis)
