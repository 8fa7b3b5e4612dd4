"""Distributed operators: per-device SpMV closures used inside shard_map.

The analogue of the reference's owned-block/interface-block operator split
(symcsrmatrix.h:249-292, built in acgsymcsrmatrix_dsymv_init): each device
computes its owned rows from (a) the owned part of x and (b) the ghost
entries delivered by the halo exchange.  The split keeps the interior
contribution independent of the halo so XLA's scheduler can overlap the
collective with interior compute (the commstream/stream overlap of
cgcuda.c:855-899, done by the compiler instead of two CUDA streams).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax.numpy as jnp
import numpy as np
from jax import lax

from .halo import allgather_halo, stencil_halo
from .mesh import AXIS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class StencilPlan:
    """Static metadata for the banded ghost-zone operator."""

    offsets: tuple[int, ...]
    N: int            # logical rows
    nparts: int
    L: int            # rows per device (padded)
    hw: int           # halo width = max |offset|

    @property
    def Ng(self) -> int:
        return self.nparts * self.L


def make_stencil_plan(offsets, N: int, nparts: int, pad_to: int = 256) -> StencilPlan:
    offsets = tuple(int(o) for o in np.asarray(offsets))
    hw = max(max(abs(o) for o in offsets), 1)
    L = _round_up(-(-N // nparts), pad_to)
    if hw > L:
        raise ValueError(
            f"halo width {hw} exceeds rows-per-device {L}; "
            f"use fewer parts or the general operator")
    return StencilPlan(offsets=offsets, N=N, nparts=nparts, L=L, hw=hw)


def pad_stencil_operand(plan: StencilPlan, vals: np.ndarray) -> np.ndarray:
    """(K, N) host slabs → (K, Ng) padded for sharding over the mesh."""
    K, N = vals.shape
    assert N == plan.N
    return np.pad(vals, ((0, 0), (0, plan.Ng - N)))


def pad_stencil_vector(plan: StencilPlan, x: np.ndarray) -> np.ndarray:
    return np.pad(np.asarray(x), (0, plan.Ng - x.shape[0]))


def stencil_spmv_local(plan: StencilPlan, vals_l: jnp.ndarray,
                       x_own: jnp.ndarray, axis: str = AXIS,
                       backend: str = "xla",
                       overlap: bool = True) -> jnp.ndarray:
    """Per-device banded SpMV with ring halo (runs inside shard_map).

    vals_l: (K, L) local diagonal slabs, x_own: (L,).  The device's rows
    are a contiguous slice of the global banded matrix, so its SpMV is the
    row-slice of the global DIA product over x_ext = [left|own|right].

    ``overlap=True`` (default) expresses the owned/interface operator
    split of the reference (symcsrmatrix.c:760-845 + cgcuda.c:855-899):
    the bulk product consumes x_own with ZERO boundaries — no data
    dependency on the ppermutes — and the halo contributions are added
    afterwards as O(hw)-row corrections to the first/last hw rows.  XLA's
    latency-hiding scheduler is then free to run the collective-permute
    concurrently with the owned product (with the old concatenated form
    the kernel consumed the halo directly, forcing serialization).
    tests/test_dist.py::test_interior_rows_independent_of_halo pins the
    dependency structure.  Boundary-row sums reassociate ((halo terms) +
    (own terms) instead of interleaved-by-offset), so results differ from
    ``overlap=False`` by normal fp reassociation only.

    ``backend="pallas"`` runs the owned product through the streaming
    kernels of ops/pallas_dia.py (ring when profitable).
    """
    hw, L = plan.hw, plan.L
    left_ext, right_ext = stencil_halo(x_own, hw, plan.nparts, axis)
    if not overlap:
        if backend == "pallas":
            from ..ops.pallas_dia import (dia_spmv_pallas, pallas_halo_width,
                                          pick_block)
            hw_p = pallas_halo_width(hw)
            pad = jnp.zeros((hw_p - hw,), x_own.dtype)
            x_ext = jnp.concatenate([pad, left_ext, x_own, right_ext, pad])
            block = pick_block(L, len(plan.offsets), hw_p,
                               vals_l.dtype.itemsize)
            return dia_spmv_pallas(vals_l, x_ext, plan.offsets, hw_p, block)
        x_ext = jnp.concatenate([left_ext, x_own, right_ext])
        y = None
        for k, off in enumerate(plan.offsets):
            xk = lax.slice_in_dim(x_ext, hw + off, hw + off + L)
            term = vals_l[k] * xk
            y = term if y is None else y + term
        return y

    # ---- owned product: zero boundaries, independent of the halo ----------
    if backend == "pallas":
        from ..ops.pallas_dia import (dia_spmv_pallas_np, dia_spmv_ring,
                                      pallas_halo_width, pick_block,
                                      pick_block_ring)
        K = len(plan.offsets)
        isz = vals_l.dtype.itemsize
        block_r = pick_block_ring(L, K, hw, isz)
        if block_r is not None:
            y0 = dia_spmv_ring(vals_l, x_own, plan.offsets, block_r)
        else:
            hw_p = pallas_halo_width(hw)
            y0 = dia_spmv_pallas_np(vals_l, x_own, plan.offsets, hw_p,
                                    pick_block(L, K, hw_p, isz))
    else:
        z = jnp.zeros((hw,), x_own.dtype)
        x_e0 = jnp.concatenate([z, x_own, z])
        y0 = None
        for k, off in enumerate(plan.offsets):
            xk = lax.slice_in_dim(x_e0, hw + off, hw + off + L)
            term = vals_l[k] * xk
            y0 = term if y0 is None else y0 + term

    # ---- interface corrections: the only consumers of the halo ------------
    # row i < hw reads left_ext where i + off < 0; row i >= L-hw reads
    # right_ext where i + off >= L; zero-padding makes the windows static.
    zpad = jnp.zeros((hw,), x_own.dtype)
    e_l = jnp.concatenate([left_ext, zpad])       # (2hw,)
    e_r = jnp.concatenate([zpad, right_ext])      # (2hw,)
    lcorr = rcorr = None
    for k, off in enumerate(plan.offsets):
        if off < 0:
            t = vals_l[k, :hw] * lax.slice_in_dim(e_l, hw + off, 2 * hw + off)
            lcorr = t if lcorr is None else lcorr + t
        elif off > 0:
            t = vals_l[k, L - hw:] * lax.slice_in_dim(e_r, off, hw + off)
            rcorr = t if rcorr is None else rcorr + t
    y = y0
    if lcorr is not None:
        y = y.at[:hw].add(lcorr)
    if rcorr is not None:
        y = y.at[L - hw:].add(rcorr)
    return y


@dataclasses.dataclass(frozen=True)
class GeneralPlanStatic:
    """Static shape info for the general partitioned operator."""

    N: int
    nparts: int
    L: int
    G: int
    S: int


def general_spmv_local(static: GeneralPlanStatic,
                       own_colidx, own_vals, ghost_colidx, ghost_vals,
                       send_idx, ghost_src_dev, ghost_src_slot,
                       x_own: jnp.ndarray, axis: str = AXIS) -> jnp.ndarray:
    """Per-device general SpMV: owned-block ELL + interface-block ELL over
    the ghost buffer filled by the all-gather halo."""
    ghosts = allgather_halo(x_own, send_idx, ghost_src_dev, ghost_src_slot, axis)
    return general_spmv_with_ghosts(own_colidx, own_vals, ghost_colidx,
                                    ghost_vals, x_own, ghosts)


def general_spmv_with_ghosts(own_colidx, own_vals, ghost_colidx, ghost_vals,
                             x_own: jnp.ndarray,
                             ghosts: jnp.ndarray) -> jnp.ndarray:
    """Owned-block + interface-block ELL SpMV given a filled ghost buffer
    (the fa/oa operator split of symcsrmatrix.h:249-292).  The owned term
    has no data dependence on the halo, so XLA overlaps the collective that
    produced ``ghosts`` with it (the commstream/stream overlap of
    cgcuda.c:855-899)."""
    y_own = jnp.sum(own_vals * jnp.take(x_own, own_colidx, axis=0), axis=0)
    y_gst = jnp.sum(ghost_vals * jnp.take(ghosts, ghost_colidx, axis=0), axis=0)
    return y_own + y_gst
