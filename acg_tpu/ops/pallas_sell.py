"""Chunked-gather SpMV kernel for arbitrary sparsity (SELL layout).

The capability match for the reference's merge-based CSR kernel
(cg-kernels-cuda.cu:312-441: load-balanced SpMV on arbitrary sparsity).
TPU vector cores have no HBM gather; what Mosaic DOES lower — fast — is
`take_along_axis` along the 128-lane axis of a VMEM tile (measured
181 Gelem/s pure; the sibling probe numbers live in BENCHMARKS.md).

Two gather windows:
  * chunk = 128: the slot's operands come from one 128-wide column
    chunk — ONE lane-gather per slot tile (fastest per stored slot).
  * chunk = 1024: operands from a (8, 128) window — 8-way masked
    lane-gather (sublane r selected by idx>>7) — ~5× the VPU ops per
    slot, but needs ~8× fewer chunks so rows pack with less padding.

Everything is laid out (…, T, 128) so no in-kernel 1-D↔2-D reshapes
occur (a (16384,) → (128, 128) relayout inside the kernel measured
~200× slower than the gather itself).

x is held ENTIRELY in VMEM (copied once at grid step 0, persistent
scratch) viewed as (C, 8, 128); each ELL slot names its chunk via a
per-(block, slot) scalar table in SMEM.  For N beyond the VMEM budget,
callers split into column panels and accumulate partial products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _take_lanes(row: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(row, idx, axis=1) with int32 indices preserved.

    jnp.take_along_axis casts indices to the default int dtype — int64
    under jax_enable_x64 — and Mosaic has no 64-bit types; its gather
    lowering accepts exactly this 2-D along-lanes form
    (tpu.dynamic_gather), so call lax.gather with the blessed dimension
    numbers directly."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        row, idx[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _sell_kernel(S, T, chunk, x_hbm, cidx_ref, vals_ref, lidx_ref, y_ref,
                 xv, sem):
    i = pl.program_id(0).astype(jnp.int32)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm, xv, sem)
        cp.start()
        cp.wait()

    acc = None
    for s in range(S):
        c = cidx_ref[i, s]
        idx2 = lidx_ref[s, :, :]                        # (T, 128)
        if chunk == 128:
            # window = one 128-lane row: c addresses (C*8, 128) rows
            row = jnp.broadcast_to(xv[c >> 3, c & 7][None, :], (T, 128))
            g = _take_lanes(row, idx2)
        else:
            # window = one (8, 128) tile: masked 8-way lane-gather
            tile = xv[c]
            lane = idx2 & 127
            sub = idx2 >> 7
            g = None
            for r in range(8):
                row = jnp.broadcast_to(tile[r:r + 1, :], (T, 128))
                gr = _take_lanes(row, lane)
                g = jnp.where(sub == r, gr, 0.0 if g is None else g)
        t = vals_ref[s, :, :] * g
        acc = t if acc is None else acc + t
    y_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("Nx", "block", "chunk"))
def sell_spmv(vals: jnp.ndarray, lidx: jnp.ndarray, cidx: jnp.ndarray,
              x: jnp.ndarray, Nx: int, block: int,
              chunk: int = 1024) -> jnp.ndarray:
    """y = A @ x for a SellOperator.

    vals/lidx: (S, Np//128, 128); cidx: (nblocks, S) int32; x: (Np,)
    row-padded (gathers address the first Nx entries)."""
    if vals.dtype == jnp.float64 and jax.default_backend() != "cpu":
        raise NotImplementedError(
            "Mosaic has no f64 tiling on TPU; build the SellOperator with "
            "dtype=float32 (dot_dtype='mixed' keeps f64-quality reductions)")
    S = vals.shape[0]
    Np = vals.shape[1] * 128
    assert chunk in (128, 1024)
    assert Np % block == 0 and block % 128 == 0
    T = block // 128
    nblocks = Np // block
    if x.shape[0] < Nx:
        x = jnp.concatenate([x, jnp.zeros((Nx - x.shape[0],), x.dtype)])
    elif x.shape[0] > Nx:
        x = x[:Nx]
    x3 = x.reshape(Nx // 1024, 8, 128)
    kernel = functools.partial(_sell_kernel, S, T, chunk)
    z32 = np.int32(0)
    try:
        vma = jax.typeof(vals).vma
        out_shape = jax.ShapeDtypeStruct((Np // 128, 128), vals.dtype,
                                         vma=vma)
    except (AttributeError, TypeError):
        out_shape = jax.ShapeDtypeStruct((Np // 128, 128), vals.dtype)
    y2 = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # x3 in HBM
            # whole table in SMEM (a (1, S) row block violates Mosaic's
            # sublane-divisibility rule on real hardware); rows are
            # selected by the grid index inside the kernel
            pl.BlockSpec((nblocks, S), lambda i: (z32, z32),
                         memory_space=pltpu.SMEM),             # cidx
            pl.BlockSpec((S, T, 128), lambda i: (z32, i, z32),
                         memory_space=pltpu.VMEM),             # vals
            pl.BlockSpec((S, T, 128), lambda i: (z32, i, z32),
                         memory_space=pltpu.VMEM),             # lidx
        ],
        out_specs=pl.BlockSpec((T, 128), lambda i: (i, z32),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Nx // 1024, 8, 128), vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Np,
            bytes_accessed=(S * Np * (vals.dtype.itemsize + 4)
                            + Nx * vals.dtype.itemsize
                            + Np * vals.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x3, cidx, vals, lidx)
    return y2.reshape(Np)
