"""Dense run-tail SpMV kernel: heavy rows with LOCAL column spans.

The load-balance tail the reference's merge-CSR split handles by
construction (cg-kernels-cuda.cu:312-441): a few rows with hundreds-to-
thousands of entries whose columns sit in one contiguous-ish window
(constraint/arrow rows after reordering).  Such rows poison the SELL
chunked-gather layout — one heavy row forces ~run/8 slot groups on all
128 rows of its tile (measured: fill 0.121 → 0.039 and 8.0 → 2.67
Gnnz/s with 7% heavy nnz, BENCHMARKS.md ACG_HEAVY=2) — and a SELL-format
tail is scatter-regime after compaction because every heavy row's window
is different.

The TPU-format answer is DENSE per-row windows with dynamic DMA:

  * each tail row i stores a dense (WSUB*1024,)-window of values
    (zeros at gaps), positioned at offset start[i] - 1024*base[i]
    inside the window;
  * x stays in HBM; the kernel DMAs each row's (WSUB, 8, 128) window
    from x3 = x.reshape(-1, 8, 128) at the dynamic row offset base[i]
    (HBM memrefs are untiled, so traced dim-0 slice offsets are legal —
    same rule the SELL chunk-table pipeline relies on);
  * y[i] = full reduce of vals_window * x_window — pure VPU elementwise
    + reduction, no gathers, no slot padding at all;
  * R=8 rows per grid step; the 8 window DMAs are all in flight before
    the first wait, and the vals slabs stream through the BlockSpec
    pipeline (double-buffered) as the dominant traffic.

Scalar outputs go to a full-array SMEM output (house rule for small
outputs); the caller scatter-adds them into the global row space.

XLA alternatives measured first (scripts/exp_runtail.py, real chip,
4688 rows x 2048-entry runs): vmap(dynamic_slice)+dot 1.26 Gnnz/s,
aligned-2W-window gather 1.28 Gnnz/s — slice-gathers lower to ~10-15
GB/s effective, hence this kernel.

STATUS: validated by CPU interpret-mode tests; the Mosaic lowering and
throughput on the real chip are pending (scripts/bench_runtail.py) —
the traced-index scalar store into a full-array SMEM output is a
pattern no other kernel here uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8          # tail rows per grid step
WSUB = 4       # window = WSUB (8, 128) subrows = WSUB*1024 elements


def _runtail_kernel(x_hbm, base_ref, vals_ref, y_ref, xw, sems):
    i = pl.program_id(0).astype(jnp.int32)

    def copy(k):
        b = base_ref[i * R + k]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b, WSUB)], xw.at[k], sems.at[k])

    for k in range(R):
        copy(k).start()
    for k in range(R):
        copy(k).wait()
        y_ref[i * R + k] = jnp.sum(vals_ref[0, k] * xw[k])


@functools.partial(jax.jit, static_argnames=("Nx",))
def runtail_spmv(vals: jnp.ndarray, base: jnp.ndarray, x: jnp.ndarray,
                 Nx: int) -> jnp.ndarray:
    """y[i] = dot(vals[i], x[1024*base[i] : 1024*base[i] + WSUB*1024]).

    vals: (nsteps, R, WSUB, 8, 128) f32 dense window slabs;
    base: (nsteps*R,) int32 window row offsets into x3 (units of 1024
    elements; padded rows point at 0 with zero vals);
    x: the column-space vector, padded here to Nx + the window overhang
    so every in-bounds base reads real memory.
    Returns (nsteps*R,) f32 per-tail-row results.
    """
    if vals.dtype != jnp.float32:
        raise NotImplementedError(
            f"runtail_spmv is f32-only (Mosaic has no f64 tiling); "
            f"got {vals.dtype}")
    nsteps = vals.shape[0]
    assert vals.shape[1:] == (R, WSUB, 8, 128), vals.shape
    assert base.shape == (nsteps * R,) and base.dtype == jnp.int32
    Nxp = Nx + WSUB * 1024
    if x.shape[0] < Nxp:
        x = jnp.concatenate([x, jnp.zeros((Nxp - x.shape[0],), x.dtype)])
    elif x.shape[0] > Nxp:
        x = x[:Nxp]
    x3 = x.reshape(Nxp // 1024, 8, 128)
    z32 = np.int32(0)
    y = pl.pallas_call(
        _runtail_kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # x3 in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),              # base
            pl.BlockSpec((1, R, WSUB, 8, 128),
                         lambda i: (i, z32, z32, z32, z32),
                         memory_space=pltpu.VMEM),              # vals
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),        # y full
        out_shape=jax.ShapeDtypeStruct((nsteps * R,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, WSUB, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((R,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * R * WSUB * 1024,
            bytes_accessed=2 * nsteps * R * WSUB * 1024 * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x3, base, vals)
    return y
