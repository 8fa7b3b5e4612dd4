"""Chunked-gather SpMV kernel for arbitrary sparsity (per-tile SELL).

The capability match for the reference's merge-based CSR kernel
(cg-kernels-cuda.cu:312-441: load-balanced SpMV on arbitrary sparsity).
TPU vector cores have no HBM gather; what Mosaic DOES lower — fast — is
a 128-lane gather within a VMEM row (tpu.dynamic_gather).

Kernel structure (layout in core/sell.py):
  * x lives ENTIRELY in VMEM (copied once at grid step 0, persistent
    scratch) viewed as (Cx, 8, 128); chunk c is row (c>>3, c&7);
  * the grid walks row-tile blocks (BLOCK_TILES tiles per step); the
    (S8, T, 8, 128) vals/lidx slabs stream through VMEM double-buffered
    by the BlockSpec pipeline — they are the dominant traffic;
  * slots are processed 8 at a time: the 8 chunk rows are stacked into
    one (8, 128) operand and a single along-lanes dynamic_gather
    resolves all 8 slots' operands; a sublane reduction folds the
    8 partial products into the tile's 128-row accumulator;
  * the per-(tile, slot) chunk table is scalar-prefetched to SMEM.

Everything is laid out (…, 8, 128) so no in-kernel 1-D↔2-D reshapes
occur (a (16384,) → (128, 128) relayout inside the kernel measured
~200× slower than the gather itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.sell import BLOCK_TILES
from . import df64


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


def _sell_kernel(G, T, Sc, x_hbm, cidx_hbm, vals_ref, lidx_ref, y_ref,
                 xv, cbuf0, cbuf1, sem, csem):
    """cidx cannot be a blocked SMEM operand (a (T, S) block violates
    Mosaic's sublane-divisibility rule for T < 8) and 2-D DMA slices of
    an HBM memref must be 8-aligned on dim 0, so the chunk table ships
    as a FLAT (ntiles*Sc,) array (Sc = S padded so T·Sc is a 1024
    multiple) and the per-block slice is DMA'd HBM→SMEM scratch,
    double-buffered across grid steps (two buffers + parity predication
    — the same pattern as the DIA window pipeline)."""
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    one, two = jnp.int32(1), jnp.int32(2)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + one, two)
    TSc = jnp.int32(T * Sc)

    def ccopy(blk, buf, s):
        return pltpu.make_async_copy(
            cidx_hbm.at[pl.ds(blk * TSc, T * Sc)], buf,
            csem.at[jnp.int32(s)])

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm, xv, sem)
        cp.start()
        ccopy(i, cbuf0, 0).start()
        cp.wait()

    @pl.when((i + one < nblocks) & (nxt == 0))
    def _():
        ccopy(i + one, cbuf0, 0).start()

    @pl.when((i + one < nblocks) & (nxt == 1))
    def _():
        ccopy(i + one, cbuf1, 1).start()

    def compute(cidx_ref):
        for t in range(T):           # static, small (BLOCK_TILES)
            tbase = jnp.int32(t * Sc)

            def one_group(g8, lidx8):
                # a group's 8 slots share one chunk: broadcast its 128
                # x-values across sublanes and resolve all 8 slots with
                # a single lane-gather
                c = cidx_ref[tbase + g8]
                row = xv[c >> 3, c & 7][None, :]
                op2 = jnp.broadcast_to(row, (8, 128))
                g = _take_lanes(op2, lidx8)              # (8, 128)
                contrib = vals_ref[t, g8] * g
                return jnp.sum(contrib, axis=0)          # (128,) rows

            def body(q, accs):
                # 8 groups per iteration into 8 INDEPENDENT accumulators:
                # a single carried acc serializes the whole
                # gather→mul→reduce→add chain (measured ~87 cycles/group
                # un-unrolled, ~26 at 4-way — latency- not
                # throughput-bound).  lidx ships 4 groups per int32 word
                # (7-bit lane ids): two packed (8, 128) loads + one
                # shift+mask per group replace four times the DMA bytes.
                g0 = q * jnp.int32(8)
                w0 = lidx_ref[t, two * q]
                w1 = lidx_ref[t, two * q + one]
                lanes = [(w >> jnp.int32(8 * k)) & jnp.int32(127)
                         for w in (w0, w1) for k in range(4)]
                return tuple(a + one_group(g0 + jnp.int32(k), lanes[k])
                             for k, a in enumerate(accs))
            # int32 loop bounds: python-int bounds trace to int64 under
            # jax_enable_x64 and Mosaic's convert lowering recurses
            z = jnp.zeros((128,), vals_ref.dtype)
            accs = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(G // 8), body, (z,) * 8)
            y_ref[t, 0, :] = (((accs[0] + accs[1]) + (accs[2] + accs[3]))
                              + ((accs[4] + accs[5]) + (accs[6] + accs[7])))

    @pl.when(slot == 0)
    def _():
        ccopy(i, cbuf0, 0).wait()
        compute(cbuf0)

    @pl.when(slot == 1)
    def _():
        ccopy(i, cbuf1, 1).wait()
        compute(cbuf1)


def _sell_kernel_df64(G, T, Sc, has_lo, interp,
                      xh_hbm, xl_hbm, cidx_hbm, vals_refs, lidx_ref,
                      yh_ref, yl_ref, xvh, xvl, cbuf0, cbuf1, sem, csem):
    """df64 (double-f32) variant of _sell_kernel: x is an explicit
    (hi, lo) f32 pair and every product/accumulation is an error-free
    transformation (ops/df64.py), giving a ~2^-48-relative q = A·w for
    the general-partition f64-parity solver (the capability the
    reference gets for free from native f64 ALUs in its merge kernel,
    cg-kernels-cuda.cu:358-441).  Matrix values are the f32 ``vals``
    slab plus an optional ``vals_lo`` low-part slab (None ⇒ the matrix
    is exactly f32-representable and A·wl needs no low correction of
    its own).  Structure (chunk-table double buffering, packed lidx,
    8 independent accumulators) matches the f32 kernel; accumulators
    become (hi, lo) pairs folded with two_sum."""
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    one, two = jnp.int32(1), jnp.int32(2)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + one, two)
    TSc = jnp.int32(T * Sc)
    if has_lo:
        vals_ref, vlo_ref = vals_refs
    else:
        (vals_ref,), vlo_ref = vals_refs, None

    def ccopy(blk, buf, s):
        return pltpu.make_async_copy(
            cidx_hbm.at[pl.ds(blk * TSc, T * Sc)], buf,
            csem.at[jnp.int32(s)])

    @pl.when(i == 0)
    def _():
        cph = pltpu.make_async_copy(xh_hbm, xvh, sem.at[jnp.int32(0)])
        cpl = pltpu.make_async_copy(xl_hbm, xvl, sem.at[jnp.int32(1)])
        cph.start()
        cpl.start()
        ccopy(i, cbuf0, 0).start()
        cph.wait()
        cpl.wait()

    @pl.when((i + one < nblocks) & (nxt == 0))
    def _():
        ccopy(i + one, cbuf0, 0).start()

    @pl.when((i + one < nblocks) & (nxt == 1))
    def _():
        ccopy(i + one, cbuf1, 1).start()

    def compute(cidx_ref):
        for t in range(T):
            tbase = jnp.int32(t * Sc)

            def one_group(g8, lidx8):
                c = cidx_ref[tbase + g8]
                rowh = jnp.broadcast_to(xvh[c >> 3, c & 7][None, :],
                                        (8, 128))
                rowl = jnp.broadcast_to(xvl[c >> 3, c & 7][None, :],
                                        (8, 128))
                gh = _take_lanes(rowh, lidx8)            # (8, 128)
                gl = _take_lanes(rowl, lidx8)
                v = vals_ref[t, g8]
                p, e = df64.two_prod(v, gh)
                e = e + v * gl
                if has_lo:
                    e = e + vlo_ref[t, g8] * gh
                # compensated sublane fold: the 8 sub-slot products of
                # this group collapse into one (128,) (hi, lo) pair
                s = p[0]
                err = jnp.sum(e, axis=0)
                for k in range(1, 8):
                    s, c2 = df64.two_sum(s, p[k])
                    err = err + c2
                return s, err

            def body(q, accs):
                g0 = q * jnp.int32(8)
                w0 = lidx_ref[t, two * q]
                w1 = lidx_ref[t, two * q + one]
                lanes = [(w >> jnp.int32(8 * k)) & jnp.int32(127)
                         for w in (w0, w1) for k in range(4)]
                out = []
                for k in range(8):
                    ah, al = accs[2 * k], accs[2 * k + 1]
                    s, err = one_group(g0 + jnp.int32(k), lanes[k])
                    ah, c2 = df64.two_sum(ah, s)
                    out += [ah, al + err + c2]
                return tuple(out)

            z = jnp.zeros((128,), jnp.float32)
            with df64.no_barriers():
                # interpret mode (CPU tests) must UNROLL this loop: the
                # pallas interpreter executes straight-line kernel ops
                # eagerly (error-free transforms hold), but a fori_loop
                # body becomes one compiled XLA:CPU unit whose excess-
                # precision evaluation silently destroys the EFTs —
                # measured 9e-9 (looped) vs 5e-15 (unrolled) relative
                # error, barriers notwithstanding.  On hardware Mosaic
                # compiles both forms exactly; the loop keeps code size
                # independent of G.
                if interp:
                    accs = (z,) * 16
                    for q in range(G // 8):
                        accs = body(jnp.int32(q), accs)
                else:
                    accs = jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(G // 8), body, (z,) * 16)
                # pairwise tree fold of the 8 accumulator pairs
                pairs = [(accs[2 * k], accs[2 * k + 1]) for k in range(8)]
                while len(pairs) > 1:
                    pairs = [df64.df_add(*pairs[j], *pairs[j + 1])
                             for j in range(0, len(pairs), 2)]
            yh_ref[t, 0, :] = pairs[0][0]
            yl_ref[t, 0, :] = pairs[0][1]

    @pl.when(slot == 0)
    def _():
        ccopy(i, cbuf0, 0).wait()
        compute(cbuf0)

    @pl.when(slot == 1)
    def _():
        ccopy(i, cbuf1, 1).wait()
        compute(cbuf1)


@functools.partial(jax.jit, static_argnames=("Nx",))
def sell_spmv_df64(vals: jnp.ndarray, vals_lo, lidx: jnp.ndarray,
                   cidx: jnp.ndarray, xh: jnp.ndarray, xl: jnp.ndarray,
                   Nx: int):
    """(yh, yl) ≈ A @ (xh + xl) to df64 accuracy for one bucket.

    Same layout contract as sell_spmv; ``vals_lo`` is either None (A is
    exactly f32-representable) or a slab of the same shape holding the
    f64-to-f32 rounding residuals (core.sell low slabs)."""
    if vals.dtype != jnp.float32:
        raise NotImplementedError("sell_spmv_df64 expects f32 (hi, lo) "
                                  f"slabs, got {vals.dtype}")
    has_lo = vals_lo is not None
    ntiles, G = vals.shape[0], vals.shape[1]
    assert G % 8 == 0 and lidx.shape == (ntiles, G // 4, 8, 128), \
        (vals.shape, lidx.shape)
    Np = ntiles * 128
    T = BLOCK_TILES
    assert ntiles % T == 0
    nblocks = ntiles // T

    def prep_x(x):
        if x.shape[0] < Nx:
            x = jnp.concatenate([x, jnp.zeros((Nx - x.shape[0],), x.dtype)])
        elif x.shape[0] > Nx:
            x = x[:Nx]
        return x.reshape(Nx // 1024, 8, 128)

    xh3, xl3 = prep_x(xh), prep_x(xl)
    Sc = -(-G // (1024 // T)) * (1024 // T)
    if cidx.ndim == 2:
        assert cidx.shape == (ntiles, G)
        cidx_flat = jnp.zeros((ntiles, Sc), jnp.int32).at[:, :G].set(cidx) \
            .reshape(-1)
    else:
        assert cidx.shape == (ntiles * Sc,), (cidx.shape, ntiles, Sc)
        cidx_flat = cidx
    interp = jax.default_backend() == "cpu"
    kernel = functools.partial(_sell_kernel_df64, G, T, Sc, has_lo, interp)
    z32 = np.int32(0)
    slab_spec = pl.BlockSpec((T, G, 8, 128), lambda i: (i, z32, z32, z32),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                 # xh3 in HBM
        pl.BlockSpec(memory_space=pl.ANY),                 # xl3 in HBM
        pl.BlockSpec(memory_space=pltpu.HBM),              # cidx flat
        slab_spec,                                          # vals hi
    ]
    args = [xh3, xl3, cidx_flat, vals]
    if has_lo:
        in_specs.append(slab_spec)                          # vals lo
        args.append(vals_lo)
    in_specs.append(
        pl.BlockSpec((T, G // 4, 8, 128), lambda i: (i, z32, z32, z32),
                     memory_space=pltpu.VMEM))              # lidx packed
    args.append(lidx)

    def krn(xh_hbm, xl_hbm, cidx_hbm, *rest):
        if has_lo:
            vh, vl, li = rest[0], rest[1], rest[2]
            vrefs = (vh, vl)
            outs = rest[3:]
        else:
            vh, li = rest[0], rest[1]
            vrefs = (vh,)
            outs = rest[2:]
        kernel(xh_hbm, xl_hbm, cidx_hbm, vrefs, li, *outs)

    out_spec = pl.BlockSpec((T, 1, 128), lambda i: (i, z32, z32),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((ntiles, 1, 128), jnp.float32)
    try:
        vma = jax.typeof(vals).vma
        out_sds = jax.ShapeDtypeStruct((ntiles, 1, 128), jnp.float32,
                                       vma=vma)
    except (AttributeError, TypeError):
        pass
    nslabs = 2 if has_lo else 1
    yh2, yl2 = pl.pallas_call(
        krn,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(out_sds, out_sds),
        scratch_shapes=[
            pltpu.VMEM((Nx // 1024, 8, 128), jnp.float32),
            pltpu.VMEM((Nx // 1024, 8, 128), jnp.float32),
            pltpu.SMEM((T * Sc,), jnp.int32),
            pltpu.SMEM((T * Sc,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * 8 * G * Np,
            bytes_accessed=(8 * G * Np * (4 * nslabs + 1)
                            + 2 * Nx * 4 + 2 * Np * 4),
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    return yh2.reshape(Np), yl2.reshape(Np)


@functools.partial(jax.jit, static_argnames=("Nx",))
def sell_spmv(vals: jnp.ndarray, lidx: jnp.ndarray, cidx: jnp.ndarray,
              x: jnp.ndarray, Nx: int) -> jnp.ndarray:
    """y = A @ x for one SellOperator bucket.

    vals: (ntiles_b, G, 8, 128); lidx: (ntiles_b, G//4, 8, 128) int32 —
    PACKED four groups per word along the G axis (lane ids are 7-bit;
    byte k of word [t, g, s, l] is the lane for group 4g+k, sub-slot s,
    row l — core.sell.pack_lidx); cidx: the Sc-padded FLAT (ntiles_b*Sc,)
    int32 chunk table (core.sell.cidx_flat_pad — padded at build time so
    no per-call pad is traced into the solve loop), or a raw (ntiles_b,
    G) table for standalone use (padded here).  x is the FULL
    column-space vector, padded/truncated here to Nx (the 1024-aligned
    column count) — bucket row counts and the column space are
    independent."""
    if vals.dtype == jnp.float64 and jax.default_backend() != "cpu":
        raise NotImplementedError(
            "Mosaic has no f64 tiling on TPU; build the SellOperator with "
            "dtype=float32 (dot_dtype='mixed' keeps f64-quality reductions)")
    ntiles, G = vals.shape[0], vals.shape[1]
    assert G % 8 == 0 and lidx.shape == (ntiles, G // 4, 8, 128), \
        (vals.shape, lidx.shape)
    Np = ntiles * 128
    T = BLOCK_TILES
    assert ntiles % T == 0
    nblocks = ntiles // T
    if x.shape[0] < Nx:
        x = jnp.concatenate([x, jnp.zeros((Nx - x.shape[0],), x.dtype)])
    elif x.shape[0] > Nx:
        x = x[:Nx]
    x3 = x.reshape(Nx // 1024, 8, 128)
    # flat chunk table with per-tile stride Sc: T·Sc must be a 1024
    # multiple for the 1-D DMA slice alignment rule
    Sc = -(-G // (1024 // T)) * (1024 // T)
    if cidx.ndim == 2:
        assert cidx.shape == (ntiles, G)
        cidx_flat = jnp.zeros((ntiles, Sc), jnp.int32).at[:, :G].set(cidx) \
            .reshape(-1)
    else:
        assert cidx.shape == (ntiles * Sc,), (cidx.shape, ntiles, Sc)
        cidx_flat = cidx
    kernel = functools.partial(_sell_kernel, G, T, Sc)
    z32 = np.int32(0)
    try:
        vma = jax.typeof(vals).vma
        out_shape = jax.ShapeDtypeStruct((ntiles, 1, 128), vals.dtype,
                                         vma=vma)
    except (AttributeError, TypeError):
        out_shape = jax.ShapeDtypeStruct((ntiles, 1, 128), vals.dtype)
    y2 = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # x3 in HBM
            # cidx PINNED to HBM: under ANY the compiler may place it in
            # VMEM, whose tiled memref rejects the (T, S) DMA slice
            # (dim-0 slices must be 8-aligned); HBM memrefs are untiled
            pl.BlockSpec(memory_space=pltpu.HBM),              # cidx
            pl.BlockSpec((T, G, 8, 128), lambda i: (i, z32, z32, z32),
                         memory_space=pltpu.VMEM),             # vals
            pl.BlockSpec((T, G // 4, 8, 128), lambda i: (i, z32, z32, z32),
                         memory_space=pltpu.VMEM),             # lidx packed
        ],
        out_specs=pl.BlockSpec((T, 1, 128), lambda i: (i, z32, z32),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Nx // 1024, 8, 128), vals.dtype),
            pltpu.SMEM((T * Sc,), jnp.int32),
            pltpu.SMEM((T * Sc,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * G * Np,
            bytes_accessed=(8 * G * Np * (vals.dtype.itemsize + 1)
                            + Nx * vals.dtype.itemsize
                            + Np * vals.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x3, cidx_flat, vals, lidx)
    return y2.reshape(Np)
