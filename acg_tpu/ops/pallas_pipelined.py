"""Fused pipelined-CG iteration kernel: SpMV + 6-vector update + dots in
ONE pass over HBM.

The reference fuses the pipelined update into one CUDA kernel
(pipelined_daxpy_fused, cg-kernels-cuda.cu:187-269) but still runs SpMV
and the dots as separate passes.  This kernel goes further — per block it

    q  = Σ_k vals[k] ⊙ w_win[off_k : off_k+B]        (SpMV, Gear's q=Aw)
    z' = q + βz ; t' = w + βt ; p' = r + βp           (fused update)
    x' = x + αp' ; r' = r − αt' ; w' = w − αz'
    partial = (Σ r'r', Σ w'r')                        (dot2 for γ', δ')

reading each vector exactly once: vals K·N + w_ext ~N + {r,z,t,p,x} 5N in,
{x,r,w,z,t,p} 6N out ≈ (K+12)·N streamed vs (K+17)·N for the separate
SpMV/update/dot passes.  α and β are precomputed f64 scalars (they depend
only on the previous iteration's reductions) cast to the storage dtype
and staged through SMEM.  Per-block dot partials are emitted per grid
step and summed in f64 outside — the "mixed" accumulation contract of
ops/blas1.py at block size B.

The w window is double-buffered exactly as in pallas_dia.py.  f32-only on
hardware (Mosaic has no f64 tiling); interpret mode covers any dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offsets, hw, B, w_hbm,
            ab_ref, bb_ref, vals_ref, x_ref, r_ref, z_ref, t_ref, p_ref,
            xo_ref, ro_ref, wo_ref, zo_ref, to_ref, po_ref, part_ref,
            win0, win1, dacc, sem):
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    two = jnp.int32(2)
    one = jnp.int32(1)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + one, two)

    def window_copy(blk, win, s):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(blk * jnp.int32(B), B + 2 * hw)],
            win, sem.at[jnp.int32(s)])

    @pl.when(i == 0)
    def _():
        window_copy(i, win0, 0).start()

    @pl.when((i + one < nblocks) & (nxt == 0))
    def _():
        window_copy(i + one, win0, 0).start()

    @pl.when((i + one < nblocks) & (nxt == 1))
    def _():
        window_copy(i + one, win1, 1).start()

    ab = ab_ref[0, 0]
    bb = bb_ref[0, 0]

    def compute(win):
        q = None
        for k, off in enumerate(offsets):
            term = vals_ref[k, :] * win[pl.ds(hw + off, B)]
            q = term if q is None else q + term
        w = win[pl.ds(hw, B)]
        z2 = q + bb * z_ref[:]
        t2 = w + bb * t_ref[:]
        p2 = r_ref[:] + bb * p_ref[:]
        x2 = x_ref[:] + ab * p2
        r2 = r_ref[:] - ab * t2
        w2 = w - ab * z2
        xo_ref[:] = x2
        ro_ref[:] = r2
        wo_ref[:] = w2
        zo_ref[:] = z2
        to_ref[:] = t2
        po_ref[:] = p2
        # per-LANE partial sums accumulated across blocks (the full
        # cross-lane reduction per block stalls the VPU); the final
        # (2, 128) table reduces in f64 outside the kernel
        @pl.when(i == 0)
        def _():
            dacc[:, :] = jnp.zeros_like(dacc)

        g = jnp.sum((r2 * r2).reshape(B // 128, 128), axis=0)
        d = jnp.sum((w2 * r2).reshape(B // 128, 128), axis=0)
        dacc[0, :] = dacc[0, :] + g
        dacc[1, :] = dacc[1, :] + d

        @pl.when(i == nblocks - one)
        def _():
            part_ref[:, :] = dacc[:, :]

    @pl.when(slot == 0)
    def _():
        window_copy(i, win0, 0).wait()
        compute(win0)

    @pl.when(slot == 1)
    def _():
        window_copy(i, win1, 1).wait()
        compute(win1)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "hw", "block"))
def fused_pipelined_iter(vals, w_ext, x, r, z, t, p, alpha, beta,
                         offsets: tuple[int, ...], hw: int, block: int):
    """One fused pipelined-CG iteration.

    vals (K, Np); w_ext (Np + 2hw) halo/zero-extended; x/r/z/t/p (Np,);
    alpha/beta scalars castable to the storage dtype.  Returns
    (x', r', w', z', t', p', gd) with gd = (γ', δ') as a float64 (2,)
    vector (per-block partials summed in f64 — "mixed" accumulation).
    """
    K, Np = vals.shape
    assert Np % block == 0, (Np, block)
    if block % 128 != 0:
        raise ValueError(
            f"the fused pipelined kernel reduces dot partials in 128-lane "
            f"rows, so the block size must be a multiple of 128 (got "
            f"block={block} from Np={Np}); construct the operator with "
            f"pad_to a multiple of 128")
    assert w_ext.shape[0] == Np + 2 * hw
    if vals.dtype == jnp.float64 and jax.default_backend() not in ("cpu",):
        raise NotImplementedError(
            "the fused pipelined kernel requires float32 storage on TPU")
    nblocks = Np // block
    kernel = functools.partial(_kernel, offsets, hw, block)
    vdt = vals.dtype
    ab = jnp.reshape(alpha.astype(vdt), (1, 1))
    bb = jnp.reshape(beta.astype(vdt), (1, 1))

    try:
        vma = jax.typeof(vals).vma
        vec = lambda: jax.ShapeDtypeStruct((Np,), vdt, vma=vma)
        parts_shape = jax.ShapeDtypeStruct((2, 128), vdt, vma=vma)
    except (AttributeError, TypeError):
        vec = lambda: jax.ShapeDtypeStruct((Np,), vdt)
        parts_shape = jax.ShapeDtypeStruct((2, 128), vdt)

    # index maps must return int32: Python-int returns trace to i64 under
    # jax_enable_x64 and Mosaic fails to legalize the index-map function
    z32 = np.int32(0)
    blk = lambda: pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM)
    smem_scalar = lambda: pl.BlockSpec((1, 1), lambda i: (z32, z32),
                                       memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # w_ext in HBM
            smem_scalar(),                                   # alpha
            smem_scalar(),                                   # beta
            pl.BlockSpec((K, block), lambda i: (z32, i),
                         memory_space=pltpu.VMEM),           # vals
            blk(), blk(), blk(), blk(), blk(),               # x r z t p
        ],
        out_specs=(blk(), blk(), blk(), blk(), blk(), blk(),
                   # (2, 128) per-lane partial-dots table; explicit int32
                   # index map (default maps return Python ints → i64)
                   pl.BlockSpec((2, 128), lambda i: (z32, z32),
                                memory_space=pltpu.VMEM)),
        out_shape=(vec(), vec(), vec(), vec(), vec(), vec(), parts_shape),
        scratch_shapes=[
            pltpu.VMEM((block + 2 * hw,), vdt),
            pltpu.VMEM((block + 2 * hw,), vdt),
            pltpu.VMEM((2, 128), vdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * K + 12) * Np,
            bytes_accessed=(K + 12) * Np * vdt.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(w_ext, ab, bb, vals, x, r, z, t, p)
    x2, r2, w2, z2, t2, p2, parts = out
    gd = jnp.sum(parts.astype(jnp.float64), axis=1)
    return x2, r2, w2, z2, t2, p2, gd


# ---------------------------------------------------------------------------
# Ring-buffer fused iteration: w streamed through VMEM exactly once (no
# zero-extended copy of w per iteration, no (B+2hw)-window re-reads), any
# halo width — the ring machinery of ops/pallas_dia.py applied to the
# one-pass iteration.  Traffic: (K + 12 + 1/R)·N vs the windowed variant's
# (K + 14 + 2hw/B)·N (which also pays extend()'s read+write of w).


def _kernel_ring(offsets, m, B, nb, w_hbm,
                 ab_ref, bb_ref, vals_ref, x_ref, r_ref, z_ref, t_ref, p_ref,
                 xo_ref, ro_ref, wo_ref, zo_ref, to_ref, po_ref, part_ref,
                 ring, sem, dacc):
    from .pallas_dia import RingWindow

    R = 2 * m + 2
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    one = jnp.int32(1)
    win = RingWindow(m, B, nb, w_hbm, ring, sem)
    phase = jax.lax.rem(i, jnp.int32(R))

    @pl.when(i == 0)
    def _():
        win.initial_fill()

    ab = ab_ref[0, 0]
    bb = bb_ref[0, 0]

    for p in range(R):

        @pl.when(phase == p)
        def _(p=p):
            win.prefetch(i, p)
            win.wait(i, p)
            q = None
            for k, off in enumerate(offsets):
                term = vals_ref[k, :] * win.slice_at(p, off)
                q = term if q is None else q + term
            w = win.slice_at(p, 0)
            z2 = q + bb * z_ref[:]
            t2 = w + bb * t_ref[:]
            p2 = r_ref[:] + bb * p_ref[:]
            x2 = x_ref[:] + ab * p2
            r2 = r_ref[:] - ab * t2
            w2 = w - ab * z2
            xo_ref[:] = x2
            ro_ref[:] = r2
            wo_ref[:] = w2
            zo_ref[:] = z2
            to_ref[:] = t2
            po_ref[:] = p2

            @pl.when(i == 0)
            def _():
                dacc[:, :] = jnp.zeros_like(dacc)

            g = jnp.sum((r2 * r2).reshape(B // 128, 128), axis=0)
            d = jnp.sum((w2 * r2).reshape(B // 128, 128), axis=0)
            dacc[0, :] = dacc[0, :] + g
            dacc[1, :] = dacc[1, :] + d

            @pl.when(i == nblocks - one)
            def _():
                part_ref[:, :] = dacc[:, :]


@functools.partial(jax.jit, static_argnames=("offsets", "block"))
def fused_pipelined_iter_ring(vals, w, x, r, z, t, p, alpha, beta,
                              offsets: tuple[int, ...], block: int):
    """One fused pipelined-CG iteration with w UNPADDED (Np,): the ring
    window streams w once; boundaries are implicit zeros.  Same returns as
    fused_pipelined_iter."""
    from .pallas_dia import ring_scratch_shapes

    K, Np = vals.shape
    assert Np % block == 0, (Np, block)
    if block % 128 != 0:
        raise ValueError(
            f"fused kernels require 128-multiple blocks (got {block}); "
            f"construct the operator with pad_to a multiple of 128")
    assert w.shape[0] == Np
    if vals.dtype == jnp.float64 and jax.default_backend() not in ("cpu",):
        raise NotImplementedError(
            "the fused pipelined kernel requires float32 storage on TPU")
    hw = max(max(abs(o) for o in offsets), 1)
    m = -(-hw // block)
    nblocks = Np // block
    kernel = functools.partial(_kernel_ring, offsets, m, block, nblocks)
    vdt = vals.dtype
    ab = jnp.reshape(alpha.astype(vdt), (1, 1))
    bb = jnp.reshape(beta.astype(vdt), (1, 1))

    try:
        vma = jax.typeof(vals).vma
        vec = lambda: jax.ShapeDtypeStruct((Np,), vdt, vma=vma)
        parts_shape = jax.ShapeDtypeStruct((2, 128), vdt, vma=vma)
    except (AttributeError, TypeError):
        vec = lambda: jax.ShapeDtypeStruct((Np,), vdt)
        parts_shape = jax.ShapeDtypeStruct((2, 128), vdt)

    z32 = np.int32(0)
    blk = lambda: pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM)
    smem_scalar = lambda: pl.BlockSpec((1, 1), lambda i: (z32, z32),
                                       memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # w in HBM
            smem_scalar(),                                   # alpha
            smem_scalar(),                                   # beta
            pl.BlockSpec((K, block), lambda i: (z32, i),
                         memory_space=pltpu.VMEM),           # vals
            blk(), blk(), blk(), blk(), blk(),               # x r z t p
        ],
        out_specs=(blk(), blk(), blk(), blk(), blk(), blk(),
                   pl.BlockSpec((2, 128), lambda i: (z32, z32),
                                memory_space=pltpu.VMEM)),
        out_shape=(vec(), vec(), vec(), vec(), vec(), vec(), parts_shape),
        scratch_shapes=ring_scratch_shapes(m, block, vdt) + [
            pltpu.VMEM((2, 128), vdt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * K + 12) * Np,
            bytes_accessed=(K + 13) * Np * vdt.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(w, ab, bb, vals, x, r, z, t, p)
    x2, r2, w2, z2, t2, p2, parts = out
    gd = jnp.sum(parts.astype(jnp.float64), axis=1)
    return x2, r2, w2, z2, t2, p2, gd


def pick_block_fused_ring(Np: int, K: int, hw: int, itemsize: int,
                          vmem_budget: int = 10 * 1024 * 1024,
                          max_phase_terms: int = 1024) -> int | None:
    """Block size for the fused ring kernel: double-buffered vals (2K·B),
    11 vector blocks double-buffered (22·B), the (2m+3)-block ring.
    None when no block fits (fall back to the windowed fused kernel)."""
    if Np < 128:
        return None
    # start at 32768: fewer grid steps measurably help the SpMV ring
    # (3048 → 3039 µs at K=27) and narrow stencils fit the budget easily
    b = 32768
    while b > Np:
        b //= 2
    while b >= 128:
        m = -(-hw // b)
        R = 2 * m + 2
        need = ((2 * K + 24) * b + (R + 1) * b) * itemsize
        if need <= vmem_budget and Np % b == 0 and b % 128 == 0 \
                and R * (K + 12) <= max_phase_terms:
            return b
        b //= 2
    return None


def pick_block_fused(Np: int, K: int, hw: int, itemsize: int,
                     vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Largest power-of-two block such that the kernel's VMEM residents fit:
    double-buffered vals (2K·B), 5 in + 6 out blocks double-buffered
    (22·B), two w windows (2·(B+2hw))."""
    if Np <= 128:
        return Np
    b = 32768
    while b > Np:
        b //= 2
    while b > 128:
        need = ((2 * K + 24) * b + 4 * hw) * itemsize
        if need <= vmem_budget and Np % b == 0:
            return b
        b //= 2
    return b if Np % b == 0 else Np
