"""Fused pipelined-CG vector update + dots, SpMV-agnostic.

The stencil path fuses the WHOLE iteration (SpMV + update + dots) into
one Pallas pass (ops/pallas_pipelined.py, ops/pallas_df64.py) because a
DIA SpMV is itself a windowed streaming pass.  On GENERAL partitions the
SpMV is the chunked-gather SELL kernel (its own pass over the slot
slabs) — the device-initiated one-pass analogue of the reference's
general-partition pipelined kernel (cg-kernels-cuda.cu:1316-1711) is
therefore TWO fused passes per iteration:

    q = A·w            (SELL chunked-gather kernel, slab traffic)
    update + dots      (THIS kernel: 6-vector Gear/Chronopoulos update
                        + both reductions, every vector read once)

XLA's own fusion leaves the two dot reductions as separate consumers of
r'/w' (re-read from HBM); this kernel computes them in the same pass,
reading 7 vectors and writing 6 with zero re-reads.  Dot partials are
accumulated across sequential grid steps in an SMEM (hi, lo) pair via
two_sum — matching the "mixed" dot contract of ops/blas1.py (f32
blockwise, f64-quality combine).

The df64 variant does the same over explicit (hi, lo) f32 pairs with
error-free transformations (ops/df64.py) — the f64-parity update for
the general-partition fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64


def _chunk_fold(prod, B):
    """(B,) f32 products → one (hi, lo) pair: 1024-chunk sums folded with
    two_sum (the same shape as pallas_df64._dot_partials)."""
    chunks = prod.reshape(B // 1024, 1024).sum(axis=1) if B >= 1024 \
        else prod.reshape(1, B).sum(axis=1)
    hi = chunks[0]
    lo = jnp.float32(0.0)
    for k in range(1, chunks.shape[0]):
        hi, e = df64.two_sum(hi, chunks[k])
        lo = lo + e
    return hi, lo


def _acc_smem(acc, i, nblocks, part_ref, pairs):
    """Fold this block's dot pairs into the SMEM accumulator (sequential
    grid → race-free) and emit on the last block."""
    @pl.when(i == 0)
    def _():
        for j in range(4):
            acc[j] = jnp.float32(0.0)

    with df64.no_barriers():
        for j, (h, l) in enumerate(pairs):
            ah, ae = df64.two_sum(acc[2 * j], h)
            acc[2 * j] = ah
            acc[2 * j + 1] = acc[2 * j + 1] + l + ae

    @pl.when(i == nblocks - jnp.int32(1))
    def _():
        for j in range(4):
            part_ref[0, j] = acc[j]


def _kernel_f32(B, sc_ref, q_ref, x_ref, r_ref, w_ref, z_ref, t_ref, p_ref,
                xo, ro, wo, zo, to, po, part_ref, acc):
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    alpha, beta = sc_ref[0, 0], sc_ref[0, 1]
    z = q_ref[:] + beta * z_ref[:]
    t = w_ref[:] + beta * t_ref[:]
    p = r_ref[:] + beta * p_ref[:]
    x = x_ref[:] + alpha * p
    r = r_ref[:] - alpha * t
    w = w_ref[:] - alpha * z
    xo[:] = x
    ro[:] = r
    wo[:] = w
    zo[:] = z
    to[:] = t
    po[:] = p
    # barrier-free EFTs: Mosaic has no optimization_barrier primitive
    # (and preserves f32 rounding without it); interpret mode executes
    # straight-line kernel ops eagerly, where the EFTs hold regardless
    with df64.no_barriers():
        gh, gl = _chunk_fold(r * r, B)
        dh, dl = _chunk_fold(w * r, B)
    _acc_smem(acc, i, nblocks, part_ref, [(gh, gl), (dh, dl)])


@functools.partial(jax.jit, static_argnames=("block",))
def fused_update_iter(q, x, r, w, z, t, p, scalars, block: int):
    """One fused pipelined-CG update given q = A·w.

    ``scalars`` is a (1, 2) f32 [[alpha, beta]].  Returns 6 updated f32
    vectors + gd, a float64 (2,) of (γ', δ') = (r'·r', w'·r')."""
    Np = q.shape[0]
    assert Np % block == 0
    nblocks = Np // block
    f32 = jnp.float32
    z32 = np.int32(0)
    blk = lambda: pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM)
    vec = lambda: jax.ShapeDtypeStruct((Np,), f32)
    out = pl.pallas_call(
        functools.partial(_kernel_f32, block),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (z32, z32),
                               memory_space=pltpu.SMEM)]
        + [blk() for _ in range(7)],
        out_specs=tuple([blk() for _ in range(6)]
                        + [pl.BlockSpec((1, 4), lambda i: (z32, z32),
                                        memory_space=pltpu.SMEM)]),
        out_shape=tuple([vec() for _ in range(6)]
                        + [jax.ShapeDtypeStruct((1, 4), f32)]),
        scratch_shapes=[pltpu.SMEM((4,), f32)],
        cost_estimate=pl.CostEstimate(
            flops=16 * Np, bytes_accessed=13 * Np * 4, transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(scalars, q, x, r, w, z, t, p)
    vecs, parts = out[:6], out[6]
    p64 = parts.astype(jnp.float64)
    gd = jnp.stack([p64[0, 0] + p64[0, 1], p64[0, 2] + p64[0, 3]])
    return (*vecs, gd)


def _kernel_df64(B, sc_ref,
                 qh_ref, ql_ref, xh_ref, xl_ref, rh_ref, rl_ref,
                 wh_ref, wl_ref, zh_ref, zl_ref, th_ref, tl_ref,
                 ph_ref, pl_ref,
                 xho, xlo, rho, rlo, who, wlo, zho, zlo, tho, tlo,
                 pho, plo, part_ref, acc):
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    abh, abl = sc_ref[0, 0], sc_ref[0, 1]
    bbh, bbl = sc_ref[0, 2], sc_ref[0, 3]
    with df64.no_barriers():
        zh, zl = df64.df_axpy(bbh, bbl, zh_ref[:], zl_ref[:],
                              qh_ref[:], ql_ref[:])
        th, tl = df64.df_axpy(bbh, bbl, th_ref[:], tl_ref[:],
                              wh_ref[:], wl_ref[:])
        ph, pl_ = df64.df_axpy(bbh, bbl, ph_ref[:], pl_ref[:],
                               rh_ref[:], rl_ref[:])
        xh, xl = df64.df_axpy(abh, abl, ph, pl_, xh_ref[:], xl_ref[:])
        nah, nal = -abh, -abl
        rh, rl = df64.df_axpy(nah, nal, th, tl, rh_ref[:], rl_ref[:])
        wh, wl = df64.df_axpy(nah, nal, zh, zl, wh_ref[:], wl_ref[:])
        g_p, g_e = df64.two_prod(rh, rh)
        g_e = g_e + 2.0 * (rh * rl)
        d_p, d_e = df64.two_prod(wh, rh)
        d_e = d_e + wh * rl + wl * rh
        gh, gl = _chunk_fold(g_p, B)
        gl = gl + jnp.sum(g_e)
        dh, dl = _chunk_fold(d_p, B)
        dl = dl + jnp.sum(d_e)
    xho[:] = xh; xlo[:] = xl
    rho[:] = rh; rlo[:] = rl
    who[:] = wh; wlo[:] = wl
    zho[:] = zh; zlo[:] = zl
    tho[:] = th; tlo[:] = tl
    pho[:] = ph; plo[:] = pl_
    _acc_smem(acc, i, nblocks, part_ref, [(gh, gl), (dh, dl)])


@functools.partial(jax.jit, static_argnames=("block",))
def fused_update_iter_df64(qh, ql, xh, xl, rh, rl, wh, wl, zh, zl,
                           th, tl, ph, pl_, scalars, block: int):
    """df64 fused update given a df64-quality q = A·w pair.

    ``scalars`` is a (1, 4) f32 [[alpha_hi, alpha_lo, beta_hi, beta_lo]].
    Returns 12 updated (hi, lo) vectors + gd, a float64 (2,)."""
    Np = qh.shape[0]
    assert Np % block == 0
    nblocks = Np // block
    f32 = jnp.float32
    z32 = np.int32(0)
    blk = lambda: pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM)
    vec = lambda: jax.ShapeDtypeStruct((Np,), f32)
    out = pl.pallas_call(
        functools.partial(_kernel_df64, block),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((1, 4), lambda i: (z32, z32),
                               memory_space=pltpu.SMEM)]
        + [blk() for _ in range(14)],
        out_specs=tuple([blk() for _ in range(12)]
                        + [pl.BlockSpec((1, 4), lambda i: (z32, z32),
                                        memory_space=pltpu.SMEM)]),
        out_shape=tuple([vec() for _ in range(12)]
                        + [jax.ShapeDtypeStruct((1, 4), f32)]),
        scratch_shapes=[pltpu.SMEM((4,), f32)],
        cost_estimate=pl.CostEstimate(
            flops=180 * Np, bytes_accessed=26 * Np * 4, transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(scalars, qh, ql, xh, xl, rh, rl, wh, wl, zh, zl, th, tl, ph, pl_)
    vecs, parts = out[:12], out[12]
    p64 = parts.astype(jnp.float64)
    gd = jnp.stack([p64[0, 0] + p64[0, 1], p64[0, 2] + p64[0, 3]])
    return (*vecs, gd)


def pick_block_update(Np: int, vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Block size for the fused-update kernels.  Callers zero-pad their
    vectors to a block multiple, so the block only needs Mosaic 1-D f32
    tile alignment (1024) and a VMEM-bounded double-buffered working set
    (df64 worst case: 28 f32 arrays in+out, 224 bytes/element)."""
    b = 32768
    while b > 1024 and (224 * b > vmem_budget or b >= 4 * max(Np, 1)):
        b //= 2
    return b
