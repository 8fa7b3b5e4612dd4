"""Fused pipelined-CG iteration in df64 (double-f32) precision.

The f64-parity answer to "the TPU has no f64 ALUs": every state vector is
an explicit (hi, lo) f32 pair and one Pallas pass per iteration performs
the SpMV, the six Gear/Chronopoulos updates, and both dot products using
error-free-transformation arithmetic (ops/df64.py) — ~2^-48 relative
accuracy, HBM traffic identical to true f64, VPU arithmetic instead of
XLA's slice-materializing f64 emulation.

Dot products: per element, two_prod(rh, rh) + the 2·rh·rl cross term give
an f64-quality product pair; products are summed f32-blockwise within
1024-element chunks and combined in f64 outside the kernel (the "mixed"
contract of ops/blas1.py, here applied to df64-quality products).

Structure mirrors ops/pallas_pipelined.py (double-buffered w-window DMA,
parity-predicated compute, SMEM partials, int32 index maps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64


def _fold_chain(prods):
    qh, ql = prods[0]
    for mh, ml in prods[1:]:
        qh, ql = df64.df_add(qh, ql, mh, ml)
    return qh, ql


def _fold(prods, accum):
    """Fold per-diagonal (hi, lo) product pairs into one pair.

    ``accum`` selects the reduction shape (VERDICT round-1 next #7 — the
    df64 SpMV is ALU-bound on the dependent df_add chain):

    * ``chain``  — sequential df_add (depth K-1, the round-1 shape);
    * ``split2`` — two independent chains over even/odd diagonals folded
      once at the end (depth ~K/2, same flop count + one df_add);
    * ``tree``   — pairwise tree reduction (depth ceil(log2 K), same
      flop count, K-1 live pairs at the widest level).

    All three compute the same mathematically-reassociated sum; df64
    accuracy is ~2^-48 regardless of association order (each df_add is
    individually error-free to working precision).
    """
    if accum == "chain" or len(prods) < 3:
        return _fold_chain(prods)
    if accum == "split2":
        a = _fold_chain(prods[0::2])
        b = _fold_chain(prods[1::2])
        return df64.df_add(*a, *b)
    if accum == "tree":
        while len(prods) > 1:
            nxt = [df64.df_add(*prods[i], *prods[i + 1])
                   for i in range(0, len(prods) - 1, 2)]
            if len(prods) % 2:
                nxt.append(prods[-1])
            prods = nxt
        return prods[0]
    raise ValueError(f"unknown df64 accum strategy {accum!r}")


def _dot_partials(ph_sum, pe_sum, B):
    """Sum a (B,) f32 product array blockwise (1024) into one f32 pair via
    sequential two_sum folding of the chunk sums."""
    chunks = ph_sum.reshape(B // 1024, 1024).sum(axis=1) if B >= 1024 \
        else ph_sum.reshape(1, B).sum(axis=1)
    # fold chunk sums into a running (hi, lo) pair
    hi = chunks[0]
    lo = jnp.float32(0.0)
    for k in range(1, chunks.shape[0]):
        hi, e = df64.two_sum(hi, chunks[k])
        lo = lo + e
    lo = lo + pe_sum
    return hi, lo


def _kernel(offsets, hw, B, vals_exact, accum, wh_hbm, wl_hbm,
            sc_ref, vh_ref, vl_ref,
            xh_ref, xl_ref, rh_ref, rl_ref, zh_ref, zl_ref,
            th_ref, tl_ref, ph_ref, pl_ref,
            xho, xlo, rho, rlo, who, wlo, zho, zlo, tho, tlo, pho, plo,
            part_ref, winh0, winh1, winl0, winl1, acc, sem):
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    one, two = jnp.int32(1), jnp.int32(2)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + one, two)

    def wc(blk, hbm, win, s):
        # semaphore s = slot*2 + {0: hi, 1: lo} — start/wait pairs match
        return pltpu.make_async_copy(
            hbm.at[pl.ds(blk * jnp.int32(B), B + 2 * hw)],
            win, sem.at[jnp.int32(s)])

    @pl.when(i == 0)
    def _():
        wc(i, wh_hbm, winh0, 0).start()
        wc(i, wl_hbm, winl0, 1).start()

    @pl.when((i + one < nblocks) & (nxt == 0))
    def _():
        wc(i + one, wh_hbm, winh0, 0).start()
        wc(i + one, wl_hbm, winl0, 1).start()

    @pl.when((i + one < nblocks) & (nxt == 1))
    def _():
        wc(i + one, wh_hbm, winh1, 2).start()
        wc(i + one, wl_hbm, winl1, 3).start()

    # alpha/beta as (hi, lo) pairs from SMEM
    abh, abl = sc_ref[0, 0], sc_ref[0, 1]
    bbh, bbl = sc_ref[0, 2], sc_ref[0, 3]

    def compute(wh_win, wl_win):
        with df64.no_barriers():
            prods = []
            for k, off in enumerate(offsets):
                if vals_exact:
                    # matrix entries exactly representable in f32
                    # (vals_lo ≡ 0, e.g. Poisson ±1/4/6/26): one-sided
                    # df×f32 product, ~half the EFT flops
                    mh, ml = df64.df_mul_f32(wh_win[pl.ds(hw + off, B)],
                                             wl_win[pl.ds(hw + off, B)],
                                             vh_ref[k, :])
                else:
                    mh, ml = df64.df_mul(vh_ref[k, :], vl_ref[k, :],
                                         wh_win[pl.ds(hw + off, B)],
                                         wl_win[pl.ds(hw + off, B)])
                prods.append((mh, ml))
            # NOTE: a compensated (non-normalized) accumulation — two_sum
            # on hi, plain adds on lo — has fewer flops but measured
            # SLOWER on v5e (1753 vs 1505 µs/iter; the longer dependent
            # chain on qh stalls the VPU), so full df_add folding stays;
            # ``accum`` picks the fold shape (chain/split2/tree)
            qh, ql = _fold(prods, accum)
            wh = wh_win[pl.ds(hw, B)]
            wl = wl_win[pl.ds(hw, B)]
            # z = q + beta*z ; t = w + beta*t ; p = r + beta*p
            zh, zl = df64.df_axpy(bbh, bbl, zh_ref[:], zl_ref[:], qh, ql)
            th, tl = df64.df_axpy(bbh, bbl, th_ref[:], tl_ref[:], wh, wl)
            phn, pln = df64.df_axpy(bbh, bbl, ph_ref[:], pl_ref[:],
                                    rh_ref[:], rl_ref[:])
            # x += alpha*p ; r -= alpha*t ; w -= alpha*z
            xh, xl = df64.df_axpy(abh, abl, phn, pln, xh_ref[:], xl_ref[:])
            nah, nal = -abh, -abl
            rh, rl = df64.df_axpy(nah, nal, th, tl, rh_ref[:], rl_ref[:])
            wh2, wl2 = df64.df_axpy(nah, nal, zh, zl, wh, wl)
            # dots on updated r, w: f64-quality products
            g_p, g_e = df64.two_prod(rh, rh)
            g_e = g_e + 2.0 * (rh * rl)
            d_p, d_e = df64.two_prod(wh2, rh)
            d_e = d_e + wh2 * rl + wl2 * rh
            gh, gl = _dot_partials(g_p, jnp.sum(g_e), B)
            dh, dl = _dot_partials(d_p, jnp.sum(d_e), B)
        xho[:] = xh; xlo[:] = xl
        rho[:] = rh; rlo[:] = rl
        who[:] = wh2; wlo[:] = wl2
        zho[:] = zh; zlo[:] = zl
        tho[:] = th; tlo[:] = tl
        pho[:] = phn; plo[:] = pln
        # fold this block's (hi, lo) dot partials into the fixed SMEM
        # accumulator (a per-block output table would scale SMEM with the
        # grid and overflow on large problems); the grid is sequential so
        # the accumulation is race-free
        @pl.when(i == 0)
        def _():
            for j in range(4):
                acc[j] = jnp.float32(0.0)

        with df64.no_barriers():
            agh, age = df64.two_sum(acc[0], gh)
            acc[0] = agh
            acc[1] = acc[1] + gl + age
            adh, ade = df64.two_sum(acc[2], dh)
            acc[2] = adh
            acc[3] = acc[3] + dl + ade

        @pl.when(i == nblocks - one)
        def _():
            for j in range(4):
                part_ref[0, j] = acc[j]

    @pl.when(slot == 0)
    def _():
        wc(i, wh_hbm, winh0, 0).wait()
        wc(i, wl_hbm, winl0, 1).wait()
        compute(winh0, winl0)

    @pl.when(slot == 1)
    def _():
        wc(i, wh_hbm, winh1, 2).wait()
        wc(i, wl_hbm, winl1, 3).wait()
        compute(winh1, winl1)


@functools.partial(jax.jit, static_argnames=("offsets", "hw", "block",
                                             "vals_exact", "accum"))
def fused_df64_iter(vals_h, vals_l, wh_ext, wl_ext,
                    xh, xl, rh, rl, zh, zl, th, tl, ph, pl_,
                    scalars, offsets: tuple[int, ...], hw: int, block: int,
                    vals_exact: bool = False, accum: str = "chain"):
    """One df64 fused pipelined-CG iteration.

    ``scalars`` is a (1, 4) f32 array [[alpha_hi, alpha_lo, beta_hi,
    beta_lo]].  ``vals_exact`` (static): the matrix entries are exactly
    f32-representable, enabling the cheaper one-sided SpMV products.
    ``accum`` (static): SpMV fold shape — see ``_fold``.
    Returns 12 updated (hi, lo) vectors plus gd, a float64 (2,) vector of
    (γ', δ') from the per-block partial pairs.
    """
    K, Np = vals_h.shape
    assert Np % block == 0
    nblocks = Np // block
    kernel = functools.partial(_kernel, offsets, hw, block, vals_exact,
                               accum)
    f32 = jnp.float32
    z32 = np.int32(0)
    blk = lambda: pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM)
    vec = lambda: jax.ShapeDtypeStruct((Np,), f32)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # wh_ext
            pl.BlockSpec(memory_space=pl.ANY),   # wl_ext
            pl.BlockSpec((1, 4), lambda i: (z32, z32),
                         memory_space=pltpu.SMEM),          # scalars
            pl.BlockSpec((K, block), lambda i: (z32, i),
                         memory_space=pltpu.VMEM),          # vals_h
            pl.BlockSpec((K, block), lambda i: (z32, i),
                         memory_space=pltpu.VMEM),          # vals_l
        ] + [blk() for _ in range(10)],
        out_specs=tuple([blk() for _ in range(12)]
                        + [pl.BlockSpec((1, 4), lambda i: (z32, z32),
                                        memory_space=pltpu.SMEM)]),
        out_shape=tuple([vec() for _ in range(12)]
                        + [jax.ShapeDtypeStruct((1, 4), f32)]),
        scratch_shapes=[
            pltpu.VMEM((block + 2 * hw,), f32),
            pltpu.VMEM((block + 2 * hw,), f32),
            pltpu.VMEM((block + 2 * hw,), f32),
            pltpu.VMEM((block + 2 * hw,), f32),
            pltpu.SMEM((4,), f32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(45 * 2 * K + 45 * 6 + 50) * Np,
            bytes_accessed=2 * (K + 12) * Np * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(wh_ext, wl_ext, scalars, vals_h, vals_l,
      xh, xl, rh, rl, zh, zl, th, tl, ph, pl_)
    outs, parts = out[:12], out[12]
    p64 = parts.astype(jnp.float64)
    gamma = p64[0, 0] + p64[0, 1]
    delta = p64[0, 2] + p64[0, 3]
    return (*outs, jnp.stack([gamma, delta]))


def pick_block_df(Np: int, K: int, hw: int,
                  vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Block size: double-buffered val pairs (4K·B), 10 in + 12 out blocks
    double-buffered (44·B), four windows."""
    if Np <= 128:
        return Np
    b = 16384
    while b > Np:
        b //= 2
    while b > 128:
        need = ((4 * K + 48) * b + 8 * hw) * 4
        if need <= vmem_budget and Np % b == 0:
            return b
        b //= 2
    return b if Np % b == 0 else Np
