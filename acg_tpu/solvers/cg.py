"""Conjugate-gradient solvers: classic and pipelined (Chronopoulos/Gear).

The TPU execution model collapses the reference's four solver variants
(host CG cg.c:198-377, CUDA host-driven CG cgcuda.c:403, and the monolithic
device-side kernels cg-kernels-cuda.cu:627-970/1316-1711) into compiled
`lax.while_loop` programs: the host launches once and control does not
return until convergence — exactly the semantics of the reference's
device-initiated NVSHMEM kernels, delivered by the compiler instead of a
hand-written persistent kernel.

Both loops are parametrized over the SpMV closure and a reduction hook, so
the single-device and `shard_map`-distributed solvers share the exact same
iteration bodies (the distributed layer injects halo-exchanging SpMVs and
`psum` reductions).

Iteration structure parity:
  * classic:   one SpMV, two scalar reductions per iteration (p·t and r·r,
               matching cgcuda.c:855-1054), convergence test after the
               x/r update.
  * pipelined: one SpMV and ONE stacked 2-element reduction (γ=r·r, δ=w·r)
               per iteration, Gear/Chronopoulos recurrences exactly as the
               reference's fused kernel (cg-kernels-cuda.cu:187-269);
               convergence tested on γ before the next update is applied
               (cgcuda.c:1793-1806).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blas1 import dot, dot2, nrm2sqr


@dataclasses.dataclass(frozen=True)
class CGOptions:
    """Stopping criteria and limits (reference defaults, acg-cuda.c:489-530)."""

    max_iterations: int = 100
    diff_atol: float = 0.0
    diff_rtol: float = 0.0
    residual_atol: float = 0.0
    residual_rtol: float = 1.0e-9
    dot_dtype: str = "float64"
    # Evaluate the while_loop convergence predicate once every
    # ``check_every`` iterations (a fori_loop block runs in between, with
    # updates frozen once converged so results are bit-identical to
    # checking every iteration).  On TPU the data-dependent loop predicate
    # forces a device round-trip per evaluation; amortizing it over a
    # block removes that overhead at the price of up to check_every-1
    # frozen (no-op) iterations of wasted bandwidth after convergence.
    check_every: int = 1
    # Plateau (stall) detection: halt when the best residual norm² seen
    # hasn't improved by at least a factor stall_ratio (on the NORM, i.e.
    # ratio² on γ) over ``stall_iters`` consecutive iterations.  0
    # disables.  A stalled halt reports converged=False, stalled=True —
    # the precision auto-escalation (solvers/auto.py) uses it to hand an
    # f32 stage that flatlines ABOVE its clamped tolerance (an ill-
    # conditioned system) straight to the df64 stage instead of spinning
    # to max_iterations.  The reference never needs this: it always
    # computes f64 (acg-cuda.c:489-530).  Applies to the compiled loops;
    # the host-stepped solvers mirror the reference's host CG, which has
    # no detector either.
    stall_iters: int = 0
    stall_ratio: float = 0.99

    @property
    def needs_diff(self) -> bool:
        return self.diff_atol > 0 or self.diff_rtol > 0


@dataclasses.dataclass
class SolveInfo:
    """Solver outcome (struct acgsolver stats analogue, cg.h:60-98)."""

    niterations: int
    converged: bool
    bnrm2: float
    r0nrm2: float
    rnrm2: float
    x0nrm2: float = 0.0
    dxnrm2: float = 0.0
    residual_history: np.ndarray | None = None
    # True when the run halted on the plateau detector (CGOptions
    # stall_iters) rather than a convergence criterion; converged is
    # False in that case.
    stalled: bool = False


def _converged(rnrm2sqr, dxnrm2sqr, bnrm2sqr, x0nrm2sqr, opt: CGOptions):
    """Any enabled criterion triggers (cg.c stopping criteria; flags are
    static Python floats so disabled branches compile away)."""
    c = jnp.bool_(False)
    if opt.residual_atol > 0:
        c = c | (rnrm2sqr < opt.residual_atol**2)
    if opt.residual_rtol > 0:
        c = c | (rnrm2sqr < (opt.residual_rtol**2) * bnrm2sqr)
    if opt.diff_atol > 0:
        c = c | (dxnrm2sqr < opt.diff_atol**2)
    if opt.diff_rtol > 0:
        c = c | (dxnrm2sqr < (opt.diff_rtol**2) * x0nrm2sqr)
    return c


def _stall_init(opt: CGOptions, gamma0):
    """(best γ, consecutive no-improve count, stalled flag) start state.

    Always carried in the loop state (constant-folded away by XLA when
    stall_iters == 0, since _stall_update is then the identity)."""
    return (gamma0, jnp.int32(0), jnp.bool_(False))


def _stall_update(stall, gamma_new, frozen, opt: CGOptions):
    """Advance the plateau detector one iteration.  No-op when disabled
    or frozen.  An iteration "improves" when γ drops below
    stall_ratio² × (best γ so far); stall_iters consecutive
    non-improving iterations raise the stalled flag, which halts the
    loop like convergence but reports converged=False."""
    if opt.stall_iters <= 0:
        return stall
    best, nbad, stalled = stall
    improved = gamma_new < best * (opt.stall_ratio ** 2)
    best_new = jnp.where(frozen | ~improved, best, gamma_new)
    nbad_new = jnp.where(frozen, nbad,
                         jnp.where(improved, jnp.int32(0),
                                   nbad + jnp.int32(1)))
    return (best_new, nbad_new, stalled | (nbad_new >= opt.stall_iters))


def _dot_dtypes(opt: CGOptions):
    """(scalar dtype, reduction mode) for the configured dot_dtype.

    "mixed" keeps all scalar recurrences in float64 but reduces dots
    blockwise in the storage dtype (ops/blas1.py) — the TPU fast path
    when vectors are float32 (no native f64 ALUs)."""
    if opt.dot_dtype == "mixed":
        return jnp.dtype(jnp.float64), "mixed"
    dt = jnp.dtype(opt.dot_dtype)
    return dt, dt


# ---------------------------------------------------------------------------
# Classic CG


def cg_loop(spmv: Callable, b, x0, opt: CGOptions,
            reduce_fn: Callable = lambda v: v):
    """Fused classic CG. Returns (x, scalars) where scalars is a dict of
    device scalars (niterations, converged, bnrm2sqr, r0nrm2sqr, rnrm2sqr,
    x0nrm2sqr, dxnrm2sqr).

    ``reduce_fn`` sums a scalar or small vector across devices (identity on
    one device, ``psum`` when called under shard_map).
    """
    dd, ddm = _dot_dtypes(opt)
    vdtype = b.dtype

    bnrm2sqr = reduce_fn(nrm2sqr(b, ddm))
    x0nrm2sqr = reduce_fn(nrm2sqr(x0, ddm))
    r = b - spmv(x0)
    gamma0 = reduce_fn(nrm2sqr(r, ddm))        # γ = r·r (reused for α numerator)
    p = r

    def cond(state):
        x, r, p, gamma, dxn2, k, conv, stall = state
        return (k < opt.max_iterations) & jnp.logical_not(conv) & \
            jnp.logical_not(stall[2])

    zero = jnp.array(0.0, dd)

    def step(state):
        x, r, p, gamma, dxn2, k, conv, stall = state
        # once converged (or past max iterations inside a check block) the
        # step freezes: alpha/beta select to 0 so x/r/gamma are unchanged —
        # results are identical to checking the predicate every iteration
        frozen = conv | stall[2] | (k >= opt.max_iterations)
        # named scopes = the reference's NVTX ranges (cgcuda.c:771-938),
        # visible in jax.profiler traces
        with jax.named_scope("acg.spmv"):
            t = spmv(p)
        with jax.named_scope("acg.dot"):
            pdott = reduce_fn(dot(p, t, ddm))
        alpha = jnp.where(frozen, zero, gamma / pdott)
        with jax.named_scope("acg.update"):
            x = x + (alpha.astype(vdtype)) * p
            r = r - (alpha.astype(vdtype)) * t
        with jax.named_scope("acg.nrm2"):
            gamma_new = jnp.where(frozen, gamma, reduce_fn(nrm2sqr(r, ddm)))
        if opt.needs_diff:
            pn2 = reduce_fn(nrm2sqr(p, ddm))
            dxn2 = jnp.where(frozen, dxn2, alpha * alpha * pn2)
        conv = conv | _converged(gamma_new, dxn2, bnrm2sqr, x0nrm2sqr, opt)
        stall = _stall_update(stall, gamma_new, frozen | conv, opt)
        beta = jnp.where(frozen, zero, gamma_new / gamma)
        p = r + (beta.astype(vdtype)) * p
        k = k + jnp.where(frozen, 0, 1).astype(jnp.int32)
        return (x, r, p, gamma_new, dxn2, k, conv, stall)

    if opt.check_every <= 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, opt.check_every,
                                     lambda i, s: step(s), state)

    dxn2_0 = jnp.array(jnp.inf, dd)
    conv0 = _converged(gamma0, dxn2_0, bnrm2sqr, x0nrm2sqr, opt)
    state = (x0, r, p, gamma0, dxn2_0, jnp.int32(0), conv0,
             _stall_init(opt, gamma0))
    (x, r, p, gamma, dxn2, k, conv, stall) = \
        jax.lax.while_loop(cond, body, state)
    scalars = dict(niterations=k, converged=conv, stalled=stall[2],
                   bnrm2sqr=bnrm2sqr, r0nrm2sqr=gamma0, rnrm2sqr=gamma,
                   x0nrm2sqr=x0nrm2sqr, dxnrm2sqr=dxn2)
    return x, scalars


def cg_history_scan(spmv: Callable, b, x0, opt: CGOptions,
                    reduce_fn: Callable = lambda v: v, niters: int | None = None):
    """Classic CG for a fixed iteration count via lax.scan, recording the
    residual norm each iteration (the residual-history regression oracle,
    SURVEY.md §4.2).  Updates freeze once converged so the history is flat
    after convergence."""
    dd, ddm = _dot_dtypes(opt)
    vdtype = b.dtype
    n = opt.max_iterations if niters is None else niters

    bnrm2sqr = reduce_fn(nrm2sqr(b, ddm))
    x0nrm2sqr = reduce_fn(nrm2sqr(x0, ddm))
    r = b - spmv(x0)
    gamma0 = reduce_fn(nrm2sqr(r, ddm))
    conv0 = _converged(gamma0, jnp.array(jnp.inf, dd), bnrm2sqr, x0nrm2sqr, opt)

    def step(state, _):
        x, r, p, gamma, k, conv = state
        t = spmv(p)
        pdott = reduce_fn(dot(p, t, ddm))
        alpha = jnp.where(conv, 0.0, gamma / pdott)
        x = x + alpha.astype(vdtype) * p
        r = r - alpha.astype(vdtype) * t
        gamma_new = jnp.where(conv, gamma, reduce_fn(nrm2sqr(r, ddm)))
        conv_new = conv | _converged(gamma_new, jnp.array(jnp.inf, dd),
                                     bnrm2sqr, x0nrm2sqr, opt)
        beta = jnp.where(conv, 0.0, gamma_new / gamma)
        p = r + beta.astype(vdtype) * p
        k = k + jnp.where(conv, 0, 1).astype(jnp.int32)
        return (x, r, p, gamma_new, k, conv_new), jnp.sqrt(gamma_new)

    state0 = (x0, r, r, gamma0, jnp.int32(0), conv0)  # p0 = r0
    (x, r, p, gamma, k, conv), hist = jax.lax.scan(step, state0, None, length=n)
    scalars = dict(niterations=k, converged=conv, stalled=jnp.bool_(False),
                   bnrm2sqr=bnrm2sqr,
                   r0nrm2sqr=gamma0, rnrm2sqr=gamma,
                   x0nrm2sqr=x0nrm2sqr,
                   dxnrm2sqr=jnp.array(jnp.inf, dd))
    return x, scalars, hist


# ---------------------------------------------------------------------------
# Pipelined CG (Gear/Chronopoulos single-reduction variant)


def pipelined_cg_loop(spmv: Callable, b, x0, opt: CGOptions,
                      reduce_fn: Callable = lambda v: v):
    """Fused pipelined CG: one SpMV + one 2-element reduction per iteration.

    Recurrences (cg-kernels-cuda.cu:187-269):
        β = γ/γ_prev          (0 at k=0)
        α = γ/(δ − βγ/α_prev) (γ/δ at k=0)
        z = q + βz ; t = w + βt ; p = r + βp
        x += αp ; r −= αt ; w −= αz
    where q = Aw, and (γ, δ) = (r·r, w·r) are reduced together.
    """
    dd, ddm = _dot_dtypes(opt)
    vdtype = b.dtype

    bnrm2sqr = reduce_fn(nrm2sqr(b, ddm))
    x0nrm2sqr = reduce_fn(nrm2sqr(x0, ddm))
    r = b - spmv(x0)
    w = spmv(r)
    gd0 = reduce_fn(dot2(r, r, w, r, ddm))
    gamma0, delta0 = gd0[0], gd0[1]

    zeros = jnp.zeros_like(b)

    def cond(state):
        (x, r, w, z, t, p, gamma, delta, gprev, aprev, dxn2, k, conv,
         stall) = state
        return (k < opt.max_iterations) & jnp.logical_not(conv) & \
            jnp.logical_not(stall[2])

    zero = jnp.array(0.0, dd)

    def step(state):
        (x, r, w, z, t, p, gamma, delta, gprev, aprev, dxn2, k, conv,
         stall) = state
        # frozen steps (post-convergence inside a check block) select
        # alpha to 0 so x/r/w and the scalars are unchanged; z/t/p keep
        # moving but only ever feed the solution through alpha terms
        frozen = conv | stall[2] | (k >= opt.max_iterations)
        with jax.named_scope("acg.spmv"):
            q = spmv(w)
        beta = jnp.where(k == 0, zero, gamma / gprev)
        alpha = jnp.where(frozen, zero,
                          gamma / (delta - beta * gamma / aprev))
        ab, bb = alpha.astype(vdtype), beta.astype(vdtype)
        with jax.named_scope("acg.fused_update"):
            z = q + bb * z
            t = w + bb * t
            p = r + bb * p
            x = x + ab * p
            r = r - ab * t
            w = w - ab * z
        with jax.named_scope("acg.dot2"):
            gd = reduce_fn(dot2(r, r, w, r, ddm))
        gamma_new = jnp.where(frozen, gamma, gd[0])
        delta_new = jnp.where(frozen, delta, gd[1])
        if opt.needs_diff:
            pn2 = reduce_fn(nrm2sqr(p, ddm))
            dxn2 = jnp.where(frozen, dxn2, alpha * alpha * pn2)
        conv = conv | _converged(gamma_new, dxn2, bnrm2sqr, x0nrm2sqr, opt)
        stall = _stall_update(stall, gamma_new, frozen | conv, opt)
        gprev_new = jnp.where(frozen, gprev, gamma)
        aprev_new = jnp.where(frozen, aprev, alpha)
        k = k + jnp.where(frozen, 0, 1).astype(jnp.int32)
        return (x, r, w, z, t, p, gamma_new, delta_new, gprev_new,
                aprev_new, dxn2, k, conv, stall)

    if opt.check_every <= 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, opt.check_every,
                                     lambda i, s: step(s), state)

    dxn2_0 = jnp.array(jnp.inf, dd)
    conv0 = _converged(gamma0, dxn2_0, bnrm2sqr, x0nrm2sqr, opt)
    state = (x0, r, w, zeros, zeros, zeros, gamma0, delta0,
             jnp.array(1.0, dd), jnp.array(1.0, dd), dxn2_0,
             jnp.int32(0), conv0, _stall_init(opt, gamma0))
    out = jax.lax.while_loop(cond, body, state)
    (x, r, w, z, t, p, gamma, delta, gprev, aprev, dxn2, k, conv,
     stall) = out
    scalars = dict(niterations=k, converged=conv, stalled=stall[2],
                   bnrm2sqr=bnrm2sqr, r0nrm2sqr=gamma0, rnrm2sqr=gamma,
                   x0nrm2sqr=x0nrm2sqr, dxnrm2sqr=dxn2)
    return x, scalars


def pipelined_cg_history_scan(spmv: Callable, b, x0, opt: CGOptions,
                              reduce_fn: Callable = lambda v: v,
                              niters: int | None = None):
    """Pipelined CG with per-iteration residual history (fixed length)."""
    dd, ddm = _dot_dtypes(opt)
    vdtype = b.dtype
    n = opt.max_iterations if niters is None else niters

    bnrm2sqr = reduce_fn(nrm2sqr(b, ddm))
    x0nrm2sqr = reduce_fn(nrm2sqr(x0, ddm))
    r = b - spmv(x0)
    w = spmv(r)
    gd0 = reduce_fn(dot2(r, r, w, r, ddm))
    gamma0, delta0 = gd0[0], gd0[1]
    zeros = jnp.zeros_like(b)
    conv0 = _converged(gamma0, jnp.array(jnp.inf, dd), bnrm2sqr, x0nrm2sqr, opt)

    def step(state, _):
        (x, r, w, z, t, p, gamma, delta, gprev, aprev, k, conv) = state
        q = spmv(w)
        beta = jnp.where(k == 0, jnp.array(0.0, dd), gamma / gprev)
        alpha = jnp.where(conv, jnp.array(0.0, dd),
                          gamma / (delta - beta * gamma / aprev))
        ab, bb = alpha.astype(vdtype), beta.astype(vdtype)
        z = q + bb * z
        t = w + bb * t
        p = r + bb * p
        x = x + ab * p
        r = r - ab * t
        w = w - ab * z
        gd = reduce_fn(dot2(r, r, w, r, ddm))
        gamma_new = jnp.where(conv, gamma, gd[0])
        delta_new = jnp.where(conv, delta, gd[1])
        conv_new = conv | _converged(gamma_new, jnp.array(jnp.inf, dd),
                                     bnrm2sqr, x0nrm2sqr, opt)
        gprev_new = jnp.where(conv, gprev, gamma)
        aprev_new = jnp.where(conv, aprev, alpha)
        k = k + jnp.where(conv, 0, 1).astype(jnp.int32)
        return (x, r, w, z, t, p, gamma_new, delta_new, gprev_new,
                aprev_new, k, conv_new), jnp.sqrt(gamma_new)

    state0 = (x0, r, w, zeros, zeros, zeros, gamma0, delta0,
              jnp.array(1.0, dd), jnp.array(1.0, dd), jnp.int32(0), conv0)
    (x, r, w, z, t, p, gamma, delta, gprev, aprev, k, conv), hist = \
        jax.lax.scan(step, state0, None, length=n)
    scalars = dict(niterations=k, converged=conv, stalled=jnp.bool_(False),
                   bnrm2sqr=bnrm2sqr,
                   r0nrm2sqr=gamma0, rnrm2sqr=gamma, x0nrm2sqr=x0nrm2sqr,
                   dxnrm2sqr=jnp.array(jnp.inf, dd))
    return x, scalars, hist


# ---------------------------------------------------------------------------
# Fully-fused pipelined CG (one Pallas pass per iteration)


def pipelined_cg_loop_fused(op, b, x0, opt: CGOptions,
                            reduce_fn: Callable = lambda v: v,
                            extend_fn: Callable | None = None,
                            spmv: Callable | None = None,
                            vals=None, offsets=None, hw: int | None = None):
    """Pipelined CG where each iteration is ONE fused Pallas pass
    (ops/pallas_pipelined.py): SpMV + the 6-vector Gear/Chronopoulos
    update + both dots, reading every vector exactly once.

    Single-device: pass a DIA ``op`` (vals/offsets/halo_width/extend).
    Distributed: pass ``op=None`` with explicit ``vals`` (local slabs),
    ``offsets``, ``hw`` (pallas-aligned), ``extend_fn`` (halo exchange →
    extended local vector), ``spmv`` (setup-path SpMV) and a psum
    ``reduce_fn``.  Dot accumulation is inherently "mixed" (per-block
    partials summed in f64); scalar recurrences are f64.  diff-based
    stopping criteria are not supported (use the unfused loop).
    """
    from ..ops.pallas_dia import pallas_halo_width
    from ..ops.pallas_pipelined import (fused_pipelined_iter,
                                        fused_pipelined_iter_ring,
                                        pick_block_fused,
                                        pick_block_fused_ring)

    if opt.needs_diff:
        raise ValueError("diff-based stopping criteria are not supported by "
                         "the fused pipelined solver")
    ring_block = None
    if op is not None:
        offsets = tuple(int(o) for o in op.offsets)
        vals = op.vals
        spmv = op.spmv
        # single-device: stream w through the VMEM ring (exactly one read
        # of w, no extend() pass, boundaries implicit zeros); fall back to
        # the windowed kernel + zero-extension when no ring block fits
        ring_block = pick_block_fused_ring(vals.shape[1], len(offsets),
                                           op.halo_width, b.dtype.itemsize)
        hw = pallas_halo_width(op.halo_width)
        extend_fn = lambda v: op.extend(v, hw)
    dd = jnp.dtype(jnp.float64)
    vdtype = b.dtype
    offsets = tuple(int(o) for o in offsets)
    if ring_block is not None:
        def iter_fn(w, x, r, z, t, p, alpha, beta):
            return fused_pipelined_iter_ring(vals, w, x, r, z, t, p,
                                             alpha, beta, offsets,
                                             ring_block)
    else:
        block = pick_block_fused(vals.shape[1], len(offsets), hw,
                                 b.dtype.itemsize)

        def iter_fn(w, x, r, z, t, p, alpha, beta):
            return fused_pipelined_iter(vals, extend_fn(w), x, r, z, t, p,
                                        alpha, beta, offsets, hw, block)

    bnrm2sqr = reduce_fn(nrm2sqr(b, "mixed"))
    x0nrm2sqr = reduce_fn(nrm2sqr(x0, "mixed"))
    r = b - spmv(x0)
    w = spmv(r)
    gd0 = reduce_fn(dot2(r, r, w, r, "mixed"))
    gamma0, delta0 = gd0[0], gd0[1]
    zeros = jnp.zeros_like(b)

    def cond(state):
        (x, r, w, z, t, p, gamma, delta, gprev, aprev, k, conv,
         stall) = state
        return (k < opt.max_iterations) & jnp.logical_not(conv) & \
            jnp.logical_not(stall[2])

    zero = jnp.array(0.0, dd)

    def step(state):
        (x, r, w, z, t, p, gamma, delta, gprev, aprev, k, conv,
         stall) = state
        frozen = conv | stall[2] | (k >= opt.max_iterations)
        beta = jnp.where(k == 0, zero, gamma / gprev)
        alpha = jnp.where(frozen, zero,
                          gamma / (delta - beta * gamma / aprev))
        with jax.named_scope("acg.fused_iter"):
            x2, r2, w2, z2, t2, p2, gd = iter_fn(w, x, r, z, t, p,
                                                 alpha, beta)
        gd = reduce_fn(gd)
        gamma_new = jnp.where(frozen, gamma, gd[0])
        delta_new = jnp.where(frozen, delta, gd[1])
        conv = conv | _converged(gamma_new, jnp.array(jnp.inf, dd),
                                 bnrm2sqr, x0nrm2sqr, opt)
        stall = _stall_update(stall, gamma_new, frozen | conv, opt)
        gprev_new = jnp.where(frozen, gprev, gamma)
        aprev_new = jnp.where(frozen, aprev, alpha)
        k = k + jnp.where(frozen, 0, 1).astype(jnp.int32)
        return (x2, r2, w2, z2, t2, p2, gamma_new, delta_new,
                gprev_new, aprev_new, k, conv, stall)

    if opt.check_every <= 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, opt.check_every,
                                     lambda i, s: step(s), state)

    conv0 = _converged(gamma0, jnp.array(jnp.inf, dd), bnrm2sqr,
                       x0nrm2sqr, opt)
    state = (x0, r, w, zeros, zeros, zeros, gamma0, delta0,
             jnp.array(1.0, dd), jnp.array(1.0, dd), jnp.int32(0), conv0,
             _stall_init(opt, gamma0))
    out = jax.lax.while_loop(cond, body, state)
    (x, r, w, z, t, p, gamma, delta, gprev, aprev, k, conv, stall) = out
    scalars = dict(niterations=k, converged=conv, stalled=stall[2],
                   bnrm2sqr=bnrm2sqr, r0nrm2sqr=gamma0, rnrm2sqr=gamma,
                   x0nrm2sqr=x0nrm2sqr,
                   dxnrm2sqr=jnp.array(jnp.inf, dd))
    return x, scalars


def pipelined_cg_loop_fused_spmv(spmv: Callable, b, x0, opt: CGOptions,
                                 reduce_fn: Callable = lambda v: v):
    """Pipelined CG where each iteration is TWO fused passes: the
    operator's own SpMV kernel (any closure — SELL chunked-gather, ELL,
    a distributed halo+SpMV) followed by ONE Pallas pass doing the
    6-vector Gear/Chronopoulos update plus both dot reductions
    (ops/pallas_update.py).  This is the device-initiated one-pass
    iteration of the reference's general-partition pipelined kernel
    (cg-kernels-cuda.cu:1316-1711) for operators whose SpMV cannot fuse
    into a windowed streaming pass the way DIA does.

    Works for any vector length: vectors are zero-padded once to a
    1024-aligned block multiple (Mosaic 1-D f32 tiling); the SpMV sees
    the original length.  f32 vectors only; dots are "mixed"-quality
    (f32 blockwise + (hi, lo) two_sum carry, combined in f64).
    """
    from ..ops.pallas_update import fused_update_iter, pick_block_update

    if opt.needs_diff:
        raise ValueError("diff-based stopping criteria are not supported by "
                         "the fused pipelined solver")
    if b.dtype != jnp.float32:
        raise ValueError("pipelined-fused requires float32 vectors "
                         f"(got {b.dtype}); use method='pipelined' for f64")
    dd = jnp.dtype(jnp.float64)
    Np = b.shape[0]
    block = pick_block_update(Np)
    Npad = -(-Np // block) * block

    if Npad == Np:
        pad = unpad = lambda v: v
    else:
        zpad = jnp.zeros((Npad - Np,), b.dtype)
        pad = lambda v: jnp.concatenate([v, zpad])
        unpad = lambda v: v[:Np]

    bnrm2sqr = reduce_fn(nrm2sqr(b, "mixed"))
    x0nrm2sqr = reduce_fn(nrm2sqr(x0, "mixed"))
    r = b - spmv(x0)
    w = spmv(r)
    gd0 = reduce_fn(dot2(r, r, w, r, "mixed"))
    gamma0, delta0 = gd0[0], gd0[1]
    zeros = jnp.zeros((Npad,), b.dtype)

    def cond(state):
        (x, r, w, z, t, p, gamma, delta, gprev, aprev, k, conv,
         stall) = state
        return (k < opt.max_iterations) & jnp.logical_not(conv) & \
            jnp.logical_not(stall[2])

    zero = jnp.array(0.0, dd)

    def step(state):
        (x, r, w, z, t, p, gamma, delta, gprev, aprev, k, conv,
         stall) = state
        frozen = conv | stall[2] | (k >= opt.max_iterations)
        beta = jnp.where(k == 0, zero, gamma / gprev)
        alpha = jnp.where(frozen, zero,
                          gamma / (delta - beta * gamma / aprev))
        with jax.named_scope("acg.spmv"):
            q = pad(spmv(unpad(w)))
        sc = jnp.stack([alpha, beta]).astype(jnp.float32).reshape(1, 2)
        with jax.named_scope("acg.fused_update"):
            x2, r2, w2, z2, t2, p2, gd = fused_update_iter(
                q, x, r, w, z, t, p, sc, block)
        gd = reduce_fn(gd)
        gamma_new = jnp.where(frozen, gamma, gd[0])
        delta_new = jnp.where(frozen, delta, gd[1])
        conv = conv | _converged(gamma_new, jnp.array(jnp.inf, dd),
                                 bnrm2sqr, x0nrm2sqr, opt)
        stall = _stall_update(stall, gamma_new, frozen | conv, opt)
        gprev_new = jnp.where(frozen, gprev, gamma)
        aprev_new = jnp.where(frozen, aprev, alpha)
        k = k + jnp.where(frozen, 0, 1).astype(jnp.int32)
        return (x2, r2, w2, z2, t2, p2, gamma_new, delta_new,
                gprev_new, aprev_new, k, conv, stall)

    if opt.check_every <= 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, opt.check_every,
                                     lambda i, s: step(s), state)

    conv0 = _converged(gamma0, jnp.array(jnp.inf, dd), bnrm2sqr,
                       x0nrm2sqr, opt)
    state = (pad(x0), pad(r), pad(w), zeros, zeros, zeros, gamma0, delta0,
             jnp.array(1.0, dd), jnp.array(1.0, dd), jnp.int32(0), conv0,
             _stall_init(opt, gamma0))
    out = jax.lax.while_loop(cond, body, state)
    (x, r, w, z, t, p, gamma, delta, gprev, aprev, k, conv, stall) = out
    scalars = dict(niterations=k, converged=conv, stalled=stall[2],
                   bnrm2sqr=bnrm2sqr, r0nrm2sqr=gamma0, rnrm2sqr=gamma,
                   x0nrm2sqr=x0nrm2sqr,
                   dxnrm2sqr=jnp.array(jnp.inf, dd))
    return unpad(x), scalars


def pipelined_cg_loop_df64_spmv(spmv2: Callable, b, x0, opt: CGOptions,
                                reduce_fn: Callable = lambda v: v):
    """df64 pipelined CG for operators with their OWN df64 SpMV kernel
    (SELL chunked-gather, a distributed halo+SpMV closure) — the
    f64-parity counterpart of pipelined_cg_loop_fused_spmv: TWO fused
    passes per iteration, ``spmv2(wh, wl) -> (qh, ql)`` followed by the
    df64 12-vector update + dots pass (ops/pallas_update.py).  This is
    the general-partition analogue of the reference's f64 pipelined
    kernel on arbitrary partitions (cg-kernels-cuda.cu:1316-1711).

    ``b``/``x0`` are float64 (Np,) arrays (setup norms and the scalar
    recurrences stay f64; the iteration state is (hi, lo) f32 pairs).
    """
    from ..ops.pallas_update import fused_update_iter_df64, pick_block_update

    if opt.needs_diff:
        raise ValueError("diff-based stopping criteria are not supported by "
                         "the df64 solver")
    dd = jnp.dtype(jnp.float64)
    f32 = jnp.float32
    Np = b.shape[0]
    block = pick_block_update(Np)
    Npad = -(-Np // block) * block

    if Npad == Np:
        pad = lambda v: v
        unpad = lambda v: v
    else:
        zpad = jnp.zeros((Npad - Np,), f32)
        pad = lambda v: jnp.concatenate([v, zpad])
        unpad = lambda v: v[:Np]

    def split(v):
        hi = v.astype(f32)
        return hi, (v - hi.astype(dd)).astype(f32)

    def join(h, l):
        return h.astype(dd) + l.astype(dd)

    def split_scalar_pair(alpha, beta):
        ah = alpha.astype(f32)
        al = (alpha - ah.astype(dd)).astype(f32)
        bh = beta.astype(f32)
        bl = (beta - bh.astype(dd)).astype(f32)
        return jnp.stack([ah, al, bh, bl]).reshape(1, 4)

    # setup: norms in f64, r/w through the df64 SpMV itself (the operator
    # has no exact-f64 kernel; one spmv2 call is df64-accurate, which is
    # the loop's own working precision)
    bnrm2sqr = reduce_fn(nrm2sqr(b, dd))
    x0nrm2sqr = reduce_fn(nrm2sqr(x0, dd))
    x0h, x0l = split(x0)
    q0h, q0l = spmv2(x0h, x0l)
    r = b - join(q0h, q0l)
    rh, rl = split(r)
    w1h, w1l = spmv2(rh, rl)
    w = join(w1h, w1l)
    gd0 = reduce_fn(dot2(r, r, w, r, dd))
    gamma0, delta0 = gd0[0], gd0[1]
    zeros = jnp.zeros((Npad,), f32)
    wh, wl = split(w)

    def cond(state):
        return (state[-3] < opt.max_iterations) & \
            jnp.logical_not(state[-2]) & jnp.logical_not(state[-1][2])

    zero = jnp.array(0.0, dd)

    def step(state):
        (xh, xl, rh, rl, wh, wl, zh, zl, th, tl, ph, pl_,
         gamma, delta, gprev, aprev, k, conv, stall) = state
        frozen = conv | stall[2] | (k >= opt.max_iterations)
        beta = jnp.where(k == 0, zero, gamma / gprev)
        alpha = jnp.where(frozen, zero,
                          gamma / (delta - beta * gamma / aprev))
        sc = split_scalar_pair(alpha, beta)
        with jax.named_scope("acg.spmv"):
            qh, ql = spmv2(unpad(wh), unpad(wl))
        with jax.named_scope("acg.df64_update"):
            (xh2, xl2, rh2, rl2, wh2, wl2, zh2, zl2, th2, tl2, ph2, pl2,
             gd) = fused_update_iter_df64(
                pad(qh), pad(ql), xh, xl, rh, rl, wh, wl, zh, zl,
                th, tl, ph, pl_, sc, block)
        gd = reduce_fn(gd)
        gamma_new = jnp.where(frozen, gamma, gd[0])
        delta_new = jnp.where(frozen, delta, gd[1])
        conv = conv | _converged(gamma_new, jnp.array(jnp.inf, dd),
                                 bnrm2sqr, x0nrm2sqr, opt)
        stall = _stall_update(stall, gamma_new, frozen | conv, opt)
        gprev_new = jnp.where(frozen, gprev, gamma)
        aprev_new = jnp.where(frozen, aprev, alpha)
        k = k + jnp.where(frozen, 0, 1).astype(jnp.int32)
        return (xh2, xl2, rh2, rl2, wh2, wl2, zh2, zl2, th2, tl2, ph2, pl2,
                gamma_new, delta_new, gprev_new, aprev_new, k, conv, stall)

    if opt.check_every <= 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, opt.check_every,
                                     lambda i, s: step(s), state)

    conv0 = _converged(gamma0, jnp.array(jnp.inf, dd), bnrm2sqr,
                       x0nrm2sqr, opt)
    state = (pad(x0h), pad(x0l), pad(rh), pad(rl), pad(wh), pad(wl),
             zeros, zeros, zeros, zeros, zeros, zeros,
             gamma0, delta0, jnp.array(1.0, dd), jnp.array(1.0, dd),
             jnp.int32(0), conv0, _stall_init(opt, gamma0))
    out = jax.lax.while_loop(cond, body, state)
    xh, xl = out[0], out[1]
    gamma, k, conv = out[12], out[16], out[17]
    x = unpad(xh).astype(dd) + unpad(xl).astype(dd)
    scalars = dict(niterations=k, converged=conv, stalled=out[18][2],
                   bnrm2sqr=bnrm2sqr, r0nrm2sqr=gamma0, rnrm2sqr=gamma,
                   x0nrm2sqr=x0nrm2sqr,
                   dxnrm2sqr=jnp.array(jnp.inf, dd))
    return x, scalars


def pipelined_cg_loop_df64(op, b, x0, opt: CGOptions,
                           reduce_fn: Callable = lambda v: v,
                           spmv: Callable | None = None,
                           vals=None, offsets=None, hw: int | None = None,
                           ext2: Callable | None = None,
                           vals_exact: bool = False, accum: str = "chain"):
    """Pipelined CG in df64 (double-f32) precision — the f64-parity fast
    path on TPU (no native f64 ALUs; see ops/df64.py and
    ops/pallas_df64.py).  ~2^-48 relative accuracy end-to-end; each
    iteration is one fused Pallas pass over (hi, lo) f32 pairs.

    Single-device: ``op`` is a float64 DIA operator; ``b``/``x0`` are
    float64 (Np,) device arrays.  Distributed: pass ``op=None`` with
    explicit float64 ``vals`` (local slabs), ``offsets``, pallas-aligned
    ``hw``, ``ext2(wh, wl) -> (wh_ext, wl_ext)`` (halo exchange applied to
    both components of the pair — exact, since the pair is just two f32
    arrays), a setup-path ``spmv`` and a psum ``reduce_fn``.  Returns
    (x float64, scalars) like the other loops.
    """
    from ..ops.pallas_dia import pallas_halo_width
    from ..ops.pallas_df64 import fused_df64_iter, pick_block_df

    if opt.needs_diff:
        raise ValueError("diff-based stopping criteria are not supported by "
                         "the df64 solver")
    dd = jnp.dtype(jnp.float64)
    f32 = jnp.float32
    if op is not None:
        hw = pallas_halo_width(op.halo_width)
        offsets = tuple(int(o) for o in op.offsets)
        vals = op.vals
        spmv = op.spmv

        def ext2(wh, wl):
            z = jnp.zeros((hw,), f32)
            return (jnp.concatenate([z, wh, z]),
                    jnp.concatenate([z, wl, z]))
    offsets = tuple(int(o) for o in offsets)
    Np = vals.shape[1]
    block = pick_block_df(Np, len(offsets), hw)

    def split(v):
        hi = v.astype(f32)
        return hi, (v - hi.astype(dd)).astype(f32)

    vals_h, vals_l = split(vals)

    def split_scalar_pair(alpha, beta):
        ah = alpha.astype(f32)
        al = (alpha - ah.astype(dd)).astype(f32)
        bh = beta.astype(f32)
        bl = (beta - bh.astype(dd)).astype(f32)
        return jnp.stack([ah, al, bh, bl]).reshape(1, 4)

    # setup in plain f64 XLA (once; slow but exact)
    bnrm2sqr = reduce_fn(nrm2sqr(b, dd))
    x0nrm2sqr = reduce_fn(nrm2sqr(x0, dd))
    r = b - spmv(x0)
    w = spmv(r)
    gd0 = reduce_fn(dot2(r, r, w, r, dd))
    gamma0, delta0 = gd0[0], gd0[1]
    zh = zl = jnp.zeros((Np,), f32)

    xh, xl = split(x0)
    rh, rl = split(r)
    wh, wl = split(w)
    th, tl = zh, zl
    ph, pl_ = zh, zl

    def cond(state):
        return (state[-3] < opt.max_iterations) & \
            jnp.logical_not(state[-2]) & jnp.logical_not(state[-1][2])

    zero = jnp.array(0.0, dd)

    def step(state):
        (xh, xl, rh, rl, wh, wl, zh, zl, th, tl, ph, pl_,
         gamma, delta, gprev, aprev, k, conv, stall) = state
        frozen = conv | stall[2] | (k >= opt.max_iterations)
        beta = jnp.where(k == 0, zero, gamma / gprev)
        alpha = jnp.where(frozen, zero,
                          gamma / (delta - beta * gamma / aprev))
        sc = split_scalar_pair(alpha, beta)
        with jax.named_scope("acg.df64_iter"):
            wh_ext, wl_ext = ext2(wh, wl)
            (xh2, xl2, rh2, rl2, wh2, wl2, zh2, zl2, th2, tl2, ph2, pl2,
             gd) = fused_df64_iter(
                vals_h, vals_l, wh_ext, wl_ext,
                xh, xl, rh, rl, zh, zl, th, tl, ph, pl_,
                sc, offsets, hw, block, vals_exact, accum)
        gd = reduce_fn(gd)
        gamma_new = jnp.where(frozen, gamma, gd[0])
        delta_new = jnp.where(frozen, delta, gd[1])
        conv = conv | _converged(gamma_new, jnp.array(jnp.inf, dd),
                                 bnrm2sqr, x0nrm2sqr, opt)
        stall = _stall_update(stall, gamma_new, frozen | conv, opt)
        gprev_new = jnp.where(frozen, gprev, gamma)
        aprev_new = jnp.where(frozen, aprev, alpha)
        k = k + jnp.where(frozen, 0, 1).astype(jnp.int32)
        return (xh2, xl2, rh2, rl2, wh2, wl2, zh2, zl2, th2, tl2, ph2, pl2,
                gamma_new, delta_new, gprev_new, aprev_new, k, conv, stall)

    if opt.check_every <= 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, opt.check_every,
                                     lambda i, s: step(s), state)

    conv0 = _converged(gamma0, jnp.array(jnp.inf, dd), bnrm2sqr,
                       x0nrm2sqr, opt)
    state = (xh, xl, rh, rl, wh, wl, zh, zl, th, tl, ph, pl_,
             gamma0, delta0, jnp.array(1.0, dd), jnp.array(1.0, dd),
             jnp.int32(0), conv0, _stall_init(opt, gamma0))
    out = jax.lax.while_loop(cond, body, state)
    xh, xl = out[0], out[1]
    gamma, k, conv = out[12], out[16], out[17]
    x = xh.astype(dd) + xl.astype(dd)
    scalars = dict(niterations=k, converged=conv, stalled=out[18][2],
                   bnrm2sqr=bnrm2sqr, r0nrm2sqr=gamma0, rnrm2sqr=gamma,
                   x0nrm2sqr=x0nrm2sqr,
                   dxnrm2sqr=jnp.array(jnp.inf, dd))
    return x, scalars


# ---------------------------------------------------------------------------
# Single-device driver


METHODS = ("cg", "pipelined", "pipelined-fused", "pipelined-df64")


@partial(jax.jit, static_argnames=("opt", "method", "history", "vals_exact",
                                   "accum"))
def _run_single(op, bp, x0p, opt: CGOptions, method: str, history: bool,
                vals_exact: bool = False, accum: str = "chain"):
    """Compiled solve program.  Keyed by the static (opt, method, history)
    triple and the operator's static aux (offsets/N/backend), so repeated
    solves with the same configuration reuse the compiled program — the
    analogue of the reference's init/solve split (acgsolvercuda_init
    uploads once, cgcuda.c:143-332; solves reuse the device state)."""
    if method == "pipelined-fused":
        if history:
            raise ValueError("pipelined-fused has no history variant; use "
                             "method='pipelined' for residual histories")
        if not hasattr(op, "offsets"):
            # non-DIA operators (SELL/ELL): SpMV is its own kernel pass;
            # fuse the update + dots into a second pass
            return pipelined_cg_loop_fused_spmv(op.spmv, bp, x0p, opt)
        return pipelined_cg_loop_fused(op, bp, x0p, opt)
    if method == "pipelined-df64":
        if history:
            raise ValueError("pipelined-df64 has no history variant; use "
                             "method='pipelined' for residual histories")
        if not hasattr(op, "offsets"):
            # non-DIA operators: the operator brings its own df64 SpMV
            # kernel (SELL chunked-gather pairs) and the update + dots
            # fuse into a second df64 pass
            if not hasattr(op, "spmv_df64"):
                raise ValueError(
                    f"{type(op).__name__} has no df64 SpMV; "
                    "pipelined-df64 needs a DIA or SELL operator")
            if not getattr(op, "df64_ready", True):
                raise ValueError(
                    "pipelined-df64 needs the operator built with "
                    "from_csr(keep_lo=True): without the keep_lo build "
                    "the matrix would silently round to f32")
            return pipelined_cg_loop_df64_spmv(op.spmv_df64, bp, x0p, opt)
        return pipelined_cg_loop_df64(op, bp, x0p, opt,
                                      vals_exact=vals_exact, accum=accum)
    if history:
        fn = cg_history_scan if method == "cg" else pipelined_cg_history_scan
    else:
        fn = cg_loop if method == "cg" else pipelined_cg_loop
    return fn(op.spmv, bp, x0p, opt)


# AOT-compiled program cache: solve() lowers/compiles explicitly (instead
# of letting jit's implicit cache do it) so the optimized HLO text of the
# exact executed program is retrievable — the per-op trace report joins
# profiler events against it (utils/traceparse.py).  Keyed like jit would
# key: backend, operator statics, shapes/dtypes, options.
_COMPILED_CACHE: dict = {}
_LAST_COMPILED = [None]


def _compiled_run(op, bp, x0p, opt, method, history, vals_exact,
                  accum="chain"):
    # leaf shapes are part of the key: SellOperator's aux (N, nnz_true)
    # alone does not determine the bucket shapes (G_b, ntiles_b), and two
    # operators sharing aux but not shapes must not share an executable
    leaf_shapes = tuple((v.shape, str(v.dtype))
                        for v in jax.tree_util.tree_leaves(op)
                        if hasattr(v, "shape"))
    key = (jax.default_backend(), type(op).__name__, op.tree_flatten()[1],
           leaf_shapes,
           bp.shape, str(bp.dtype), opt, method, history, vals_exact, accum)
    c = _COMPILED_CACHE.get(key)
    if c is None:
        c = _run_single.lower(op, bp, x0p, opt, method, history,
                              vals_exact, accum).compile()
        _COMPILED_CACHE[key] = c
    _LAST_COMPILED[0] = c
    return c


def last_compiled_text() -> str | None:
    """Optimized HLO text of the most recent solve()'s program (None if no
    solve ran yet).  Used by the CLI --trace report."""
    c = _LAST_COMPILED[0]
    return c.as_text() if c is not None else None


def solve(op, b: np.ndarray, x0: np.ndarray | None = None,
          opt: CGOptions = CGOptions(), method: str = "cg",
          history: bool = False):
    """Solve A x = b on the current default device.

    ``op`` is a DiaOperator/EllOperator (any object with .spmv/.N/.Np).
    ``b``/``x0`` are host arrays of length N.  Returns (x (N,) numpy,
    SolveInfo)."""
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; expected one of {METHODS}")
    N, Np = op.N, op.Np
    vdtype = getattr(op, "dtype", None)
    if vdtype is None:
        vdtype = op.vals.dtype if hasattr(op, "vals") else jnp.float64
    if method == "pipelined-df64" and not hasattr(op, "offsets"):
        # SELL stores f32 slabs but the df64 loop takes f64 b/x0 (setup
        # norms and scalar recurrences stay f64; iteration state is
        # (hi, lo) pairs split inside the loop)
        vdtype = jnp.float64
    bp = jnp.zeros((Np,), vdtype).at[:N].set(jnp.asarray(b, vdtype))
    if x0 is None:
        x0p = jnp.zeros((Np,), vdtype)
    else:
        x0p = jnp.zeros((Np,), vdtype).at[:N].set(jnp.asarray(x0, vdtype))

    vals_exact = False
    accum = "chain"
    if method == "pipelined-df64":
        # SpMV fold shape A/B switch (ops/pallas_df64._fold); a static
        # compile-time property, part of the compiled-program cache key.
        # Validated here: a typo'd value would otherwise be silently
        # treated as "chain" at small K or error deep in kernel tracing.
        accum = os.environ.get("ACG_DF64_ACCUM", "chain")
        if accum not in ("chain", "split2", "tree"):
            raise ValueError(
                f"ACG_DF64_ACCUM={accum!r} is not a valid fold shape; "
                "expected one of 'chain', 'split2', 'tree'")
        # static property used to specialize the kernel (matrix entries
        # exactly f32-representable?) — cached on the operator at
        # construction; the fallback fetch happens at most once per
        # operator instance (a per-solve fetch costs seconds over the
        # device tunnel).  SELL-style operators record it structurally:
        # the low-residual slabs are None iff the matrix is f32-exact.
        if not hasattr(op, "offsets"):
            vals_exact = getattr(op, "vals_lo", None) is None
        else:
            vals_exact = getattr(op, "_vals_exact", None)
            if vals_exact is None:
                v = np.asarray(op.vals)
                vals_exact = bool(
                    np.all(v == v.astype(np.float32).astype(v.dtype)))
                op._vals_exact = vals_exact

    run = _compiled_run(op, bp, x0p, opt, method, history, vals_exact, accum)
    if history:
        x, scalars, hist = run(op, bp, x0p)
        hist = np.asarray(hist)
    else:
        x, scalars = run(op, bp, x0p)
        hist = None

    scalars = jax.device_get(scalars)
    info = SolveInfo(
        niterations=int(scalars["niterations"]),
        converged=bool(scalars["converged"]),
        bnrm2=float(np.sqrt(scalars["bnrm2sqr"])),
        r0nrm2=float(np.sqrt(scalars["r0nrm2sqr"])),
        rnrm2=float(np.sqrt(scalars["rnrm2sqr"])),
        x0nrm2=float(np.sqrt(scalars["x0nrm2sqr"])),
        dxnrm2=float(np.sqrt(scalars["dxnrm2sqr"])) if np.isfinite(scalars["dxnrm2sqr"]) else 0.0,
        residual_history=hist,
        stalled=bool(scalars.get("stalled", False)),
    )
    return np.asarray(x[:N]), info
