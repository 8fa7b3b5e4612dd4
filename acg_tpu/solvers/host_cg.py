"""Host-stepped CG: one jitted iteration per host round-trip.

The reference's default solvers are host-driven — the CPU launches each
iteration's kernels and performs the convergence test after an async D2H
copy of the residual norm (acgsolvercuda_solvempi, cgcuda.c:855-1054).
This module reproduces that execution model: a jitted step function, a
Python loop, a device→host sync per iteration for the convergence branch.

It exists as the comparison axis against the fused while_loop solvers
(solvers/cg.py): on TPU the host round-trip costs orders of magnitude more
than on a locally attached GPU, which is precisely the measurement that
motivates the device-initiated design (SURVEY.md §5.8).  Use it for
debugging and for the host-vs-device benchmark axis, not production.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blas1 import dot, dot2, nrm2sqr
from .cg import CGOptions, SolveInfo


def _check(rnrm2, dxnrm2, bnrm2, x0nrm2, opt: CGOptions) -> bool:
    if opt.residual_atol > 0 and rnrm2 < opt.residual_atol:
        return True
    if opt.residual_rtol > 0 and rnrm2 < opt.residual_rtol * bnrm2:
        return True
    if opt.diff_atol > 0 and dxnrm2 < opt.diff_atol:
        return True
    if opt.diff_rtol > 0 and x0nrm2 > 0 and dxnrm2 < opt.diff_rtol * x0nrm2:
        return True
    return False


def solve_host_stepped(op, b: np.ndarray, x0: np.ndarray | None = None,
                       opt: CGOptions = CGOptions(), method: str = "cg"):
    """Host-driven solve; same semantics/result type as solvers.cg.solve."""
    dd = jnp.dtype(opt.dot_dtype)
    N, Np = op.N, op.Np
    vdtype = op.vals.dtype if hasattr(op, "vals") else jnp.float64
    bp = jnp.zeros((Np,), vdtype).at[:N].set(jnp.asarray(b, vdtype))
    x = jnp.zeros((Np,), vdtype)
    if x0 is not None:
        x = x.at[:N].set(jnp.asarray(x0, vdtype))

    spmv = jax.jit(lambda o, v: o.spmv(v))
    bnrm2 = float(np.sqrt(jax.device_get(nrm2sqr(bp, dd))))
    x0nrm2 = float(np.sqrt(jax.device_get(nrm2sqr(x, dd))))

    r = bp - spmv(op, x)
    gamma = float(jax.device_get(nrm2sqr(r, dd)))
    r0nrm2 = float(np.sqrt(gamma))
    dxnrm2 = float("inf")

    if method == "cg":
        p = r

        @jax.jit
        def step(op_, x_, r_, p_, gamma_):
            t = op_.spmv(p_)
            pdott = dot(p_, t, dd)
            alpha = gamma_ / pdott
            xn = x_ + alpha.astype(vdtype) * p_
            rn = r_ - alpha.astype(vdtype) * t
            gn = nrm2sqr(rn, dd)
            pn2 = nrm2sqr(p_, dd)
            beta = gn / gamma_
            pnew = rn + beta.astype(vdtype) * p_
            return xn, rn, pnew, gn, alpha * alpha * pn2

        k = 0
        converged = _check(r0nrm2, dxnrm2, bnrm2, x0nrm2, opt)
        while not converged and k < opt.max_iterations:
            x, r, p, g, dx2 = step(op, x, r, p, gamma)
            gamma = float(jax.device_get(g))          # host decision point
            dxnrm2 = float(np.sqrt(jax.device_get(dx2)))
            k += 1
            converged = _check(np.sqrt(gamma), dxnrm2, bnrm2, x0nrm2, opt)
    elif method == "pipelined":
        w = spmv(op, r)
        gd = jax.device_get(dot2(r, r, w, r, dd))
        gamma, delta = float(gd[0]), float(gd[1])
        z = t_ = p = jnp.zeros_like(bp)
        gprev = aprev = 1.0

        @jax.jit
        def step(op_, x_, r_, w_, z_, t__, p_, gamma_, delta_, gprev_, aprev_, k_):
            q = op_.spmv(w_)
            beta = jnp.where(k_ == 0, jnp.array(0.0, dd), gamma_ / gprev_)
            alpha = gamma_ / (delta_ - beta * gamma_ / aprev_)
            ab, bb = alpha.astype(vdtype), beta.astype(vdtype)
            zn = q + bb * z_
            tn = w_ + bb * t__
            pn = r_ + bb * p_
            xn = x_ + ab * pn
            rn = r_ - ab * tn
            wn = w_ - ab * zn
            gd_ = dot2(rn, rn, wn, rn, dd)
            return xn, rn, wn, zn, tn, pn, gd_, alpha

        k = 0
        converged = _check(np.sqrt(gamma), dxnrm2, bnrm2, x0nrm2, opt)
        while not converged and k < opt.max_iterations:
            x, r, w, z, t_, p, gd, alpha = step(
                op, x, r, w, z, t_, p, gamma, delta, gprev, aprev, k)
            gprev, aprev = gamma, float(jax.device_get(alpha))
            gd = jax.device_get(gd)
            gamma, delta = float(gd[0]), float(gd[1])
            k += 1
            converged = _check(np.sqrt(gamma), dxnrm2, bnrm2, x0nrm2, opt)
    else:
        raise ValueError(f"unknown method {method!r}")

    info = SolveInfo(niterations=k, converged=converged, bnrm2=bnrm2,
                     r0nrm2=r0nrm2, rnrm2=float(np.sqrt(gamma)),
                     x0nrm2=x0nrm2,
                     dxnrm2=dxnrm2 if np.isfinite(dxnrm2) else 0.0)
    return np.asarray(x[:N]), info


def solve_host_stepped_dist(offsets, vals, b, nparts=None,
                            x0=None, opt: CGOptions = CGOptions(),
                            pad_to: int = 256, devices=None):
    """Host-stepped DISTRIBUTED classic CG over a banded operator — the
    direct analogue of the reference's host-driven MPI solver
    (acgsolver_solvempi, cg.c:379-614): each iteration is one jitted
    shard_map step (halo + SpMV + psum dots + updates on the mesh), with
    the convergence branch on the host after a device→host scalar fetch.

    Debug/comparison path; the compiled while_loop solvers
    (solvers/dist_cg.py) are the production mode.
    """
    from jax import lax, shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.dist import (pad_stencil_vector, stencil_spmv_local)
    from ..parallel.mesh import AXIS
    from ..solvers.dist_cg import build_stencil_dist

    dd = jnp.dtype(opt.dot_dtype)
    mesh, plan, vals_sh = build_stencil_dist(offsets, vals, nparts,
                                             None, pad_to, devices)
    vdtype = vals_sh.dtype
    b_g = pad_stencil_vector(plan, np.asarray(b)).astype(vdtype)
    x_g = (np.zeros(plan.Ng, dtype=vdtype) if x0 is None
           else pad_stencil_vector(plan, np.asarray(x0)).astype(vdtype))
    vsh = NamedSharding(mesh, P(AXIS))
    b_sh = jax.device_put(b_g, vsh)
    x = jax.device_put(x_g, vsh)

    def _setup(vals_l, b_l, x_l):
        spmv = lambda xx: stencil_spmv_local(plan, vals_l, xx, AXIS)
        r = b_l - spmv(x_l)
        return (r, lax.psum(nrm2sqr(r, dd), AXIS),
                lax.psum(nrm2sqr(b_l, dd), AXIS),
                lax.psum(nrm2sqr(x_l, dd), AXIS))

    def _step(vals_l, x_l, r_l, p_l, gamma):
        spmv = lambda xx: stencil_spmv_local(plan, vals_l, xx, AXIS)
        t = spmv(p_l)
        pdott = lax.psum(dot(p_l, t, dd), AXIS)
        alpha = gamma / pdott
        xn = x_l + alpha.astype(vdtype) * p_l
        rn = r_l - alpha.astype(vdtype) * t
        gn = lax.psum(nrm2sqr(rn, dd), AXIS)
        beta = gn / gamma
        pn = rn + beta.astype(vdtype) * p_l
        return xn, rn, pn, gn

    sspec = dict(niterations=P(), converged=P())  # noqa: F841 (doc)
    setup = jax.jit(shard_map(_setup, mesh=mesh,
                              in_specs=(P(None, AXIS), P(AXIS), P(AXIS)),
                              out_specs=(P(AXIS), P(), P(), P()),
                              check_vma=False))
    step = jax.jit(shard_map(_step, mesh=mesh,
                             in_specs=(P(None, AXIS), P(AXIS), P(AXIS),
                                       P(AXIS), P()),
                             out_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
                             check_vma=False))

    r, gamma_d, bn2_d, x0n2_d = setup(vals_sh, b_sh, x)
    gamma = float(jax.device_get(gamma_d))
    bnrm2 = float(np.sqrt(jax.device_get(bn2_d)))
    x0nrm2 = float(np.sqrt(jax.device_get(x0n2_d)))
    r0nrm2 = float(np.sqrt(gamma))
    p = r

    k = 0
    converged = _check(r0nrm2, float("inf"), bnrm2, x0nrm2, opt)
    while not converged and k < opt.max_iterations:
        x, r, p, g = step(vals_sh, x, r, p, gamma)
        gamma = float(jax.device_get(g))        # host decision point
        k += 1
        converged = _check(np.sqrt(gamma), float("inf"), bnrm2, x0nrm2, opt)

    info = SolveInfo(niterations=k, converged=converged, bnrm2=bnrm2,
                     r0nrm2=r0nrm2, rnrm2=float(np.sqrt(gamma)),
                     x0nrm2=x0nrm2)
    return np.asarray(x)[: plan.N], info


def solve_host_stepped_dist_general(pm, b, x0=None,
                                    opt: CGOptions = CGOptions(),
                                    devices=None, halo: str = "allgather",
                                    dtype=None):
    """Host-stepped distributed CG on a GENERAL (METIS-style) partition —
    the full analogue of the reference's host-driven MPI solver on
    arbitrary partitions (acgsolver_solvempi, cg.c:379-614): every
    iteration is one jitted shard_map step (halo exchange + owned/interface
    ELL SpMV + psum-reduced dots + vector updates), and the convergence
    branch runs on the host after a device→host fetch of the residual
    norm — one launch + one sync round-trip per iteration, exactly the
    execution model whose cost the compiled-loop solvers
    (dist_cg.solve_dist_general) exist to amortize.

    ``pm`` comes from partition.graph.build_partitioned_matrix.  Debug /
    comparison path; returns (x (N,) numpy, SolveInfo).
    """
    from jax import lax, shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.dist import general_spmv_with_ghosts
    from ..parallel.mesh import AXIS, make_mesh
    from ..partition.graph import gather_vector, scatter_vector
    from .dist_cg import _halo_plan

    dd = jnp.dtype(opt.dot_dtype)
    vdtype = np.dtype(dtype) if dtype is not None else pm.own_vals.dtype
    mesh = make_mesh(pm.P, devices)
    stk = NamedSharding(mesh, P(AXIS))
    op_args = (jax.device_put(pm.own_colidx, stk),
               jax.device_put(jnp.asarray(pm.own_vals, vdtype), stk),
               jax.device_put(pm.ghost_colidx, stk),
               jax.device_put(jnp.asarray(pm.ghost_vals, vdtype), stk))
    hargs_h, halo_fn = _halo_plan(pm, halo)
    hargs = [jax.device_put(h, stk) for h in hargs_h]
    b_l = jax.device_put(scatter_vector(pm, np.asarray(b)).astype(vdtype),
                         stk)
    x = jax.device_put(
        (np.zeros((pm.P, pm.L), vdtype) if x0 is None
         else scatter_vector(pm, np.asarray(x0)).astype(vdtype)), stk)

    def _spmv(op_local, h):
        oc, ov, gc, gv = op_local

        def spmv(xx):
            ghosts = halo_fn(xx, *h, AXIS)
            return general_spmv_with_ghosts(oc, ov, gc, gv, xx, ghosts)
        return spmv

    sq = lambda t: tuple(v[0] for v in t)

    def _setup(*a):
        op_local, (b_, x_), h = sq(a[:4]), sq(a[4:6]), sq(a[6:])
        r = b_ - _spmv(op_local, h)(x_)
        return (r[None], lax.psum(nrm2sqr(r, dd), AXIS),
                lax.psum(nrm2sqr(b_, dd), AXIS),
                lax.psum(nrm2sqr(x_, dd), AXIS))

    def _step(*a):
        op_local, (x_, r_, p_) = sq(a[:4]), sq(a[4:7])
        gamma, h = a[7], sq(a[8:])
        t = _spmv(op_local, h)(p_)
        pdott = lax.psum(dot(p_, t, dd), AXIS)
        alpha = gamma / pdott
        xn = x_ + alpha.astype(vdtype) * p_
        rn = r_ - alpha.astype(vdtype) * t
        gn = lax.psum(nrm2sqr(rn, dd), AXIS)
        beta = gn / gamma
        pn = rn + beta.astype(vdtype) * p_
        return xn[None], rn[None], pn[None], gn

    vspec = [P(AXIS)] * 4
    setup = jax.jit(shard_map(
        _setup, mesh=mesh,
        in_specs=tuple(vspec + [P(AXIS)] * 2 + [P(AXIS)] * len(hargs)),
        out_specs=(P(AXIS), P(), P(), P()), check_vma=False))
    step = jax.jit(shard_map(
        _step, mesh=mesh,
        in_specs=tuple(vspec + [P(AXIS)] * 3 + [P()] + [P(AXIS)] * len(hargs)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P()), check_vma=False))

    r, gamma_d, bn2_d, x0n2_d = setup(*op_args, b_l, x, *hargs)
    gamma = float(jax.device_get(gamma_d))
    bnrm2 = float(np.sqrt(jax.device_get(bn2_d)))
    x0nrm2 = float(np.sqrt(jax.device_get(x0n2_d)))
    r0nrm2 = float(np.sqrt(gamma))
    p = r

    k = 0
    converged = _check(r0nrm2, float("inf"), bnrm2, x0nrm2, opt)
    while not converged and k < opt.max_iterations:
        x, r, p, g = step(*op_args, x, r, p, gamma, *hargs)
        gamma = float(jax.device_get(g))        # host decision point
        k += 1
        converged = _check(np.sqrt(gamma), float("inf"), bnrm2, x0nrm2, opt)

    info = SolveInfo(niterations=k, converged=converged, bnrm2=bnrm2,
                     r0nrm2=r0nrm2, rnrm2=float(np.sqrt(gamma)),
                     x0nrm2=x0nrm2)
    return gather_vector(pm, np.asarray(x)), info
