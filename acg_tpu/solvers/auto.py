"""Precision auto-escalation: f32 fast path + df64 restart.

The TPU fast path stores f32 and accumulates dots blockwise ("mixed");
its achievable residual is floored at ~1e-5 relative by f32 rounding in
the pipelined recurrences (measured on the 2048^2 Poisson system:
rnrm/bnrm stalls at 1.5e-5, BENCHMARKS.md).  The reference always
computes in f64 (acg-cuda.c:489-530 defaults), so a user asking for
rtol 1e-6 through the fast path would spin to the iteration cap.

``solve_auto`` delivers the reference's convergence semantics at fast-
path speed: it runs the f32 pipelined solver down to the floor, then —
only if the requested tolerance demands more — restarts the df64
(double-f32) solver from the f32 iterate.  CG restarts cleanly from any
x0, so the first stage's digits are kept and the expensive df64
iterations only refine the tail (measured: df64 is ~3x the f32 cost per
iteration, so finishing the last decade in df64 beats running it end to
end).  This is the "mixed-precision escalation" analogue of iterative
refinement for Krylov solvers.
"""

from __future__ import annotations

import numpy as np

from .cg import CGOptions, SolveInfo, solve

# Measured f32-pipelined relative-residual floor with a safety decade:
# the 2048^2 Poisson run stalls at rnrm/bnrm = 1.5e-5; requesting more
# than 1e-4 from the f32 stage risks spinning at the floor on worse-
# conditioned systems.
F32_RTOL_FLOOR = 1e-4

# Plateau window for the f32 stage when a df64 stage will follow: if the
# best residual norm hasn't improved by >=1% over this many consecutive
# iterations, the f32 stage has hit ITS OWN floor (which on an ill-
# conditioned system sits ABOVE the 1e-4 clamp) and the df64 restart
# takes over immediately instead of the stage spinning to
# max_iterations.  Sized against the asymptotic CG rate: the 2048^2
# Poisson system (kappa ~ 1.7e6) improves ~7%/50 iters, a comfortable
# margin above the 1% trigger, so well-conditioned protocols are
# unchanged.
STALL_WINDOW = 50


def _needs_escalation(opt: CGOptions, bnrm: float) -> bool:
    """True if the requested tolerance is below what f32 can deliver."""
    if opt.residual_rtol > 0 and opt.residual_rtol < F32_RTOL_FLOOR:
        return True
    if opt.residual_atol > 0 and opt.residual_atol < F32_RTOL_FLOOR * bnrm:
        return True
    return False


def solve_auto(op64, b: np.ndarray, x0: np.ndarray | None = None,
               opt: CGOptions = CGOptions(), op32=None,
               method32: str = "pipelined-fused",
               method64: str = "pipelined-df64", verbose: bool = False):
    """Solve with automatic precision selection/escalation.

    ``op64`` is the operator used by the df64 stage (a DiaOperator with
    f64 vals, or a SellOperator built with from_csr(keep_lo=True));
    ``op32`` the f32 fast-path twin (built from ``op64`` if omitted; a
    keep_lo SELL operator serves both stages itself).  ``method64``
    picks the escalation stage's solver: "pipelined-df64" (the TPU fast
    path; default) or "pipelined"/"cg" for true-f64 XLA (the reference-
    parity correctness path — also what CPU tests use, since XLA:CPU's
    excess-precision simplifier weakens the df64 EFTs under jit).
    Residual-based stopping criteria only.
    Returns (x (N,) numpy float64, SolveInfo) where ``niterations``
    counts both stages.
    """
    if opt.needs_diff:
        raise ValueError("solve_auto supports residual-based stopping "
                         "criteria only (diff criteria need the unfused "
                         "f64 solver)")
    bnrm = float(np.linalg.norm(np.asarray(b, dtype=np.float64)))
    escalate = _needs_escalation(opt, bnrm)

    if op32 is None:
        if hasattr(op64, "offsets"):
            from ..core.dia import DiaOperator
            # op64.vals is already column-padded to op64.Np; slice back to
            # N so from_arrays re-pads consistently with the f32 backend's
            # pad_to
            op32 = DiaOperator.from_arrays(
                np.asarray(op64.offsets),
                np.asarray(op64.vals, dtype=np.float64)[:, :op64.N],
                dtype=np.float32, backend="pallas")
        elif getattr(op64, "df64_ready", False) or not escalate:
            # SELL operator: the hi slabs ARE the f32 operator, so one
            # operator serves both stages (stage 1 ignores vals_lo).  The
            # df64 stage additionally needs the keep_lo build — but only
            # if this tolerance escalates at all.
            op32 = op64
        else:
            raise ValueError(
                "op32 must be provided for non-DIA operators (or pass a "
                "SELL operator built with from_csr(keep_lo=True), which "
                "serves both stages)")

    # Stage 1: f32 fast path, clamped to its floor.  When no escalation
    # is needed this is the whole solve.
    import dataclasses
    x1, info1 = solve(op32, b, x0=x0, opt=_stage1_opt(opt, bnrm, escalate),
                      method=method32)
    if not escalate:
        return x1.astype(np.float64), info1
    if verbose:
        print(f"auto: f32 stage {info1.niterations} iters"
              f"{' (stalled at its floor)' if info1.stalled else ''}, "
              f"rnrm {info1.rnrm2:.3e}; escalating to df64")

    # Stage 2: df64 restart from the f32 iterate, original tolerances.
    iters_left = max(opt.max_iterations - info1.niterations, 1)
    opt2 = dataclasses.replace(opt, max_iterations=iters_left)
    x2, info2 = solve(op64, b, x0=x1.astype(np.float64), opt=opt2,
                      method=method64)
    return x2, _merge_infos(info1, info2)


def _merge_infos(info1: SolveInfo, info2: SolveInfo) -> SolveInfo:
    """Two-stage SolveInfo: total iterations, stage-2 convergence state,
    stage-1 initial quantities (residual at the ORIGINAL x0)."""
    return SolveInfo(
        niterations=info1.niterations + info2.niterations,
        converged=info2.converged,
        bnrm2=info2.bnrm2,
        r0nrm2=info1.r0nrm2,
        rnrm2=info2.rnrm2,
        x0nrm2=info1.x0nrm2,
        dxnrm2=info2.dxnrm2,
        stalled=info2.stalled,
    )


def _stage1_opt(opt: CGOptions, bnrm: float,
                escalate: bool) -> "CGOptions":
    """Stage-1 (f32) options: tolerances clamped to the f32 floor when a
    df64 stage will follow, plus plateau detection so an f32 stage whose
    own floor sits ABOVE the clamp (ill-conditioned systems) hands over
    to df64 early instead of spinning to the iteration cap."""
    import dataclasses
    rtol1 = opt.residual_rtol if not escalate else \
        max(opt.residual_rtol, F32_RTOL_FLOOR)
    atol1 = opt.residual_atol if not escalate else \
        max(opt.residual_atol, F32_RTOL_FLOOR * bnrm)
    stall1 = opt.stall_iters
    if escalate and stall1 == 0:
        stall1 = STALL_WINDOW
    return dataclasses.replace(opt, residual_rtol=rtol1,
                               residual_atol=atol1, dot_dtype="mixed",
                               stall_iters=stall1)


def solve_auto_dist(pm, b: np.ndarray, x0: np.ndarray | None = None,
                    opt: CGOptions = CGOptions(), halo: str = "allgather",
                    sell_op=None, devices=None, verbose: bool = False):
    """Distributed precision auto-escalation over a general partition —
    the reference's headline protocol (multi-device, rtol 1e-6,
    scripts/mpi_combined.sh:57-58) at fast-path cost: an f32 SELL
    pipelined-fused stage clamped to the f32 residual floor, then — only
    if the requested tolerance demands it — a df64-SELL restart from the
    gathered f32 iterate.  ONE keep_lo DistSellOperator serves both
    stages (the f32 kernels simply ignore the lo slabs).

    ``pm`` is a partition.graph.PartitionedMatrix; ``sell_op`` an
    optional prebuilt parallel.dist_sell.build_dist_sell(pm,
    keep_lo=...) operator (keep_lo required when the tolerance
    escalates).  Returns (x (N,) float64 numpy, SolveInfo) with
    ``niterations`` counting both stages."""
    import dataclasses

    from ..parallel.dist_sell import build_dist_sell
    from .dist_cg import solve_dist_general

    if opt.needs_diff:
        raise ValueError("solve_auto_dist supports residual-based "
                         "stopping criteria only")
    bnrm = float(np.linalg.norm(np.asarray(b, dtype=np.float64)))
    escalate = _needs_escalation(opt, bnrm)
    dso = sell_op if sell_op is not None else \
        build_dist_sell(pm, keep_lo=escalate)
    if escalate and not dso.df64_ready:
        raise ValueError(
            "this tolerance escalates to df64: pass sell_op built with "
            "build_dist_sell(pm, keep_lo=True)")

    x1, info1 = solve_dist_general(
        pm, b, x0=x0, opt=_stage1_opt(opt, bnrm, escalate),
        method="pipelined-fused", operator="sell", sell_op=dso,
        halo=halo, devices=devices)
    if not escalate:
        return x1.astype(np.float64), info1
    if verbose:
        print(f"auto: f32 stage {info1.niterations} iters"
              f"{' (stalled at its floor)' if info1.stalled else ''}, "
              f"rnrm {info1.rnrm2:.3e}; escalating to df64")
    iters_left = max(opt.max_iterations - info1.niterations, 1)
    opt2 = dataclasses.replace(opt, max_iterations=iters_left)
    x2, info2 = solve_dist_general(
        pm, b, x0=x1.astype(np.float64), opt=opt2,
        method="pipelined-df64", operator="sell", sell_op=dso,
        halo=halo, devices=devices)
    return x2, _merge_infos(info1, info2)


def solve_auto_dist_stencil(offsets, vals: np.ndarray, b: np.ndarray,
                            nparts: int | None = None,
                            x0: np.ndarray | None = None,
                            opt: CGOptions = CGOptions(),
                            devices=None, verbose: bool = False):
    """Distributed auto-escalation on a banded operator (contiguous
    partition): f32 fused-ring stage + df64 fused restart, both under
    the same mesh (solvers/dist_cg.solve_dist_stencil).  ``vals`` is
    the float64 (K, N) DIA operand."""
    import dataclasses

    from .dist_cg import solve_dist_stencil

    if opt.needs_diff:
        raise ValueError("solve_auto_dist_stencil supports residual-based "
                         "stopping criteria only")
    vals = np.asarray(vals)
    bnrm = float(np.linalg.norm(np.asarray(b, dtype=np.float64)))
    escalate = _needs_escalation(opt, bnrm)
    x1, info1 = solve_dist_stencil(
        offsets, vals, b, nparts=nparts, x0=x0,
        opt=_stage1_opt(opt, bnrm, escalate), method="pipelined-fused",
        dtype=np.float32, devices=devices)
    if not escalate:
        return x1.astype(np.float64), info1
    if verbose:
        print(f"auto: f32 stage {info1.niterations} iters"
              f"{' (stalled at its floor)' if info1.stalled else ''}, "
              f"rnrm {info1.rnrm2:.3e}; escalating to df64")
    iters_left = max(opt.max_iterations - info1.niterations, 1)
    opt2 = dataclasses.replace(opt, max_iterations=iters_left)
    x2, info2 = solve_dist_stencil(
        offsets, vals.astype(np.float64), b, nparts=nparts,
        x0=x1.astype(np.float64), opt=opt2, method="pipelined-df64",
        devices=devices)
    return x2, _merge_infos(info1, info2)
