"""External-library baseline solvers (the cgpetsc.c analogue).

The reference ships a PETSc KSPCG/KSPPIPECG adapter purely as a baseline to
cross-check its own solvers (acg/cgpetsc.h:118-236).  The equivalents here
are scipy's host CG and jax.scipy's device CG, driven through the same
options/result types so the CLI's ``--solver petsc``-style comparison axis
is preserved (exposed as ``--solver scipy`` / ``--solver jax-ref``).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse.linalg as spla

from .cg import CGOptions, SolveInfo


def solve_scipy(A_full_csr, b: np.ndarray, x0: np.ndarray | None = None,
                opt: CGOptions = CGOptions()) -> tuple[np.ndarray, SolveInfo]:
    """scipy.sparse.linalg.cg with reference-style stopping semantics."""
    bnrm2 = float(np.linalg.norm(b))
    x0 = np.zeros_like(b) if x0 is None else x0
    r0nrm2 = float(np.linalg.norm(b - A_full_csr @ x0))
    history: list[float] = []

    def callback(xk):
        history.append(float(np.linalg.norm(b - A_full_csr @ xk)))

    # scipy's rtol is relative to ||b||, matching --residual-rtol semantics.
    rtol = opt.residual_rtol if opt.residual_rtol > 0 else 0.0
    atol = opt.residual_atol if opt.residual_atol > 0 else 0.0
    x, code = spla.cg(A_full_csr, b, x0=x0, rtol=rtol, atol=atol,
                      maxiter=opt.max_iterations, callback=callback)
    rnrm2 = float(np.linalg.norm(b - A_full_csr @ x))
    info = SolveInfo(
        niterations=len(history), converged=(code == 0),
        bnrm2=bnrm2, r0nrm2=r0nrm2, rnrm2=rnrm2,
        x0nrm2=float(np.linalg.norm(x0)),
        residual_history=np.asarray(history),
    )
    return x, info


def solve_jax_ref(op, b: np.ndarray, x0: np.ndarray | None = None,
                  opt: CGOptions = CGOptions()) -> tuple[np.ndarray, SolveInfo]:
    """jax.scipy.sparse.linalg.cg against our operator's SpMV (device-side
    library baseline)."""
    import jax.numpy as jnp
    import jax.scipy.sparse.linalg as jspla

    N, Np = op.N, op.Np
    vdtype = op.vals.dtype if hasattr(op, "vals") else jnp.float64
    bp = jnp.zeros((Np,), vdtype).at[:N].set(jnp.asarray(b, vdtype))
    x0p = jnp.zeros((Np,), vdtype)
    if x0 is not None:
        x0p = x0p.at[:N].set(jnp.asarray(x0, vdtype))
    tol = opt.residual_rtol if opt.residual_rtol > 0 else 1e-30
    atol = opt.residual_atol
    x, _ = jspla.cg(op.spmv, bp, x0=x0p, tol=tol, atol=atol,
                    maxiter=opt.max_iterations)
    xh = np.asarray(x[:N])
    # jax.scipy's cg returns no convergence info (its second output is
    # always None) — derive it from the actual residual, the same
    # criterion the library loop used, so the oracle verifies something
    # (the reference's PETSc adapter reports KSP's true reason/its
    # iteration count, cgpetsc.c).
    bn = float(np.linalg.norm(b))
    r = np.asarray(bp - op.spmv(x))[:N]
    rn = float(np.linalg.norm(r))
    r0 = float(np.linalg.norm(np.asarray(bp - op.spmv(x0p))[:N]))
    converged = bool(rn <= max(tol * bn, atol))
    info = SolveInfo(niterations=-1, converged=converged, bnrm2=bn,
                     r0nrm2=r0, rnrm2=rn,
                     x0nrm2=float(np.linalg.norm(np.asarray(x0p[:N]))))
    return xh, info
