"""Single-device CG solver tests: manufactured-solution oracle, stopping
criteria, classic/pipelined agreement, residual histories vs scipy.

Mirrors the reference's runtime validation mechanisms (SURVEY.md §4):
manufactured solutions (acg-cuda.c:1969-1984), residual-history comparison,
and cross-implementation agreement (four native variants + PETSc adapter →
here: classic vs pipelined vs scipy vs jax.scipy)."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.core.csr import SymCSRMatrix
from acg_tpu.core.dia import DiaOperator
from acg_tpu.core.ell import EllOperator
from acg_tpu.io.generators import dia_to_coo, poisson2d_dia, poisson3d_dia
from acg_tpu.solvers.cg import CGOptions, solve
from acg_tpu.solvers.reference import solve_scipy


def poisson_op_and_csr(n=16):
    offsets, vals = poisson2d_dia(n)
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    return op, A, N


def manufactured(rng, A, N):
    """Random normalized exact solution (acg-cuda.c:1969-1984 oracle)."""
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    return xstar, b


@pytest.mark.parametrize("method", ["cg", "pipelined"])
def test_manufactured_solution(method, rng):
    op, A, N = poisson_op_and_csr(16)
    xstar, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-10)
    x, info = solve(op, b, opt=opt, method=method)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8
    assert info.rnrm2 < 1e-10 * info.bnrm2


@pytest.mark.parametrize("method", ["cg", "pipelined"])
def test_ell_operator_solve(method, rng):
    offsets, vals = poisson2d_dia(12)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    up = rowidx <= colidx
    m = SymCSRMatrix.from_coo(N, rowidx[up], colidx[up], a[up])
    ci, v = m.to_ell_arrays()
    op = EllOperator.from_arrays(ci, v, pad_to=128)
    xstar, b = manufactured(rng, A, N)
    x, info = solve(op, b, opt=CGOptions(max_iterations=1000, residual_rtol=1e-10),
                    method=method)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8


def test_classic_vs_pipelined_iteration_parity(rng):
    """Pipelined CG is algebraically the same iteration; counts must agree
    to within a couple of iterations (reference's cross-variant check)."""
    op, A, N = poisson_op_and_csr(16)
    _, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-8)
    _, i1 = solve(op, b, opt=opt, method="cg")
    _, i2 = solve(op, b, opt=opt, method="pipelined")
    assert abs(i1.niterations - i2.niterations) <= 2
    assert i1.converged and i2.converged


def test_residual_history_matches_scipy(rng):
    """Per-iteration residual norms must track scipy's CG (same Krylov
    iteration in exact arithmetic → matches closely in f64)."""
    op, A, N = poisson_op_and_csr(10)
    _, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=40, residual_rtol=1e-30)
    x, info = solve(op, b, opt=opt, method="cg", history=True)
    _, sinfo = solve_scipy(A, b, opt=CGOptions(max_iterations=40, residual_rtol=1e-12))
    n = min(len(info.residual_history), len(sinfo.residual_history), 30)
    np.testing.assert_allclose(info.residual_history[:n],
                               sinfo.residual_history[:n], rtol=1e-6)


def test_pipelined_history_matches_classic(rng):
    op, A, N = poisson_op_and_csr(10)
    _, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=30, residual_rtol=1e-30)
    _, i1 = solve(op, b, opt=opt, method="cg", history=True)
    _, i2 = solve(op, b, opt=opt, method="pipelined", history=True)
    np.testing.assert_allclose(i1.residual_history[:25], i2.residual_history[:25],
                               rtol=1e-8)


def test_stopping_criteria_residual_atol(rng):
    op, A, N = poisson_op_and_csr(8)
    _, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=1000, residual_rtol=0.0, residual_atol=1e-6)
    x, info = solve(op, b, opt=opt)
    assert info.converged and info.rnrm2 < 1e-6


def test_stopping_criteria_max_iterations(rng):
    op, A, N = poisson_op_and_csr(16)
    _, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=3, residual_rtol=1e-14)
    x, info = solve(op, b, opt=opt)
    assert not info.converged and info.niterations == 3


def test_stopping_criteria_diff(rng):
    op, A, N = poisson_op_and_csr(8)
    _, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=1000, residual_rtol=0.0, diff_atol=1e-8)
    x, info = solve(op, b, opt=opt)
    assert info.converged and info.dxnrm2 < 1e-8


def test_initial_guess(rng):
    op, A, N = poisson_op_and_csr(8)
    xstar, b = manufactured(rng, A, N)
    # x0 = xstar → converged in 0 iterations
    x, info = solve(op, b, x0=xstar, opt=CGOptions(residual_rtol=1e-8))
    assert info.converged and info.niterations == 0
    # warm start converges faster than cold start
    x0 = xstar + 1e-6 * rng.standard_normal(N)
    _, warm = solve(op, b, x0=x0, opt=CGOptions(max_iterations=1000, residual_rtol=1e-8))
    _, cold = solve(op, b, opt=CGOptions(max_iterations=1000, residual_rtol=1e-8))
    assert warm.niterations < cold.niterations


def test_info_norms(rng):
    op, A, N = poisson_op_and_csr(8)
    xstar, b = manufactured(rng, A, N)
    _, info = solve(op, b, opt=CGOptions(max_iterations=200, residual_rtol=1e-9))
    np.testing.assert_allclose(info.bnrm2, np.linalg.norm(b), rtol=1e-12)
    np.testing.assert_allclose(info.r0nrm2, np.linalg.norm(b), rtol=1e-12)  # x0=0


def test_f32_storage_f64_dots(rng):
    """Fast path: f32 vectors with f64 dot accumulation still converges to
    f32-representable tolerance."""
    offsets, vals = poisson2d_dia(12)
    op = DiaOperator.from_arrays(offsets, vals, dtype=np.float32, pad_to=128)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-5, dot_dtype="float64")
    x, info = solve(op, b, opt=opt, method="pipelined")
    assert info.converged
    assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-3


def test_3d_poisson_27pt(rng):
    offsets, vals = poisson3d_dia(6, 27)
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar, b = manufactured(rng, A, N)
    x, info = solve(op, b, opt=CGOptions(max_iterations=500, residual_rtol=1e-10))
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-7


def test_mixed_dot_accumulation(rng):
    """dot_dtype="mixed" (blockwise f32 sums, f64 across blocks) converges
    like full-f64 dots on the f32 fast path, with near-identical history."""
    offsets, vals = poisson2d_dia(16)
    op32 = DiaOperator.from_arrays(offsets, vals, dtype=np.float32, pad_to=1024)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar, b = manufactured(rng, A, N)
    o64 = CGOptions(max_iterations=2000, residual_rtol=1e-5, dot_dtype="float64")
    omx = CGOptions(max_iterations=2000, residual_rtol=1e-5, dot_dtype="mixed")
    x1, i1 = solve(op32, b, opt=o64, method="pipelined")
    x2, i2 = solve(op32, b, opt=omx, method="pipelined")
    assert i2.converged
    assert abs(i2.niterations - i1.niterations) <= 3
    assert np.linalg.norm(x2 - xstar) / np.linalg.norm(xstar) < 1e-3


def test_f32_precision_floor(rng):
    """f32 storage cannot push the residual to deep tolerances (the
    precision floor that motivates the df64 solver — which reaches rtol
    1e-10 with f64-identical iteration counts on hardware, BENCHMARKS.md)."""
    offsets, vals = poisson2d_dia(16)
    op32 = DiaOperator.from_arrays(offsets, vals, dtype=np.float32, pad_to=1024)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar, b = manufactured(rng, A, N)
    opt = CGOptions(max_iterations=3000, residual_rtol=1e-10,
                    dot_dtype="mixed")
    x, info = solve(op32, b, opt=opt, method="pipelined")
    assert not info.converged          # f32 stalls well above 1e-10
    assert info.rnrm2 / info.bnrm2 > 1e-9


def test_jax_ref_honest_convergence_info(rng):
    """solve_jax_ref must derive converged/rnrm2 from the actual residual:
    a capped solve that cannot reach tolerance reports converged=False
    (round-1 fabricated converged=True unconditionally)."""
    from acg_tpu.solvers.reference import solve_jax_ref

    op, A, N = poisson_op_and_csr(16)
    xstar, b = manufactured(rng, A, N)
    capped = CGOptions(max_iterations=3, residual_rtol=1e-12)
    x, info = solve_jax_ref(op, b, opt=capped)
    assert not info.converged
    assert np.isfinite(info.rnrm2) and info.rnrm2 > 1e-12 * info.bnrm2
    # and a generous budget reports converged with a real residual
    x, info = solve_jax_ref(op, b, opt=CGOptions(max_iterations=1000,
                                                 residual_rtol=1e-8))
    assert info.converged
    assert info.rnrm2 <= 1e-8 * info.bnrm2
    assert np.linalg.norm(x - xstar) < 1e-6
