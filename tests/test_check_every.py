"""Blocked convergence checks (CGOptions.check_every) must be bit-identical
to checking every iteration: same solution, same iteration count, same
final norms — only the while_loop predicate evaluation is amortized."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
from acg_tpu.solvers.cg import CGOptions, solve
from acg_tpu.solvers.dist_cg import solve_dist_stencil


def _system(n, rng):
    offsets, vals = poisson2d_dia(n)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    return offsets, vals, xstar, A @ xstar


@pytest.mark.parametrize("method", ["cg", "pipelined"])
@pytest.mark.parametrize("ce", [2, 5, 16])
def test_check_every_identical(method, ce, rng):
    offsets, vals, xstar, b = _system(16, rng)
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    base = CGOptions(max_iterations=400, residual_rtol=1e-10)
    blocked = CGOptions(max_iterations=400, residual_rtol=1e-10,
                        check_every=ce)
    x1, i1 = solve(op, b, opt=base, method=method)
    x2, i2 = solve(op, b, opt=blocked, method=method)
    assert i2.converged == i1.converged
    assert i2.niterations == i1.niterations
    np.testing.assert_array_equal(x1, x2)
    assert i2.rnrm2 == pytest.approx(i1.rnrm2, rel=1e-14)


@pytest.mark.parametrize("method", ["cg", "pipelined"])
def test_check_every_respects_max_iterations(method, rng):
    """A check block must not overshoot max_iterations (frozen steps)."""
    offsets, vals, xstar, b = _system(12, rng)
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    opt = CGOptions(max_iterations=7, residual_rtol=1e-30, check_every=5)
    x, info = solve(op, b, opt=opt, method=method)
    assert info.niterations == 7
    assert not info.converged
    ref = CGOptions(max_iterations=7, residual_rtol=1e-30)
    x1, i1 = solve(op, b, opt=ref, method=method)
    np.testing.assert_array_equal(x, x1)


def test_check_every_distributed(rng):
    offsets, vals, xstar, b = _system(16, rng)
    opt = CGOptions(max_iterations=500, residual_rtol=1e-10, check_every=8)
    x, info = solve_dist_stencil(offsets, vals, b, nparts=8, opt=opt,
                                 method="pipelined", pad_to=32)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8
    ref = CGOptions(max_iterations=500, residual_rtol=1e-10)
    x1, i1 = solve_dist_stencil(offsets, vals, b, nparts=8, opt=ref,
                                method="pipelined", pad_to=32)
    assert info.niterations == i1.niterations
    np.testing.assert_array_equal(x, x1)
