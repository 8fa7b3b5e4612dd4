"""df64 (double-f32) arithmetic must track numpy float64 to ~2^-48.

Accuracy assertions run EAGERLY: the CPU XLA backend evaluates jitted f32
chains in excess precision (through optimization barriers), which
invalidates the (hi, lo) invariants on CPU only.  On TPU the jitted and
Pallas paths hold (verified on hardware: df_mul 2.6e-14, in-kernel
3.5e-14); the solvers only use df64 inside Pallas kernels.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acg_tpu.ops.df64 import (df_add, df_axpy, df_from_f64, df_mul,
                              df_mul_f32, df_to_f64, two_prod, two_sum)

EPS_DF = 2.0 ** -44   # conservative bound (theory ~2^-48)


def test_split_roundtrip(rng):
    x = rng.standard_normal(1000) * np.exp(rng.uniform(-20, 20, 1000))
    hi, lo = df_from_f64(x)
    # hi+lo captures x to df64 accuracy (~2^-48 relative; the residual can
    # need more than 24 extra bits, so exact equality is not guaranteed)
    np.testing.assert_allclose(df_to_f64(hi, lo), x, rtol=2.0**-44)


def test_two_sum_exact(rng):
    """two_sum must capture the rounding error exactly (compiler probe)."""
    a = jnp.float32(1.0)
    b = jnp.float32(1e-8)            # lost entirely in f32 addition
    s, e = jax.jit(two_sum)(a, b)
    assert float(s) == 1.0
    assert float(e) == pytest.approx(1e-8, rel=1e-6)
    # error term non-zero ⇒ the compiler did not fuse/reassociate it away


def test_two_prod_exact():
    a = jnp.float32(1.0 + 2.0 ** -12)
    b = jnp.float32(1.0 + 2.0 ** -12)
    p, e = jax.jit(two_prod)(a, b)
    exact = (1.0 + 2.0 ** -12) ** 2
    assert float(np.float64(p) + np.float64(e)) == pytest.approx(exact, abs=1e-15)
    assert float(e) != 0.0


def test_df_add_mul_accuracy(rng):
    x = rng.standard_normal(4096)
    y = rng.standard_normal(4096)
    xh, xl = df_from_f64(x)
    yh, yl = df_from_f64(y)

    def go(xh, xl, yh, yl):   # eager: CPU jit uses excess precision
        sh, sl = df_add(xh, xl, yh, yl)
        ph, pl = df_mul(xh, xl, yh, yl)
        return sh, sl, ph, pl

    sh, sl, ph, pl = go(jnp.asarray(xh), jnp.asarray(xl),
                        jnp.asarray(yh), jnp.asarray(yl))
    # atol covers cancellation points where x+y ≈ 0 and relative error
    # is meaningless
    np.testing.assert_allclose(df_to_f64(sh, sl), x + y, rtol=EPS_DF,
                               atol=1e-13)
    np.testing.assert_allclose(df_to_f64(ph, pl), x * y, rtol=EPS_DF)


def test_df_axpy_chain_accuracy(rng):
    """A chained axpy recurrence (the CG update pattern) must stay within
    df64 accuracy of the f64 reference over many steps."""
    n = 1024
    x = rng.standard_normal(n)
    y = rng.standard_normal(n)
    a = 0.123456789
    xh, xl = map(jnp.asarray, df_from_f64(x))
    yh, yl = map(jnp.asarray, df_from_f64(y))
    ah, al = map(jnp.asarray, df_from_f64(np.float64(a)))

    def steps(xh, xl, yh, yl):   # eager: CPU jit uses excess precision
        for _ in range(50):
            yh, yl = df_axpy(ah, al, xh, xl, yh, yl)
        return yh, yl

    yh2, yl2 = steps(xh, xl, yh, yl)
    yref = y + 50 * a * x
    np.testing.assert_allclose(df_to_f64(np.asarray(yh2), np.asarray(yl2)),
                               yref, rtol=1e-12, atol=1e-12)


def test_df_mul_f32(rng):
    x = rng.standard_normal(512)
    xh, xl = map(jnp.asarray, df_from_f64(x))
    ph, pl = df_mul_f32(xh, xl, jnp.float32(3.0))
    np.testing.assert_allclose(df_to_f64(np.asarray(ph), np.asarray(pl)),
                               3.0 * x, rtol=EPS_DF)


def test_df64_solver_converges(rng):
    """The df64 fused solver must converge (CPU interpret only validates
    convergence — excess precision on the CPU backend degrades the pairs
    to ~f32; true df64 depth is validated on hardware, see bench)."""
    import scipy.sparse as sp
    from acg_tpu.core.dia import DiaOperator
    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    from acg_tpu.solvers.cg import CGOptions, solve

    offsets, vals = poisson2d_dia(12)
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)  # float64
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-5, check_every=4)
    x, info = solve(op, b, opt=opt, method="pipelined-df64")
    assert info.converged
    assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-3


def test_df64_accum_strategies(rng):
    """The split2/tree SpMV fold shapes (ops/pallas_df64._fold) converge
    to the same solution as the chain fold — reassociation only."""
    import scipy.sparse as sp
    from acg_tpu.core.dia import DiaOperator
    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    from acg_tpu.solvers.cg import CGOptions, solve

    offsets, vals = poisson2d_dia(12)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-5, check_every=4)
    sols = {}
    for accum in ("chain", "split2", "tree"):
        os.environ["ACG_DF64_ACCUM"] = accum
        try:
            op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
            x, info = solve(op, b, opt=opt, method="pipelined-df64")
        finally:
            del os.environ["ACG_DF64_ACCUM"]
        assert info.converged, accum
        assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-3, accum
        sols[accum] = x
    assert np.allclose(sols["split2"], sols["chain"], rtol=1e-6)
    assert np.allclose(sols["tree"], sols["chain"], rtol=1e-6)


def test_df64_distributed_stencil(rng):
    """df64 fused iteration under shard_map with ring halo on the pairs."""
    import scipy.sparse as sp
    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    from acg_tpu.solvers.cg import CGOptions
    from acg_tpu.solvers.dist_cg import solve_dist_stencil

    offsets, vals = poisson2d_dia(16)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-5, check_every=4)
    x, info = solve_dist_stencil(offsets, vals, b, nparts=8, opt=opt,
                                 method="pipelined-df64", pad_to=128)
    assert info.converged
    assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-3


def test_df64_vals_exact_specialization(rng):
    """Poisson entries are exactly f32-representable; the specialized
    one-sided SpMV must converge identically.  A scaled (inexact) matrix
    must take the general path and still converge."""
    import scipy.sparse as sp
    from acg_tpu.core.dia import DiaOperator
    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    from acg_tpu.solvers.cg import CGOptions, solve

    offsets, vals = poisson2d_dia(10)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-5)

    op_exact = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    x1, i1 = solve(op_exact, A @ xstar, opt=opt, method="pipelined-df64")
    assert i1.converged

    scale = 1.0 / 3.0  # makes entries inexact in f32
    op_inexact = DiaOperator.from_arrays(offsets, vals * scale, pad_to=128)
    x2, i2 = solve(op_inexact, (A * scale) @ xstar, opt=opt,
                   method="pipelined-df64")
    assert i2.converged
    assert np.linalg.norm(x2 - xstar) / np.linalg.norm(xstar) < 1e-3
