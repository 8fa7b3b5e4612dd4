"""Fused pipelined-iteration kernel (interpret mode on CPU): one Pallas
pass must reproduce the unfused SpMV + update + dot2 exactly, and the
fused solver must converge like the unfused pipelined solver."""

import functools

import numpy as np
import pytest
import scipy.sparse as sp
from jax.experimental import pallas as pl

import acg_tpu.ops.pallas_pipelined as pp
from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
from acg_tpu.solvers.cg import CGOptions, solve


@pytest.fixture(autouse=True)
def interpret_mode():
    # the kernels auto-select interpret mode on the CPU backend
    pp.fused_pipelined_iter._clear_cache()
    yield
    pp.fused_pipelined_iter._clear_cache()


def test_fused_iter_matches_unfused(rng):
    import jax.numpy as jnp
    offsets, vals = poisson2d_dia(16)
    op = DiaOperator.from_arrays(offsets, vals, dtype=np.float32, pad_to=128)
    Np, hw = op.Np, op.halo_width
    offs = tuple(int(o) for o in offsets)
    vdt = jnp.float32
    arrs = {n: jnp.asarray(rng.standard_normal(Np), vdt)
            for n in "xrwztp"}
    alpha = jnp.float64(0.37)
    beta = jnp.float64(0.11)

    x2, r2, w2, z2, t2, p2, gd = pp.fused_pipelined_iter(
        op.vals, op.extend(arrs["w"], hw), arrs["x"], arrs["r"],
        arrs["z"], arrs["t"], arrs["p"], alpha, beta, offs, hw, 128)

    # unfused reference
    q = op.spmv(arrs["w"])
    ab, bb = vdt(alpha), vdt(beta)
    ze = q + bb * arrs["z"]
    te = arrs["w"] + bb * arrs["t"]
    pe = arrs["r"] + bb * arrs["p"]
    xe = arrs["x"] + ab * pe
    re = arrs["r"] - ab * te
    we = arrs["w"] - ab * ze
    for got, exp in ((x2, xe), (r2, re), (w2, we), (z2, ze), (t2, te), (p2, pe)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-6, atol=1e-6)
    re64 = np.asarray(re, np.float64)
    we64 = np.asarray(we, np.float64)
    np.testing.assert_allclose(np.asarray(gd),
                               [re64 @ re64, we64 @ re64], rtol=1e-4)


def test_fused_ring_matches_windowed(rng):
    """The ring-window fused iteration must equal the extended-w windowed
    one bit-for-bit (same arithmetic order)."""
    import jax.numpy as jnp
    offsets, vals = poisson2d_dia(16)
    op = DiaOperator.from_arrays(offsets, vals, dtype=np.float32, pad_to=128)
    Np, hw = op.Np, op.halo_width
    offs = tuple(int(o) for o in offsets)
    arrs = {n: jnp.asarray(rng.standard_normal(Np), jnp.float32)
            for n in "xrwztp"}
    alpha = jnp.float64(0.37)
    beta = jnp.float64(0.11)
    a = pp.fused_pipelined_iter(
        op.vals, op.extend(arrs["w"], hw), arrs["x"], arrs["r"],
        arrs["z"], arrs["t"], arrs["p"], alpha, beta, offs, hw, 128)
    b = pp.fused_pipelined_iter_ring(
        op.vals, arrs["w"], arrs["x"], arrs["r"],
        arrs["z"], arrs["t"], arrs["p"], alpha, beta, offs, 128)
    for got, exp in zip(b, a):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_fused_ring_wide_halo(rng):
    """Ring fused iteration with hw > block (the 3-D regime)."""
    import jax.numpy as jnp
    from acg_tpu.io.generators import poisson3d_dia
    offsets, vals = poisson3d_dia(8, 27)   # N=512, hw=73
    op = DiaOperator.from_arrays(offsets, vals, dtype=np.float32, pad_to=128)
    Np, hw = op.Np, op.halo_width
    offs = tuple(int(o) for o in offsets)
    arrs = {n: jnp.asarray(rng.standard_normal(Np), jnp.float32)
            for n in "xrwztp"}
    alpha = jnp.float64(0.2)
    beta = jnp.float64(0.5)
    a = pp.fused_pipelined_iter(
        op.vals, op.extend(arrs["w"], hw), arrs["x"], arrs["r"],
        arrs["z"], arrs["t"], arrs["p"], alpha, beta, offs, hw, 128)
    b = pp.fused_pipelined_iter_ring(
        op.vals, arrs["w"], arrs["x"], arrs["r"],
        arrs["z"], arrs["t"], arrs["p"], alpha, beta, offs, 128)
    for got, exp in zip(b, a):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


@pytest.mark.parametrize("ce", [1, 4])
def test_fused_solver_converges(ce, rng):
    offsets, vals = poisson2d_dia(12)
    op = DiaOperator.from_arrays(offsets, vals, dtype=np.float32, pad_to=128)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-5, check_every=ce)
    x, info = solve(op, b, opt=opt, method="pipelined-fused")
    assert info.converged
    assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-3
    # iteration count comparable to the unfused pipelined solver
    o2 = CGOptions(max_iterations=2000, residual_rtol=1e-5, dot_dtype="mixed")
    _, i2 = solve(op, b, opt=o2, method="pipelined")
    assert abs(info.niterations - i2.niterations) <= 3


def test_fused_rejects_diff_criteria(rng):
    offsets, vals = poisson2d_dia(8)
    op = DiaOperator.from_arrays(offsets, vals, dtype=np.float32, pad_to=128)
    b = np.ones(op.N)
    with pytest.raises(ValueError):
        solve(op, b, opt=CGOptions(max_iterations=5, diff_atol=1e-3),
              method="pipelined-fused")


def test_fused_distributed_stencil(rng):
    """Fused iteration under shard_map with ring-halo extension on the
    8-device mesh matches the unfused distributed pipelined solve."""
    from acg_tpu.solvers.dist_cg import solve_dist_stencil

    offsets, vals = poisson2d_dia(16)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-5, check_every=4)
    xf, inf = solve_dist_stencil(offsets, vals, b, nparts=8, opt=opt,
                                 method="pipelined-fused", pad_to=128,
                                 dtype=np.float32)
    assert inf.converged
    assert np.linalg.norm(xf - xstar) / np.linalg.norm(xstar) < 1e-3
    o2 = CGOptions(max_iterations=1000, residual_rtol=1e-5,
                   dot_dtype="mixed")
    xu, inu = solve_dist_stencil(offsets, vals, b, nparts=8, opt=o2,
                                 method="pipelined", pad_to=128,
                                 dtype=np.float32)
    assert abs(inf.niterations - inu.niterations) <= 3
