"""Distributed solver tests on the 8-virtual-device CPU mesh.

Covers what the reference could never test without a cluster
(SURVEY.md §4.4): partitioned SpMV, halo exchange, and multi-device CG
against scipy oracles and against the single-device solvers."""

import jax
import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.core.csr import SymCSRMatrix
from acg_tpu.io.generators import dia_to_coo, poisson2d_dia, poisson3d_dia
from acg_tpu.partition.graph import build_partitioned_matrix, scatter_vector, gather_vector
from acg_tpu.partition.partitioner import (edge_cut, partition_bfs_recursive,
                                           partition_contiguous)
from acg_tpu.solvers.cg import CGOptions, solve
from acg_tpu.solvers.dist_cg import solve_dist_general, solve_dist_stencil
from acg_tpu.core.dia import DiaOperator

NDEV = len(jax.devices())


def poisson_system(n=16, rng=None):
    offsets, vals = poisson2d_dia(n)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    return offsets, vals, A, xstar, A @ xstar


def test_eight_devices_available():
    assert NDEV == 8, f"conftest should provide 8 CPU devices, got {NDEV}"


@pytest.mark.parametrize("nparts", [2, 8])
@pytest.mark.parametrize("method", ["cg", "pipelined"])
def test_dist_stencil_manufactured(nparts, method, rng):
    offsets, vals, A, xstar, b = poisson_system(16, rng)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-10)
    x, info = solve_dist_stencil(offsets, vals, b, nparts=nparts,
                                 opt=opt, method=method, pad_to=32)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8


def test_dist_stencil_matches_single_device(rng):
    """Iteration count and residual history must match the 1-device solve
    (the reference's cross-scale regression signal)."""
    offsets, vals, A, xstar, b = poisson_system(12, rng)
    opt = CGOptions(max_iterations=30, residual_rtol=1e-30)
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    _, i1 = solve(op, b, opt=opt, method="cg", history=True)
    _, i8 = solve_dist_stencil(offsets, vals, b, nparts=8, opt=opt,
                               method="cg", history=True, pad_to=32)
    np.testing.assert_allclose(i1.residual_history, i8.residual_history,
                               rtol=1e-9)


def test_dist_stencil_3d(rng):
    offsets, vals = poisson3d_dia(8, 7)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N); xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    x, info = solve_dist_stencil(offsets, vals, b, nparts=4,
                                 opt=CGOptions(max_iterations=500, residual_rtol=1e-10),
                                 method="pipelined", pad_to=128)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-7


# ---------------------------------------------------------------------------
# Partitioner + general path


def test_partition_contiguous_balance():
    p = partition_contiguous(103, 8)
    sizes = np.bincount(p)
    assert sizes.max() - sizes.min() <= 1 and len(sizes) == 8


def test_partition_bfs_quality(rng):
    offsets, vals, A, _, _ = poisson_system(16, rng)
    part = partition_bfs_recursive(A.indptr, A.indices, 4, seed=0)
    sizes = np.bincount(part, minlength=4)
    assert sizes.min() > 0
    # balanced within 25%
    assert sizes.max() <= 1.25 * sizes.mean()
    # edge cut sane: way below total edges
    assert edge_cut(A.indptr, A.indices, part) < A.nnz // 8


def test_partitioned_matrix_structure(rng):
    offsets, vals, A, _, _ = poisson_system(8, rng)
    part = partition_contiguous(A.shape[0], 4)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    assert pm.P == 4
    # every row owned exactly once
    assert pm.n_owned.sum() == A.shape[0]
    # interior+border = owned
    np.testing.assert_array_equal(pm.n_interior + pm.n_border, pm.n_owned)
    # comm matrix symmetric structure for symmetric A
    assert (pm.comm_matrix.T > 0).sum() == (pm.comm_matrix > 0).sum()
    # ghosts of part p are owned elsewhere
    for p in range(4):
        g = pm.ghost_global[p, : pm.n_ghost[p]]
        assert np.all(pm.part[g] != p)


def test_scatter_gather_roundtrip(rng):
    offsets, vals, A, _, _ = poisson_system(8, rng)
    part = partition_bfs_recursive(A.indptr, A.indices, 4, seed=1)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    x = rng.standard_normal(A.shape[0])
    np.testing.assert_array_equal(gather_vector(pm, scatter_vector(pm, x)), x)


@pytest.mark.parametrize("pmethod", ["contiguous", "bfs"])
@pytest.mark.parametrize("method", ["cg", "pipelined"])
def test_dist_general_manufactured(pmethod, method, rng):
    offsets, vals, A, xstar, b = poisson_system(12, rng)
    N = A.shape[0]
    if pmethod == "contiguous":
        part = partition_contiguous(N, 4)
    else:
        part = partition_bfs_recursive(A.indptr, A.indices, 4, seed=0)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-10)
    x, info = solve_dist_general(pm, b, opt=opt, method=method)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8


def test_dist_general_spmv_oracle(rng):
    """One distributed SpMV (via one CG iteration residual) against scipy:
    r0 = b - A x0 with random x0 exercises halo + both ELL blocks."""
    offsets, vals, A, _, _ = poisson_system(10, rng)
    N = A.shape[0]
    part = partition_bfs_recursive(A.indptr, A.indices, 8, seed=2)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    x0 = rng.standard_normal(N)
    b = rng.standard_normal(N)
    # 0 max iterations → solver returns r0nrm2 = ||b - A x0||
    opt = CGOptions(max_iterations=0, residual_rtol=1e-30)
    _, info = solve_dist_general(pm, b, x0=x0, opt=opt)
    np.testing.assert_allclose(info.r0nrm2, np.linalg.norm(b - A @ x0), rtol=1e-11)


def test_dist_general_matches_single_device_history(rng):
    offsets, vals, A, xstar, b = poisson_system(10, rng)
    part = partition_bfs_recursive(A.indptr, A.indices, 4, seed=0)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    opt = CGOptions(max_iterations=25, residual_rtol=1e-30)
    op = DiaOperator.from_arrays(*poisson2d_dia(10), pad_to=128)
    _, i1 = solve(op, b, opt=opt, method="cg", history=True)
    _, ig = solve_dist_general(pm, b, opt=opt, method="cg", history=True)
    np.testing.assert_allclose(i1.residual_history, ig.residual_history, rtol=1e-8)


def test_partitioned_matrix_describe(rng):
    offsets, vals, A, _, _ = poisson_system(8, rng)
    part = partition_bfs_recursive(A.indptr, A.indices, 4, seed=1)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    d = pm.describe()
    assert f"parts={pm.P}" in d
    assert "halo volume" in d
    assert d.count("part ") == pm.P


def test_host_stepped_distributed(rng):
    """Host-driven distributed CG (acgsolver_solvempi analogue) matches
    the compiled distributed solver."""
    from acg_tpu.solvers.host_cg import solve_host_stepped_dist

    offsets, vals, A, xstar, b = poisson_system(12, rng)
    opt = CGOptions(max_iterations=500, residual_rtol=1e-10)
    x, info = solve_host_stepped_dist(offsets, vals, b, nparts=4,
                                      opt=opt, pad_to=32)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8
    x2, i2 = solve_dist_stencil(offsets, vals, b, nparts=4, opt=opt,
                                method="cg", pad_to=32)
    assert info.niterations == i2.niterations


@pytest.mark.parametrize("halo", ["allgather", "alltoall"])
def test_host_stepped_distributed_general(rng, halo):
    """Host-driven CG on a GENERAL (METIS-style) partition — the full
    solvempi analogue (cg.c:379-614): matches the compiled general
    distributed solver iteration-for-iteration."""
    from acg_tpu.solvers.host_cg import solve_host_stepped_dist_general

    offsets, vals, A, xstar, b = poisson_system(12, rng)
    part = partition_bfs_recursive(A.indptr, A.indices, 4, seed=2)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    opt = CGOptions(max_iterations=500, residual_rtol=1e-10)
    x, info = solve_host_stepped_dist_general(pm, b, opt=opt, halo=halo)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8
    x2, i2 = solve_dist_general(pm, b, opt=opt, method="cg", halo=halo)
    assert info.niterations == i2.niterations
