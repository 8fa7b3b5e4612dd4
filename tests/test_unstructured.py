"""End-to-end unstructured-SPD pipeline (the SuiteSparse-style scenario of
BASELINE.md config 5, generated offline): random sparse SPD matrix →
RCM ordering → DIA/ELL operator → solve → compare against scipy."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.core.csr import SymCSRMatrix
from acg_tpu.core.dia import DiaOperator
from acg_tpu.core.ell import EllOperator
from acg_tpu.partition.graph import build_partitioned_matrix
from acg_tpu.partition.ordering import bandwidth, permute_csr, rcm_order
from acg_tpu.partition.partitioner import partition_bfs_recursive
from acg_tpu.solvers.cg import CGOptions, solve
from acg_tpu.solvers.dist_cg import solve_dist_general
from acg_tpu.solvers.reference import solve_scipy


def random_spd(n, avg_degree, rng, shuffle=True):
    """SPD matrix from a random sparse graph Laplacian + identity (shuffled
    so the natural ordering has no structure, like a SuiteSparse input)."""
    nnz = n * avg_degree
    i = rng.integers(0, n, nnz)
    j = rng.integers(0, n, nnz)
    keep = i != j
    i, j = i[keep], j[keep]
    w = rng.uniform(0.1, 1.0, i.size)
    W = sp.coo_matrix((w, (i, j)), shape=(n, n))
    W = (W + W.T).tocsr()
    L = sp.diags(np.asarray(W.sum(axis=1)).ravel()) - W
    A = (L + sp.eye(n)).tocsr()
    if shuffle:
        p = rng.permutation(n)
        A = permute_csr(A, p)
    return A


def test_unstructured_ell_solve(rng):
    A = random_spd(400, 6, rng)
    coo = sp.triu(A).tocoo()
    S = SymCSRMatrix.from_coo(A.shape[0], coo.row, coo.col, coo.data)
    ci, v = S.to_ell_arrays()
    op = EllOperator.from_arrays(ci, v, pad_to=128)
    xstar = rng.standard_normal(A.shape[0])
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    x, info = solve(op, b, opt=CGOptions(max_iterations=2000,
                                         residual_rtol=1e-10))
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-7
    # cross-check against scipy's CG (the petsc-adapter analogue)
    xs, infos = solve_scipy(A, b, opt=CGOptions(max_iterations=2000,
                                                residual_rtol=1e-10))
    assert np.linalg.norm(x - xs) < 1e-6


def test_unstructured_distributed(rng):
    A = random_spd(300, 5, rng)
    N = A.shape[0]
    part = partition_bfs_recursive(A.indptr, A.indices, 4, seed=0)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    x, info = solve_dist_general(pm, b, opt=CGOptions(max_iterations=2000,
                                                      residual_rtol=1e-10),
                                 method="pipelined", halo="alltoall")
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-7


def test_unstructured_rcm_reduces_bandwidth_substantially(rng):
    # not every random graph becomes banded, but RCM must not be a no-op
    A = random_spd(500, 4, rng)
    bw0 = bandwidth(A.indptr, A.indices)
    perm = rcm_order(A.indptr.astype(np.int64), A.indices.astype(np.int64))
    B = permute_csr(A, perm)
    bw1 = bandwidth(B.indptr, B.indices)
    assert bw1 <= bw0
