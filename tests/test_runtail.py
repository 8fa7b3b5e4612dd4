"""Dense run-tail kernel + HeavySplitOperator vs scipy oracles.

Covers the heavy-local-row regime the cap-and-tail split measured
infeasible (BENCHMARKS.md): rows with long contiguous runs move to the
dense-window kernel (ops/pallas_runtail.py), the SELL main block keeps
only the regular rows.  Reference capability anchor: merge-CSR load
balance, cg-kernels-cuda.cu:312-441."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from acg_tpu.core.heavy import (HeavySplitOperator, SPAN_LIMIT,
                                heavy_rows)
from acg_tpu.core.sell import _round_up
from acg_tpu.ops.pallas_runtail import R, WSUB, runtail_spmv
from acg_tpu.solvers.cg import CGOptions, solve
from acg_tpu.solvers.reference import solve_scipy


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _heavy_system(rng, n=3000, nheavy=13, run=700):
    """SPD mesh-like banded matrix + interleaved contiguous heavy rows."""
    diags = [np.ones(n), *(0.1 * np.ones(n) for _ in range(4))]
    A = sp.diags(diags, [0, 1, -1, 7, -7], shape=(n, n)).tolil()
    hrows = rng.choice(n - run, size=nheavy, replace=False)
    for r in hrows:
        c0 = int(r)
        vals = 0.01 * rng.standard_normal(run)
        A[r, c0:c0 + run] = vals
        A[c0:c0 + run, r] = vals          # keep symmetric
    A = A.tocsr()
    A = A + sp.diags(np.abs(A).sum(axis=1).A1)   # diagonally dominant SPD
    return A.tocsr(), np.sort(hrows)


def test_runtail_kernel_matches_dense(rng):
    ntail, ncols = 21, 5000
    Nx = _round_up(ncols, 1024)
    nsteps = -(-ntail // R)
    vals = np.zeros((nsteps * R, WSUB * 1024), np.float32)
    base = np.zeros((nsteps * R,), np.int32)
    ref = np.zeros(nsteps * R)
    x = rng.standard_normal(ncols).astype(np.float32)
    xp = np.zeros(Nx, np.float32)
    xp[:ncols] = x
    for i in range(ntail):
        span = int(rng.integers(1, SPAN_LIMIT))
        start = int(rng.integers(0, ncols - span))
        b = start // 1024
        v = rng.standard_normal(span).astype(np.float32)
        vals[i, start - b * 1024:start - b * 1024 + span] = v
        base[i] = b
        ref[i] = np.dot(v.astype(np.float64),
                        xp[start:start + span].astype(np.float64))
    y = np.asarray(runtail_spmv(
        jnp.asarray(vals.reshape(nsteps, R, WSUB, 8, 128)),
        jnp.asarray(base), jnp.asarray(xp), Nx))
    np.testing.assert_allclose(y[:ntail], ref[:ntail], rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(y[ntail:], 0.0)


def test_heavy_rows_selection(rng):
    A, hrows = _heavy_system(rng)
    got = heavy_rows(A, threshold=300)
    # every planted heavy row is found; the mesh rows are not
    assert set(hrows) <= set(got)
    counts = np.diff(A.indptr)
    assert all(counts[r] >= 300 for r in got)


def test_heavy_split_spmv_matches_scipy(rng):
    A, _ = _heavy_system(rng)
    op = HeavySplitOperator.from_csr(A, threshold=300)
    assert op.ntail >= R and op.fill > op.main.fill * 0.5
    # the main block really lost the heavy rows
    assert op.main.nnz_true < A.nnz
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:A.shape[0]].set(
        jnp.asarray(x))
    y = np.asarray(op.spmv(xp))[:A.shape[0]]
    ref = A @ x.astype(np.float64)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_heavy_split_cg_matches_scipy(rng):
    A, _ = _heavy_system(rng)
    op = HeavySplitOperator.from_csr(A, threshold=300)
    xstar = rng.standard_normal(A.shape[0])
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=120, residual_rtol=1e-5,
                    dot_dtype="mixed", check_every=1)
    x, info = solve(op, b, opt=opt, method="pipelined")
    _, sinfo = solve_scipy(A, b, opt=CGOptions(max_iterations=120,
                                               residual_rtol=1e-5))
    assert info.converged and sinfo.converged
    assert abs(info.niterations - sinfo.niterations) <= 2
    assert np.linalg.norm(x - xstar) < 5e-4


def test_no_heavy_rows_raises(rng):
    A = sp.diags([np.ones(512)], [0]).tocsr()
    with pytest.raises(ValueError):
        HeavySplitOperator.from_csr(A)


def test_sell_from_csr_heavy_gate(rng):
    """sell_from_csr(heavy=True) splits iff heavy-local rows exist."""
    import scipy.sparse as sp

    from acg_tpu.core.heavy import HeavySplitOperator
    from acg_tpu.core.sell import SellOperator, sell_from_csr

    N = 1500
    mesh = sp.diags([np.full(N, 4.0), np.full(N - 1, -1.0),
                     np.full(N - 1, -1.0)], [0, -1, 1]).tocsr()
    # uniform mesh: no qualifying rows -> plain layout unchanged
    assert isinstance(sell_from_csr(mesh, heavy=True), SellOperator)
    # interleave two heavy local rows -> split
    A = mesh.tolil()
    for r in (100, 700):
        cols = np.arange(r, min(r + 600, N))
        A[r, cols] = 0.01
        A[cols, r] = 0.01
        A[r, r] = 50.0
    A = sp.csr_matrix(A)
    op = sell_from_csr(A, heavy=True)
    assert isinstance(op, HeavySplitOperator)
    # correctness through the generic entry point
    import jax.numpy as jnp
    x = rng.standard_normal(op.Np).astype(np.float32)
    y = np.asarray(op.spmv(jnp.asarray(x)))[:N]
    ref = A @ x[:N].astype(np.float64)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_heavy_segments_distant_run(rng):
    """The ACG_HEAVY=2 shape: mesh entries near the diagonal PLUS a
    dense run at a DISTANT random column.  The whole-row span is huge
    (mesh part + far run), but the run segment must still be detected,
    moved to the tail, and the row's mesh part kept in the main block."""
    from acg_tpu.core.heavy import heavy_segments

    n, run = 4000, 600
    A = sp.diags([4.0 * np.ones(n), -np.ones(n), -np.ones(n)],
                 [0, 1, -1], shape=(n, n)).tolil()
    planted = ((50, 3000), (1200, 200))
    for r, c0 in planted:
        vals = 0.01 * rng.standard_normal(run)
        A[r, c0:c0 + run] = vals
        A[c0:c0 + run, r] = vals
    A = A.tocsr()
    A = A + sp.diags(np.abs(A).sum(axis=1).A1)
    A = A.tocsr()
    seg_row, seg_lo, seg_hi = heavy_segments(A, threshold=300)
    assert {50, 1200} <= set(seg_row.tolist())
    op = HeavySplitOperator.from_csr(A, threshold=300)
    assert op.main.nnz_true < A.nnz          # segments really removed
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:A.shape[0]].set(
        jnp.asarray(x))
    y = np.asarray(op.spmv(xp))[:A.shape[0]]
    ref = A @ x.astype(np.float64)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_heavy_two_segments_one_row(rng):
    """A row owning TWO distant dense runs emits two tail slots; the
    scatter-add (no uniqueness promise) accumulates both into the row."""
    from acg_tpu.core.heavy import heavy_segments

    n, run = 4000, 400
    A = sp.diags([4.0 * np.ones(n)], [0]).tolil()
    r = 77
    for c0 in (500, 3200):
        vals = 0.01 * rng.standard_normal(run)
        A[r, c0:c0 + run] = vals
        A[c0:c0 + run, r] = vals
    A = A.tocsr()
    A = (A + sp.diags(np.abs(A).sum(axis=1).A1)).tocsr()
    seg_row, _, _ = heavy_segments(A, threshold=300)
    assert (seg_row == r).sum() == 2
    op = HeavySplitOperator.from_csr(A, threshold=300)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:A.shape[0]].set(
        jnp.asarray(x))
    y = np.asarray(op.spmv(xp))[:A.shape[0]]
    ref = A @ x.astype(np.float64)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5
