"""Distributed SELL operator tests (8-virtual-device CPU mesh).

The multi-chip unstructured fast path: per-device chunked-gather SELL
kernels on the owned + interface blocks (parallel/dist_sell.py), the
analogue of the reference running its merge-CSR kernel per rank on fa/oa
(cg-kernels-cuda.cu:312-441 dispatched from cgcuda.c:855-899).  Oracles:
scipy SpMV/solves and the gather-ELL distributed path."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
from acg_tpu.parallel.dist_sell import build_dist_sell
from acg_tpu.partition.graph import build_partitioned_matrix
from acg_tpu.partition.partitioner import (partition_bfs_recursive,
                                           partition_contiguous)
from acg_tpu.solvers.cg import CGOptions
from acg_tpu.solvers.dist_cg import solve_dist_general


def poisson_pm(n, nparts, rng, pad_to=8, pmethod="bfs"):
    offsets, vals = poisson2d_dia(n)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    if pmethod == "bfs":
        part = partition_bfs_recursive(A.indptr, A.indices, nparts, seed=0)
    else:
        part = partition_contiguous(N, nparts)
    return A, build_partitioned_matrix(A, part, pad_to=pad_to)


def random_spd(N, density, seed):
    R = sp.random(N, N, density=density, random_state=seed, format="csr")
    A = R + R.T + sp.eye(N) * (float(np.abs(R).sum(axis=1).max()) * 2 + 1)
    A = sp.csr_matrix(A)
    A.sort_indices()
    return A


def test_build_shapes_spmd_uniform(rng):
    """shard_map needs identical per-part shapes: every bucket's stacked
    slabs carry the part axis first and agree across owned/ghost lists."""
    A, pm = poisson_pm(12, 4, rng)
    dso = build_dist_sell(pm)
    for blk in (dso.own, dso.gst):
        assert len(blk.vals) == len(blk.lidx) == len(blk.cidx)
        for v, l, c in zip(blk.vals, blk.lidx, blk.cidx):
            assert v.shape[0] == pm.P
            # lidx packs four groups per int32 word along the G axis
            assert l.shape == (v.shape[0], v.shape[1], v.shape[2] // 4,
                               8, 128)
            assert c.shape[0] == pm.P
        assert blk.tile_order.shape[0] == pm.P
    # every true nonzero is stored exactly once across both block types
    assert dso.nnz_true == A.nnz
    assert 0 < dso.fill <= 1


@pytest.mark.parametrize("method", ["cg", "pipelined"])
def test_dist_sell_manufactured(method, rng):
    A, pm = poisson_pm(12, 4, rng)
    N = A.shape[0]
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-6)
    x, info = solve_dist_general(pm, b, opt=opt, method=method,
                                 operator="sell")
    assert info.converged
    # f32 storage/arithmetic; the pipelined recurrences carry a bit more
    # rounding than true CG
    assert np.linalg.norm(x - xstar) < 1e-4


def test_dist_sell_spmv_oracle(rng):
    """r0 = b - A x0 at 0 iterations exercises halo + both SELL blocks
    against scipy."""
    A, pm = poisson_pm(10, 8, rng)
    N = A.shape[0]
    x0 = rng.standard_normal(N)
    b = rng.standard_normal(N)
    opt = CGOptions(max_iterations=0, residual_rtol=1e-30)
    _, info = solve_dist_general(pm, b, x0=x0, opt=opt, operator="sell")
    np.testing.assert_allclose(info.r0nrm2, np.linalg.norm(b - A @ x0),
                               rtol=1e-5)


def test_dist_sell_rectangular_ghost_block(rng):
    """Scattered connectivity makes the interface block WIDER than tall
    (G > L) — the case that overflowed the native scan's row-count-sized
    chunk map."""
    N = 512
    A = random_spd(N, 0.06, seed=1)
    part = partition_contiguous(N, 8)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    assert pm.G > pm.L, "test intends the rectangular G > L regime"
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=500, residual_rtol=1e-6)
    x, info = solve_dist_general(pm, b, opt=opt, method="pipelined",
                                 operator="sell")
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-5


def test_dist_sell_matches_ell_history(rng):
    """Same solve through the gather-ELL operator at f32: histories agree
    to f32 roundoff (different per-device summation order only)."""
    A, pm = poisson_pm(10, 4, rng)
    N = A.shape[0]
    b = rng.standard_normal(N)
    opt = CGOptions(max_iterations=20, residual_rtol=1e-30)
    _, i_ell = solve_dist_general(pm, b, opt=opt, method="cg",
                                  history=True, dtype=np.float32)
    _, i_sell = solve_dist_general(pm, b, opt=opt, method="cg",
                                   history=True, operator="sell")
    np.testing.assert_allclose(i_ell.residual_history,
                               i_sell.residual_history, rtol=2e-3)


def test_dist_sell_prebuilt_operator_reused(rng):
    """A prebuilt DistSellOperator skips the layout build and solves
    identically."""
    A, pm = poisson_pm(10, 4, rng)
    N = A.shape[0]
    b = rng.standard_normal(N)
    dso = build_dist_sell(pm)
    opt = CGOptions(max_iterations=50, residual_rtol=1e-5)
    x1, i1 = solve_dist_general(pm, b, opt=opt, operator="sell")
    x2, i2 = solve_dist_general(pm, b, opt=opt, operator="sell",
                                sell_op=dso)
    np.testing.assert_array_equal(x1, x2)
    assert i1.niterations == i2.niterations


def test_dist_sell_rejects_f64(rng):
    A, pm = poisson_pm(8, 2, rng)
    with pytest.raises(ValueError, match="float32"):
        solve_dist_general(pm, np.ones(A.shape[0]), operator="sell",
                           dtype=np.float64)


def test_dist_sell_diagonal_empty_interface(rng):
    """A block-diagonal system has (near-)empty interface blocks; the
    layout build must handle zero-nnz CSR blocks."""
    N = 256
    d = rng.uniform(1.0, 2.0, N)
    A = sp.diags(d).tocsr()
    part = partition_contiguous(N, 4)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    xstar = rng.standard_normal(N)
    b = A @ xstar
    opt = CGOptions(max_iterations=200, residual_rtol=1e-6)
    x, info = solve_dist_general(pm, b, opt=opt, operator="sell")
    assert info.converged
    assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-5


def test_dist_sell_df64_converges(rng):
    """Distributed pipelined-df64 on a general (BFS) partition: per-device
    df64 chunked-gather SpMV on the owned + interface blocks with the halo
    exchanged on both (hi, lo) components — the multi-chip f64-parity mode
    matching the reference's per-rank f64 pipelined kernel on arbitrary
    partitions (cg-kernels-cuda.cu:1316-1711).  CPU interpret validates
    convergence; df64 depth is covered by test_sell.py's SpMV accuracy
    test and on hardware."""
    A, pm = poisson_pm(14, 8, rng)
    A = (A / 3.0).tocsr()                       # inexact in f32
    pm = build_partitioned_matrix(
        A, partition_bfs_recursive(A.indptr, A.indices, 8, seed=0), pad_to=8)
    N = A.shape[0]
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=3000, residual_rtol=1e-5, check_every=4)
    x, info = solve_dist_general(pm, b, opt=opt, method="pipelined-df64",
                                 operator="sell")
    assert info.converged
    assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-3


def test_dist_sell_df64_needs_keep_lo(rng):
    """A caller-supplied sell_op without the keep_lo build is rejected
    (it can't prove the matrix is f32-exact), and pipelined-df64 demands
    operator='sell'."""
    A, pm = poisson_pm(8, 2, rng)
    dso = build_dist_sell(pm)                   # no keep_lo
    with pytest.raises(ValueError, match="keep_lo"):
        solve_dist_general(pm, np.ones(A.shape[0]), operator="sell",
                           method="pipelined-df64", sell_op=dso)
    with pytest.raises(ValueError, match="sell"):
        solve_dist_general(pm, np.ones(A.shape[0]), operator="ell",
                           method="pipelined-df64")


def test_dist_sell_df64_exact_matrix_no_lo_slabs(rng):
    """keep_lo on an f32-exact matrix builds no residual slabs (proof
    recorded in df64_ready) and the solve still runs."""
    A, pm = poisson_pm(10, 4, rng)              # Poisson: f32-exact
    dso = build_dist_sell(pm, keep_lo=True)
    assert dso.df64_ready
    assert dso.own.vals_lo is None and dso.gst.vals_lo is None
    N = A.shape[0]
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-5, check_every=4)
    x, info = solve_dist_general(pm, b, opt=opt, method="pipelined-df64",
                                 operator="sell", sell_op=dso)
    assert info.converged
    assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-3


# ---------------------------------------------------------------------------
# Round 4: distributed layout fill — per-part cluster local order +
# value-aware bucket DP on the across-parts max histogram (VERDICT weak 4)


def test_dist_sell_cluster_local_order_correct(rng):
    """local_order='cluster' changes only the per-part row order; the
    distributed SELL solve stays scipy-correct and the layout fill does
    not regress vs the ascending-global order."""
    offsets, vals = poisson2d_dia(32)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    part = partition_bfs_recursive(A.indptr, A.indices, 4, seed=0)
    pm0 = build_partitioned_matrix(A, part, pad_to=8)
    pm1 = build_partitioned_matrix(A, part, pad_to=8,
                                   local_order="cluster")
    # same partition → same ghosts/halo volume, different local order
    np.testing.assert_array_equal(pm0.comm_matrix, pm1.comm_matrix)
    assert not np.array_equal(pm0.rows_global, pm1.rows_global)
    dso0 = build_dist_sell(pm0)
    dso1 = build_dist_sell(pm1)
    assert dso1.fill >= dso0.fill * 0.95   # never materially worse
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-6)
    x, info = solve_dist_general(pm1, b, opt=opt, method="pipelined",
                                 operator="sell", sell_op=dso1)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-3   # f32 storage, N=1024


def test_dist_sell_optimal_buckets_spmd_uniform(rng, monkeypatch):
    """The value-aware bucket DP runs on the elementwise-max sorted-G
    histogram: per-part shapes must stay identical, and the layout must
    store no more slots than the equal-count fallback."""
    import os
    A, pm = poisson_pm(24, 4, rng)
    dso = build_dist_sell(pm)                       # DP buckets (default)
    monkeypatch.setenv("ACG_SELL_BUCKETS", "0")
    dso_eq = build_dist_sell(pm)                    # equal-count fallback
    monkeypatch.delenv("ACG_SELL_BUCKETS")
    for blk in (dso.own, dso.gst):
        for v, l in zip(blk.vals, blk.lidx):
            assert v.shape[0] == pm.P and l.shape[0] == pm.P
    assert dso.fill >= dso_eq.fill


# ---------------------------------------------------------------------------
# Round 5: distributed heavy-segment split (build_dist_sell(heavy=True)) —
# the multi-device twin of the run-tail split that measured 2.67 → 8.71
# Gnnz/s single-chip (BENCHMARKS.md; reference capability anchor:
# merge-CSR load balance, cg-kernels-cuda.cu:312-441).


def _heavy_pm(rng, n=1600, nparts=4, nheavy=5, run=300):
    """Mesh + interleaved heavy-run rows, contiguously partitioned so
    each heavy row's run stays within its own part's owned columns."""
    A = sp.diags([np.ones(n), 0.1 * np.ones(n), 0.1 * np.ones(n)],
                 [0, 1, -1], shape=(n, n)).tolil()
    L = n // nparts
    hrows = []
    for p in range(nparts):
        if p >= nheavy:
            break
        r = p * L + 40                      # run inside part p's columns
        v = 0.01 * rng.standard_normal(run)
        A[r, r:r + run] = v
        A[r:r + run, r] = v
        hrows.append(r)
    A = A.tocsr()
    A = (A + sp.diags(np.abs(A).sum(axis=1).A1)).tocsr()
    part = partition_contiguous(n, nparts)
    return A, build_partitioned_matrix(A, part, pad_to=8), hrows


def test_dist_heavy_build_and_spmv(rng):
    """heavy=True strips per-part owned segments into SPMD-uniform
    stacked run-tails and the distributed solve stays scipy-exact."""
    A, pm, hrows = _heavy_pm(rng)
    dso = build_dist_sell(pm, heavy=True, heavy_threshold=200)
    assert dso.tail is not None
    tvals, trows = dso.tail["tvals"], dso.tail["trows"]
    assert tvals.shape[0] == pm.P and trows.shape == (pm.P, tvals.shape[1] * 8)
    # tails really detected on the parts holding heavy rows
    assert int(np.sum(np.asarray(trows) < pm.L)) >= len(hrows)
    N = A.shape[0]
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=200, residual_rtol=1e-5,
                    dot_dtype="mixed")
    x, info = solve_dist_general(pm, b, opt=opt, method="pipelined-fused",
                                 operator="sell", sell_op=dso)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 5e-4


def test_dist_heavy_uniform_mesh_no_tail(rng):
    """Detection is the gate: a uniform mesh builds the plain stacked
    layout (tail=None), bit-identical shapes to heavy=False."""
    A, pm = poisson_pm(12, 4, rng)
    dso_h = build_dist_sell(pm, heavy=True)
    dso_p = build_dist_sell(pm)
    assert dso_h.tail is None
    for a, b_ in zip(dso_h.own.vals, dso_p.own.vals):
        assert a.shape == b_.shape


def test_dist_heavy_keep_lo_df64(rng):
    """heavy + keep_lo distributed: the df64 tail (masked-add rounds,
    one per occurrence rank) converges at a tolerance far below the f32
    floor — the reference's f64 merge kernel needs no special casing
    (cg-kernels-cuda.cu:358-441) and now neither does the distributed
    driver."""
    A, pm, hrows = _heavy_pm(rng)
    A = (A / 3.0).tocsr()                    # inexact in f32
    pm = build_partitioned_matrix(A, partition_contiguous(A.shape[0], 4),
                                  pad_to=8)
    dso = build_dist_sell(pm, heavy=True, keep_lo=True,
                          heavy_threshold=200)
    assert dso.df64_ready and dso.tail is not None and dso.tail_K >= 1
    assert "tvals_lo" in dso.tail
    N = A.shape[0]
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=300, residual_rtol=1e-8, check_every=4)
    x, info = solve_dist_general(pm, b, opt=opt, method="pipelined-df64",
                                 operator="sell", sell_op=dso)
    assert info.converged
    assert np.linalg.norm(b - A @ x) < 1e-8 * np.linalg.norm(b) * 4
    assert np.linalg.norm(x - xstar) < 1e-6


def test_dist_heavy_mirror_strip(rng):
    """Distributed twin of the symmetric-mirror strip: the dense-column
    twins leave the per-part owned blocks (svals in the stacked tail)
    and the solve stays scipy-exact."""
    A, pm, hrows = _heavy_pm(rng)
    dso = build_dist_sell(pm, heavy=True, heavy_threshold=200)
    assert dso.tail is not None and "svals" in dso.tail
    assert int((np.asarray(dso.tail["svals"]) != 0).sum()) > 100
    N = A.shape[0]
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=200, residual_rtol=1e-5,
                    dot_dtype="mixed")
    x, info = solve_dist_general(pm, b, opt=opt, method="pipelined-fused",
                                 operator="sell", sell_op=dso)
    assert info.converged
    assert np.linalg.norm(x - xstar) < 5e-4
