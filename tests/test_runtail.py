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


def test_runtail_df64_kernel_accuracy(rng):
    """runtail_spmv_df64 tracks f64 window dots to ~2^-48 — the
    f64-parity run-tail the reference's f64 merge kernel provides with
    no special casing (cg-kernels-cuda.cu:358-441).  On the CPU backend
    this exercises the eager-XLA twin (the pallas interpreter compiles
    the pure-elementwise kernel body into one excess-precision XLA:CPU
    unit that destroys the EFTs — measured 1.7e-8; the hardware Mosaic
    path is asserted by scripts/bench_runtail.py stage 1b)."""
    from acg_tpu.ops.pallas_runtail import runtail_spmv_df64

    ntail, ncols = 21, 5000
    Nx = _round_up(ncols, 1024)
    nsteps = -(-ntail // R)
    vals = np.zeros((nsteps * R, WSUB * 1024), np.float32)
    vlo = np.zeros_like(vals)
    base = np.zeros((nsteps * R,), np.int32)
    ref = np.zeros(nsteps * R)
    x64 = rng.standard_normal(Nx) / 3.0
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    for i in range(ntail):
        span = int(rng.integers(1, SPAN_LIMIT))
        start = int(rng.integers(0, ncols - span))
        b = start // 1024
        v64 = rng.standard_normal(span) / 3.0
        vh = v64.astype(np.float32)
        vals[i, start - b * 1024:start - b * 1024 + span] = vh
        vlo[i, start - b * 1024:start - b * 1024 + span] = \
            (v64 - vh.astype(np.float64)).astype(np.float32)
        base[i] = b
        ref[i] = np.dot(v64, x64[start:start + span])
    yh, yl = runtail_spmv_df64(
        jnp.asarray(vals.reshape(nsteps, R, WSUB, 8, 128)),
        jnp.asarray(vlo.reshape(nsteps, R, WSUB, 8, 128)),
        jnp.asarray(base), jnp.asarray(xh), jnp.asarray(xl), Nx)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    err = np.abs(y[:ntail] - ref[:ntail]) / \
        np.maximum(np.abs(ref[:ntail]), 1e-30)
    assert err.max() < 1e-12


def test_heavy_keep_lo_spmv_df64(rng):
    """A keep_lo heavy split is df64-exact end to end: SELL main block
    lo slabs + (hi, lo) run-tail + duplicate-free df_add scatter."""
    A, _ = _heavy_system(rng)
    A = (A / 3.0).tocsr()                    # inexact in f32
    op = HeavySplitOperator.from_csr(A, threshold=300, keep_lo=True)
    assert op.df64_ready and op.vals_lo is not None
    N = A.shape[0]
    x64 = rng.standard_normal(N)
    xp = np.zeros(op.Np)
    xp[:N] = x64
    xh = xp.astype(np.float32)
    xl = (xp - xh.astype(np.float64)).astype(np.float32)
    yh, yl = op.spmv_df64(jnp.asarray(xh), jnp.asarray(xl))
    y = (np.asarray(yh, np.float64) + np.asarray(yl, np.float64))[:N]
    ref = A @ x64
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12


def test_heavy_keep_lo_two_segments_df64(rng):
    """df64 scatter with a row owning TWO segments: the occurrence-rank
    groups keep every df_add unique-index (a plain pair .add would
    round away the low bits)."""
    n, run = 4000, 400
    A = sp.diags([4.0 * np.ones(n)], [0]).tolil()
    r = 77
    for c0 in (500, 3200):
        vals = 0.01 * rng.standard_normal(run)
        A[r, c0:c0 + run] = vals
        A[c0:c0 + run, r] = vals
    A = A.tocsr()
    A = ((A + sp.diags(np.abs(A).sum(axis=1).A1)) / 3.0).tocsr()
    op = HeavySplitOperator.from_csr(A, threshold=300, keep_lo=True)
    assert len(op.groups) == 2               # two occurrence ranks
    x64 = rng.standard_normal(n)
    xp = np.zeros(op.Np)
    xp[:n] = x64
    xh = xp.astype(np.float32)
    xl = (xp - xh.astype(np.float64)).astype(np.float32)
    yh, yl = op.spmv_df64(jnp.asarray(xh), jnp.asarray(xl))
    y = (np.asarray(yh, np.float64) + np.asarray(yl, np.float64))[:n]
    ref = A @ x64
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12


def test_heavy_keep_lo_cg_df64(rng):
    """acg-df64 semantics on a heavy matrix: pipelined-df64 through the
    keep_lo heavy split reaches tolerances far below the f32 floor
    (CPU-jit df64 is weaker than hardware — CLAUDE.md — so 1e-8 here;
    the reference needs no special casing, cg-kernels-cuda.cu:358-441)."""
    A, _ = _heavy_system(rng)
    A = (A / 3.0).tocsr()
    op = HeavySplitOperator.from_csr(A, threshold=300, keep_lo=True)
    N = A.shape[0]
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=300, residual_rtol=1e-8, check_every=4)
    x, info = solve(op, b, opt=opt, method="pipelined-df64")
    assert info.converged
    # the solver guarantees its recurrence residual; the true residual
    # lags by a small drift factor, larger here than in the SELL-only
    # tests because CPU-jit weakens the tail's XLA-land df_adds too
    # (hardware: the df64 tail kernel measured 2e-14 exact)
    assert np.linalg.norm(b - A @ x) < 1e-8 * np.linalg.norm(b) * 4


def test_heavy_df64_requires_keep_lo(rng):
    """Without keep_lo the df64 dispatch refuses (no silent f32 round)."""
    A, _ = _heavy_system(rng)
    op = HeavySplitOperator.from_csr(A, threshold=300)
    assert not op.df64_ready
    b = np.ones(A.shape[0])
    with pytest.raises(ValueError, match="keep_lo"):
        solve(op, b, opt=CGOptions(max_iterations=10),
              method="pipelined-df64")


def test_sell_from_csr_heavy_keep_lo_and_cap_guard(rng):
    """heavy composes with keep_lo through the generic builder; heavy
    with cap is an explicit error instead of a silent skip."""
    from acg_tpu.core.sell import sell_from_csr

    A, _ = _heavy_system(rng)
    A = (A / 3.0).tocsr()
    op = sell_from_csr(A, heavy=True, keep_lo=True)
    assert isinstance(op, HeavySplitOperator) and op.df64_ready
    with pytest.raises(ValueError, match="competing"):
        sell_from_csr(A, heavy=True, cap=8)
    with pytest.raises(NotImplementedError, match="f32"):
        sell_from_csr(A, heavy=True, dtype=np.float64)


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


def test_runtail_windowed_fallback_matches_resident(rng, monkeypatch):
    """Large column spaces fall back to the per-row-window DMA kernel;
    force it (RESIDENT_X_MAX=0) and check bit-level agreement with the
    resident path on the same inputs (both run interpret on CPU)."""
    import acg_tpu.ops.pallas_runtail as rt

    ntail, ncols = 11, 4000
    Nx = _round_up(ncols, 1024)
    nsteps = -(-ntail // R)
    vals = np.zeros((nsteps * R, WSUB * 1024), np.float32)
    base = np.zeros((nsteps * R,), np.int32)
    x = rng.standard_normal(Nx).astype(np.float32)
    for i in range(ntail):
        span = int(rng.integers(1, SPAN_LIMIT))
        start = int(rng.integers(0, ncols - span))
        b = start // 1024
        vals[i, start - b * 1024:start - b * 1024 + span] = \
            rng.standard_normal(span).astype(np.float32)
        base[i] = b
    v5 = jnp.asarray(vals.reshape(nsteps, R, WSUB, 8, 128))
    b1 = jnp.asarray(base)
    xj = jnp.asarray(x)
    y_res = np.asarray(rt.runtail_spmv(v5, b1, xj, Nx))
    monkeypatch.setattr(rt, "RESIDENT_X_MAX", 0)
    rt.runtail_spmv.clear_cache()
    y_win = np.asarray(rt.runtail_spmv(v5, b1, xj, Nx))
    rt.runtail_spmv.clear_cache()
    # same values through different f32 reduction orders (the resident
    # path folds WSUB window parts before the full-array sum) — agree
    # to the roundoff of a 4096-element f32 dot
    np.testing.assert_allclose(y_win, y_res, rtol=5e-5, atol=5e-5)


def test_mirror_strip_symmetric(rng):
    """Symmetric heavy input: the mirrors of stripped row segments (the
    dense COLUMNS) move to the scatter slab and the main block slims to
    near the mesh-only entry count; SpMV stays scipy-exact (covers
    diagonal-in-window and overlapping-run hazards — _heavy_system's
    runs start at the diagonal and may overlap)."""
    A, _ = _heavy_system(rng)
    op = HeavySplitOperator.from_csr(A, threshold=300)
    assert op.svals is not None
    nsym = int((np.asarray(op.svals) != 0).sum())
    assert nsym > 1000                 # mirrors really moved
    op_rows_only = HeavySplitOperator.from_csr(A, threshold=300, sym=False)
    assert op.main.nnz_true == op_rows_only.main.nnz_true - nsym
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:A.shape[0]].set(
        jnp.asarray(x))
    ref = A @ x.astype(np.float64)
    for o in (op, op_rows_only):
        y = np.asarray(o.spmv(xp))[:A.shape[0]]
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_mirror_strip_asymmetric_graceful(rng):
    """Bit-unequal mirrors stay in the main block (no wrong transpose
    contribution); SpMV stays exact on an asymmetric matrix."""
    A, _ = _heavy_system(rng)
    C = A.copy()
    C.data = C.data.copy()
    C.data[::7] *= 1.0000001           # break symmetry across the board
    op = HeavySplitOperator.from_csr(C, threshold=300)
    x = rng.standard_normal(C.shape[0]).astype(np.float32)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:C.shape[0]].set(
        jnp.asarray(x))
    y = np.asarray(op.spmv(xp))[:C.shape[0]]
    ref = C @ x.astype(np.float64)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_mirror_strip_cg_converges(rng):
    """End-to-end CG through the mirror-stripped operator matches the
    scipy iteration count."""
    A, _ = _heavy_system(rng)
    op = HeavySplitOperator.from_csr(A, threshold=300)
    assert op.svals is not None
    xstar = rng.standard_normal(A.shape[0])
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=120, residual_rtol=1e-5,
                    dot_dtype="mixed")
    x, info = solve(op, b, opt=opt, method="pipelined-fused")
    assert info.converged
    assert np.linalg.norm(x - xstar) < 5e-4


def test_runtail_scatter_overlapping_windows(rng):
    """Two segments whose y windows OVERLAP accumulate correctly (the
    sequential-grid resident-y contract), including both rows of one
    grid step and rows split across steps."""
    from acg_tpu.ops.pallas_runtail import runtail_scatter

    Nx = 4096
    W = WSUB * 1024
    ntail = 10                                  # spans two grid steps
    nsteps = -(-ntail // R)
    vals = np.zeros((nsteps * R, W), np.float32)
    base = np.zeros((nsteps * R,), np.int32)
    xr = np.zeros((nsteps * R,), np.float32)
    ref = np.zeros(Nx + W)
    for i in range(ntail):
        b = 0                                   # every window overlaps
        span = int(rng.integers(50, W))
        v = rng.standard_normal(span).astype(np.float32)
        vals[i, :span] = v
        base[i] = b
        s = float(rng.standard_normal())
        xr[i] = s
        ref[:span] += v.astype(np.float64) * s
    import jax.numpy as jnp
    y = np.asarray(runtail_scatter(
        jnp.asarray(vals.reshape(nsteps, R, WSUB, 8, 128)),
        jnp.asarray(base), jnp.asarray(xr), Nx))
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_runtail_scatter_all_pad_is_zero(rng):
    """Zero xr (all pads) produces an exactly zero image."""
    from acg_tpu.ops.pallas_runtail import runtail_scatter

    Nx = 2048
    vals = np.asarray(rng.standard_normal((1, R, WSUB, 8, 128)),
                      np.float32)
    base = np.zeros((R,), np.int32)
    xr = np.zeros((R,), np.float32)
    import jax.numpy as jnp
    y = np.asarray(runtail_scatter(jnp.asarray(vals), jnp.asarray(base),
                                   jnp.asarray(xr), Nx))
    np.testing.assert_array_equal(y, 0.0)
