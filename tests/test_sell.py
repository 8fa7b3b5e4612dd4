"""SELL chunked-gather operator — the unstructured fast path.

Capability analogue of the reference's merge-based CSR kernel
(cg-kernels-cuda.cu:312-441): load-balanced SpMV on arbitrary sparsity,
here via per-(row-block, column-chunk) ELL slots gathered from
VMEM-resident x (core/sell.py, ops/pallas_sell.py).  Tests run the
kernel in interpret mode on CPU against scipy."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from acg_tpu.core.sell import SellOperator
from acg_tpu.solvers.cg import CGOptions, solve
from acg_tpu.solvers.reference import solve_scipy

from test_unstructured import random_spd


def spmv_host(op: SellOperator, x: np.ndarray) -> np.ndarray:
    dt = op.vals[0].dtype
    xp = jnp.zeros((op.Np,), dt).at[:len(x)].set(jnp.asarray(x, dt))
    return np.asarray(op.spmv(xp))[:op.N]


def test_sell_spmv_matches_scipy(rng):
    A = random_spd(700, 6, rng)          # shuffled: no band structure
    op = SellOperator.from_csr(A, dtype=np.float32)
    assert 0.0 < op.fill <= 1.0
    assert op.nnz_true == A.nnz
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = spmv_host(op, x)
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_sell_spmv_f64(rng):
    A = random_spd(300, 5, rng)
    op = SellOperator.from_csr(A, dtype=np.float64)
    x = rng.standard_normal(A.shape[0])
    y = spmv_host(op, x)
    assert np.allclose(y, A @ x, rtol=1e-12, atol=1e-12)


def test_sell_empty_rows_and_nonmultiple_n(rng):
    # rows with no off-diagonal entries + N far from a block multiple
    N = 333
    d = np.arange(1.0, N + 1.0)
    A = sp.diags(d).tocsr() + sp.csr_matrix(
        ([0.5, 0.5], ([0, N - 1], [N - 1, 0])), shape=(N, N))
    op = SellOperator.from_csr(A, dtype=np.float32)
    x = rng.standard_normal(N).astype(np.float32)
    y = spmv_host(op, x)
    assert np.allclose(y, A @ x, rtol=1e-5, atol=1e-5)


def test_sell_wide_column_span(rng):
    # columns spanning many 1024-chunks: force multi-chunk rows
    N = 2100
    rows = np.arange(N)
    far = (rows * 997) % N
    vals = np.full(N, 0.25)
    B = sp.csr_matrix((vals, (rows, far)), shape=(N, N))
    A = sp.eye(N).tocsr() * 3.0 + B + B.T
    op = SellOperator.from_csr(A.tocsr(), dtype=np.float32)
    x = rng.standard_normal(N).astype(np.float32)
    y = spmv_host(op, x)
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_sell_cg_solve_matches_scipy(rng):
    A = random_spd(500, 5, rng)
    N = A.shape[0]
    op = SellOperator.from_csr(A, dtype=np.float64)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-10)
    x, info = solve(op, b, opt=opt, method="pipelined")
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-7
    xs, _ = solve_scipy(A, b, opt=opt)
    assert np.linalg.norm(x - xs) < 1e-6


def test_native_layout_matches_numpy_fallback(rng, monkeypatch):
    """The native layout build (first-appearance chunk order) and the
    numpy fallback (ascending chunk order) are different valid layouts
    of the same matrix — their SpMV results must agree exactly."""
    from acg_tpu import _native
    if not _native.has_sell():
        pytest.skip("native library not built")
    A = random_spd(700, 6, rng)
    op_nat = SellOperator.from_csr(A, dtype=np.float32)
    monkeypatch.setattr(_native, "has_sell", lambda: False)
    op_py = SellOperator.from_csr(A, dtype=np.float32)
    assert op_nat.G == op_py.G          # same group multiset per tile
    assert op_nat.nnz_true == op_py.nnz_true
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    ya, yb = spmv_host(op_nat, x), spmv_host(op_py, x)
    np.testing.assert_allclose(ya, yb, rtol=1e-5,
                               atol=1e-5 * np.linalg.norm(yb))


def test_optimal_buckets_partition_and_optimality():
    """The DP bucketer returns a valid partition of the sorted tiles
    (contiguous, BLOCK_TILES-aligned interior boundaries) and never
    stores more slots than the equal-count default bucketing, across
    skewed/uniform/degenerate G distributions."""
    from acg_tpu.core.sell import (BLOCK_TILES, bucket_groups,
                                   default_buckets, optimal_buckets)
    rng = np.random.default_rng(3)
    cases = [
        np.ones(64, dtype=np.int64),                      # uniform
        np.arange(1, 65, dtype=np.int64),                 # linear ramp
        np.concatenate([np.ones(60), [200, 220, 240, 260]]).astype(np.int64),
        rng.integers(1, 400, size=256).astype(np.int64),  # random skew
        np.array([7], dtype=np.int64),                    # single tile
    ]
    for G in cases:
        ntiles = len(G)
        so = np.argsort(G, kind="stable")
        bk = optimal_buckets(G, so, 24)
        # exact partition of [0, ntiles)
        assert bk[0][0] == 0 and bk[-1][1] == ntiles
        for (s0, e0), (s1, _) in zip(bk, bk[1:]):
            assert e0 == s1 and s0 < e0
        for s, _ in bk[1:]:
            assert s % BLOCK_TILES == 0
        def slots(b):
            return sum((e - s) * g
                       for (s, e), g in zip(b, bucket_groups(G, so, b)))
        assert slots(bk) <= slots(default_buckets(ntiles))


def test_bucketing_reduces_stored_slots(rng):
    """G-bucketing never stores more slots than global-max padding and
    strictly fewer when per-tile group counts differ."""
    from acg_tpu import _native
    if not _native.has_sell():
        pytest.skip("native library not built")
    A = random_spd(900, 6, rng)
    op = SellOperator.from_csr(A, dtype=np.float32)
    assert len(op.vals) >= 2                      # multiple buckets
    worst = 8 * op.G * op.ntiles * 128            # global-max padding
    assert op.nnz <= worst
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = spmv_host(op, x)
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def df_split(v: np.ndarray):
    hi = v.astype(np.float32)
    return hi, (v - hi.astype(np.float64)).astype(np.float32)


def test_sell_spmv_df64_accuracy(rng):
    """The df64 chunked-gather SpMV (ops/pallas_sell.sell_spmv_df64) must
    track scipy float64 to ~2^-48 — the f64-parity product the reference
    gets from native f64 ALUs in its merge kernel
    (cg-kernels-cuda.cu:358-441).  Unlike the fused update pass, the
    kernel's error-free transforms survive CPU interpret mode, so the
    full accuracy is assertable here (measured 3.6e-15)."""
    # degree sweep exercises G=8 (single accumulator trip), G>=16
    # (multi-trip two_sum accumulation — the case that caught the
    # interpret-mode fori_loop EFT loss) and multi-bucket layouts
    for deg in (6, 15, 30):
        A = random_spd(700, deg, rng) / 3.0      # inexact in f32
        op = SellOperator.from_csr(A, keep_lo=True)
        assert op.vals_lo is not None            # lo slabs present
        x = rng.standard_normal(A.shape[0])
        xp = np.zeros(op.Np)
        xp[:op.N] = x
        xh, xl = df_split(xp)
        yh, yl = op.spmv_df64(jnp.asarray(xh), jnp.asarray(xl))
        y = np.asarray(yh, np.float64)[:op.N] \
            + np.asarray(yl, np.float64)[:op.N]
        ref = A @ x
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12, deg


def test_sell_spmv_df64_exact_matrix_skips_lo(rng):
    """f32-exact entries ⇒ no low-residual slabs are built and the
    one-slab kernel variant is still df64-accurate in x."""
    A = random_spd(500, 5, rng)
    A.data = A.data.astype(np.float32).astype(np.float64)  # f32-exact
    op = SellOperator.from_csr(A, keep_lo=True)
    assert op.vals_lo is None
    x = rng.standard_normal(A.shape[0])
    xp = np.zeros(op.Np)
    xp[:op.N] = x
    xh, xl = df_split(xp)
    yh, yl = op.spmv_df64(jnp.asarray(xh), jnp.asarray(xl))
    y = np.asarray(yh, np.float64)[:op.N] + np.asarray(yl, np.float64)[:op.N]
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12


def test_sell_df64_solver_converges(rng):
    """pipelined-df64 on a SellOperator: two fused passes per iteration
    (df64 SpMV + df64 update/dots).  CPU interpret validates convergence
    only — excess precision degrades the update pass's pairs to ~f32;
    df64 depth is validated by the SpMV test above and on hardware."""
    A = random_spd(500, 5, rng) / 3.0
    N = A.shape[0]
    op = SellOperator.from_csr(A, keep_lo=True)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-5, check_every=4)
    x, info = solve(op, b, opt=opt, method="pipelined-df64")
    assert info.converged
    assert np.linalg.norm(x - xstar) / np.linalg.norm(xstar) < 1e-3


def test_sell_df64_vmem_guard():
    """spmv_df64 refuses column spaces whose doubled working set cannot
    fit VMEM, with an actionable message (partition across devices)."""
    import dataclasses
    A = sp.eye(256).tocsr()
    op = SellOperator.from_csr(A, keep_lo=True)
    huge = dataclasses.replace(op, ncols=10_000_000)
    xh = jnp.zeros((op.Np,), jnp.float32)
    with pytest.raises(MemoryError, match="partition"):
        huge.spmv_df64(xh, xh)


def test_capped_sell_matches_scipy(rng):
    """Cap-and-tail split (CappedSellOperator): heavy (row, chunk) runs
    beyond the cap move to a compacted tail operator; y = main·x +
    scatter_add(tail_rows, tail·x) must equal the unsplit product.  The
    load-balance analogue of the reference's merge-CSR work split
    (cg-kernels-cuda.cu:312-441)."""
    from acg_tpu.core.sell import CappedSellOperator

    A = random_spd(700, 20, rng) / 3.0
    N = A.shape[0]
    op = CappedSellOperator.from_csr(A, cap=8, keep_lo=True)
    assert op.tail is not None and op.tail_rows.shape[0] > 0
    assert op.nnz_true == A.nnz
    x = rng.standard_normal(N).astype(np.float32)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:N].set(jnp.asarray(x))
    y = np.asarray(op.spmv(xp))[:N]
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5
    # df64 product through the same split
    xp64 = np.zeros(op.Np)
    xp64[:N] = x
    xh, xl = df_split(xp64)
    yh, yl = op.spmv_df64(jnp.asarray(xh), jnp.asarray(xl))
    y2 = np.asarray(yh, np.float64)[:N] + np.asarray(yl, np.float64)[:N]
    ref64 = A @ x.astype(np.float64)
    assert np.linalg.norm(y2 - ref64) / np.linalg.norm(ref64) < 1e-12
    assert op.df64_ready


def test_capped_sell_solver_and_auto(rng):
    """The capped operator drops into every solver path: pipelined-fused,
    pipelined-df64, and precision auto-escalation."""
    from acg_tpu.core.sell import CappedSellOperator
    from acg_tpu.solvers.auto import solve_auto

    A = random_spd(600, 12, rng) / 3.0
    N = A.shape[0]
    op = CappedSellOperator.from_csr(A, cap=8, keep_lo=True)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-5, check_every=4)
    x1, i1 = solve(op, b, opt=opt, method="pipelined-fused")
    assert i1.converged and np.linalg.norm(x1 - xstar) < 1e-3
    x2, i2 = solve(op, b, opt=opt, method="pipelined-df64")
    assert i2.converged and np.linalg.norm(x2 - xstar) < 1e-3
    opt8 = CGOptions(max_iterations=2000, residual_rtol=1e-8, check_every=4)
    x3, i3 = solve_auto(op, b, opt=opt8)
    assert i3.converged
    assert np.linalg.norm(b - A @ x3) < 1e-8 * np.linalg.norm(b) * 2


def test_capped_sell_no_tail_when_cap_large(rng):
    from acg_tpu.core.sell import CappedSellOperator

    A = random_spd(300, 4, rng)
    op = CappedSellOperator.from_csr(A, cap=1024)
    assert op.tail is None
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:A.shape[0]].set(jnp.asarray(x))
    y = np.asarray(op.spmv(xp))[:A.shape[0]]
    assert np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x) < 1e-5


def test_scatter_regime_fails_fast(rng):
    """Matrices with no column locality (random scatter) explode the
    chunked-gather layout; both builders must refuse with a sized
    MemoryError BEFORE allocating slabs (measured boundary: a Chung-Lu
    power-law graph projects fill 0.002 / 20 GB, BENCHMARKS.md), and
    capping must not mask it (the cap fixes run length, not chunk
    scatter)."""
    import scipy.sparse as sp

    from acg_tpu.core.sell import CappedSellOperator, SellOperator

    n, deg = 4096, 8
    r = np.repeat(np.arange(n, dtype=np.int64), deg)
    c = rng.integers(0, n, size=n * deg)
    keep = r != c
    G = sp.coo_matrix((np.ones(keep.sum()), (r[keep], c[keep])),
                      shape=(n, n))
    A = ((G + G.T) > 0).astype(np.float64).tocsr()
    A = A + sp.diags(np.full(n, deg + 1.0))
    cap_bytes = 2 * 1024 * 1024
    with pytest.raises(MemoryError, match="slots"):
        SellOperator.from_csr(A, max_stored_bytes=cap_bytes)
    with pytest.raises(MemoryError, match="slots"):
        CappedSellOperator.from_csr(A, cap=8, max_stored_bytes=cap_bytes)
