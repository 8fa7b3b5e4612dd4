"""Column-paneled SELL operator — lifts the VMEM x-residency cap.

The reference's merge-CSR kernel streams x from global memory and has no
row-count cap (cg-kernels-cuda.cu:358-441); the TPU analogue is column
paneling (core/sell.py PaneledSellOperator).  Tests shrink MAX_VMEM_ROWS /
PANEL_COLS so small matrices exercise the paneled path on CPU."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import acg_tpu.core.sell as sell_mod
from acg_tpu.core.sell import (PaneledSellOperator, SellOperator,
                               sell_from_csr)
from acg_tpu.solvers.cg import CGOptions, solve

from test_unstructured import random_spd


@pytest.fixture
def small_panels(monkeypatch):
    """Force paneling on test-sized matrices: x 'fits VMEM' only up to
    1024 columns, panels are 1024 wide."""
    monkeypatch.setattr(sell_mod, "MAX_VMEM_ROWS", 1024)
    monkeypatch.setattr(sell_mod, "PANEL_COLS", 1024)


def spmv_host(op, x: np.ndarray) -> np.ndarray:
    xp = jnp.zeros((op.Np,), op.dtype).at[:len(x)].set(
        jnp.asarray(x, op.dtype))
    return np.asarray(op.spmv(xp))[:op.N]


def test_paneled_dispatch(small_panels, rng):
    A = random_spd(500, 5, rng)
    assert isinstance(sell_from_csr(A), SellOperator)   # fits: unpaneled
    B = random_spd(3000, 5, rng)
    op = sell_from_csr(B)
    assert isinstance(op, PaneledSellOperator)
    assert len(op.panels) == 3
    assert op.nnz_true == B.nnz


def test_paneled_spmv_matches_scipy(small_panels, rng):
    A = random_spd(3000, 6, rng)        # shuffled: tiles hit all panels
    op = sell_from_csr(A, dtype=np.float32)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = spmv_host(op, x)
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_paneled_banded_skips_foreign_tiles(small_panels, rng):
    """A banded matrix touches ~1 panel per tile: each panel's
    sub-operator must cover only its own tiles (the waste the subset
    design removes), and the SpMV must still be exact."""
    N = 3000
    diags = [rng.standard_normal(N) for _ in range(5)]
    A = sp.diags(diags, [-40, -1, 0, 1, 40], shape=(N, N)).tocsr()
    A = (A + A.T + 20.0 * sp.eye(N)).tocsr()
    op = sell_from_csr(A, dtype=np.float32)
    total_tiles = sum(int(t.shape[0]) for t in op.panel_tiles)
    # 24 tiles, 3 panels; band half-width 40 << 128 so at most one
    # boundary tile is shared per panel seam
    assert total_tiles <= op.ntiles + 2 * (len(op.panels) - 1)
    x = rng.standard_normal(N).astype(np.float32)
    y = spmv_host(op, x)
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_paneled_nonmultiple_n_and_empty_panel(small_panels, rng):
    """N far from a tile multiple, plus a matrix whose middle panel is
    structurally empty (those columns never referenced)."""
    N = 2900
    rows = np.arange(N)
    # entries only in columns [0, 1024) and [2048, N): panel 1 is empty
    far = np.where(rows % 2 == 0, rows % 1024, 2048 + rows % (N - 2048))
    B = sp.csr_matrix((np.full(N, 0.5), (rows, far)), shape=(N, N))
    A = (B + B.T + 10.0 * sp.eye(N)).tocsr()
    op = sell_from_csr(A, dtype=np.float32)
    assert isinstance(op, PaneledSellOperator)
    assert len(op.panels) < 3 or all(
        p.nnz_true > 0 for p in op.panels)
    x = rng.standard_normal(N).astype(np.float32)
    y = spmv_host(op, x)
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_paneled_cg_solve(small_panels, rng):
    A = random_spd(2500, 5, rng)
    N = A.shape[0]
    op = sell_from_csr(A, dtype=np.float64)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=4000, residual_rtol=1e-10)
    x, info = solve(op, b, opt=opt, method="pipelined")
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-6


def test_paneled_slot_total_close_to_unpaneled(small_panels, rng):
    """Every chunk lands in exactly one panel, so paneling only adds
    bucket-padding variance — stored slots stay within 2x (typically
    ~1x) of the unpaneled layout of the same matrix."""
    A = random_spd(2000, 6, rng)
    op_p = sell_from_csr(A, dtype=np.float32)
    sell_mod_max = sell_mod.MAX_VMEM_ROWS
    try:
        sell_mod.MAX_VMEM_ROWS = 3_000_000
        op_u = SellOperator.from_csr(A, dtype=np.float32)
    finally:
        sell_mod.MAX_VMEM_ROWS = sell_mod_max
    assert op_p.nnz <= 2 * op_u.nnz


# ---------------------------------------------------------------------------
# Round 4: keep_lo / df64 for paneled operators — the single-chip
# f64-parity path at Config-5 size (the reference computes f64 end-to-end
# at any size by default, acg-cuda.c:489-530)


@pytest.fixture
def small_panels_df(monkeypatch):
    monkeypatch.setattr(sell_mod, "MAX_VMEM_ROWS", 1024)
    monkeypatch.setattr(sell_mod, "PANEL_COLS", 1024)
    monkeypatch.setattr(sell_mod, "PANEL_COLS_DF64", 512)


def test_paneled_keep_lo_spmv_df64(small_panels_df, rng):
    """Paneled df64 SpMV reproduces the f64 product on a matrix whose
    entries are NOT f32-exact (lo slabs carry real residuals)."""
    A = random_spd(3000, 6, rng)
    A.data *= np.pi              # not f32-representable
    op = sell_from_csr(A, keep_lo=True)
    assert isinstance(op, PaneledSellOperator)
    assert op.df64_ready and op.vals_lo is not None
    x = rng.standard_normal(A.shape[0])
    xh = x.astype(np.float32)
    xl = (x - xh.astype(np.float64)).astype(np.float32)
    Np = op.Np
    pad = lambda v: jnp.zeros((Np,), jnp.float32).at[:len(v)].set(
        jnp.asarray(v))
    yh, yl = op.spmv_df64(pad(xh), pad(xl))
    y = np.asarray(yh, np.float64)[:op.N] + np.asarray(yl, np.float64)[:op.N]
    ref = A @ x
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    # df64 SpMV accuracy ~2^-48; f32 alone would be ~1e-7
    assert rel < 1e-12, rel


def test_paneled_keep_lo_exact_matrix(small_panels_df, rng):
    """f32-exact entries: no lo slabs, still df64_ready."""
    A = random_spd(2000, 5, rng)
    A.data = A.data.astype(np.float32).astype(np.float64)
    op = sell_from_csr(A, keep_lo=True)
    assert isinstance(op, PaneledSellOperator)
    assert op.df64_ready and op.vals_lo is None


def test_paneled_df64_solve(small_panels_df, rng):
    """pipelined-df64 end-to-end on a paneled operator (solve() accepts
    it: spmv_df64 + df64_ready)."""
    A = random_spd(2500, 5, rng)
    A.data *= np.pi
    op = sell_from_csr(A, keep_lo=True)
    assert isinstance(op, PaneledSellOperator)
    xstar = rng.standard_normal(A.shape[0])
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    # rtol 1e-6 is the reference protocol tolerance (mpi_combined.sh:57);
    # CPU-jit weakens the EFTs (CLAUDE.md) so the CPU test stops here —
    # the TPU validation runs tighter
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-6)
    x, info = solve(op, b, opt=opt, method="pipelined-df64")
    assert info.converged
    assert np.linalg.norm(b - A @ x) < 2e-6 * np.linalg.norm(b)


def test_paneled_auto_escalation(small_panels_df, rng):
    """solve_auto on a paneled keep_lo operator: one operator serves the
    f32 stage and the df64 restart (the Config-5 single-chip protocol)."""
    from acg_tpu.solvers.auto import solve_auto
    A = random_spd(2500, 5, rng)
    A.data *= np.pi
    op = sell_from_csr(A, keep_lo=True)
    assert isinstance(op, PaneledSellOperator)
    xstar = rng.standard_normal(A.shape[0])
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-6)
    x, info = solve_auto(op, b, opt=opt)
    assert info.converged
    assert np.linalg.norm(b - A @ x) < 2e-6 * np.linalg.norm(b)


def test_paneled_cap_still_rejected(small_panels_df, rng):
    A = random_spd(3000, 5, rng)
    with pytest.raises(NotImplementedError, match="cap"):
        sell_from_csr(A, cap=8)
