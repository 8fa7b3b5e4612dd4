"""Precision auto-escalation (solvers/auto.py): f32 fast path with a
df64 restart when the tolerance demands it — the reference's f64
convergence semantics (acg-cuda.c:489-530 defaults) at fast-path cost."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
from acg_tpu.solvers.auto import F32_RTOL_FLOOR, solve_auto
from acg_tpu.solvers.cg import CGOptions, solve


@pytest.fixture
def system(rng):
    offsets, vals = poisson2d_dia(16)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    op64 = DiaOperator.from_arrays(offsets, vals, dtype=np.float64,
                                   pad_to=128)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    return A, op64, xstar, A @ xstar


def test_loose_tolerance_stays_f32(system):
    """rtol above the floor: single f32 stage, no df64 cost."""
    A, op64, xstar, b = system
    opt = CGOptions(max_iterations=500, residual_rtol=1e-3)
    x, info = solve_auto(op64, b, opt=opt)
    assert info.converged
    assert x.dtype == np.float64
    # f32-stage accuracy only
    assert np.linalg.norm(x - xstar) < 1e-2


def test_tight_tolerance_escalates_to_df64(system):
    """rtol below the f32 floor: the df64 restart must reach it, with a
    total iteration count comparable to a pure f64 solve."""
    A, op64, xstar, b = system
    # rtol 1e-8: far below the f32 floor, above the CPU-jit df64 floor
    # (XLA:CPU's excess-precision simplifier weakens the EFTs — CLAUDE.md;
    # on TPU the df64 path reaches f64-identical convergence)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-8)
    x, info = solve_auto(op64, b, opt=opt)
    assert info.converged
    rnrm = np.linalg.norm(b - A @ x)
    # the solver guarantees its internal recurrence residual; the
    # true residual may lag by a small drift factor (pipelined recurrences
    # + the CPU-jit EFT weakening)
    assert rnrm < 1e-8 * np.linalg.norm(b) * 2
    assert np.linalg.norm(x - xstar) < 1e-5
    _, i64 = solve(op64, b, opt=opt, method="pipelined")
    # warm restart wastes a few iterations rebuilding the Krylov space
    assert info.niterations <= i64.niterations + 25


def test_atol_criterion_escalates(system):
    A, op64, xstar, b = system
    bnrm = np.linalg.norm(b)
    opt = CGOptions(max_iterations=1000, residual_rtol=0.0,
                    residual_atol=1e-8 * bnrm)
    x, info = solve_auto(op64, b, opt=opt)
    assert info.converged
    assert np.linalg.norm(b - A @ x) < 1e-8 * bnrm * 2


def test_rejects_diff_criteria(system):
    _, op64, _, b = system
    with pytest.raises(ValueError, match="residual-based"):
        solve_auto(op64, b, opt=CGOptions(max_iterations=5, diff_atol=1e-3))


def test_floor_boundary_no_escalation(system):
    """rtol exactly at the floor: f32 stage handles it alone."""
    A, op64, xstar, b = system
    opt = CGOptions(max_iterations=1000, residual_rtol=F32_RTOL_FLOOR)
    x, info = solve_auto(op64, b, opt=opt)
    assert info.converged
    assert np.linalg.norm(b - A @ x) <= F32_RTOL_FLOOR * np.linalg.norm(b) * 1.1


def test_cli_acg_auto(tmp_path, capsys):
    from acg_tpu.cli import main as cli_main
    from acg_tpu.io import write_mtx
    from acg_tpu.io.generators import poisson2d_mtx

    p = tmp_path / "A.mtx"
    write_mtx(p, poisson2d_mtx(12))
    rc = cli_main.main([str(p), "--manufactured-solution",
                        "--solver", "acg-auto", "--max-iterations", "500",
                        "--residual-rtol", "1e-8", "--warmup", "0"])
    assert rc == 0
    err = capsys.readouterr().err
    val = float(err.split(
        "manufactured solution error 2-norm: ")[1].splitlines()[0])
    assert val < 1e-7


def test_auto_sell_operator(rng):
    """A keep_lo SELL operator serves BOTH stages: f32 fast path on the
    hi slabs, df64 restart using the rounding-residual slabs — precision
    auto-escalation for unstructured matrices (the reference's headline
    use case runs f64 end to end, acg-cuda.c:489-530)."""
    from acg_tpu.core.sell import SellOperator
    from test_unstructured import random_spd

    A = random_spd(600, 5, rng) / 3.0         # inexact in f32
    N = A.shape[0]
    op = SellOperator.from_csr(A, keep_lo=True)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    # loose: stays f32 (niterations == the single f32 stage)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-3, check_every=4)
    x, info = solve_auto(op, b, opt=opt)
    assert info.converged
    # tight: escalates, df64 restart reaches 1e-8 true residual
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-8, check_every=4)
    x, info = solve_auto(op, b, opt=opt)
    assert info.converged
    rnrm = np.linalg.norm(b - A @ x)
    assert rnrm < 1e-8 * np.linalg.norm(b) * 2
    assert np.linalg.norm(x - xstar) < 1e-6


def test_auto_sell_requires_keep_lo(rng):
    """Without the keep_lo build the matrix would silently round to f32
    in the df64 stage — both solve_auto and the direct pipelined-df64
    dispatch must refuse."""
    from acg_tpu.core.sell import SellOperator
    from test_unstructured import random_spd

    A = random_spd(300, 5, rng) / 3.0
    op = SellOperator.from_csr(A)             # no keep_lo
    b = np.ones(A.shape[0])
    with pytest.raises(ValueError, match="keep_lo"):
        solve_auto(op, b, opt=CGOptions(max_iterations=10,
                                        residual_rtol=1e-8))
    with pytest.raises(ValueError, match="keep_lo"):
        solve(op, b, opt=CGOptions(max_iterations=10),
              method="pipelined-df64")


# ---------------------------------------------------------------------------
# Round 5: plateau (stall) detection — an ill-conditioned system whose f32
# stage flatlines ABOVE the 1e-4 clamp must hand over to the f64 stage
# early instead of spinning to max_iterations.  The reference sidesteps
# the problem by always computing f64 (acg-cuda.c:489-530); the fast path
# needs the detector.


def _illconditioned_system(rng, n=24, decades=2):
    """Symmetric diagonal scaling D·A·D of the 2-D Poisson operator:
    SPD and DIA structure preserved, condition number boosted to
    ~1.5e5 (measured, decades=2) — high enough that f32 pipelined CG
    plateaus in >50-iteration stretches well above 1e-4 relative."""
    offsets, vals = poisson2d_dia(n)
    offsets = [int(o) for o in offsets]
    N = vals.shape[1]
    d = np.logspace(0, decades, N)
    rng.shuffle(d)
    vals2 = vals.astype(np.float64).copy()
    for k, o in enumerate(offsets):
        if o > 0:
            vals2[k, :N - o] *= d[:N - o] * d[o:]
        elif o < 0:
            vals2[k, -o:] *= d[-o:] * d[:o]
        else:
            vals2[k] *= d * d
    ri, ci, a, _ = dia_to_coo(offsets, vals2)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    return A, np.array(offsets), vals2, xstar, A @ xstar


def test_f32_stall_detection(rng):
    """Direct detector check: an unreachable tolerance with stall_iters
    set halts early with stalled=True instead of running to the cap."""
    A, offsets, vals2, xstar, b = _illconditioned_system(rng)
    op32 = DiaOperator.from_arrays(offsets, vals2, dtype=np.float32,
                                   backend="pallas")
    opt = CGOptions(max_iterations=4000, residual_rtol=1e-12,
                    dot_dtype="mixed", stall_iters=50)
    x, info = solve(op32, b, opt=opt, method="pipelined-fused")
    assert info.stalled
    assert not info.converged
    assert info.niterations < 1000          # measured: halts around 306
    # the stalled iterate still carries the progress made so far
    assert info.rnrm2 < 1e-2 * info.bnrm2


def test_stall_disabled_by_default(system):
    """stall_iters=0 (the default) must leave every protocol unchanged:
    the well-conditioned solve converges normally, stalled=False."""
    A, op64, xstar, b = system
    opt = CGOptions(max_iterations=500, residual_rtol=1e-6)
    x, info = solve(op64, b, opt=opt, method="pipelined")
    assert info.converged and not info.stalled


def test_auto_illconditioned_escalates_on_plateau(capsys):
    """End-to-end: the f32 stage stalls (does not spin to the 8000 cap),
    the f64 stage finishes from the stalled iterate, and the total
    iteration count stays near the scipy-f64 count (measured: 1052 vs
    805 — a warm restart on an ill-conditioned system loses some Krylov
    history).  method64="pipelined" (true-f64 XLA) because CPU-jit
    weakens the df64 EFTs (CLAUDE.md); on TPU the default df64 stage
    behaves like f64.  Fixed seed: whether the f32 stage stalls or limps
    to the 1e-4 clamp first is seed-dependent near the boundary, and the
    test pins the measured stalling instance (306 f32 iters)."""
    from scipy.sparse.linalg import cg as scipy_cg

    A, offsets, vals2, xstar, b = _illconditioned_system(
        np.random.default_rng(0))
    op64 = DiaOperator.from_arrays(offsets, vals2, dtype=np.float64,
                                   backend="xla")
    cnt = [0]
    scipy_cg(A, b, rtol=1e-6, atol=0.0, maxiter=20000,
             callback=lambda xk: cnt.__setitem__(0, cnt[0] + 1))
    opt = CGOptions(max_iterations=8000, residual_rtol=1e-6)
    x, info = solve_auto(op64, b, opt=opt, method64="pipelined",
                         verbose=True)
    out = capsys.readouterr().out
    assert "stalled at its floor" in out     # stage 1 exited on the detector
    assert info.converged
    assert np.linalg.norm(b - A @ x) < 1e-6 * np.linalg.norm(b) * 1.5
    assert info.niterations <= 2 * cnt[0]    # near the pure-f64 count


# ---------------------------------------------------------------------------
# Round 4: distributed auto-escalation (solve_auto_dist / _stencil) — the
# reference's headline protocol is multi-device at rtol 1e-6
# (scripts/mpi_combined.sh:57-58), exactly where escalation pays.


def _dist_system(rng, n=16):
    from acg_tpu.partition.graph import build_partitioned_matrix
    from acg_tpu.partition.partitioner import partition_bfs_recursive
    offsets, vals = poisson2d_dia(n)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    part = partition_bfs_recursive(A.indptr, A.indices, 8, seed=0)
    pm = build_partitioned_matrix(A, part)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    return A, pm, xstar, A @ xstar, offsets, vals


def test_auto_dist_escalates(rng):
    from acg_tpu.solvers.auto import solve_auto_dist
    A, pm, xstar, b, _, _ = _dist_system(rng)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-8)
    x, info = solve_auto_dist(pm, b, opt=opt)
    assert info.converged
    rnrm = np.linalg.norm(b - A @ x)
    assert rnrm < 1e-8 * np.linalg.norm(b) * 2
    assert np.linalg.norm(x - xstar) < 1e-5
    # iteration parity with a pure-f64 distributed solve (warm restart
    # may waste a few iterations rebuilding the Krylov space)
    from acg_tpu.solvers.dist_cg import solve_dist_general
    _, i64 = solve_dist_general(pm, b, opt=opt, method="pipelined")
    assert info.niterations <= i64.niterations + 25


def test_auto_dist_loose_stays_f32(rng):
    from acg_tpu.solvers.auto import solve_auto_dist
    A, pm, xstar, b, _, _ = _dist_system(rng)
    opt = CGOptions(max_iterations=500, residual_rtol=1e-3)
    x, info = solve_auto_dist(pm, b, opt=opt)
    assert info.converged
    assert x.dtype == np.float64
    assert np.linalg.norm(x - xstar) < 1e-2


def test_auto_dist_keep_lo_guard(rng):
    """An escalating tolerance with a non-keep_lo prebuilt operator is
    rejected up front instead of silently rounding the matrix to f32."""
    from acg_tpu.parallel.dist_sell import build_dist_sell
    from acg_tpu.solvers.auto import solve_auto_dist
    A, pm, xstar, b, _, _ = _dist_system(rng)
    dso = build_dist_sell(pm)    # not a keep_lo build: df64_ready=False
    assert not dso.df64_ready
    opt = CGOptions(max_iterations=10, residual_rtol=1e-8)
    with pytest.raises(ValueError, match="keep_lo"):
        solve_auto_dist(pm, b, opt=opt, sell_op=dso)


def test_auto_dist_stencil_escalates(rng):
    from acg_tpu.solvers.auto import solve_auto_dist_stencil
    A, pm, xstar, b, offsets, vals = _dist_system(rng)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-8)
    x, info = solve_auto_dist_stencil(offsets, vals, b, nparts=8, opt=opt)
    assert info.converged
    rnrm = np.linalg.norm(b - A @ x)
    assert rnrm < 1e-8 * np.linalg.norm(b) * 2
    assert np.linalg.norm(x - xstar) < 1e-5


def test_stall_with_check_every_blocks(rng):
    """Stall detection composes with blocked convergence checks: the
    loop exits at a block boundary, iterations inside the block freeze,
    and the result is still a detected stall."""
    A, offsets, vals2, xstar, b = _illconditioned_system(rng)
    op32 = DiaOperator.from_arrays(offsets, vals2, dtype=np.float32,
                                   backend="pallas")
    opt = CGOptions(max_iterations=4000, residual_rtol=1e-12,
                    dot_dtype="mixed", stall_iters=50, check_every=16)
    x, info = solve(op32, b, opt=opt, method="pipelined-fused")
    assert info.stalled and not info.converged
    assert info.niterations < 1000


def test_stall_ratio_zero_never_improves(system):
    """stall_ratio = 0 means no iteration can count as improvement
    (γ ≥ 0 can never drop below 0·best), so the loop halts after
    exactly stall_iters iterations — a pin of the detector arithmetic."""
    A, op64, xstar, b = system
    opt = CGOptions(max_iterations=400, residual_rtol=1e-12,
                    stall_iters=7, stall_ratio=0.0)
    x, info = solve(op64, b, opt=opt, method="pipelined")
    assert info.stalled
    assert info.niterations == 7
