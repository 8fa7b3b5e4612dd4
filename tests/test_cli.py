"""CLI driver tests (acg-cuda.c interface parity)."""

import numpy as np
import pytest

from acg_tpu.cli import main as cli_main
from acg_tpu.cli import mtx2bin as cli_mtx2bin
from acg_tpu.cli import mtxpartition as cli_mtxpartition
from acg_tpu.cli import poisson as cli_poisson
from acg_tpu.io import read_mtx, read_partition, write_mtx
from acg_tpu.io.generators import poisson2d_mtx


@pytest.fixture
def matrix_file(tmp_path):
    p = tmp_path / "A.mtx"
    write_mtx(p, poisson2d_mtx(12))
    return p


def test_solve_manufactured(matrix_file, tmp_path, capsys):
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--max-iterations", "500", "--residual-rtol", "1e-8",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "manufactured solution error 2-norm:" in err
    assert "residual 2-norm:" in err
    x = read_mtx(out).to_dense_vector()
    assert x.shape == (144,)


@pytest.mark.parametrize("solver", ["acg-pipelined", "acg-host", "scipy", "petsc"])
def test_solver_variants(matrix_file, tmp_path, solver, capsys):
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--solver", solver, "--max-iterations", "500",
                        "--residual-rtol", "1e-8", "--warmup", "0",
                        "-o", str(out)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "manufactured solution error 2-norm: " in err
    val = float(err.split("manufactured solution error 2-norm: ")[1].splitlines()[0])
    assert val < 1e-5


def test_distributed_solve(matrix_file, tmp_path, capsys):
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--nparts", "4", "--comm", "xla",
                        "--max-iterations", "500", "--residual-rtol", "1e-8",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0
    val = float(capsys.readouterr().err.split(
        "manufactured solution error 2-norm: ")[1].splitlines()[0])
    assert val < 1e-5


def test_distributed_sell_solve(matrix_file, tmp_path, capsys):
    """--format sell with --nparts runs the distributed chunked-gather
    operator (f32 storage)."""
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--nparts", "4", "--comm", "xla",
                        "--format", "sell", "--dtype", "float32",
                        "--partition-method", "bfs",
                        "--max-iterations", "500", "--residual-rtol", "1e-6",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0
    val = float(capsys.readouterr().err.split(
        "manufactured solution error 2-norm: ")[1].splitlines()[0])
    assert val < 1e-4


def test_distributed_sell_rejects_f64(matrix_file, capsys):
    with pytest.raises(SystemExit):
        cli_main.main([str(matrix_file), "--manufactured-solution",
                       "--nparts", "4", "--format", "sell",
                       "--partition-method", "bfs", "--warmup", "0"])
    assert "float32" in capsys.readouterr().err


def test_distributed_with_partition_file(matrix_file, tmp_path, capsys):
    part_file = tmp_path / "part.mtx"
    with open(part_file, "wb") as f:
        rc = _run_redirect(cli_mtxpartition.main,
                           [str(matrix_file), "--parts", "4", "-o", str(part_file)])
    part = read_partition(part_file)
    assert part.max() == 3 and len(part) == 144
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--nparts", "4", "--partition", str(part_file),
                        "--max-iterations", "500", "--residual-rtol", "1e-8",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0


def _run_redirect(fn, argv):
    return fn(argv)


def test_mtx2bin_roundtrip(matrix_file, tmp_path):
    binf = tmp_path / "A.bin"
    rc = cli_mtx2bin.main([str(matrix_file), str(binf)])
    assert rc == 0
    m = read_mtx(binf, binary=True)
    m0 = read_mtx(matrix_file)
    np.testing.assert_array_equal(m.rowidx, m0.rowidx)
    np.testing.assert_allclose(m.data, m0.data)


def test_binary_input_solve(matrix_file, tmp_path, capsys):
    binf = tmp_path / "A.bin"
    cli_mtx2bin.main([str(matrix_file), str(binf)])
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(binf), "--binary", "--manufactured-solution",
                        "--max-iterations", "500", "--residual-rtol", "1e-8",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0


def test_poisson_generator_cli(tmp_path):
    out = tmp_path / "p.mtx"
    rc = cli_poisson.main(["-n", "8", "--dim", "3", "--stencil", "27",
                           "-o", str(out)])
    assert rc == 0
    m = read_mtx(out)
    assert m.nrows == 512


def test_rhs_file_and_x0(matrix_file, tmp_path, capsys):
    from acg_tpu.io import vector_to_mtx
    rng = np.random.default_rng(0)
    b = rng.standard_normal(144)
    bf = tmp_path / "b.mtx"
    write_mtx(bf, vector_to_mtx(b))
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), str(bf), "--max-iterations", "500",
                        "--residual-rtol", "1e-9", "--warmup", "0",
                        "-o", str(out)])
    assert rc == 0
    # verify Ax ≈ b via scipy
    import scipy.sparse as sp
    from acg_tpu.core.csr import SymCSRMatrix
    A = SymCSRMatrix.from_mtx(read_mtx(matrix_file)).to_scipy_full()
    x = read_mtx(out).to_dense_vector()
    assert np.linalg.norm(A @ x - b) <= 1e-8 * np.linalg.norm(b)


def test_not_converged_exit_code(matrix_file, tmp_path):
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--max-iterations", "2", "--residual-rtol", "1e-14",
                        "--warmup", "0", "-q"])
    assert rc == 2


def test_epsilon_shift(matrix_file, tmp_path, capsys):
    # big diagonal shift: much better conditioning, fewer iterations
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--epsilon", "100.0",
                        "--max-iterations", "500", "--residual-rtol", "1e-9",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0
    err = capsys.readouterr().err
    iters = int(err.split("  iterations: ")[1].splitlines()[0])
    assert iters < 20


def test_comm_matrix_output(matrix_file, capsys, tmp_path):
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--nparts", "4",
                        "--partition-method", "bfs",
                        "--output-comm-matrix", "--max-iterations", "50",
                        "--residual-rtol", "1e-6", "--warmup", "0",
                        "-o", str(out)])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "%%MatrixMarket matrix coordinate integer general" in cap


def test_version(capsys):
    with pytest.raises(SystemExit) as e:
        cli_main.main(["--version"])
    assert e.value.code == 0


# ---------------------------------------------------------------------------
# Newer flags: solver aliases / kernels, precision modes, tracing


@pytest.mark.parametrize("solver", ["acg-device", "acg-device-pipelined",
                                    "acg-fused", "acg-df64"])
def test_solver_kernel_variants(matrix_file, tmp_path, solver):
    out = tmp_path / "x.mtx"
    args = [str(matrix_file), "--manufactured-solution", "--solver", solver,
            "--max-iterations", "1000", "--residual-rtol", "1e-5",
            "--warmup", "0", "-o", str(out)]
    if solver == "acg-fused":
        args += ["--dtype", "float32"]
    rc = cli_main.main(args)
    assert rc == 0
    assert read_mtx(out).to_dense_vector().shape == (144,)


def test_dtype_and_dot_dtype_modes(matrix_file, tmp_path):
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--solver", "acg-pipelined", "--dtype", "float32",
                        "--dot-dtype", "mixed", "--check-every", "5",
                        "--max-iterations", "1000", "--residual-rtol", "1e-5",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0


def test_fused_guards(matrix_file):
    with pytest.raises(SystemExit):
        cli_main.main([str(matrix_file), "--solver", "acg-df64",
                       "--dtype", "float32", "-q"])


def test_trace_flag_writes_profile(matrix_file, tmp_path):
    tdir = tmp_path / "trace"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--max-iterations", "20", "--warmup", "0",
                        "--trace", str(tdir), "-q"])
    assert rc in (0, 2)
    prof = list(tdir.glob("plugins/profile/*/*"))
    assert prof, "no profile artifacts written"


def test_reorder_nd(matrix_file, tmp_path):
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--reorder", "nd", "--format", "ell",
                        "--max-iterations", "800", "--residual-rtol", "1e-6",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0


@pytest.fixture
def unstructured_file(tmp_path):
    """A shuffled SPD matrix with far too many distinct diagonals for DIA
    (the SuiteSparse-style input of BASELINE config 5)."""
    import scipy.sparse as sp
    from acg_tpu.io.mtxfile import MtxFile

    rng = np.random.default_rng(5)
    n, deg = 300, 6
    i = rng.integers(0, n, n * deg)
    j = rng.integers(0, n, n * deg)
    keep = i != j
    i, j = i[keep], j[keep]
    W = sp.coo_matrix((rng.uniform(0.1, 1.0, i.size), (i, j)), shape=(n, n))
    W = (W + W.T).tocsr()
    A = sp.diags(np.asarray(W.sum(axis=1)).ravel() + 1.0) - W
    coo = sp.triu(A.tocsr()).tocoo()
    m = MtxFile(object="matrix", format="coordinate", field="real",
                symmetry="symmetric", nrows=n, ncols=n, nnz=coo.nnz,
                rowidx=coo.row.astype(np.int64),
                colidx=coo.col.astype(np.int64), data=coo.data)
    p = tmp_path / "U.mtx"
    write_mtx(p, m)
    return p


@pytest.mark.parametrize("fmt", ["sell", "auto"])
def test_format_sell_unstructured(unstructured_file, tmp_path, fmt, capsys):
    """--format sell (and auto's fallback when DIA can't band) solves an
    unstructured system through the chunked-gather path end to end."""
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(unstructured_file), "--manufactured-solution",
                        "--format", fmt, "--max-iterations", "2000",
                        "--residual-rtol", "1e-9", "--warmup", "0",
                        "-v", "-o", str(out)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "SELL layout" in err        # proves the sell path was taken
    val = float(err.split("manufactured solution error 2-norm: ")[1]
                .splitlines()[0])
    assert val < 1e-6


@pytest.mark.parametrize("solver", ["acg-df64", "acg-auto"])
def test_sell_df64_and_auto_solvers(unstructured_file, tmp_path, solver,
                                    capsys):
    """acg-df64 / acg-auto on the SELL format: the f64 matrix is carried
    as (hi, lo) f32 pairs (keep_lo slabs) with the cap-and-tail split —
    f64-quality convergence on an unstructured system through the CLI."""
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(unstructured_file), "--manufactured-solution",
                        "--format", "sell", "--solver", solver,
                        "--sell-cap", "8", "--max-iterations", "2000",
                        "--check-every", "4",
                        "--residual-rtol", "1e-7", "--warmup", "0",
                        "-v", "-o", str(out)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "SELL layout" in err
    val = float(err.split("manufactured solution error 2-norm: ")[1]
                .splitlines()[0])
    assert val < 1e-5


# ---------------------------------------------------------------------------
# Round 4: distributed fast solvers reachable from the driver
# (the reference dispatches every solver at every commsize,
# acg-cuda.c:2241-2262; previously acg-fused/df64/auto errored at nparts>1)


@pytest.mark.parametrize("solver,extra,rtol,errtol", [
    # error tolerances: rtol 1e-6 bounds the RESIDUAL; the error norm
    # carries the condition number (f32 recurrences for acg-fused)
    ("acg-fused", ["--dtype", "float32"], "1e-6", 1e-3),
    ("acg-df64", [], "1e-6", 1e-5),
    ("acg-auto", [], "1e-6", 5e-5),
])
def test_distributed_fast_solver_general(matrix_file, tmp_path, capsys,
                                         solver, extra, rtol, errtol):
    """General (BFS) partition -> distributed SELL kernel paths."""
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--solver", solver, "--nparts", "8",
                        "--partition-method", "bfs", "--format", "sell",
                        "--max-iterations", "1000", "--residual-rtol", rtol,
                        "--warmup", "0", "-o", str(out)] + extra)
    assert rc == 0
    val = float(capsys.readouterr().err.split(
        "manufactured solution error 2-norm: ")[1].splitlines()[0])
    assert val < errtol


@pytest.mark.parametrize("solver,extra", [
    ("acg-fused", ["--dtype", "float32"]),
    ("acg-df64", []),
    ("acg-auto", []),
])
def test_distributed_fast_solver_stencil(matrix_file, tmp_path, capsys,
                                         solver, extra):
    """DIA + contiguous partition -> the two-ppermute stencil fast path."""
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--solver", solver, "--nparts", "4",
                        "--max-iterations", "1000", "--residual-rtol", "1e-6",
                        "--warmup", "0", "-o", str(out)] + extra)
    assert rc == 0
    val = float(capsys.readouterr().err.split(
        "manufactured solution error 2-norm: ")[1].splitlines()[0])
    assert val < 1e-4


def test_distributed_fast_rejects_ell(matrix_file, capsys):
    with pytest.raises(SystemExit):
        cli_main.main([str(matrix_file), "--manufactured-solution",
                       "--solver", "acg-df64", "--nparts", "4",
                       "--format", "ell", "--warmup", "0"])
    assert "DIA or SELL" in capsys.readouterr().err


def test_scatter_regime_falls_back_to_ell(tmp_path, capsys, monkeypatch):
    """A legal SPD input in the scatter regime (Chung-Lu-style random
    graph Laplacian, no column locality) must SOLVE through the driver —
    the SELL fail-fast routes to the gather-ELL operator with a one-line
    note instead of a traceback (the reference's merge kernel runs any
    CSR, cg-kernels-cuda.cu:312-441).  The VMEM budget is shrunk so a
    test-sized matrix crosses the fail-fast boundary."""
    import scipy.sparse as sp

    import acg_tpu.core.sell as sell_mod
    from acg_tpu.io import vector_to_mtx
    from acg_tpu.io.mtxfile import MtxFile

    rng = np.random.default_rng(3)
    n, deg = 4096, 8
    w = (np.arange(1, n + 1, dtype=np.float64)) ** -0.7   # power-law weights
    p_ = w / w.sum()
    r = rng.choice(n, size=n * deg, p=p_)
    c = rng.integers(0, n, size=n * deg)
    keep = r != c
    G = sp.coo_matrix((np.ones(keep.sum()), (r[keep], c[keep])), shape=(n, n))
    Adj = ((G + G.T) > 0).astype(np.float64).tocsr()
    A = (sp.diags(np.asarray(Adj.sum(axis=1)).ravel() + 1.0) - Adj).tocoo()
    upper = A.row <= A.col
    m = MtxFile(object="matrix", format="coordinate", field="real",
                symmetry="symmetric", nrows=n, ncols=n,
                nnz=int(upper.sum()),
                rowidx=A.row[upper].astype(np.int64),
                colidx=A.col[upper].astype(np.int64),
                data=A.data[upper])
    f = tmp_path / "chunglu.mtx"
    write_mtx(f, m)

    monkeypatch.setattr(sell_mod, "VMEM_BYTES", 64 * 1024)
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(f), "--manufactured-solution",
                        "--format", "sell", "--dtype", "float32",
                        "--max-iterations", "50", "--residual-rtol", "1e-6",
                        "--warmup", "0", "-o", str(out)])
    assert rc in (0, 2), rc
    err = capsys.readouterr().err
    assert "falling back to the gather-ELL operator" in err


def test_sell_heavy_flag_solves(tmp_path, capsys):
    """--sell-heavy routes a mesh with interleaved heavy-local rows
    through the HeavySplitOperator and still solves correctly."""
    import scipy.sparse as sp

    from acg_tpu.io.mtxfile import MtxFile

    N = 1500
    A = sp.diags([np.full(N, 4.0), np.full(N - 1, -1.0),
                  np.full(N - 1, -1.0)], [0, -1, 1], format="lil")
    for r in (100, 700):
        cols = np.arange(r, min(r + 600, N))
        A[r, cols] = 0.01
        A[cols, r] = 0.01
        A[r, r] = 50.0
    A = sp.csr_matrix(A).tocoo()
    up = A.row <= A.col
    m = MtxFile(object="matrix", format="coordinate", field="real",
                symmetry="symmetric", nrows=N, ncols=N, nnz=int(up.sum()),
                rowidx=A.row[up].astype(np.int64),
                colidx=A.col[up].astype(np.int64), data=A.data[up])
    f = tmp_path / "heavy.mtx"
    write_mtx(f, m)
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(f), "--manufactured-solution",
                        "--format", "sell", "--sell-heavy",
                        "--dtype", "float32", "--dot-dtype", "mixed",
                        "--max-iterations", "2000",
                        "--residual-rtol", "1e-5",
                        "--warmup", "0", "-o", str(out)])
    assert rc == 0
    val = float(capsys.readouterr().err.split(
        "manufactured solution error 2-norm: ")[1].splitlines()[0])
    assert val < 1e-2


# ---------------------------------------------------------------------------
# Round 5: heavy-segment auto-detection (no flag) — the reference needs no
# flag to be load-balanced (merge-CSR by construction,
# cg-kernels-cuda.cu:312-441), so neither does the driver under
# --format auto.  Measured basis: run-tail split 2.67 → 8.71 Gnnz/s
# (BENCHMARKS.md).


@pytest.fixture
def heavy_file(tmp_path):
    """Mesh + two long-run rows: >512 distinct diagonals (DIA gives up,
    auto falls to SELL) and qualifying dense window segments."""
    import scipy.sparse as sp
    from acg_tpu.io.mtxfile import MtxFile

    rng = np.random.default_rng(9)
    n, run = 1500, 600
    A = sp.diags([np.ones(n), 0.1 * np.ones(n), 0.1 * np.ones(n)],
                 [0, 1, -1], shape=(n, n)).tolil()
    for r in (100, 800):
        v = 0.01 * rng.standard_normal(run)
        A[r, r:r + run] = v
        A[r:r + run, r] = v
    A = A.tocsr()
    A = (A + sp.diags(np.abs(A).sum(axis=1).A1)).tocsr()
    coo = sp.triu(A).tocoo()
    m = MtxFile(object="matrix", format="coordinate", field="real",
                symmetry="symmetric", nrows=n, ncols=n, nnz=coo.nnz,
                rowidx=coo.row.astype(np.int64),
                colidx=coo.col.astype(np.int64), data=coo.data)
    p = tmp_path / "H.mtx"
    write_mtx(p, m)
    return p


def test_format_auto_heavy_no_flag(heavy_file, tmp_path, capsys):
    """--format auto takes the run-tail split with NO --sell-heavy flag
    on a heavy-regime matrix (f32 fast path: the run-tail kernel stores
    f32 slabs, so the auto gate is dtype-aware — the default-f64 classic
    path keeps reference semantics unchanged)."""
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(heavy_file), "--manufactured-solution",
                        "--solver", "acg-fused", "--dtype", "float32",
                        "--max-iterations", "500", "--residual-rtol",
                        "1e-6", "--warmup", "0", "-v", "-o", str(out)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "run-tail" in err            # the split path, not plain SELL
    val = float(err.split("manufactured solution error 2-norm: ")[1]
                .splitlines()[0])
    assert val < 1e-4


def test_format_auto_uniform_mesh_unchanged(unstructured_file, capsys):
    """A matrix with no qualifying segments builds the plain layout
    under auto — detection is the gate, no behavior change."""
    rc = cli_main.main([str(unstructured_file), "--manufactured-solution",
                        "--max-iterations", "2000", "--residual-rtol",
                        "1e-6", "--warmup", "0", "-v"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "SELL layout" in err
    assert "run-tail" not in err


def test_cli_heavy_df64(heavy_file, tmp_path, capsys):
    """acg-df64 --sell-heavy: f64-quality convergence on a heavy matrix
    through the keep_lo run-tail split (VERDICT round-4 gap: this
    combination silently built the fill-poisoned plain layout)."""
    out = tmp_path / "x.mtx"
    rc = cli_main.main([str(heavy_file), "--manufactured-solution",
                        "--solver", "acg-df64", "--sell-heavy",
                        "--format", "sell",
                        "--max-iterations", "500", "--check-every", "4",
                        "--residual-rtol", "1e-7", "--warmup", "0",
                        "-v", "-o", str(out)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "run-tail" in err
    # the stats report must handle multi-bucket SELL operators (the
    # per-bucket slab tuple is inhomogeneous for np.asarray — regression
    # guard for the op.dtype fix in solvers/stats.py)
    assert "stats unavailable" not in err
    val = float(err.split("manufactured solution error 2-norm: ")[1]
                .splitlines()[0])
    assert val < 1e-5


def test_cli_dist_heavy_fused(heavy_file, capsys):
    """acg-fused --nparts 4 on the heavy matrix: the distributed SELL
    layout builds per-part run-tails under auto detection."""
    rc = cli_main.main([str(heavy_file), "--manufactured-solution",
                        "--solver", "acg-fused", "--dtype", "float32",
                        "--nparts", "4", "--partition-method", "contiguous",
                        "--max-iterations", "500", "--residual-rtol",
                        "1e-5", "--warmup", "0", "-v"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "run-tail" in err
    val = float(err.split("manufactured solution error 2-norm: ")[1]
                .splitlines()[0])
    assert val < 1e-3


def test_comm_xla_forces_dist_at_nparts1(matrix_file, capsys):
    """--comm xla drives the distributed code path at nparts=1 (the
    reference's solvempi runs through MPI at 1 rank too, cg.c:490-614) —
    the only way to hardware-prove the shard_map programs from the
    driver on a single attached chip."""
    rc = cli_main.main([str(matrix_file), "--manufactured-solution",
                        "--solver", "acg-fused", "--dtype", "float32",
                        "--comm", "xla", "--nparts", "1",
                        "--residual-rtol", "1e-5", "--warmup", "0", "-v"])
    assert rc == 0
    err = capsys.readouterr().err
    val = float(err.split("manufactured solution error 2-norm: ")[1]
                .splitlines()[0])
    assert val < 1e-2
