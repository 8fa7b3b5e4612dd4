"""`acg-tpu` — benchmark/driver CLI (cuda/acg-cuda.c analogue).

Flag-for-flag port of the reference driver's interface
(acg-cuda.c:315-377) adapted to one comm backend (XLA collectives):

    acg-tpu [OPTION..] A [b] [x0]

Differences from the reference, by design:
  * --solver: acg / acg-pipelined are the fused compiled solvers (the
    device-initiated execution model); acg-host / acg-host-pipelined are
    the host-stepped variants (the reference's default host-driven mode);
    scipy (alias: petsc) and jax-ref are external-library baselines.
  * --comm: none | xla (aliases mpi/nccl/nvshmem are accepted for script
    parity and map to xla — SURVEY.md §5.8: one backend replaces five).
  * --nparts: number of mesh devices (the reference gets this from MPI).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

VERSION_STRING = "acg-tpu 0.1.0 (TPU-native re-design of aCG 1.0.0 capabilities)"

SOLVERS = ("acg", "acg-pipelined", "acg-host", "acg-host-pipelined",
           "acg-device", "acg-device-pipelined",   # reference script parity:
           # the compiled while_loop IS the device-initiated variant, so
           # these are aliases of acg / acg-pipelined (DESIGN.md)
           "acg-fused",   # one-pass pipelined iteration kernel (DIA/SELL;
           # at --nparts>1 the fused update+dots pass runs per device)
           "acg-df64",    # double-f32 kernels: f64-quality at VPU speed
           # (single- and multi-device via the keep_lo SELL / DIA slabs)
           "acg-auto",    # precision auto-escalation: f32 fast path, then a
           # df64 restart only if the tolerance demands it (solvers/auto.py;
           # distributed twin solve_auto_dist at --nparts>1)
           "scipy", "petsc", "jax-ref")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="acg-tpu",
        description="Solve a linear system Ax=b with the conjugate gradient "
                    "(CG) method on TPU for a matrix A and right-hand side b.")
    p.add_argument("A", help="path to Matrix Market file for a matrix A")
    p.add_argument("b", nargs="?", default=None,
                   help="optional path to Matrix Market file for a right-hand side b")
    p.add_argument("x0", nargs="?", default=None,
                   help="optional path to Matrix Market file for an initial guess x0")
    g = p.add_argument_group("input options")
    g.add_argument("-z", "--gzip", "--gunzip", "--ungzip", action="store_true",
                   dest="gzip", help="filter files through gzip")
    g.add_argument("--binary", action="store_true",
                   help="read Matrix Market files in binary format")
    g = p.add_argument_group("partitioning options")
    g.add_argument("--partition", metavar="FILE", default=None,
                   help="read partition vector from Matrix Market file")
    g.add_argument("--binary-partition", action="store_true",
                   help="read partition vector in binary format")
    g.add_argument("--partition-method", default="contiguous",
                   choices=("contiguous", "bfs", "metis-like"),
                   help="partitioner when no --partition file is given [contiguous]")
    g.add_argument("--reorder", default="none",
                   choices=("none", "rcm", "nd", "cluster"),
                   help="symmetric row/column reordering applied before "
                        "solving: rcm reduces bandwidth (enables the DIA "
                        "fast path on unstructured matrices) [none]")
    g.add_argument("--nparts", type=int, default=1,
                   help="number of parts/devices (1 = single chip) [1]")
    g.add_argument("--seed", type=int, default=0, help="random number seed [0]")
    g = p.add_argument_group("solver options")
    g.add_argument("--solver", default="acg", choices=SOLVERS,
                   help="solver variant [acg]")
    g.add_argument("--max-iterations", type=int, default=100, metavar="N",
                   help="maximum number of iterations [100]")
    g.add_argument("--diff-atol", type=float, default=0.0, metavar="TOL",
                   help="stop when ||x_{k+1}-x_k|| < TOL [0]")
    g.add_argument("--diff-rtol", type=float, default=0.0, metavar="TOL",
                   help="stop when ||x_{k+1}-x_k||/||x_0|| < TOL [0]")
    g.add_argument("--residual-atol", type=float, default=0.0, metavar="TOL",
                   help="stop when ||b-Ax|| < TOL [0]")
    g.add_argument("--residual-rtol", type=float, default=1e-9, metavar="TOL",
                   help="stop when ||b-Ax||/||b|| < TOL [1e-9]")
    g.add_argument("--epsilon", type=float, default=0.0, metavar="TOL",
                   help="add TOL to the diagonal of A [0]")
    g.add_argument("--warmup", type=int, default=1, metavar="N",
                   help="perform N full warmup solves before the timed solve "
                        "[1].  The reference's --warmup N (default 10) warms "
                        "each op CLASS N times — cheap single kernels; here "
                        "the op class is the whole compiled solve program, "
                        "so one warmup pays the compile and N>1 repeats the "
                        "full solve N times")
    g.add_argument("--check-every", type=int, default=1, metavar="M",
                   help="evaluate the convergence predicate every M "
                        "iterations (identical results; amortizes the "
                        "device sync) [1]")
    g.add_argument("--dtype", default="float64",
                   choices=("float64", "float32"),
                   help="vector/matrix storage dtype [float64]")
    g.add_argument("--dot-dtype", default="float64",
                   choices=("float64", "float32", "mixed"),
                   help="dot-product accumulation: float64, float32, or "
                        "mixed (blockwise storage-dtype sums, f64 across "
                        "blocks — the fast path with --dtype float32) "
                        "[float64]")
    g.add_argument("--format", default="auto",
                   choices=("auto", "dia", "ell", "sell"),
                   help="operator format; auto = DIA when the (reordered) "
                        "matrix bands, else SELL chunked-gather (the "
                        "unstructured fast path); ell = the slow reference "
                        "gather fallback [auto]")
    g.add_argument("--backend", default="xla", choices=("xla", "pallas"),
                   help="DIA SpMV implementation: xla shifted slices or the "
                        "pallas streaming kernel [xla]")
    g.add_argument("--sell-cap", type=int, default=0, metavar="R",
                   help="SELL cap-and-tail split: per-(row, chunk) entry "
                        "runs beyond R go to a compacted tail operator "
                        "(higher fill on heavy-tailed matrices; 8 is a "
                        "good value); 0 = off [0]")
    g.add_argument("--sell-heavy", action="store_true",
                   help="split heavy-but-local rows into the dense "
                        "run-tail operator (core/heavy.py) when any "
                        "qualify; recovers the mesh-only SELL fill on "
                        "matrices with interleaved constraint/arrow rows")
    g = p.add_argument_group("communication options")
    g.add_argument("--comm", default="none",
                   choices=("none", "xla", "mpi", "nccl", "nvshmem"),
                   help="none, or xla (mpi/nccl/nvshmem are accepted aliases) [none]")
    g.add_argument("--halo", default="allgather",
                   choices=("allgather", "alltoall", "ragged"),
                   help="halo exchange strategy for general partitions "
                        "(ragged = exact wire volume via ragged-all-to-all; "
                        "TPU only, XLA:CPU has no thunk) [allgather]")
    g = p.add_argument_group("verification options")
    g.add_argument("--manufactured-solution", action="store_true",
                   help="use a manufactured solution and right-hand side")
    g = p.add_argument_group("output options")
    g.add_argument("--numfmt", default=None, metavar="FMT",
                   help="printf format string for numerical output values")
    g.add_argument("--output-comm-matrix", action="store_true",
                   help="print communication matrix to standard output")
    g.add_argument("-o", "--output", default=None, metavar="FILE",
                   help="write solution vector to FILE instead of stdout")
    g.add_argument("--trace", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the solve to DIR "
                        "(the nsys/NVTX analogue, viewable in Perfetto/"
                        "TensorBoard)")
    g.add_argument("-v", "--verbose", action="count", default=0,
                   help="be more verbose")
    g.add_argument("-q", "--quiet", action="store_true", help="suppress output")
    p.add_argument("--version", action="version", version=VERSION_STRING)
    return p


def log(args, msg: str) -> None:
    if args.verbose:
        print(msg, file=sys.stderr)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # validate --numfmt before any work (acg-cuda.c:763-770 via fmtspec_parse)
    if args.numfmt is not None:
        from ..utils.fmtspec import validate_numfmt
        try:
            args.numfmt = validate_numfmt(args.numfmt, field="real")
        except ValueError as e:
            print(f"error: --numfmt: {e}", file=sys.stderr)
            return 1

    import acg_tpu  # noqa: F401 (x64)
    from ..parallel.multihost import init_multihost
    init_multihost()   # no-op unless ACG_COORDINATOR/... env vars are set
    from ..core.csr import SymCSRMatrix
    from ..core.dia import DiaOperator
    from ..core.ell import EllOperator
    from ..io.mtxfile import (read_mtx, read_partition, vector_to_mtx,
                              write_mtx, MtxFile)
    from ..partition.graph import build_partitioned_matrix
    from ..partition.partitioner import partition as make_partition
    from ..solvers.cg import CGOptions, solve
    from ..solvers.dist_cg import solve_dist_general, solve_dist_stencil
    from ..solvers.host_cg import solve_host_stepped
    from ..solvers.reference import solve_jax_ref, solve_scipy
    from ..solvers.stats import format_report
    from ..timing import PhaseTimer

    timer = PhaseTimer()
    opt = CGOptions(max_iterations=args.max_iterations,
                    diff_atol=args.diff_atol, diff_rtol=args.diff_rtol,
                    residual_atol=args.residual_atol,
                    residual_rtol=args.residual_rtol,
                    check_every=args.check_every,
                    dot_dtype=args.dot_dtype)

    with timer.phase("read"):
        mtx = read_mtx(args.A, gzip=args.gzip or None, binary=args.binary)
    log(args, f"read {args.A}: {mtx.nrows}x{mtx.ncols}, {mtx.nnz} entries "
              f"({timer.phases['read']:.3f} s)")

    with timer.phase("assemble"):
        A = SymCSRMatrix.from_mtx(mtx)
    log(args, f"assembled symmetric CSR: N={A.N}, stored nnz={A.nnz_stored}")

    perm = None
    if args.reorder != "none":
        from ..partition.ordering import (bandwidth, cluster_order,
                                          nd_order, rcm_order)
        with timer.phase("reorder"):
            full = A.to_scipy_full()
            bw0 = bandwidth(full.indptr, full.indices)
            order_fn = {"rcm": rcm_order, "nd": nd_order,
                        "cluster": cluster_order}[args.reorder]
            perm = order_fn(full.indptr.astype(np.int64),
                            full.indices.astype(np.int64))
            A = A.permuted(perm)
            full2 = A.to_scipy_full()
            bw1 = bandwidth(full2.indptr, full2.indices)
        log(args, f"reordered ({args.reorder}): bandwidth {bw0} -> {bw1} "
                  f"({timer.phases['reorder']:.3f} s)")

    N = A.N
    rng = np.random.default_rng(args.seed)

    # --- right-hand side / initial guess (acg-cuda.c:1820-2115) -----------
    xstar = None
    if args.manufactured_solution:
        xstar = rng.standard_normal(N)
        xstar /= np.linalg.norm(xstar)
        with timer.phase("rhs"):
            b = A.matvec(xstar, epsilon=args.epsilon)
    elif args.b is not None:
        b = read_mtx(args.b, gzip=args.gzip or None,
                     binary=args.binary).to_dense_vector()
        if perm is not None:
            b = b[perm]
    else:
        b = np.ones(N)
    x0 = None
    if args.x0 is not None:
        x0 = read_mtx(args.x0, gzip=args.gzip or None,
                      binary=args.binary).to_dense_vector()
        if perm is not None:
            x0 = x0[perm]

    nparts = args.nparts if args.comm != "none" or args.nparts > 1 else 1
    # an EXPLICIT communicator forces the distributed code path even at
    # nparts=1 (the reference's solvempi runs through MPI at 1 rank too,
    # cg.c:490-614) — the only way to drive the shard_map programs on a
    # single attached chip end-to-end from the driver
    dist = nparts > 1 or args.comm != "none"
    dia = None
    with timer.phase("format"):
        if args.format in ("auto", "dia"):
            dia = A.to_dia_arrays(epsilon=args.epsilon)
            if dia is None and args.format == "dia":
                print("error: matrix has too many diagonals for --format dia",
                      file=sys.stderr)
                return 1

    # --- solve --------------------------------------------------------------
    _halo_info = {"bytes": 0}   # per-exchange wire volume for the stats report

    # the DIA + contiguous-partition shortcut (two-ppermute stencil halo)
    use_dia_stencil = (dia is not None and args.partition is None
                       and args.partition_method == "contiguous"
                       and args.format in ("auto", "dia"))

    _dist_cache = {}   # partition + layouts built once across warmup solves

    def _get_pm(local_order: str = "none"):
        # SELL consumers pass "cluster": the per-part BFS-ball local
        # order lifts the chunked-gather fill (partition/graph.py)
        key = ("pm", local_order)
        if key not in _dist_cache:
            with timer.phase("partition"):
                if args.partition:
                    part = read_partition(args.partition,
                                          binary=args.binary_partition)
                else:
                    full = A.to_scipy_full(args.epsilon)
                    part = make_partition(full.indptr, full.indices, nparts,
                                          method=args.partition_method,
                                          seed=args.seed)
                pm = build_partitioned_matrix(
                    A.to_scipy_full(args.epsilon), part,
                    local_order=local_order)
            if args.verbose >= 2:
                print(pm.describe(), file=sys.stderr)
            if args.output_comm_matrix:
                _print_comm_matrix(pm.comm_matrix)
            _halo_info["bytes"] = (int(pm.comm_matrix.sum())
                                   * np.dtype(args.dtype).itemsize)
            _dist_cache[key] = pm
        return _dist_cache[key]

    def _heavy_wanted(dtype: str = "float32") -> bool:
        """Heavy-segment splitting: explicit --sell-heavy, or ON by
        default under --format auto — detection is the gate (a uniform
        mesh has no qualifying segments and builds the plain layout
        unchanged; the split measured 2.67 → 8.71 Gnnz/s on the heavy
        regime, BENCHMARKS.md), matching the reference, which needs no
        flag to be load-balanced (cg-kernels-cuda.cu:312-441)."""
        if args.sell_heavy:
            return True
        return (args.format == "auto" and not args.sell_cap
                and dtype == "float32")

    def _dist_heavy_probe() -> bool:
        """True when the distributed SELL build should take the heavy
        split.  Probes the GLOBAL matrix: heavy runs are contiguous in
        the input ordering, and the per-part cluster relabeling
        FRAGMENTS them below the detection threshold (measured on the
        real chip: 172 of 528 segments survived, fill 0.062) — so heavy
        inputs keep the identity local order (the run split recovers
        far more fill than clustering does), while mesh-only inputs
        keep the cluster-order lift."""
        key = ("heavy_probe",)
        if key not in _dist_cache:
            probe = False
            if _heavy_wanted():
                from ..core.heavy import heavy_segments
                probe = len(heavy_segments(
                    A.to_scipy_full(args.epsilon))[0]) > 0
            _dist_cache[key] = probe
        return _dist_cache[key]

    def _dist_sell_pm():
        """The pm every distributed-SELL consumer must share (operator
        slabs AND vector scatter/halo plans live in the same local
        order)."""
        return _get_pm("none" if _dist_heavy_probe() else "cluster")

    def _get_dist_sell(keep_lo: bool = False):
        heavy = _dist_heavy_probe()
        key = ("dso", keep_lo, heavy)
        if key not in _dist_cache:
            with timer.phase("format"):
                from ..parallel.dist_sell import build_dist_sell
                _dist_cache[key] = build_dist_sell(
                    _dist_sell_pm(), keep_lo=keep_lo, heavy=heavy)
            dso = _dist_cache[key]
            nseg = 0 if dso.tail is None else \
                int(np.sum(np.asarray(dso.tail["tocc"]) >= 0))
            log(args, "distributed SELL layout: "
                      f"fill={dso.fill:.3f}"
                      + (f", run-tail: {nseg} segments" if nseg else ""))
        return _dist_cache[key]

    def _run_dist_fast():
        """acg-fused / acg-df64 / acg-auto at nparts>1: the distributed
        kernel-speed paths (the reference driver dispatches every solver
        at every commsize, acg-cuda.c:2241-2262)."""
        df = args.solver == "acg-df64"
        if args.format == "ell":
            print(f"error: --solver {args.solver} requires the DIA or "
                  "SELL format", file=sys.stderr)
            raise SystemExit(1)
        if args.solver == "acg-auto":
            from ..solvers.auto import (_needs_escalation, solve_auto_dist,
                                        solve_auto_dist_stencil)
            if use_dia_stencil:
                offsets, vals = dia
                hw = max(1, int(np.abs(offsets).max()))
                _halo_info["bytes"] = (2 * hw * (nparts - 1)
                                       * np.dtype(args.dtype).itemsize)
                return solve_auto_dist_stencil(offsets, vals, b,
                                               nparts=nparts, x0=x0, opt=opt,
                                               verbose=args.verbose > 0)
            bnrm = float(np.linalg.norm(np.asarray(b, np.float64)))
            dso = _get_dist_sell(keep_lo=_needs_escalation(opt, bnrm))
            return solve_auto_dist(_dist_sell_pm(), b, x0=x0, opt=opt,
                                   halo=args.halo, sell_op=dso,
                                   verbose=args.verbose > 0)
        if use_dia_stencil:
            offsets, vals = dia
            if df and args.dtype != "float64":
                print("error: --solver acg-df64 consumes a float64 DIA "
                      "operator (drop --dtype float32)", file=sys.stderr)
                raise SystemExit(1)
            if not df and args.dtype != "float32":
                print("error: --solver acg-fused requires --dtype float32 "
                      "(Mosaic kernels are f32-only on TPU; use acg-df64 "
                      "for f64-quality results)", file=sys.stderr)
                raise SystemExit(1)
            hw = max(1, int(np.abs(offsets).max()))
            _halo_info["bytes"] = (2 * hw * (nparts - 1)
                                   * np.dtype(args.dtype).itemsize)
            return solve_dist_stencil(
                offsets, vals, b, nparts=nparts, x0=x0, opt=opt,
                method="pipelined-df64" if df else "pipelined-fused",
                dtype=np.float64 if df else np.float32)
        # general partition: distributed SELL (keep_lo slabs for df64)
        dso = _get_dist_sell(keep_lo=df)
        return solve_dist_general(
            _dist_sell_pm(), b, x0=x0, opt=opt,
            method="pipelined-df64" if df else "pipelined-fused",
            operator="sell", sell_op=dso, halo=args.halo)

    def run_once():
        if args.solver in ("scipy", "petsc"):
            return solve_scipy(A.to_scipy_full(args.epsilon), b, x0, opt)
        if args.solver == "jax-ref":
            op = _make_op()
            return solve_jax_ref(op, b, x0, opt)
        if args.solver == "acg-auto":
            if dist:
                return _run_dist_fast()
            from ..solvers.auto import solve_auto
            if dia is not None and args.format in ("auto", "dia"):
                offsets, vals = dia
                op64 = DiaOperator.from_arrays(offsets, vals,
                                               dtype=np.float64,
                                               backend="xla")
            else:
                # unstructured: one keep_lo SELL operator serves both the
                # f32 stage and the df64 restart
                op64 = _make_op(keep_lo=True, force_f32=True)
                if not hasattr(op64, "spmv_df64"):
                    if args.format == "ell":
                        print("error: --solver acg-auto needs the DIA or "
                              "SELL format", file=sys.stderr)
                        raise SystemExit(1)
                    # the SELL build fell back to gather-ELL (scatter
                    # regime): escalation has nothing to escalate to —
                    # solve in plain f64, the reference's own semantics
                    print("note: auto-escalation unavailable on the ELL "
                          "fallback; solving in f64 (pipelined)",
                          file=sys.stderr)
                    return solve(_make_op(), b, x0, opt, "pipelined")
            return solve_auto(op64, b, x0, opt, verbose=args.verbose > 0)
        if args.solver in ("acg-fused", "acg-df64"):
            if dist:
                return _run_dist_fast()
            df = args.solver == "acg-df64"
            use_dia = dia is not None and args.format in ("auto", "dia")
            if args.format == "ell":
                print(f"error: --solver {args.solver} requires the DIA or "
                      "SELL format", file=sys.stderr)
                raise SystemExit(1)
            if use_dia:
                if df and args.dtype != "float64":
                    print("error: --solver acg-df64 consumes a float64 DIA "
                          "operator (drop --dtype float32)", file=sys.stderr)
                    raise SystemExit(1)
                if not df and args.dtype != "float32":
                    # Mosaic has no f64 tiling on TPU; reject here instead
                    # of a NotImplementedError traceback from inside jit
                    print("error: --solver acg-fused requires --dtype "
                          "float32 (Mosaic kernels are f32-only on TPU; use "
                          "acg-df64 for f64-quality results)",
                          file=sys.stderr)
                    raise SystemExit(1)
                op = _make_op()
            else:
                # SELL: always f32 hi slabs (Mosaic kernels are f32-only);
                # acg-df64 represents the f64 matrix as (hi, lo) pairs via
                # the keep_lo rounding-residual slabs, so --dtype float64
                # is already honored by the pair — no dtype restriction
                op = _make_op(keep_lo=df, force_f32=True)
                if df and not hasattr(op, "spmv_df64"):
                    # scatter-regime ELL fallback has no df64 kernel;
                    # plain-f64 pipelined delivers the same semantics
                    print("note: acg-df64 unavailable on the ELL fallback; "
                          "solving in f64 (pipelined)", file=sys.stderr)
                    return solve(_make_op(), b, x0, opt, "pipelined")
            method = "pipelined-fused" if not df else "pipelined-df64"
            return solve(op, b, x0, opt, method)
        method = "pipelined" if "pipelined" in args.solver else "cg"
        if dist:
            if use_dia_stencil:
                offsets, vals = dia
                hw = max(1, int(np.abs(offsets).max()))
                _halo_info["bytes"] = (2 * hw * (nparts - 1)
                                       * np.dtype(args.dtype).itemsize)
                return solve_dist_stencil(offsets, vals, b, nparts=nparts,
                                          x0=x0, opt=opt, method=method,
                                          dtype=args.dtype,
                                          backend=args.backend)
            # per-device operator: the chunked-gather SELL kernels are the
            # fast path (f32 storage); auto picks them whenever the dtype
            # allows, ell is the explicit slow gather fallback
            if args.format == "sell" and args.dtype != "float32":
                print("error: --format sell with --nparts requires --dtype "
                      "float32 (Mosaic kernels are f32-only on TPU)",
                      file=sys.stderr)
                raise SystemExit(1)
            operator = ("sell" if args.format == "sell"
                        or (args.format == "auto"
                            and args.dtype == "float32") else "ell")
            pm = _dist_sell_pm() if operator == "sell" else _get_pm("none")
            dso = _get_dist_sell() if operator == "sell" else None
            return solve_dist_general(pm, b, x0=x0, opt=opt, method=method,
                                      dtype=args.dtype, halo=args.halo,
                                      operator=operator, sell_op=dso)
        op = _make_op()
        if args.solver.startswith("acg-host"):
            return solve_host_stepped(op, b, x0, opt, method)
        return solve(op, b, x0, opt, method)

    _op_cache = {}

    def _make_op(keep_lo: bool = False, force_f32: bool = False):
        dtype = "float32" if force_f32 else args.dtype
        key = ("op", keep_lo, dtype)
        if key not in _op_cache:
            if dia is not None and args.format in ("auto", "dia"):
                offsets, vals = dia
                _op_cache[key] = DiaOperator.from_arrays(offsets, vals,
                                                         dtype=dtype,
                                                         backend=args.backend)
            elif args.format == "ell":
                ci, v = A.to_ell_arrays(epsilon=args.epsilon)
                _op_cache[key] = EllOperator.from_arrays(ci, v,
                                                         dtype=dtype)
            else:
                # explicit --format sell, or auto on a matrix with too many
                # diagonals to band: the chunked-gather fast path (keep_lo
                # adds the df64 rounding-residual slabs; --sell-cap splits
                # heavy (row, chunk) tails for fill)
                from ..core.sell import sell_from_csr
                try:
                    op = sell_from_csr(
                        A.to_scipy_full(args.epsilon), dtype=dtype,
                        cap=args.sell_cap, keep_lo=keep_lo,
                        heavy=_heavy_wanted(dtype))
                    _op_cache[key] = op
                    extra = f", run-tail: {op.ntail} segments" \
                        if hasattr(op, "ntail") else ""
                    log(args, f"SELL layout: S={op.S} slots, "
                              f"fill={op.fill:.3f}{extra}")
                except MemoryError as e:
                    # scatter-regime fail-fast (no column locality — the
                    # chunked-gather layout is infeasible by measurement,
                    # BENCHMARKS.md): route to the gather-ELL operator,
                    # which like the reference's merge kernel runs ANY
                    # CSR (cg-kernels-cuda.cu:312-441), just slowly
                    print(f"note: SELL layout infeasible ({e}); falling "
                          "back to the gather-ELL operator",
                          file=sys.stderr)
                    ci, v = A.to_ell_arrays(epsilon=args.epsilon)
                    _op_cache[key] = EllOperator.from_arrays(ci, v,
                                                             dtype=dtype)
        return _op_cache[key]

    def _print_comm_matrix(cm):
        coo = [(i, j, int(cm[i, j])) for i in range(cm.shape[0])
               for j in range(cm.shape[1]) if cm[i, j]]
        m = MtxFile(object="matrix", format="coordinate", field="integer",
                    symmetry="general", nrows=cm.shape[0], ncols=cm.shape[1],
                    nnz=len(coo),
                    rowidx=np.array([c[0] for c in coo], dtype=np.int64),
                    colidx=np.array([c[1] for c in coo], dtype=np.int64),
                    data=np.array([c[2] for c in coo], dtype=np.int64))
        write_mtx(sys.stdout.buffer, m)

    if args.warmup > 0 and args.solver.startswith("acg") \
            and not args.solver.startswith("acg-host"):
        # The reference warms each op class N times (cgcuda.c:613-710); the
        # compiled-loop model has exactly one op class — the whole solve
        # program — so --warmup N runs N warmup solves.  The first pays the
        # compile; further repetitions warm caches/allocator the same way
        # the reference's repeated kernel launches do.
        with timer.phase("warmup"):
            for _ in range(args.warmup):
                run_once()
        log(args, f"{args.warmup} warmup solve(s) done "
                  f"({timer.phases['warmup']:.3f} s, first includes compile)")

    if args.trace:
        import jax
        with timer.phase("solve"), jax.profiler.trace(args.trace):
            x, info = run_once()
        log(args, f"profiler trace written to {args.trace}")
    else:
        with timer.phase("solve"):
            x, info = run_once()
    tsolve = timer.phases["solve"]
    log(args, f"solve done in {tsolve:.6f} s, {info.niterations} iterations, "
              f"converged={info.converged}"
              + (" (halted on the plateau detector)"
                 if getattr(info, "stalled", False) else ""))

    # --- report (acgsolver_fwrite format) -----------------------------------
    if not args.quiet or args.verbose:
        try:
            # byte accounting wants the operator the solve actually used;
            # reuse the cached one (a fresh default-dtype build would be
            # wasteful, and heavy layouts are f32-only)
            op = next(iter(_op_cache.values())) if _op_cache else _make_op()
            # measured per-op times: join the profiler trace against the
            # executed program's optimized HLO (the CUDA-event profiling
            # analogue, cgcuda.c:1057-1095).  Works at nparts>1 too: the
            # distributed solvers AOT-compile their shard_map programs
            # and publish the same last-compiled slot; event durations
            # sum over the devices' concurrent lanes, so dividing by
            # nparts reports the per-device mean — the distributed per-op
            # table of cgcuda.c:1927-2120 (there: per-rank CUDA events)
            measured = None
            if args.trace and args.solver.startswith("acg") \
                    and not args.solver.startswith("acg-host"):
                try:
                    from ..solvers.cg import last_compiled_text
                    from ..utils.traceparse import measured_op_times
                    text = last_compiled_text()
                    if text:
                        measured = measured_op_times(args.trace, text)
                        if measured and nparts > 1:
                            measured = {k: (t / nparts, c)
                                        for k, (t, c) in measured.items()}
                except Exception as e:
                    log(args, f"(trace parse failed: {e})")
            report = format_report(op, info, opt, args.solver, tsolve,
                                   nparts=nparts,
                                   halo_bytes_per_exchange=_halo_info["bytes"],
                                   measured=measured)
            print(report, file=sys.stderr)
        except Exception as e:  # stats must never break the solve output
            print(f"(stats unavailable: {e})", file=sys.stderr)

    if xstar is not None:
        err = np.linalg.norm(x - xstar)
        err0 = np.linalg.norm((x0 if x0 is not None else np.zeros(N)) - xstar)
        print(f"manufactured solution error 2-norm: {err:.17g}", file=sys.stderr)
        print(f"initial error 2-norm: {err0:.17g}", file=sys.stderr)

    if not args.quiet:
        x_out = x
        if perm is not None:   # back to the input ordering
            x_out = np.empty_like(x)
            x_out[perm] = x
        dest = args.output if args.output else sys.stdout.buffer
        write_mtx(dest, vector_to_mtx(x_out), numfmt=args.numfmt,
                  comments=["% solution vector x computed by acg-tpu"])
    return 0 if info.converged or args.max_iterations == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
