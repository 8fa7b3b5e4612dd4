"""Per-operation statistics report in the reference's output format.

Reproduces the layout of ``acgsolver_fwrite`` (acg/cg.c:665-845): unknowns,
iterations, flops, per-op time/count/bytes/GB/s breakdown, stopping
criteria and final norms.

On TPU the solver is one fused XLA program, so per-op *times* cannot be
measured from the host; counts and bytes are exact analytic values from
the loop structure, and per-op times are attributed from the measured
total in proportion to each op's byte traffic (marked "est." in the
output).  True on-device timelines come from ``jax.profiler`` traces
(utils/profiling — the nsys/NVTX analogue).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .cg import CGOptions, SolveInfo


@dataclasses.dataclass
class OpStats:
    n: int = 0
    nbytes: int = 0
    flops: int = 0
    t_est: float = 0.0

    @property
    def gbps(self) -> float:
        return 1e-9 * self.nbytes / self.t_est if self.t_est > 0 else 0.0


def analytic_op_stats(op, info: SolveInfo, method: str, nparts: int = 1,
                      halo_bytes_per_exchange: int = 0,
                      tsolve: float = 0.0) -> dict[str, OpStats]:
    """Exact per-op counts/bytes for the executed iteration structure.

    Per iteration: classic CG does 1 SpMV, 2 dots (p·t, r·r), 3 axpy-class
    updates and 2 scalar allreduces (cgcuda.c:855-1054); pipelined does
    1 SpMV, 1 fused double-dot, 6 fused vector updates and 1 two-element
    allreduce (cgcuda.c:1710-1821).  Setup adds 1-2 SpMVs and norms.
    """
    k = max(info.niterations, 0)
    # operator storage width: .dtype when exposed (SELL operators hold a
    # TUPLE of per-bucket slabs — np.asarray on it is inhomogeneous)
    if hasattr(op, "dtype"):
        s = np.dtype(op.dtype).itemsize
    elif hasattr(op, "vals"):
        s = np.asarray(op.vals).dtype.itemsize
    else:
        s = 8
    Np = op.Np
    vec = Np * s
    spmv_b = op.bytes_per_spmv()
    spmv_f = op.flops_per_spmv()
    stats: dict[str, OpStats] = {}

    if method in ("cg", "acg", "acg-host"):
        stats["gemv"] = OpStats(n=k + 1, nbytes=(k + 1) * spmv_b, flops=(k + 1) * spmv_f)
        stats["dot"] = OpStats(n=2 * k, nbytes=2 * k * 2 * vec, flops=2 * k * 2 * Np)
        stats["nrm2"] = OpStats(n=2, nbytes=2 * vec, flops=2 * 2 * Np)
        stats["axpy"] = OpStats(n=3 * k, nbytes=3 * k * 3 * vec, flops=3 * k * 2 * Np)
        stats["allreduce"] = OpStats(n=2 * k, nbytes=2 * k * 8)
        stats["halo"] = OpStats(n=(k + 1) if nparts > 1 else 0,
                                nbytes=(k + 1) * halo_bytes_per_exchange if nparts > 1 else 0)
    else:  # pipelined
        stats["gemv"] = OpStats(n=k + 2, nbytes=(k + 2) * spmv_b, flops=(k + 2) * spmv_f)
        stats["dot"] = OpStats(n=2 * (k + 1), nbytes=(k + 1) * 2 * vec,
                               flops=2 * (k + 1) * 2 * Np)
        stats["nrm2"] = OpStats(n=2, nbytes=2 * vec, flops=2 * 2 * Np)
        stats["axpy"] = OpStats(n=6 * k, nbytes=6 * k * 3 * vec, flops=6 * k * 2 * Np)
        stats["allreduce"] = OpStats(n=k + 1, nbytes=(k + 1) * 16)
        stats["halo"] = OpStats(n=(k + 2) if nparts > 1 else 0,
                                nbytes=(k + 2) * halo_bytes_per_exchange if nparts > 1 else 0)

    total_bytes = sum(o.nbytes for o in stats.values())
    if tsolve > 0 and total_bytes > 0:
        for o in stats.values():
            o.t_est = tsolve * (o.nbytes / total_bytes)
    return stats


def format_report(op, info: SolveInfo, opt: CGOptions, method: str,
                  tsolve: float, nparts: int = 1,
                  halo_bytes_per_exchange: int = 0, indent: int = 0,
                  measured: dict | None = None) -> str:
    """The acgsolver_fwrite report (cg.c:665-845 layout).

    ``measured``: optional {row: (seconds, count)} from a jax.profiler
    trace (utils/traceparse.measured_op_times) — when present, per-op
    times and GB/s are MEASURED (the reference's CUDA-event profiling,
    cgcuda.c:1057-1095) instead of estimated from byte shares."""
    pad = " " * indent
    stats = analytic_op_stats(op, info, method, nparts,
                              halo_bytes_per_exchange, tsolve)
    nflops = sum(o.flops for o in stats.values())
    lines = []
    a = lines.append
    a(f"{pad}unknowns: {op.N}")
    a(f"{pad}solves: 1")
    a(f"{pad}total iterations: {info.niterations}")
    a(f"{pad}total flops: {1e-9 * nflops:.3f} Gflop")
    a(f"{pad}total flop rate: {1e-9 * nflops / tsolve if tsolve > 0 else 0:.3f} Gflop/s")
    a(f"{pad}total solver time: {tsolve:.6f} seconds")
    if measured:
        lane = (f"; times are the MEAN over the {nparts} devices' "
                f"concurrent lanes, not per-rank" if nparts > 1 else "")
        a(f"{pad}performance breakdown (times MEASURED from the profiler "
          f"trace; counts/bytes analytic{lane}):")
    else:
        a(f"{pad}performance breakdown (times est. from byte shares of the fused program):")
    for name in ("gemv", "dot", "nrm2", "axpy", "allreduce", "halo"):
        o = stats[name]
        if measured and name in measured:
            t, _nev = measured[name]
            gbps = 1e-9 * o.nbytes / t if t > 0 else 0.0
            a(f"{pad}  {name}: {t:.6f} seconds {o.n} times {o.nbytes} B "
              f"{gbps:.3f} GB/s (measured)")
        else:
            a(f"{pad}  {name}: {o.t_est:.6f} seconds {o.n} times {o.nbytes} B "
              f"{o.gbps:.3f} GB/s{' (est.)' if measured else ''}")
    a(f"{pad}last solve:")
    a(f"{pad}  stopping criterion:")
    a(f"{pad}    maximum iterations: {opt.max_iterations}")
    a(f"{pad}    tolerance for residual: {opt.residual_atol:.17g}")
    a(f"{pad}    tolerance for relative residual: {opt.residual_rtol:.17g}")
    a(f"{pad}    tolerance for difference in solution iterates: {opt.diff_atol:.17g}")
    a(f"{pad}    tolerance for relative difference in solution iterates: {opt.diff_rtol:.17g}")
    a(f"{pad}  iterations: {info.niterations}")
    a(f"{pad}  right-hand side 2-norm: {info.bnrm2:.17g}")
    a(f"{pad}  initial guess 2-norm: {info.x0nrm2:.17g}")
    a(f"{pad}  initial residual 2-norm: {info.r0nrm2:.17g}")
    a(f"{pad}  residual 2-norm: {info.rnrm2:.17g}")
    a(f"{pad}  difference in solution iterates 2-norm: {info.dxnrm2:.17g}")
    return "\n".join(lines)
