"""Auto-escalation protocol run on the real TPU (VERDICT round-2 weak #2).

The 2048^2 Poisson BASELINE protocol at the reference tolerance
(rtol 1e-6): solve with solve_auto (f32 fast path + df64 restart) and
report iterations/wall/true residual, with scipy's f64 CG iteration
count as the convergence-parity oracle.  ACG_BENCH_CPU=1 runs a small
CPU smoke variant.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ACG_BENCH_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402


def main():
    import jax

    from acg_tpu.core.dia import DiaOperator
    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    from acg_tpu.solvers.auto import solve_auto
    from acg_tpu.solvers.cg import CGOptions

    small = os.environ.get("ACG_BENCH_CPU") == "1"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (64 if small else 2048)
    rtol = float(os.environ.get("ACG_RTOL", "1e-6"))
    offsets, vals = poisson2d_dia(n)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    rng = np.random.default_rng(0)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    bnrm = np.linalg.norm(b)
    op64 = DiaOperator.from_arrays(offsets, vals, dtype=np.float64,
                                   pad_to=1024, backend="xla")
    opt = CGOptions(max_iterations=2000, residual_rtol=rtol,
                    check_every=25)

    # warm (compiles both stages), then timed run
    t0 = time.perf_counter()
    x, info = solve_auto(op64, b, opt=opt, verbose=True)
    print(f"warm solve: {time.perf_counter() - t0:.2f} s "
          f"(includes compiles)", flush=True)
    t0 = time.perf_counter()
    x, info = solve_auto(op64, b, opt=opt)
    wall = time.perf_counter() - t0
    rtrue = np.linalg.norm(b - A @ x)
    print(f"auto: n={n} N={N:,} iters={info.niterations} "
          f"converged={info.converged} wall={wall:.3f} s "
          f"rnrm(true)={rtrue:.3e} rel={rtrue / bnrm:.3e} "
          f"err={np.linalg.norm(x - xstar):.3e}", flush=True)

    # scipy f64 oracle for the iteration count
    from acg_tpu.solvers.reference import solve_scipy
    t0 = time.perf_counter()
    _, sinfo = solve_scipy(A, b, opt=CGOptions(max_iterations=2000,
                                               residual_rtol=rtol))
    print(f"scipy: iters={sinfo.niterations} converged={sinfo.converged} "
          f"({time.perf_counter() - t0:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
