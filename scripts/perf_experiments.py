"""Isolate composition overhead in the fused pipelined-CG iteration.

The components (SpMV / 6-vector update / double-dot) sum to ~1.1 ms on the
2048² f64 Poisson problem but the composed while_loop iteration measures
~4 ms.  Each experiment below toggles one suspect:

  A. fori_loop, full iteration WITHOUT scalar recurrences/conv check
     (constant alpha/beta)  — pure data-path composition cost
  B. lax.scan full pipelined iteration (real recurrences, no early exit)
  C. while_loop with convergence check every iteration (current bench path)
  D. while_loop checking every CHECK_EVERY iterations (fori inner block)

Timing: two trip counts differenced (cancels dispatch/fetch constants),
min of reps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import acg_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import poisson2d_dia
from acg_tpu.ops.blas1 import dot2
from acg_tpu.solvers.cg import CGOptions, pipelined_cg_loop, pipelined_cg_history_scan

N_GRID = int(os.environ.get("ACG_BENCH_N", "2048"))
DTYPE = os.environ.get("ACG_BENCH_DTYPE", "float64")
K1, K2 = 30, 130
REPS = 3


def timed_pair(make_run, k1=K1, k2=K2):
    def one(iters):
        run = make_run(iters)
        r = run()
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            r = run()
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = one(k1), one(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    offsets, vals = poisson2d_dia(N_GRID, dtype=np.dtype(DTYPE))
    op = DiaOperator.from_arrays(offsets, vals, pad_to=1024)
    Np = op.Np
    vdt = jnp.dtype(DTYPE)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(Np) * 1e-3, vdt)
    b = op.spmv(x0)

    # A: full data path, constant scalars, fori_loop
    def mk_A(iters):
        @jax.jit
        def run():
            ab = jnp.array(1e-7, vdt)
            bb = jnp.array(0.5, vdt)

            def body(i, s):
                x, r, w, z, t, p, acc = s
                q = op.spmv(w)
                z2 = q + bb * z
                t2 = w + bb * t
                p2 = r + bb * p
                x2 = x + ab * p2
                r2 = r - ab * t2
                w2 = w - ab * z2
                gd = dot2(r2, r2, w2, r2)
                return (x2, r2, w2, z2, t2, p2, acc + gd[0])
            s = jax.lax.fori_loop(0, iters, body,
                                  (x0, b, x0, x0, x0, x0,
                                   jnp.array(0.0, jnp.float64)))
            return s[6]
        return run

    t = timed_pair(mk_A)
    print(f"A fori constant-scalars full iter: {t*1e6:.1f} us/iter")

    # B: scan with real recurrences
    opt_fixed = CGOptions(max_iterations=K2, residual_rtol=0.0)

    def mk_B(iters):
        opt = CGOptions(max_iterations=iters, residual_rtol=0.0)

        @jax.jit
        def run():
            x, scalars, hist = pipelined_cg_history_scan(op.spmv, b, x0, opt)
            return scalars["rnrm2sqr"]
        return run

    t = timed_pair(mk_B)
    print(f"B scan real recurrences:           {t*1e6:.1f} us/iter")

    # C: while_loop, check every iteration (bench path)
    def mk_C(iters):
        opt = CGOptions(max_iterations=iters, residual_rtol=0.0,
                        residual_atol=0.0)

        @jax.jit
        def run():
            x, scalars = pipelined_cg_loop(op.spmv, b, x0, opt)
            return scalars["rnrm2sqr"]
        return run

    t = timed_pair(mk_C)
    print(f"C while_loop check-every-1:        {t*1e6:.1f} us/iter")


if __name__ == "__main__":
    main()
