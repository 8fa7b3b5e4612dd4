"""df64 SELL benchmark — the unstructured f64-parity fast path on TPU.

Measures, on the real chip, what the new df64 chunked-gather path costs
relative to the f32 fast path on the BASELINE Config-5 analogue (the
RCM/cluster-ordered 3-D mesh solid of scripts/bench_unstructured.py):

  * sell_spmv_df64 (two-slab: values are random f64 → lo slabs present)
    vs the f32 sell_spmv, us/SpMV and effective Gnnz/s;
  * end-to-end pipelined-df64 (two fused passes/iter) vs pipelined-fused
    (f32), us/iter by K-differencing two fixed-iteration compiled solves;
  * precision auto-escalation (solvers/auto.py) at rtol 1e-8: stage
    split, total iterations, and iteration parity vs scipy f64 CG.

The reference runs this matrix class in native f64 end to end
(acg-cuda.c:489-530 defaults + cg-kernels-cuda.cu:358-441); this is the
TPU's equivalent capability (no f64 ALUs → error-free f32 pairs).

Usage: python scripts/bench_sell_df64.py [nodes]   (default 200000 →
       600k rows); ACG_BENCH_CPU=1 for an interpret-mode smoke run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ACG_BENCH_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bench_unstructured import build_matrix  # noqa: E402

SMALL = os.environ.get("ACG_BENCH_CPU") == "1"
# interpret-mode pallas on CPU is ~1000x slower: shrink the smoke run
K1, K2 = (1, 3) if SMALL else (10, 60)     # SpMV differencing
I1, I2 = (2, 5) if SMALL else (20, 120)    # solver-iteration differencing
CE = 1 if SMALL else 10


def timed(run, *args, reps=2 if SMALL else 5):
    import jax
    r = run(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from acg_tpu.core.sell import SellOperator
    from acg_tpu.partition.ordering import cluster_order
    from acg_tpu.solvers.auto import solve_auto
    from acg_tpu.solvers.cg import (CGOptions, pipelined_cg_loop_df64_spmv,
                                    pipelined_cg_loop_fused_spmv, solve)
    from acg_tpu.solvers.reference import solve_scipy

    small = SMALL
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else \
        (2000 if small else 200000)
    A = build_matrix(nodes)
    perm = cluster_order(A.indptr, A.indices, ball=256)
    A = A[perm][:, perm].tocsr()
    N = A.shape[0]
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    op = SellOperator.from_csr(A, keep_lo=True)
    tb = time.perf_counter() - t0
    assert op.vals_lo is not None, "random data should be f32-inexact"
    print(f"sell keep_lo: fill={op.fill:.3f} layout {tb:.1f} s "
          f"(hi+lo slabs)", flush=True)

    # --- SpMV: f32 vs df64 ---------------------------------------------
    x = rng.standard_normal(N)
    xp = np.zeros(op.Np)
    xp[:N] = x
    xh = jnp.asarray(xp.astype(np.float32))
    xl = jnp.asarray((xp - np.asarray(xh, np.float64)).astype(np.float32))

    def make_f32(iters):
        @jax.jit
        def run(op_, v):
            def body(_, vv):
                return op_.spmv(vv) * 1e-3
            return jax.lax.fori_loop(0, iters, body, v)[0]
        return run

    def make_df(iters):
        @jax.jit
        def run(op_, vh, vl):
            def body(_, c):
                h, l = op_.spmv_df64(c[0], c[1])
                return (h * 1e-3, l * 1e-3)
            return jax.lax.fori_loop(0, iters, body, (vh, vl))[0][0]
        return run

    t_f32 = (timed(make_f32(K2), op, xh) - timed(make_f32(K1), op, xh)) \
        / (K2 - K1)
    t_df = (timed(make_df(K2), op, xh, xl) - timed(make_df(K1), op, xh, xl)) \
        / (K2 - K1)
    print(f"  spmv f32 : {t_f32 * 1e6:9.1f} us  "
          f"{A.nnz / t_f32 / 1e9:6.2f} Gnnz/s", flush=True)
    print(f"  spmv df64: {t_df * 1e6:9.1f} us  "
          f"{A.nnz / t_df / 1e9:6.2f} Gnnz/s  ({t_df / t_f32:.2f}x f32)",
          flush=True)
    # accuracy on hardware (Mosaic preserves the EFTs)
    yh, yl = op.spmv_df64(xh, xl)
    y = np.asarray(yh, np.float64)[:N] + np.asarray(yl, np.float64)[:N]
    ref = A @ x
    print(f"  df64 SpMV rel-err vs scipy f64: "
          f"{np.linalg.norm(y - ref) / np.linalg.norm(ref):.2e}", flush=True)

    # --- solver us/iter: pipelined-fused (f32) vs pipelined-df64 --------
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    bp32 = jnp.zeros((op.Np,), jnp.float32).at[:N].set(
        jnp.asarray(b, jnp.float32))
    bp64 = jnp.zeros((op.Np,), jnp.float64).at[:N].set(jnp.asarray(b))
    z32 = jnp.zeros((op.Np,), jnp.float32)
    z64 = jnp.zeros((op.Np,), jnp.float64)

    def make_solver(iters, df):
        opt = CGOptions(max_iterations=iters, residual_rtol=0.0,
                        residual_atol=0.0, check_every=CE)

        @jax.jit
        def run(op_, b_, x0_):
            if df:
                xx, sc = pipelined_cg_loop_df64_spmv(
                    op_.spmv_df64, b_, x0_, opt)
            else:
                xx, sc = pipelined_cg_loop_fused_spmv(
                    op_.spmv, b_, x0_, opt)
            return xx[0], sc["rnrm2sqr"]
        return run

    tf1 = timed(make_solver(I1, False), op, bp32, z32)
    tf2 = timed(make_solver(I2, False), op, bp32, z32)
    td1 = timed(make_solver(I1, True), op, bp64, z64)
    td2 = timed(make_solver(I2, True), op, bp64, z64)
    it_f32 = (tf2 - tf1) / (I2 - I1)
    it_df = (td2 - td1) / (I2 - I1)
    print(f"  iter fused-f32: {it_f32 * 1e6:9.1f} us/iter", flush=True)
    print(f"  iter df64     : {it_df * 1e6:9.1f} us/iter "
          f"({it_df / it_f32:.2f}x f32)", flush=True)

    # --- auto-escalation end-to-end at rtol 1e-8 -------------------------
    opt = CGOptions(max_iterations=2000, residual_rtol=1e-8,
                    check_every=1 if small else CE)
    t0 = time.perf_counter()
    xa, ia = solve_auto(op, b, opt=opt, verbose=True)
    ta = time.perf_counter() - t0
    rn = np.linalg.norm(b - A @ xa) / np.linalg.norm(b)
    print(f"  auto: iters={int(ia.niterations)} converged={ia.converged} "
          f"true-rnrm={rn:.2e} err={np.linalg.norm(xa - xstar):.2e} "
          f"wall={ta:.2f} s", flush=True)
    t0 = time.perf_counter()
    xd, idf = solve(op, b, opt=opt, method="pipelined-df64")
    td = time.perf_counter() - t0
    print(f"  pure df64: iters={int(idf.niterations)} "
          f"converged={idf.converged} wall={td:.2f} s", flush=True)
    _, si = solve_scipy(A, b, opt=opt)
    print(f"  scipy f64: iters={si.niterations} converged={si.converged}",
          flush=True)


if __name__ == "__main__":
    main()
