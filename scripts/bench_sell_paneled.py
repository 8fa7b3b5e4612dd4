"""Column-paneled SELL benchmark — the Config-5-size capability check.

BASELINE Config 5's Queen_4147 has 4,147,110 rows; the plain
SellOperator caps at ~3M columns (x resident in VMEM, core/sell.py
MAX_VMEM_ROWS) and the reference's merge kernel has no such cap
(cg-kernels-cuda.cu:358-441).  PaneledSellOperator lifts it by paneling
x into VMEM-sized column ranges (core/sell.py docstring).  This builds
a ≥4.2M-row RCM'd/cluster-ordered mesh solid — the same synthetic
stand-in for Queen_4147 as bench_unstructured.py (no network egress to
fetch SuiteSparse) — and measures the paneled SpMV on the real chip,
plus end-to-end pipelined CG vs scipy.

Target (VERDICT round-2 item 2): ≥5 Gnnz/s single-chip at ≥4.2M rows.

Usage: python scripts/bench_sell_paneled.py [nodes] [target_degree]
       (default 1,400,000 nodes x 3 dofs = 4.2M rows, degree ~15 to
       keep the slot slabs within HBM)
       ACG_BENCH_CPU=1 for a small interpret-mode smoke run.
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

from bench_unstructured import bench_spmv, build_matrix  # noqa: E402

SMALL = os.environ.get("ACG_BENCH_CPU") == "1"


def main():
    import jax.numpy as jnp

    from acg_tpu.core import sell as sell_mod
    from acg_tpu.core.sell import PaneledSellOperator, sell_from_csr
    from acg_tpu.partition.ordering import cluster_order
    from acg_tpu.solvers.cg import CGOptions, solve
    from acg_tpu.solvers.reference import solve_scipy

    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else \
        (3000 if SMALL else 1_400_000)
    degree = float(sys.argv[2]) if len(sys.argv) > 2 else \
        (26.0 if SMALL else 15.0)
    if SMALL:
        # shrink the panel machinery so the tiny matrix panels on CPU
        sell_mod.MAX_VMEM_ROWS = 4096
        sell_mod.PANEL_COLS = 2048
    # the host-side build (KD-tree + RCM + kron + cluster order) takes
    # ~10 min at 4.2M rows on this box — cache the ordered matrix so
    # TPU reruns skip it
    cache = f"/tmp/paneled_A_{nodes}_{degree:g}.npz"
    if not SMALL and os.path.exists(cache):
        import scipy.sparse as sp
        z = np.load(cache)
        A = sp.csr_matrix((z["data"], z["indices"], z["indptr"]),
                          shape=tuple(z["shape"]))
        print(f"loaded cached matrix {cache}: N={A.shape[0]:,} "
              f"nnz={A.nnz:,}", flush=True)
    else:
        A = build_matrix(nodes, target_degree=degree)
        t0 = time.perf_counter()
        perm = cluster_order(A.indptr, A.indices, ball=256)
        A = A[perm][:, perm].tocsr()
        print(f"cluster order {time.perf_counter() - t0:.1f} s",
              flush=True)
        if not SMALL:
            np.savez(cache, data=A.data.astype(np.float32),
                     indices=A.indices, indptr=A.indptr,
                     shape=np.array(A.shape))
    # round values to f32 so build-path and cache-path runs solve the
    # IDENTICAL system (the operator stores f32 anyway)
    A.data = A.data.astype(np.float32).astype(np.float64)
    N = A.shape[0]
    rng = np.random.default_rng(0)
    xh = rng.standard_normal(N).astype(np.float32)
    ref = A @ xh

    t0 = time.perf_counter()
    op = sell_from_csr(A, dtype=np.float32)
    tb = time.perf_counter() - t0
    stored_gb = op.nnz * (op.dtype.itemsize + 1) / 1e9
    if isinstance(op, PaneledSellOperator):
        print(f"paneled sell: {len(op.panels)} panels, fill={op.fill:.3f}, "
              f"stored {stored_gb:.1f} GB (layout {tb:.1f} s)", flush=True)
    else:
        # matrix small enough for the plain operator — still a valid
        # sanity run, but not the paneled measurement
        print(f"NOTE: ncols={op.ncols:,} fits VMEM; plain SellOperator "
              f"(fill={op.fill:.3f}, layout {tb:.1f} s)", flush=True)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:N].set(jnp.asarray(xh))
    y = np.asarray(op.spmv(xp))[:N]
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    print(f"  rel-err {err:.1e}", flush=True)
    assert err < 1e-4
    bench_spmv("paneled-sell", op, xp, A.nnz)
    del xp, y

    # end-to-end pipelined CG vs scipy
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=200, residual_rtol=1e-5,
                    dot_dtype="mixed", check_every=1 if SMALL else 10)
    t0 = time.perf_counter()
    xs, info = solve(op, b, opt=opt, method="pipelined")
    tsolve = time.perf_counter() - t0
    errs = np.linalg.norm(xs - xstar)
    _, sinfo = solve_scipy(A, b, opt=CGOptions(max_iterations=200,
                                               residual_rtol=1e-5))
    print(f"CG: iters={info.niterations} converged={info.converged} "
          f"err={errs:.2e} wall={tsolve:.2f} s | scipy iters="
          f"{sinfo.niterations} converged={sinfo.converged}", flush=True)


if __name__ == "__main__":
    main()
