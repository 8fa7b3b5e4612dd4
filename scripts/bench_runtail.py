"""Run-tail heavy-row benchmark: HeavySplitOperator on the ACG_HEAVY=2 regime.

The measured gap this closes (BENCHMARKS.md cap-and-tail): a 600k-row
mesh solid with one contiguous 2,048-entry heavy row per 128 rows drops
the plain SELL layout to fill 0.039 / 2.67 Gnnz/s, and the SELL-format
tail split measured NEGATIVE (scatter regime after compaction).  The
dense run-tail operator (core/heavy.py + ops/pallas_runtail.py) stores
heavy rows as dense per-row windows with dynamic x DMA — zero slot
padding — and the SELL main block recovers its mesh-only fill.

Stages:
  1. kernel validation: runtail_spmv vs numpy on the real tail windows
     (first Mosaic lowering of the traced-index SMEM-store pattern);
  2. kernel-alone throughput (tail nnz / time);
  3. operator A/B: plain SellOperator vs HeavySplitOperator SpMV
     (scipy-exactness + Gnnz/s; target >= 2x the 2.67 uncapped number);
  4. end-to-end pipelined-fused CG on the split operator.

Usage: python scripts/bench_runtail.py [nodes]   (real TPU)
       ACG_BENCH_CPU=1 for an interpret-mode smoke run.

Reference anchor: the merge-CSR kernel load-balances such rows by
construction (cg-kernels-cuda.cu:312-441); this is the TPU-format
answer for the same capability.
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

from bench_sell_capped import add_dense_rows, bench_spmv, timed  # noqa: E402
from bench_unstructured import build_matrix  # noqa: E402

SMALL = os.environ.get("ACG_BENCH_CPU") == "1"


def main():
    import jax
    import jax.numpy as jnp

    from acg_tpu.core.heavy import HeavySplitOperator
    from acg_tpu.core.sell import SellOperator, _round_up
    from acg_tpu.ops.pallas_runtail import runtail_spmv
    from acg_tpu.partition.ordering import cluster_order
    from acg_tpu.solvers.cg import CGOptions, solve

    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else (2000 if SMALL
                                                        else 200000)
    A = build_matrix(nodes)
    perm = cluster_order(A.indptr, A.indices, ball=256)
    A = A[perm][:, perm].tocsr()
    A = add_dense_rows(A, run=64 if SMALL else 2048,
                       every=32 if SMALL else 128)
    N = A.shape[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N).astype(np.float32)
    ref = A @ x

    # --- stage 1+2: the kernel alone on the real tail rows ----------------
    t0 = time.perf_counter()
    # SMALL smoke: run=64 sits below the default heavy threshold
    op = HeavySplitOperator.from_csr(A, threshold=100 if SMALL else None)
    live = int(np.sum(np.asarray(op.trows) < N))
    print(f"split build {time.perf_counter() - t0:.1f} s: "
          f"{live:,} segments on "
          f"{len(np.unique(np.asarray(op.trows)[:live])):,} rows, "
          f"tail slots {op.tvals.size:,}, main fill {op.main.fill:.3f}, "
          f"combined fill {op.fill:.3f}", flush=True)
    Nx = _round_up(N, 1024)
    xpad = jnp.zeros((Nx + 4 * 1024,), jnp.float32).at[:N].set(
        jnp.asarray(x))
    yt = np.asarray(runtail_spmv(op.tvals, op.tbase, xpad, Nx))
    # numpy oracle over the dense windows
    tv = np.asarray(op.tvals).reshape(op.ntail, -1)
    tb = np.asarray(op.tbase)
    tr = np.asarray(op.trows)
    xp_np = np.asarray(xpad)
    W = tv.shape[1]
    ref_t = np.array([np.dot(tv[i], xp_np[tb[i] * 1024: tb[i] * 1024 + W])
                      for i in range(op.ntail)])
    live = tr < N
    err = np.linalg.norm(yt[live] - ref_t[live]) / \
        max(np.linalg.norm(ref_t[live]), 1e-30)
    print(f"kernel validation: rel err {err:.2e} "
          f"({'OK' if err < 1e-5 else 'FAIL'})", flush=True)
    assert err < 1e-5

    def make_tail(iters):
        @jax.jit
        def run(tv_, tb_, v):
            def body(_, vv):
                y = runtail_spmv(tv_, tb_, vv, Nx)
                return vv.at[:y.shape[0]].add(y * 1e-9)
            return jax.lax.fori_loop(0, iters, body, v)[0]
        return run

    K1, K2 = (1, 3) if SMALL else (10, 60)
    per = (timed(make_tail(K2), op.tvals, op.tbase, xpad)
           - timed(make_tail(K1), op.tvals, op.tbase, xpad)) / (K2 - K1)
    tail_nnz = int(op.tvals.size)
    gbs = 2 * tail_nnz * 4 / per / 1e9   # vals read + x window read
    print(f"kernel alone: {per * 1e6:9.1f} us/pass  "
          f"{tail_nnz / per / 1e9:6.2f} Gslot/s  ~{gbs:.0f} GB/s",
          flush=True)

    # --- stage 3: operator A/B --------------------------------------------
    xp = jnp.zeros((op.Np,), jnp.float32).at[:N].set(jnp.asarray(x))
    y = np.asarray(op.spmv(xp))[:N]
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    print(f"split operator SpMV vs scipy: rel err {rel:.2e}", flush=True)
    assert rel < 1e-4
    bench_spmv(op, xp, A.nnz, "heavy-split")

    msb = int(float(os.environ.get("ACG_MSB_GB", "6")) * 1024**3)
    try:
        t0 = time.perf_counter()
        base = SellOperator.from_csr(A, max_stored_bytes=msb)
        print(f"uncapped baseline layout {time.perf_counter() - t0:.1f} s",
              flush=True)
        bench_spmv(base, xp, A.nnz, "uncapped ")
        del base
    except MemoryError as e:
        print(f"uncapped baseline INFEASIBLE at {msb / 1e9:.0f} GB: {e}",
              flush=True)

    # --- stage 4: end-to-end CG -------------------------------------------
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=50 if SMALL else 300,
                    residual_rtol=1e-5, check_every=1 if SMALL else 10,
                    dot_dtype="mixed")
    t0 = time.perf_counter()
    xs, info = solve(op, b, opt=opt, method="pipelined-fused")
    t1 = time.perf_counter() - t0
    errn = np.linalg.norm(xs - xstar)
    print(f"pipelined-fused CG: {info.niterations} iters, converged="
          f"{info.converged}, err {errn:.2e}, {t1:.1f} s incl. compile",
          flush=True)


if __name__ == "__main__":
    main()
