"""Distributed SELL operator on the real chip — VERDICT r2 item 1 check.

Compares, on the same RCM'd 3-D mesh-solid SPD matrix
(scripts/bench_unstructured.build_matrix):

  * bare SellOperator SpMV (single-chip kernel, the 6.9 Gnnz/s path);
  * the SAME matrix through the DISTRIBUTED stack at nparts=1: partition
    -> PartitionedMatrix -> DistSellOperator -> shard_map(halo + owned +
    interface SELL kernels) — measuring the wrapper overhead (scatter,
    empty-halo collective, y_own + y_gst add).

Target: dist-per-SpMV within ~15% of bare (the reference's per-rank
merge-CSR dispatch, cgcuda.c:855-899, has the same structure: full +
interface kernels per rank).

Usage: python scripts/bench_dist_sell.py [nodes]   (default 200000)
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

from bench_unstructured import build_matrix, bench_spmv  # noqa: E402

K1, K2 = 10, 60


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from acg_tpu.core.sell import SellOperator
    from acg_tpu.parallel.dist_sell import (build_dist_sell,
                                            dist_sell_spmv_with_ghosts)
    from acg_tpu.parallel.halo import allgather_halo
    from acg_tpu.parallel.mesh import AXIS, make_mesh
    from acg_tpu.partition.graph import build_partitioned_matrix
    from acg_tpu.partition.partitioner import partition_bfs_recursive
    from acg_tpu.solvers.cg import CGOptions
    from acg_tpu.solvers.dist_cg import solve_dist_general

    small = os.environ.get("ACG_BENCH_CPU") == "1"
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else (2000 if small else 200000)
    nparts = len(jax.devices())
    A = build_matrix(nodes)
    # round-5 protocol: cluster-order the global matrix so the bare
    # baseline is the 8.03 Gnnz/s record path (fill 0.121), and the
    # distributed layout gets the round-4 levers on top (per-part
    # local_order="cluster" + the elementwise-max bucket DP)
    from acg_tpu.partition.ordering import cluster_order
    t0 = time.perf_counter()
    perm = cluster_order(A.indptr, A.indices, ball=256)
    A = A[perm][:, perm].tocsr()
    print(f"cluster order {time.perf_counter() - t0:.1f} s", flush=True)
    N = A.shape[0]
    rng = np.random.default_rng(0)
    xh = rng.standard_normal(N).astype(np.float32)
    ref = A @ xh

    # --- bare single-chip kernel -----------------------------------------
    op = SellOperator.from_csr(A, dtype=np.float32)
    xp = jnp.zeros((op.Np,), jnp.float32).at[:N].set(jnp.asarray(xh))
    y = np.asarray(op.spmv(xp))[:N]
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    print(f"bare sell: fill={op.fill:.3f} rel-err {err:.1e}", flush=True)
    assert err < 1e-4
    t_bare = bench_spmv("bare-sell", op, xp, A.nnz)
    del op, xp

    # --- distributed stack at nparts devices -----------------------------
    t0 = time.perf_counter()
    part = partition_bfs_recursive(A.indptr, A.indices, nparts, seed=0)
    pm = build_partitioned_matrix(A, part, pad_to=256,
                                  local_order="cluster")
    t_part = time.perf_counter() - t0
    t0 = time.perf_counter()
    dso = build_dist_sell(pm)
    t_lay = time.perf_counter() - t0
    print(f"dist layout: P={pm.P} L={pm.L:,} G={pm.G:,} "
          f"fill={dso.fill:.3f} (partition {t_part:.1f} s, "
          f"layout {t_lay:.1f} s)", flush=True)

    mesh = make_mesh(pm.P)
    stk = NamedSharding(mesh, P(AXIS))
    own_t = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), stk), dso.own.tree())
    gst_t = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), stk), dso.gst.tree())
    hargs = [jax.device_put(jnp.asarray(pm.send_idx.astype(np.int32)), stk),
             jax.device_put(jnp.asarray(pm.ghost_src_dev.astype(np.int32)),
                            stk),
             jax.device_put(jnp.asarray(pm.ghost_src_slot.astype(np.int32)),
                            stk)]
    from acg_tpu.partition.graph import scatter_vector
    x_l = jax.device_put(scatter_vector(pm, xh).astype(np.float32), stk)
    own_ncols, gst_ncols = dso.own.ncols, dso.gst.ncols

    def make(iters):
        @jax.jit
        def run(own, gst, xx, si, gd, gs):
            def local(own_, gst_, xl, si_, gd_, gs_):
                sq = lambda t: jax.tree_util.tree_map(lambda v: v[0], t)
                ol, gl = sq(own_), sq(gst_)
                xl0, si0, gd0, gs0 = xl[0], si_[0], gd_[0], gs_[0]

                def body(_, v):
                    ghosts = allgather_halo(v, si0, gd0, gs0, AXIS)
                    return dist_sell_spmv_with_ghosts(
                        ol, gl, v, ghosts, own_ncols, gst_ncols) * 1e-3
                return lax.fori_loop(0, iters, body, xl0)[None]
            return shard_map(local, mesh=mesh,
                             in_specs=(P(AXIS),) * 6,
                             out_specs=P(AXIS), check_vma=False)(
                                 own, gst, xx, si, gd, gs)
        return run

    # correctness first: one dist SpMV vs scipy
    one = make(1)
    y_l = one(own_t, gst_t, x_l, *hargs)
    from acg_tpu.partition.graph import gather_vector
    yd = gather_vector(pm, np.asarray(y_l)) * 1e3
    errd = np.linalg.norm(yd - ref) / np.linalg.norm(ref)
    print(f"dist sell: rel-err {errd:.1e}", flush=True)
    assert errd < 1e-4

    def timed(run):
        r = run(own_t, gst_t, x_l, *hargs)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(run(own_t, gst_t, x_l, *hargs))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(make(K1)), timed(make(K2))
    t_dist = (t2 - t1) / (K2 - K1)
    print(f"  dist-sell: {t_dist * 1e6:9.1f} us/spmv "
          f"{A.nnz / t_dist / 1e9:7.2f} Gnnz/s "
          f"(overhead vs bare: {100 * (t_dist / t_bare - 1):+.1f}%)",
          flush=True)

    # end-to-end distributed solve cross-check
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=200, residual_rtol=1e-5,
                    dot_dtype="mixed", check_every=10)
    t0 = time.perf_counter()
    xs, info = solve_dist_general(pm, b, opt=opt, method="pipelined",
                                  operator="sell", sell_op=dso)
    tsolve = time.perf_counter() - t0
    errs = np.linalg.norm(xs - xstar)
    print(f"dist CG: iters={info.niterations} converged={info.converged} "
          f"err={errs:.2e} wall={tsolve:.2f} s", flush=True)


if __name__ == "__main__":
    main()
