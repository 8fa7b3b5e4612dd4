"""Cap-and-tail SELL benchmark — does the fill gain reach the wire?

Host accounting (scripts/exp_fill_levers.py) projects cluster-order fill
0.121 → ~0.24 when per-(row, chunk) runs are capped at 8 and the heavy
tail is compacted into its own small operator.  This measures the real
SpMV on the 600k-row mesh solid for the uncapped baseline and a cap
sweep, plus end-to-end pipelined-fused CG — the load-balance benefit the
reference's merge-CSR split gets by construction
(cg-kernels-cuda.cu:312-441).

Usage: python scripts/bench_sell_capped.py [nodes] [caps...]
       ACG_BENCH_CPU=1 for an interpret-mode smoke run.
       ACG_HEAVY=1 for a Chung-Lu power-law graph (hub rows with
       degree in the thousands).  Measured result: the SCATTER regime —
       every touched (tile, chunk) costs a full 8x128 slot group, and
       random columns give ~degree distinct chunks per row, so BOTH the
       uncapped and capped layouts are infeasible (fill 0.002).  The
       chunked-gather format needs column locality; reorder-first is
       the pipeline, and capping is orthogonal to chunk scatter.
       ACG_HEAVY=2 for the regime the cap IS designed for: a mesh solid
       with one locally-DENSE heavy row per tile (a contiguous ~2k-run
       each, the arrow/constraint-row pattern after reordering spreads
       heavy rows across tiles).  Uncapped, each heavy row forces
       ~run/8 slot groups on all 128 rows of its tile; capped, the
       beyond-cap entries compact into a small dense tail operator.
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
K1, K2 = (1, 3) if SMALL else (10, 60)
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


def bench_spmv(op, xp, nnz, label):
    import jax

    def make(iters):
        @jax.jit
        def run(op_, v):
            def body(_, vv):
                return op_.spmv(vv) * 1e-3
            return jax.lax.fori_loop(0, iters, body, v)[0]
        return run

    per = (timed(make(K2), op, xp) - timed(make(K1), op, xp)) / (K2 - K1)
    print(f"  {label}: fill={op.fill:.3f}  {per * 1e6:9.1f} us/spmv  "
          f"{nnz / per / 1e9:6.2f} Gnnz/s", flush=True)
    return per


def build_heavy_matrix(nodes: int, seed: int = 11, mean_degree: float = 12.0):
    """Chung-Lu power-law SPD system: most rows short, hub rows huge.

    Node weights w ~ Pareto(alpha=1.8); M = nodes*mean_degree/2 edges with
    both endpoints drawn proportional to w, symmetrized, deduped,
    Laplacian + I (diagonally dominant SPD).  Degree distribution has a
    genuine tail (max degree in the thousands at 500k nodes) — the case
    where per-(row, chunk) capping should pay, unlike the uniform mesh.
    """
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    w = (1.0 + rng.pareto(1.8, nodes)).astype(np.float64)
    p = w / w.sum()
    M = int(nodes * mean_degree / 2)
    t0 = time.perf_counter()
    i = rng.choice(nodes, size=M, p=p)
    j = rng.choice(nodes, size=M, p=p)
    keep = i != j
    i, j = i[keep], j[keep]
    G = sp.coo_matrix((np.ones(len(i)), (i, j)), shape=(nodes, nodes))
    G = ((G + G.T) > 0).astype(np.float64).tocsr()
    deg = np.diff(G.indptr)
    A = (sp.diags(deg + 1.0) - G).tocsr()
    print(f"chung-lu graph: {nodes:,} nodes, nnz={A.nnz:,}, degree "
          f"median={int(np.median(deg))} p99={int(np.percentile(deg, 99))} "
          f"max={int(deg.max())} ({time.perf_counter() - t0:.1f} s)",
          flush=True)
    return A


def add_dense_rows(A, run: int = 2048, every: int = 128, seed: int = 5):
    """Overlay one locally-dense heavy row per ``every`` rows: row i gets
    a contiguous ``run``-column band of entries (plus the symmetric
    column entries and a diagonal shift keeping A SPD via diagonal
    dominance).  This is the arrow / constraint-row pattern — the regime
    where per-(row, chunk) runs, not chunk scatter, dominate the SELL
    padding."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    N = A.shape[0]
    hubs = np.arange(0, N, every, dtype=np.int64)
    c0 = rng.integers(0, max(N - run, 1), size=len(hubs))
    r = np.repeat(hubs, run)
    c = (c0[:, None] + np.arange(run)[None, :]).ravel()
    keep = r != c
    B = sp.coo_matrix((np.full(keep.sum(), -0.01), (r[keep], c[keep])),
                      shape=A.shape)
    B = (B + B.T).tocsr()
    B.sum_duplicates()
    absrow = np.abs(B).sum(axis=1).A.ravel()
    H = (B + sp.diags(absrow + 1e-3)).tocsr()
    out = (A + H).tocsr()
    out.sum_duplicates()
    print(f"added {len(hubs):,} heavy rows (run {run}): nnz "
          f"{A.nnz:,} -> {out.nnz:,}", flush=True)
    return out


def main():
    import jax.numpy as jnp

    from acg_tpu.core.sell import CappedSellOperator, SellOperator
    from acg_tpu.partition.ordering import cluster_order
    from acg_tpu.solvers.cg import CGOptions, solve

    heavy = os.environ.get("ACG_HEAVY", "0")
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else \
        (2000 if SMALL else (500000 if heavy == "1" else 200000))
    caps = [int(c) for c in sys.argv[2:]] or [8, 16]
    A = build_heavy_matrix(nodes) if heavy == "1" else build_matrix(nodes)
    perm = cluster_order(A.indptr, A.indices, ball=256)
    A = A[perm][:, perm].tocsr()
    if heavy == "2":
        A = add_dense_rows(A, run=64 if SMALL else 2048,
                           every=32 if SMALL else 128)
    N = A.shape[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N).astype(np.float32)
    ref = A @ x

    t0 = time.perf_counter()
    # Heavy modes bound the uncapped baseline to a PRACTICAL build size:
    # the device-side fill transiently needs ~2x the final slabs
    # (unpacked lidx before pack_lidx), so near-13GB layouts thrash a
    # 16 GB chip — measured 27+ min stuck at 8 GB final.  The sized
    # MemoryError still reports the projected slots/fill.
    msb = int(float(os.environ.get(
        "ACG_MSB_GB", "4" if heavy != "0" else "13")) * 1024**3)
    try:
        base = SellOperator.from_csr(A, max_stored_bytes=msb)
    except MemoryError as e:
        # Heavy-tailed matrices are the motivating case for the cap: a
        # hub row forces every row in its G-bucket to pad to the hub's
        # chunk count, so the uncapped layout explodes (fill ~0.002 on
        # the Chung-Lu graph).  Report it and move on to the cap sweep.
        print(f"uncapped layout INFEASIBLE: {e}", flush=True)
    else:
        print(f"baseline layout {time.perf_counter() - t0:.1f} s",
              flush=True)
        xp = jnp.zeros((base.Np,), jnp.float32).at[:N].set(jnp.asarray(x))
        y = np.asarray(base.spmv(xp))[:N]
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-4
        bench_spmv(base, xp, A.nnz, "uncapped")
        del base

    best = None
    for cap in caps:
        t0 = time.perf_counter()
        try:
            op = CappedSellOperator.from_csr(A, cap=cap)
        except MemoryError as e:
            print(f"cap={cap}: INFEASIBLE: {e}", flush=True)
            continue
        tb = time.perf_counter() - t0
        ntail = op.tail_rows.shape[0] if op.tail is not None else 0
        print(f"cap={cap}: layout {tb:.1f} s, tail rows {ntail:,} "
              f"({(op.tail.nnz_true if op.tail else 0) / A.nnz:.1%} of nnz)",
              flush=True)
        xp = jnp.zeros((op.Np,), jnp.float32).at[:N].set(jnp.asarray(x))
        y = np.asarray(op.spmv(xp))[:N]
        err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert err < 1e-4, err
        per = bench_spmv(op, xp, A.nnz, f"cap={cap}  ")
        if best is None or per < best[1]:
            best = (cap, per, op)
        else:
            del op

    if best is None:
        print("no feasible cap layout — scatter-regime matrix (see "
              "docstring); reorder or partition instead", flush=True)
        return
    # end-to-end pipelined-fused CG on the best cap
    cap, per, op = best
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=200, residual_rtol=1e-5, check_every=CE)
    t0 = time.perf_counter()
    xs, info = solve(op, b, opt=opt, method="pipelined-fused")
    print(f"  CG (cap={cap}): iters={int(info.niterations)} "
          f"converged={info.converged} err={np.linalg.norm(xs - xstar):.2e} "
          f"wall={time.perf_counter() - t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
