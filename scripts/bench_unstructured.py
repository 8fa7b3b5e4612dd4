"""Unstructured SpMV benchmark — the merge-CSR capability check
(BASELINE Config 5; VERDICT round-1 missing #1).

The true Config-5 matrices (SuiteSparse Queen_4147 / Bump_2911) are not
fetchable from this container (no network egress — scripts/
fetch_suitesparse.py documents the block), so this benchmark builds a
structurally analogous SPD system: a 3-D random-geometric mesh (uniform
points, radius graph → irregular degrees) with 3 dofs per node (solid
mechanics block structure), symmetrized and diagonally dominated, in RCM
order — the class DIA cannot band (hundreds of thousands of distinct
offsets) but whose columns have the locality real RCM'd FEM matrices
have.

Measures, on the real TPU:
  * SellOperator chunked-gather SpMV (chunk 128 and 1024), Gnnz/s;
  * the gather-ELL fallback on the same matrix (the 0.139 Gnnz/s
    baseline of round 1);
  * end-to-end CG convergence cross-checked against scipy.

Usage: python scripts/bench_unstructured.py [nodes] (default 650000)
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
import scipy.sparse as sp  # noqa: E402

K1, K2 = 10, 60


def build_matrix(nodes: int, seed: int = 7, dofs: int = 3,
                 target_degree: float = 26.0):
    """3-D random-geometric graph × dofs-block SPD system, RCM-ordered."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    pts = rng.random((nodes, 3))
    # radius for the expected degree in a unit cube
    r = (target_degree / nodes * 3.0 / (4.0 * np.pi)) ** (1.0 / 3.0)
    t0 = time.perf_counter()
    tree = cKDTree(pts)
    pairs = tree.query_pairs(r, output_type="ndarray")
    print(f"geometric graph: {nodes:,} nodes, {len(pairs):,} edges "
          f"({time.perf_counter() - t0:.1f} s)", flush=True)
    i, j = pairs[:, 0], pairs[:, 1]
    G = sp.coo_matrix((np.ones(len(pairs)), (i, j)),
                      shape=(nodes, nodes)).tocsr()
    G = G + G.T
    perm = reverse_cuthill_mckee(G, symmetric_mode=True)
    G = G[perm][:, perm].tocsr()
    # expand to dofs×dofs blocks with random symmetric off-diagonal values
    A = sp.kron(G, np.ones((dofs, dofs)), format="csr")
    A.data = rng.standard_normal(A.nnz) * 0.5
    A = (A + A.T) * 0.5
    A = A.tocsr()
    # diagonal dominance → SPD
    rowsum = np.abs(A).sum(axis=1).A1
    A = A + sp.diags(rowsum + 1.0)
    A = A.tocsr()
    # RCM bandwidth diagnostic
    rows = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    bw = int(np.abs(A.indices - rows).max())
    noffsets = len(np.unique(A.indices - rows))
    print(f"matrix: N={A.shape[0]:,} nnz={A.nnz:,} rcm-bandwidth={bw:,} "
          f"distinct offsets={noffsets:,}", flush=True)
    return A


def bench_spmv(name, op, x, nnz, reps=5):
    """``op`` must be a registered pytree (SellOperator/EllOperator are):
    passing it as a jit ARGUMENT keeps the slot slabs out of the compiled
    program — closed-over device arrays become jaxpr constants, and a
    GB-scale constant blows past the compile-request size limit."""
    import jax

    def make(iters):
        @jax.jit
        def run(op_, xx):
            def body(_, v):
                return op_.spmv(v) * 1e-3
            return jax.lax.fori_loop(0, iters, body, xx)[0]
        return run

    def timed(run):
        r = run(op, x)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(op, x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(make(K1)), timed(make(K2))
    per = (t2 - t1) / (K2 - K1)
    print(f"  {name}: {per * 1e6:9.1f} us/spmv  {nnz / per / 1e9:7.2f} Gnnz/s",
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from acg_tpu.core.ell import EllOperator
    from acg_tpu.core.sell import SellOperator
    from acg_tpu.solvers.cg import CGOptions, solve
    from acg_tpu.solvers.reference import solve_scipy

    small = os.environ.get("ACG_BENCH_CPU") == "1"
    # 200k nodes × 3 dofs = 600k rows: the padded SELL layout of the
    # RCM'd wide-bandwidth mesh stays within the 13 GB stored-slot cap
    # (stored slots grow ~ bandwidth × N ~ N^(5/3) on 3-D meshes; larger
    # problems take the distributed path, where partitioning shrinks the
    # per-device bandwidth)
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else (2000 if small else 200000)
    A = build_matrix(nodes)
    # the framework's own preprocessing: BFS-ball clustering order packs
    # each 128-row tile with a compact graph neighbourhood — the SELL
    # fill lever (partition/ordering.cluster_order; measured RCM fill
    # 0.102 → 0.121 and 6.92 → 8.03 Gnnz/s on the 600k-row system;
    # fill plateaus for ball ≥ 192, scripts/exp_ball_sweep.py).
    # ACG_ORDER=rcm benches the RCM'd input directly.
    if os.environ.get("ACG_ORDER", "cluster") == "cluster":
        from acg_tpu.partition.ordering import cluster_order
        t0 = time.perf_counter()
        perm = cluster_order(A.indptr, A.indices,
                             ball=int(os.environ.get("ACG_BALL", "256")))
        A = A[perm][:, perm].tocsr()
        print(f"cluster order ({time.perf_counter() - t0:.1f} s + "
              f"permute)", flush=True)
    N = A.shape[0]
    rng = np.random.default_rng(0)
    xh = rng.standard_normal(N).astype(np.float32)

    ref = A @ xh
    t0 = time.perf_counter()
    op = SellOperator.from_csr(A, dtype=np.float32)
    tb = time.perf_counter() - t0
    xp = jnp.zeros((op.Np,), jnp.float32).at[:N].set(jnp.asarray(xh))
    y = np.asarray(op.spmv(xp))[:N]
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    print(f"sell: S={op.S} fill={op.fill:.3f} stored "
          f"{op.nnz * (op.dtype.itemsize + 4) / 1e9:.1f} GB "
          f"(layout {tb:.1f} s) rel-err {err:.1e}", flush=True)
    assert err < 1e-4
    bench_spmv("sell", op, xp, A.nnz)
    del op, xp

    if not small and N <= 4_200_000:
        # gather-ELL baseline (round-1 fallback): one rep is enough
        t0 = time.perf_counter()
        ci, v = [], []
        ell = EllOperator.from_csr_arrays(A.indptr, A.indices, A.data,
                                          dtype=np.float32) \
            if hasattr(EllOperator, "from_csr_arrays") else None
        if ell is not None:
            xp = jnp.zeros((ell.Np,), jnp.float32).at[:N].set(jnp.asarray(xh))
            bench_spmv("gather-ell", ell, xp, A.nnz, reps=2)
            del ell, xp

    # end-to-end CG cross-check vs scipy
    op = SellOperator.from_csr(A, dtype=np.float32)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    opt = CGOptions(max_iterations=200, residual_rtol=1e-5,
                    dot_dtype="mixed", check_every=10)
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
