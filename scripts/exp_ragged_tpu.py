"""Execute the ragged-all-to-all halo on real TPU hardware.

The ragged halo (parallel/halo.ragged_halo — exact wire volume, the
halo.c:687-769 alltoallv analogue) has compiled everywhere but XLA:CPU
has no ragged-all-to-all thunk, so through round 3 it had never
EXECUTED.  shard_map programs run on the real chip at nparts=1
(scripts/bench_dist_sell.py proved the pattern), so this drives the
general-partition pipelined solve with halo="ragged" on the attached
chip and checks the result against halo="allgather" on the same
partition + the scipy oracle.

Usage: python scripts/exp_ragged_tpu.py [n]   (2-D Poisson grid n, default 64)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402


def main():
    import jax

    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    from acg_tpu.partition.graph import build_partitioned_matrix
    from acg_tpu.partition.partitioner import partition_bfs_recursive
    from acg_tpu.solvers.cg import CGOptions
    from acg_tpu.solvers.dist_cg import solve_dist_general

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nparts = len(jax.devices())
    print(f"devices: {jax.devices()} -> nparts={nparts}", flush=True)

    offsets, vals = poisson2d_dia(n)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    part = partition_bfs_recursive(A.indptr, A.indices, nparts, seed=0)
    pm = build_partitioned_matrix(A, part, pad_to=256)
    rng = np.random.default_rng(0)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    b = A @ xstar
    # f32 vectors + mixed dots: a MEASURED hardware constraint (2026-08-
    # 20) — the first f64 attempt failed in XLA's X64-rewrite pass
    # ("While rewriting computation to not contain X64 element types ...
    # not implemented: ragged-all-to-all f64"), i.e. the TPU f64
    # emulation cannot carry a ragged collective.  The production fast
    # path is f32 storage anyway, so the exact-volume halo is validated
    # where it is actually used; f64 solves take halo=allgather/alltoall.
    opt = CGOptions(max_iterations=500, residual_rtol=1e-5, check_every=10,
                    dot_dtype="mixed")

    results = {}
    for halo in ("allgather", "ragged"):
        t0 = time.perf_counter()
        try:
            x, info = solve_dist_general(pm, b, opt=opt, method="pipelined",
                                         halo=halo, dtype=np.float32)
        except Exception as e:
            print(f"halo={halo}: FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        dt = time.perf_counter() - t0
        err = np.linalg.norm(x - xstar)
        results[halo] = (x, info)
        print(f"halo={halo}: {info.niterations} iters, converged="
              f"{info.converged}, rnrm {info.rnrm2:.6e}, err {err:.3e} "
              f"({dt:.1f} s incl. compile)", flush=True)

    if len(results) == 2:
        xa, ia = results["allgather"]
        xr, ir = results["ragged"]
        print(f"residual match: allgather {ia.rnrm2:.9e} vs ragged "
              f"{ir.rnrm2:.9e} (iters {ia.niterations} vs {ir.niterations}); "
              f"max |x_a - x_r| = {np.abs(xa - xr).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
