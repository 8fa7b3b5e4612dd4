"""Setup-path scaling benchmark (VERDICT round-1 missing #2 / next #4).

Times the full general-partition setup pipeline at BASELINE Config-3
scale — 3-D Poisson 256³ 27-point (N = 16.7M rows, ~450M nnz):

    generate DIA → assemble CSR → partition (bfs/multilevel) →
    build_partitioned_matrix (reorder, ghosts, halo plan, ELL split)

All host-side, single core (the reference does this in C with radix
sorts, graph.c:582-1529).  Round 1's per-row Python loops took hours at
this scale; the vectorized numpy construction is the fix being measured.

Usage: python scripts/bench_setup.py [n] [stencil] [parts]
       (defaults 256 27 8; use 64 for a quick check)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    stencil = int(sys.argv[2]) if len(sys.argv) > 2 else 27
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from acg_tpu.io.generators import dia_to_csr, poisson3d_dia
    from acg_tpu.partition.graph import build_partitioned_matrix
    from acg_tpu.partition.partitioner import edge_cut, partition

    t0 = time.perf_counter()
    offsets, vals = poisson3d_dia(n, stencil)
    t1 = time.perf_counter()
    print(f"generate DIA {n}^3 {stencil}-pt: {t1 - t0:8.2f} s", flush=True)

    A = dia_to_csr(offsets, vals)
    del vals
    t2 = time.perf_counter()
    print(f"assemble CSR (N={A.shape[0]:,}, nnz={A.nnz:,}): "
          f"{t2 - t1:8.2f} s", flush=True)

    part = partition(A.indptr.astype(np.int64), A.indices.astype(np.int64),
                     P, method="bfs", seed=1)
    t3 = time.perf_counter()
    cut = edge_cut(A.indptr, A.indices, part)
    t3b = time.perf_counter()
    print(f"partition (multilevel, P={P}): {t3 - t2:8.2f} s   "
          f"edge cut {cut:,} ({t3b - t3:.1f} s to measure)", flush=True)

    pm = build_partitioned_matrix(A, part)
    t4 = time.perf_counter()
    print(f"build_partitioned_matrix: {t4 - t3b:8.2f} s", flush=True)
    print(pm.describe().splitlines()[0], flush=True)
    print(f"TOTAL partition+build (the <60 s target scope): "
          f"{(t3 - t2) + (t4 - t3b):8.2f} s", flush=True)


if __name__ == "__main__":
    main()
