"""Partition quality: edge-cut table (VERDICT round-1 next #6).

Compares, per mesh:
  * multilevel  — native heavy-edge-matching multilevel k-way
                  (acg_native.cpp partition_graph) when available,
                  else the Python graph-growing + greedy refinement;
  * bfs-python  — the pure-Python recursive graph-growing partitioner
                  (partition_bfs_recursive, includes refine_greedy);
  * bfs-norefine — the same without the refinement pass (isolates the
                  refinement contribution the round-1 fallback lacked);
  * contiguous  — balanced contiguous row slabs (natural order);
  * ideal       — the analytic minimal slab cut for the structured
                  meshes (P-1 planar interfaces), a lower-bound anchor.

Meshes: 2-D 5-pt Poisson (natural order), 3-D 27-pt Poisson (natural
order), and a randomly-permuted 2-D Poisson (the "shuffled unstructured
mesh" case — contiguous slabs are near-worst-case there, the graph
partitioners must rediscover the geometry).

The reference's analogue is METIS k-way via metis.c:118-190; the quality
bar is that multilevel/bfs cuts land within a small factor of the ideal
slab cut on structured meshes and far below contiguous on shuffled ones.

Usage: python scripts/bench_partition_quality.py [n2d] [n3d] [P]
       (defaults 512 64 8; host-only, no TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def bench_mesh(name, A, P, ideal=None, seed=1):
    from acg_tpu import _native
    from acg_tpu.partition.partitioner import (edge_cut,
                                               partition_bfs_recursive,
                                               partition_contiguous,
                                               refine_greedy)

    rowptr = A.indptr.astype(np.int64)
    colidx = A.indices.astype(np.int64)
    N = A.shape[0]
    rows = []

    def record(label, part, secs):
        cut = edge_cut(rowptr, colidx, part)
        sizes = np.bincount(part, minlength=P)
        imb = sizes.max() / (N / P)
        rows.append((label, cut, imb, secs))

    if _native.available():
        t0 = time.perf_counter()
        part = _native.partition_graph(rowptr, colidx, P, seed)
        record("multilevel", part, time.perf_counter() - t0)

    t0 = time.perf_counter()
    part = partition_bfs_recursive(rowptr, colidx, P, seed)
    record("bfs-python", part, time.perf_counter() - t0)

    # same bisection, refinement stripped (monkey-free: re-run the
    # bisection then skip refine by calling with passes=0)
    t0 = time.perf_counter()
    import acg_tpu.partition.partitioner as pp
    saved = pp.refine_greedy
    try:
        pp.refine_greedy = lambda rp, ci, part, k, **kw: part
        part = partition_bfs_recursive(rowptr, colidx, P, seed)
    finally:
        pp.refine_greedy = saved
    record("bfs-norefine", part, time.perf_counter() - t0)

    t0 = time.perf_counter()
    part = partition_contiguous(N, P)
    record("contiguous", part, time.perf_counter() - t0)

    print(f"\n== {name}: N={N:,} nnz={A.nnz:,} P={P}"
          + (f"  (ideal slab cut {ideal:,})" if ideal else ""))
    for label, cut, imb, secs in rows:
        rel = f"  {cut / ideal:5.2f}x ideal" if ideal else ""
        print(f"  {label:13s} cut={cut:>10,}  imbalance={imb:.3f}  "
              f"({secs:6.2f} s){rel}", flush=True)


def main():
    import scipy.sparse as sp

    from acg_tpu.io.generators import dia_to_csr, poisson2d_dia, poisson3d_dia

    n2 = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n3 = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    # 2-D 5-pt, natural order.  Ideal slab cut: (P-1) rows of n vertices,
    # 1 edge each across the seam.
    A2 = dia_to_csr(*poisson2d_dia(n2))
    bench_mesh(f"poisson2d n={n2} 5pt", A2, P, ideal=(P - 1) * n2)

    # 3-D 27-pt, natural order.  Each seam plane: n² vertices × edges to
    # 9 neighbours in the next plane.
    A3 = dia_to_csr(*poisson3d_dia(n3, 27))
    bench_mesh(f"poisson3d n={n3} 27pt", A3, P, ideal=(P - 1) * n3 * n3 * 9)

    # shuffled 2-D mesh — destroys natural-order locality entirely
    rng = np.random.default_rng(0)
    perm = rng.permutation(A2.shape[0])
    Ps = sp.eye(A2.shape[0], format="csr", dtype=A2.dtype)[perm]
    A2s = (Ps @ A2 @ Ps.T).tocsr()
    bench_mesh(f"poisson2d n={n2} shuffled", A2s, P, ideal=(P - 1) * n2)


if __name__ == "__main__":
    main()
