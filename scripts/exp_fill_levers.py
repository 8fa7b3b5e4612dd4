"""Host-side accounting of SELL fill levers on the 600k-row mesh solid.

Computes, without building device slabs:
  (a) group-level fill of the current layout under cluster order;
  (b) cluster order + within-ball row sort by (length, first-chunk);
  (c) cap+tail split accounting: cap K_tc at R entries, tail entries go
      to a ROW-COMPACTED secondary layout (simulated by re-scanning the
      compacted tail CSR) — total slot traffic vs the single layout.

Usage: python scripts/exp_fill_levers.py [nodes]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402

from bench_unstructured import build_matrix  # noqa: E402

from acg_tpu.core.sell import sell_scan_phase  # noqa: E402
from acg_tpu.partition.ordering import cluster_order  # noqa: E402


def scan_stats(A, label):
    ntiles = -(-A.shape[0] // 128)
    ncols = A.shape[1]
    scan = sell_scan_phase(A, ntiles, ncols, use_native=True)
    slots = int(scan["Kg"].sum()) * 8 * 128
    print(f"{label}: groups={int(scan['Kg'].sum()):,} "
          f"fill={A.nnz / slots:.3f}", flush=True)
    return scan


def cap_tail(A, scan, caps):
    """Split runs at R entries; tail rows compacted (original order)."""
    rowptr = A.indptr.astype(np.int64)
    col = A.indices.astype(np.int64)
    nnz = len(col)
    N = A.shape[0]
    rowlen = np.diff(rowptr)
    row = np.repeat(np.arange(N, dtype=np.int64), rowlen)
    Cn = (max(A.shape[1], 1) + 127) // 128 + 1
    c = col >> 7
    key_rc = row * Cn + c
    run_start = np.ones(nnz, dtype=bool)
    run_start[1:] = key_rc[1:] != key_rc[:-1]
    first = np.nonzero(run_start)[0]
    run_id = np.cumsum(run_start) - 1
    rank = np.arange(nnz, dtype=np.int64) - first[run_id]
    for R in caps:
        tail_mask = rank >= R
        tail_nnz = int(tail_mask.sum())
        # main slots: per (tile, chunk) Kg with K_tc capped at R
        tile = row >> 7
        key_tc = tile * Cn + c
        # max capped run per (tile, chunk)
        run_len = np.diff(np.concatenate([first, [nnz]]))
        run_tc = key_tc[first]
        o = np.argsort(run_tc, kind="stable")
        rt = run_tc[o]
        tc_start = np.ones(len(o), dtype=bool)
        tc_start[1:] = rt[1:] != rt[:-1]
        tc_id = np.cumsum(tc_start) - 1
        n_tc = int(tc_id[-1]) + 1 if len(o) else 0
        Kmax = np.zeros(n_tc, dtype=np.int64)
        np.maximum.at(Kmax, tc_id, np.minimum(run_len[o], R))
        main_groups = int(((Kmax + 7) >> 3).sum())
        # tail: compacted rows, rescanned
        trow, tcol = row[tail_mask], col[tail_mask]
        tdata = np.ones(tail_nnz, dtype=np.float32)
        rows_u, trow_c = np.unique(trow, return_inverse=True)
        T = sp.csr_matrix((tdata, (trow_c, tcol)),
                          shape=(len(rows_u), A.shape[1]))
        tscan = sell_scan_phase(T, -(-T.shape[0] // 128), A.shape[1],
                                use_native=True)
        tail_groups = int(tscan["Kg"].sum())
        tot = (main_groups + tail_groups) * 1024
        print(f"  cap={R:3d}: tail={tail_nnz / nnz:5.1%} of nnz "
              f"({len(rows_u):,} rows) main fill="
              f"{(nnz - tail_nnz) / (main_groups * 1024):.3f} "
              f"tail fill={tail_nnz / max(tail_groups * 1024, 1):.3f} "
              f"TOTAL eff fill={nnz / tot:.3f}", flush=True)


def within_ball_sort(A, ball):
    """Permutation refining cluster order: sort rows within each ball
    by (row length, first chunk) — symmetric, keeps ball locality."""
    N = A.shape[0]
    rowlen = np.diff(A.indptr)
    firstc = A.indices[A.indptr[:-1]] >> 7
    perm = np.arange(N)
    for s in range(0, N, ball):
        e = min(s + ball, N)
        seg = np.lexsort((firstc[s:e], rowlen[s:e]))
        perm[s:e] = s + seg
    return perm


def main():
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    A0 = build_matrix(nodes)
    perm = cluster_order(A0.indptr, A0.indices, ball=256)
    A = A0[perm][:, perm].tocsr()
    scan = scan_stats(A, "cluster256")
    for ball in (128, 256):
        p2 = within_ball_sort(A, ball)
        A2 = A[p2][:, p2].tocsr()
        scan_stats(A2, f"cluster+sort{ball}")
    cap_tail(A, scan, caps=(8, 16, 24, 32))


if __name__ == "__main__":
    main()
