"""Graph orderings: RCM bandwidth reduction and nested dissection.

The reference wraps METIS's orderings (metis_nd / metis_ndsym nested
dissection, metis.h:148-263) alongside its partitioners.  On TPU an
ordering is not an optimization detail but a *format enabler*: the DIA
fast path (core/dia.py) requires small bandwidth, and RCM turns most
mesh-derived SPD matrices into bandable form — the TPU substitute for
gather-based unstructured SpMV (SURVEY.md §7 "hard parts").

  * ``rcm_order``        — reverse Cuthill-McKee (native C++ fast path via
                           _native.rcm_order, numpy fallback here).
  * ``nd_order``         — recursive nested dissection using the BFS
                           bisection of partitioner.py; vertex separators
                           ordered last (metis_ndsym analogue).
  * ``bandwidth``        — max |i - j| over nonzeros (quality metric).
  * ``permute_csr``      — symmetric permutation P A Pᵀ of a CSR matrix.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .. import _native


def bandwidth(rowptr: np.ndarray, colidx: np.ndarray) -> int:
    """max |i - j| over stored entries."""
    n = rowptr.shape[0] - 1
    if colidx.size == 0:
        return 0
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    return int(np.abs(rows - colidx).max())


def _rcm_python(rowptr: np.ndarray, colidx: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee, BFS with min-degree tie-breaking."""
    n = rowptr.shape[0] - 1
    degree = np.diff(rowptr)
    visited = np.zeros(n, dtype=bool)
    perm = np.empty(n, dtype=np.int64)
    idx = 0
    for comp_start in np.argsort(degree, kind="stable"):
        if visited[comp_start]:
            continue
        visited[comp_start] = True
        perm[idx] = comp_start
        idx += 1
        head = idx - 1
        while head < idx:
            u = perm[head]
            head += 1
            nbrs = colidx[rowptr[u]:rowptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = np.unique(nbrs)
                nbrs = nbrs[np.argsort(degree[nbrs], kind="stable")]
                visited[nbrs] = True
                perm[idx: idx + nbrs.size] = nbrs
                idx += nbrs.size
    return perm[::-1].copy()


def rcm_order(rowptr: np.ndarray, colidx: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee permutation: perm[k] = old index of new row k.

    Uses the native C++ implementation when built (acg_rcm_order),
    otherwise the numpy BFS above.
    """
    if _native.available():
        try:
            return _native.rcm_order(np.asarray(rowptr, dtype=np.int64),
                                     np.asarray(colidx, dtype=np.int32))
        except Exception:
            pass
    return _rcm_python(np.asarray(rowptr), np.asarray(colidx))


def _cluster_python(rowptr: np.ndarray, colidx: np.ndarray,
                    ball: int) -> np.ndarray:
    """Greedy BFS-ball clustering, pure-Python fallback."""
    n = rowptr.shape[0] - 1
    visited = np.zeros(n, dtype=bool)
    perm = np.empty(n, dtype=np.int64)
    idx = 0
    scan = 0
    frontier = 0
    while idx < n:
        seed = -1
        while frontier < idx and seed < 0:
            u = perm[frontier]
            nb = colidx[rowptr[u]:rowptr[u + 1]]
            un = nb[~visited[nb]]
            if un.size:
                seed = int(un[0])
            else:
                frontier += 1
        if seed < 0:
            while scan < n and visited[scan]:
                scan += 1
            seed = scan
        ballq = [seed]
        visited[seed] = True
        head = 0
        while head < len(ballq) and len(ballq) < ball:
            u = ballq[head]
            head += 1
            nb = colidx[rowptr[u]:rowptr[u + 1]]
            for v in nb[~visited[nb]][: ball - len(ballq)]:
                visited[v] = True
                ballq.append(int(v))
        perm[idx: idx + len(ballq)] = ballq
        idx += len(ballq)
    return perm


def cluster_order(rowptr: np.ndarray, colidx: np.ndarray,
                  ball: int = 128) -> np.ndarray:
    """Greedy BFS-ball clustering: emit consecutive compact
    neighbourhoods of ~``ball`` vertices (2-D locality) instead of RCM's
    thin BFS-level slices (1-D bandwidth).  This is the SELL fill lever:
    a 128-row tile of the permuted matrix is a graph ball, so its rows
    share column chunks and the per-(tile, chunk) lane density rises
    (measured fill 0.122 → ~0.15 on a 3-dof mesh solid vs RCM; the same
    role as a Morton order on mesh coordinates, but coordinate-free).
    The reference leans on RCM/METIS orderings only (metis.h:148-263) —
    its merge-CSR kernel is insensitive to ordering; the chunked-gather
    format is not."""
    if _native.has_cluster_order():
        return _native.cluster_order(np.asarray(rowptr, dtype=np.int64),
                                     np.asarray(colidx, dtype=np.int32),
                                     ball)
    return _cluster_python(np.asarray(rowptr), np.asarray(colidx), ball)


def nd_order(rowptr: np.ndarray, colidx: np.ndarray,
             leaf_size: int = 64, seed: int = 0) -> np.ndarray:
    """Nested-dissection permutation (metis_nd/metis_ndsym analogue).

    Recursively bisect the graph (BFS graph-growing, as partitioner.py),
    identify the vertex separator as the boundary vertices of the smaller
    side, and order [left, right, separator].  Leaves fall back to RCM.
    Returns perm with perm[k] = old index of new position k.
    """
    from .partitioner import partition_bfs_recursive

    rowptr = np.asarray(rowptr)
    colidx = np.asarray(colidx)
    n = rowptr.shape[0] - 1
    out: list[np.ndarray] = []

    def rec(nodes: np.ndarray, depth: int):
        if nodes.size <= leaf_size:
            if nodes.size:
                sub = _subgraph(rowptr, colidx, nodes)
                out.append(nodes[rcm_order(*sub)])
            return
        sub_rowptr, sub_colidx = _subgraph(rowptr, colidx, nodes)
        half = partition_bfs_recursive(sub_rowptr, sub_colidx, 2,
                                       seed=seed + depth)
        side0 = np.where(half == 0)[0]
        side1 = np.where(half == 1)[0]
        if side0.size == 0 or side1.size == 0:   # degenerate: stop dissecting
            sub = _subgraph(rowptr, colidx, nodes)
            out.append(nodes[rcm_order(*sub)])
            return
        # separator: vertices of the smaller side adjacent to the other side
        small, big = (side0, side1) if side0.size <= side1.size else (side1, side0)
        in_big = np.zeros(nodes.size, dtype=bool)
        in_big[big] = True
        sep_mask = np.zeros(nodes.size, dtype=bool)
        for u in small:
            nb = sub_colidx[sub_rowptr[u]:sub_rowptr[u + 1]]
            if np.any(in_big[nb]):
                sep_mask[u] = True
        sep = np.where(sep_mask)[0]
        rest_small = small[~sep_mask[small]]
        rec(nodes[rest_small], depth + 1)
        rec(nodes[big], depth + 1)
        if sep.size:
            out.append(nodes[sep])

    rec(np.arange(n, dtype=np.int64), 0)
    perm = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    assert perm.size == n
    return perm


def _subgraph(rowptr, colidx, nodes: np.ndarray):
    """CSR adjacency restricted to ``nodes`` (renumbered 0..len-1)."""
    n = rowptr.shape[0] - 1
    newid = np.full(n, -1, dtype=np.int64)
    newid[nodes] = np.arange(nodes.size)
    sub_rowptr = np.zeros(nodes.size + 1, dtype=np.int64)
    cols: list[np.ndarray] = []
    for k, u in enumerate(nodes):
        nb = newid[colidx[rowptr[u]:rowptr[u + 1]]]
        nb = nb[nb >= 0]
        cols.append(nb)
        sub_rowptr[k + 1] = sub_rowptr[k] + nb.size
    sub_colidx = (np.concatenate(cols) if cols else
                  np.empty(0, dtype=np.int64))
    return sub_rowptr, sub_colidx


def permute_csr(A: sp.csr_matrix, perm: np.ndarray) -> sp.csr_matrix:
    """Symmetric permutation: B = A[perm][:, perm] (B[i,j] = A[perm[i],perm[j]])."""
    return A[perm][:, perm].tocsr()
