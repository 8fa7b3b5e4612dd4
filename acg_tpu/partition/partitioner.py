"""Row/graph partitioners (metis.c / graph.c:510-528 analogue).

The reference partitions the matrix sparsity graph with METIS k-way
edge-cut minimization (metis_partgraphsym, metis.c:118-190).  Here:

  * ``partition_contiguous`` — balanced contiguous row blocks.  For banded
    matrices (stencils in natural order, or RCM-reordered meshes) this is
    near-optimal: the edge cut is the bandwidth at P−1 block seams, the
    same as a METIS slab decomposition, and it keeps the banded structure
    each device needs for the DIA fast path.
  * ``partition_bfs_recursive`` — METIS-style edge-cut partitioner for
    unstructured graphs: recursive bisection by BFS level sets from a
    pseudo-peripheral vertex (graph-growing heuristic), with greedy
    boundary refinement.  Pure numpy; a native C++ implementation can be
    slotted behind the same signature.
  * partition-vector file parity: outputs are plain (N,) int arrays, which
    cli/mtxpartition.py writes in the reference's integer Matrix Market
    format so ``--partition=FILE`` files interoperate.
"""

from __future__ import annotations

import numpy as np

from ..errors import PartitionError


def partition_contiguous(N: int, nparts: int) -> np.ndarray:
    """Balanced contiguous blocks: part sizes differ by at most 1."""
    if nparts <= 0 or N < 0:
        raise PartitionError(f"invalid N={N}, nparts={nparts}")
    base, rem = divmod(N, nparts)
    sizes = np.full(nparts, base, dtype=np.int64)
    sizes[:rem] += 1
    return np.repeat(np.arange(nparts, dtype=np.int64), sizes)


def _frontier_neighbours(rowptr, colidx, frontier):
    """All neighbours of the frontier vertices (with repeats), vectorized:
    gather indices built from rowptr spans (no per-vertex Python loop)."""
    starts = rowptr[frontier]
    lens = rowptr[frontier + 1] - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=colidx.dtype)
    # idx = concat(arange(starts[i], starts[i]+lens[i])) via cumsum trick
    idx = np.ones(total, dtype=np.int64)
    heads = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx[heads] = starts
    idx[heads[1:]] -= starts[:-1] + lens[:-1] - 1
    return colidx[np.cumsum(idx)]


def _bfs_levels(rowptr, colidx, start, mask):
    """Level-synchronous BFS over the masked subgraph, vectorized per
    level; returns (visit order, level array)."""
    n = rowptr.shape[0] - 1
    level = np.full(n, -1, dtype=np.int64)
    order = [np.array([start], dtype=np.int64)]
    frontier = order[0]
    level[start] = 0
    d = 0
    while True:
        nbrs = _frontier_neighbours(rowptr, colidx, frontier)
        nxt = np.unique(nbrs[mask[nbrs] & (level[nbrs] < 0)])
        if nxt.size == 0:
            break
        level[nxt] = d + 1
        order.append(nxt)
        frontier = nxt
        d += 1
    return np.concatenate(order), level


def refine_greedy(rowptr, colidx, part, nparts: int, passes: int = 4,
                  tol: float = 0.03) -> np.ndarray:
    """Greedy boundary refinement (FM-style gains, vectorized): per pass,
    compute each boundary vertex's connectivity to every neighbouring part,
    and move it to the best part when the gain is positive and balance
    (±tol of the mean part size) allows.  The same objective as the native
    kway_refine (acg_native.cpp) and metis.c's refinement stage."""
    part = np.asarray(part, dtype=np.int64).copy()
    n = rowptr.shape[0] - 1
    rowlen = np.diff(rowptr)
    row_of = np.repeat(np.arange(n, dtype=np.int64), rowlen)
    sizes = np.bincount(part, minlength=nparts)
    maxsz = int(n / nparts * (1 + tol)) + 1
    for _ in range(passes):
        cpart = part[colidx]
        boundary_e = cpart != part[row_of]
        bverts = np.unique(row_of[boundary_e])
        if bverts.size == 0:
            break
        # connectivity counts per (boundary vertex, part) via sorted runs
        sel = np.isin(row_of, bverts)
        r, q = row_of[sel], cpart[sel]
        key = r * nparts + q
        ukey, cnt = np.unique(key, return_counts=True)
        ur, uq = ukey // nparts, ukey % nparts
        # per vertex: connectivity to own part and best other part
        own = np.zeros(n, dtype=np.int64)
        own_sel = uq == part[ur]
        own[ur[own_sel]] = cnt[own_sel]
        other = ~own_sel
        if not np.any(other):
            break
        orr, oq, oc = ur[other], uq[other], cnt[other]
        best = np.full(n, -1, dtype=np.int64)
        bestc = np.zeros(n, dtype=np.int64)
        o = np.lexsort((oc, orr))       # per vertex, max count last
        np.maximum.at(bestc, orr[o], oc[o])
        is_max = oc == bestc[orr]
        best[orr[is_max]] = oq[is_max]  # any argmax
        gain = bestc[bverts] - own[bverts]
        cand = bverts[gain > 0]
        # apply moves sequentially (tiny loop over boundary candidates)
        moved = 0
        for u in cand[np.argsort(-(gain[gain > 0]))]:
            p, t = int(part[u]), int(best[u])
            if sizes[t] + 1 <= maxsz and sizes[p] > 1:
                part[u] = t
                sizes[p] -= 1
                sizes[t] += 1
                moved += 1
        if moved == 0:
            break
    return part


def _pseudo_peripheral(rowptr, colidx, nodes, mask, rng):
    """A few BFS sweeps to find a far-apart vertex (standard heuristic)."""
    u = int(nodes[rng.integers(len(nodes))])
    for _ in range(3):
        order, level = _bfs_levels(rowptr, colidx, u, mask)
        far = order[-1]
        if level[far] <= level[u]:
            break
        u = int(far)
    return u


def partition_bfs_recursive(rowptr: np.ndarray, colidx: np.ndarray,
                            nparts: int, seed: int = 0) -> np.ndarray:
    """Recursive graph-growing bisection of the (full, symmetric) adjacency.

    Splits the vertex set by BFS order from a pseudo-peripheral vertex so
    each half is connected-ish and the interface is a quasi-level-set —
    the same goal as METIS recursive bisection (metis.c:118-190), without
    the multilevel machinery.  Handles disconnected graphs by restarting
    BFS in unvisited components.
    """
    n = rowptr.shape[0] - 1
    part = np.zeros(n, dtype=np.int64)
    rng = np.random.default_rng(seed)

    def bisect(nodes: np.ndarray, k: int, first_label: int):
        if k == 1:
            part[nodes] = first_label
            return
        k_left = k // 2
        target_left = int(round(len(nodes) * (k_left / k)))
        mask = np.zeros(n, dtype=bool)
        mask[nodes] = True
        visited: list[np.ndarray] = []
        count = 0
        remaining = set(nodes.tolist())
        while count < target_left and remaining:
            start = _pseudo_peripheral(
                rowptr, colidx, np.fromiter(remaining, dtype=np.int64), mask, rng)
            order, _ = _bfs_levels(rowptr, colidx, start, mask)
            take = order[: target_left - count]
            visited.append(take)
            count += len(take)
            mask[order] = False  # whole component visited or consumed
            remaining.difference_update(order.tolist())
            # re-enable unconsumed part of this component
            rest = order[len(take):]
            mask[rest] = True
            remaining.update(rest.tolist())
            if len(take) == len(order) and not remaining:
                break
        left = np.concatenate(visited) if visited else nodes[:target_left]
        lmask = np.zeros(n, dtype=bool)
        lmask[left] = True
        right = nodes[~lmask[nodes]]
        bisect(left, k_left, first_label)
        bisect(right, k - k_left, first_label + k_left)

    bisect(np.arange(n, dtype=np.int64), nparts, 0)
    return refine_greedy(rowptr, colidx, part, nparts)


def edge_cut(rowptr: np.ndarray, colidx: np.ndarray, part: np.ndarray) -> int:
    """Number of cut edges (quality metric; METIS's objective)."""
    rows = np.repeat(np.arange(rowptr.shape[0] - 1), np.diff(rowptr))
    cut = part[rows] != part[colidx]
    return int(cut.sum()) // 2


def partition(rowptr, colidx, nparts: int, method: str = "contiguous",
              seed: int = 0) -> np.ndarray:
    N = rowptr.shape[0] - 1
    if nparts == 1:
        return np.zeros(N, dtype=np.int64)
    if method == "contiguous":
        return partition_contiguous(N, nparts)
    if method in ("bfs", "metis-like", "native"):
        from .. import _native
        if _native.available():
            part = _native.partition_graph(rowptr, colidx, nparts, seed)
            if np.bincount(part, minlength=nparts).min() > 0:
                return part
            # degenerate native result (empty part): fall through to Python
        if method == "native":
            raise PartitionError("native partitioner not available")
        return partition_bfs_recursive(rowptr, colidx, nparts, seed)
    raise PartitionError(f"unknown partition method {method!r}")
