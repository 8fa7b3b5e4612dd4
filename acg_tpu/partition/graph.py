"""Distributed-matrix construction: reorder, ghost discovery, halo plan.

The analogue of the reference's graph layer (acg/graph.{h,c}): given a full
symmetric CSR matrix and a partition vector, build for every part

  * the local row order **interior → border** (+ ghosts appended after the
    owned block), mirroring graph.h:199-243;
  * the ghost list (off-part columns referenced by owned rows), sorted by
    owning part then global index (graph.c:1020-1133);
  * the halo plan: which owned entries each part must export, and where
    each ghost slot is filled from (graph.c:1898-1981 / halo.h:72-186).

All per-part arrays are padded to the max across parts — `shard_map`
requires uniform shapes per device; the padding is inert by the zero-value
invariant (padded rows carry zero matrix entries, padded send slots are
never read by any receiver).

The halo plan targets the all-gather exchange: each part packs one send
buffer serving *all* neighbours (slot-addressed), receivers pick their
ghosts out of the gathered (P, S_max) table.  This adopts the reference's
NVSHMEM trick of sizing symmetric buffers to the global max
(halo.c:883-891) as the way to satisfy XLA's static-shape rule.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class PartitionedMatrix:
    """Host-side partitioned matrix + halo plan (stacked per-part arrays)."""

    P: int
    N: int
    part: np.ndarray              # (N,) owning part per global row
    # local ordering
    rows_global: np.ndarray       # (P, L) global row id per local slot (-1 pad)
    global_to_local: np.ndarray   # (N,) local slot of each global row
    n_owned: np.ndarray           # (P,)
    n_interior: np.ndarray        # (P,)
    n_border: np.ndarray          # (P,)
    L: int                        # padded owned length (max over parts)
    # ghosts
    ghost_global: np.ndarray      # (P, G) global row id per ghost slot (-1 pad)
    n_ghost: np.ndarray           # (P,)
    G: int
    # halo plan (all-gather addressing)
    send_idx: np.ndarray          # (P, S) local owned idx to pack (0 pad)
    n_send: np.ndarray            # (P,)
    S: int
    ghost_src_dev: np.ndarray     # (P, G) source part per ghost slot
    ghost_src_slot: np.ndarray    # (P, G) slot in source part's send buffer
    comm_matrix: np.ndarray       # (P, P) words sent p→q (for --output-comm-matrix)
    # halo plan (pairwise all-to-all addressing, the neighbor-alltoallv
    # analogue: per-destination send buffers padded to the max pair count)
    M: int                        # padded max entries on any p→q edge
    pair_send_idx: np.ndarray     # (P, P, M) sender p, row q = local idx to pack
    ghost_src_pair_slot: np.ndarray  # (P, G) slot within the (src→p) pair row
    # local operators (ELL slabs, columns in local numbering)
    own_colidx: np.ndarray        # (P, K_own, L) cols into owned vector
    own_vals: np.ndarray          # (P, K_own, L)
    ghost_colidx: np.ndarray      # (P, K_gst, L) cols into ghost buffer
    ghost_vals: np.ndarray        # (P, K_gst, L)

    @property
    def nnz_local_max(self) -> int:
        return self.own_vals.shape[1] * self.L + self.ghost_vals.shape[1] * self.L

    def describe(self) -> str:
        """Human-readable partition/halo summary (the acggraph_fwrite /
        acghalo_fwrite debug printers, graph.c:404 / halo.c:356)."""
        lines = [f"partitioned matrix: N={self.N} parts={self.P} "
                 f"L={self.L} G={self.G} S={self.S} M={self.M}"]
        for p in range(self.P):
            neigh = np.where(self.comm_matrix[:, p] > 0)[0]
            lines.append(
                f"  part {p}: owned={self.n_owned[p]} "
                f"(interior={self.n_interior[p]}, border={self.n_border[p]}) "
                f"ghosts={self.n_ghost[p]} sends={self.n_send[p]} "
                f"neighbours={neigh.tolist()}")
        total = int(self.comm_matrix.sum())
        lines.append(f"  halo volume: {total} words/exchange "
                     f"({total * 8} B at f64)")
        return "\n".join(lines)


def build_partitioned_matrix(A_full: sp.csr_matrix, part: np.ndarray,
                             pad_to: int = 8) -> PartitionedMatrix:
    """Partition a full-storage symmetric CSR matrix by rows.

    ``part`` is the (N,) partition vector (from partitioner.py or a
    reference-format partition file).
    """
    A = A_full.tocsr()
    N = A.shape[0]
    part = np.asarray(part, dtype=np.int64)
    P = int(part.max()) + 1 if N else 1

    rowptr, colidx, data = A.indptr, A.indices, A.data

    # --- classify interior/border, establish local order -------------------
    rows_of = [np.where(part == p)[0] for p in range(P)]
    # border row: any column owned elsewhere (graph.c:946-1133 classification)
    row_owner = part
    local_order: list[np.ndarray] = []
    n_int = np.zeros(P, dtype=np.int64)
    n_bor = np.zeros(P, dtype=np.int64)
    for p in range(P):
        rows = rows_of[p]
        is_border = np.zeros(len(rows), dtype=bool)
        for j, r in enumerate(rows):
            cols = colidx[rowptr[r]:rowptr[r + 1]]
            if np.any(row_owner[cols] != p):
                is_border[j] = True
        interior = rows[~is_border]
        border = rows[is_border]
        n_int[p], n_bor[p] = len(interior), len(border)
        local_order.append(np.concatenate([interior, border]))

    n_owned = np.array([len(r) for r in rows_of], dtype=np.int64)
    L = _round_up(int(n_owned.max()), pad_to)
    rows_global = np.full((P, L), -1, dtype=np.int64)
    global_to_local = np.full(N, -1, dtype=np.int64)
    for p in range(P):
        rows_global[p, : n_owned[p]] = local_order[p]
        global_to_local[local_order[p]] = np.arange(n_owned[p])

    # --- ghosts: off-part columns of owned rows, sorted (owner, global) ----
    ghosts: list[np.ndarray] = []
    for p in range(P):
        rows = local_order[p]
        cols = np.unique(np.concatenate(
            [colidx[rowptr[r]:rowptr[r + 1]] for r in rows])) if len(rows) else np.array([], np.int64)
        g = cols[row_owner[cols] != p]
        order = np.lexsort((g, row_owner[g]))
        ghosts.append(g[order])
    n_ghost = np.array([len(g) for g in ghosts], dtype=np.int64)
    G = _round_up(max(int(n_ghost.max()), 1), pad_to)
    ghost_global = np.full((P, G), -1, dtype=np.int64)
    for p in range(P):
        ghost_global[p, : n_ghost[p]] = ghosts[p]

    # --- halo plan: per-part send buffers (union of all requests) ----------
    # exported[q] = sorted unique global rows of q requested by any other part
    requested: list[set] = [set() for _ in range(P)]
    for p in range(P):
        for g in ghosts[p]:
            requested[row_owner[g]].add(int(g))
    exported = [np.array(sorted(s), dtype=np.int64) for s in requested]
    n_send = np.array([len(e) for e in exported], dtype=np.int64)
    S = _round_up(max(int(n_send.max()), 1), pad_to)
    send_idx = np.zeros((P, S), dtype=np.int64)
    slot_of: list[dict] = []
    for q in range(P):
        send_idx[q, : n_send[q]] = global_to_local[exported[q]]
        slot_of.append({int(g): i for i, g in enumerate(exported[q])})

    ghost_src_dev = np.zeros((P, G), dtype=np.int64)
    ghost_src_slot = np.zeros((P, G), dtype=np.int64)
    comm_matrix = np.zeros((P, P), dtype=np.int64)
    for p in range(P):
        for i, g in enumerate(ghosts[p]):
            q = int(row_owner[g])
            ghost_src_dev[p, i] = q
            ghost_src_slot[p, i] = slot_of[q][int(g)]
            comm_matrix[q, p] += 1

    # --- pairwise (all-to-all) halo plan ------------------------------------
    # pair_request[q][p] = sorted global ids q must send to p.  ghosts[p] is
    # sorted by (owner, global), so p's ghosts from q form a contiguous
    # sorted run — its position within the run is the pair-buffer slot
    # (the alltoallv sdispls/rdispls contract of halo.h:72-186, made static
    # by padding every edge to the max count M, per halo.c:883-891).
    M = _round_up(max(int(comm_matrix.max()), 1), pad_to)
    pair_send_idx = np.zeros((P, P, M), dtype=np.int64)
    ghost_src_pair_slot = np.zeros((P, G), dtype=np.int64)
    for p in range(P):
        gsd = ghost_src_dev[p, : n_ghost[p]]
        for q in range(P):
            sel = np.where(gsd == q)[0]
            if sel.size == 0:
                continue
            ids = ghosts[p][sel]                     # sorted globals from q
            pair_send_idx[q, p, : sel.size] = global_to_local[ids]
            ghost_src_pair_slot[p, sel] = np.arange(sel.size)

    # --- local ELL operators -------------------------------------------------
    # Column renumbering: owned col → local slot; ghost col → ghost slot.
    own_rows_ell, ghost_rows_ell = [], []
    K_own = K_gst = 0
    per_part = []
    for p in range(P):
        rows = local_order[p]
        gslot = {int(g): i for i, g in enumerate(ghosts[p])}
        own_entries, gst_entries = [], []
        for li, r in enumerate(rows):
            o, g = [], []
            for k in range(rowptr[r], rowptr[r + 1]):
                c, v = colidx[k], data[k]
                if row_owner[c] == p:
                    o.append((global_to_local[c], v))
                else:
                    g.append((gslot[int(c)], v))
            own_entries.append(o)
            gst_entries.append(g)
        K_own = max(K_own, max((len(o) for o in own_entries), default=0))
        K_gst = max(K_gst, max((len(g) for g in gst_entries), default=0))
        per_part.append((own_entries, gst_entries))

    K_gst = max(K_gst, 1)
    K_own = max(K_own, 1)
    own_colidx = np.zeros((P, K_own, L), dtype=np.int32)
    own_vals = np.zeros((P, K_own, L), dtype=np.float64)
    ghost_colidx = np.zeros((P, K_gst, L), dtype=np.int32)
    ghost_vals = np.zeros((P, K_gst, L), dtype=np.float64)
    for p in range(P):
        own_entries, gst_entries = per_part[p]
        # padding col targets: the row itself (inert: val 0)
        own_colidx[p, :, :] = np.arange(L, dtype=np.int32)[None, :] % max(L, 1)
        for li, o in enumerate(own_entries):
            for k, (c, v) in enumerate(o):
                own_colidx[p, k, li] = c
                own_vals[p, k, li] = v
        for li, g in enumerate(gst_entries):
            for k, (c, v) in enumerate(g):
                ghost_colidx[p, k, li] = c
                ghost_vals[p, k, li] = v

    return PartitionedMatrix(
        P=P, N=N, part=part,
        rows_global=rows_global, global_to_local=global_to_local,
        n_owned=n_owned, n_interior=n_int, n_border=n_bor, L=L,
        ghost_global=ghost_global, n_ghost=n_ghost, G=G,
        send_idx=send_idx, n_send=n_send, S=S,
        ghost_src_dev=ghost_src_dev, ghost_src_slot=ghost_src_slot,
        comm_matrix=comm_matrix,
        M=M, pair_send_idx=pair_send_idx,
        ghost_src_pair_slot=ghost_src_pair_slot,
        own_colidx=own_colidx, own_vals=own_vals,
        ghost_colidx=ghost_colidx, ghost_vals=ghost_vals,
    )


def scatter_vector(pm: PartitionedMatrix, x: np.ndarray) -> np.ndarray:
    """Global (N,) vector → stacked local owned blocks (P, L), zero-padded
    (acgvector_scatter analogue)."""
    out = np.zeros((pm.P, pm.L), dtype=x.dtype)
    for p in range(pm.P):
        n = pm.n_owned[p]
        out[p, :n] = x[pm.rows_global[p, :n]]
    return out


def gather_vector(pm: PartitionedMatrix, xl: np.ndarray) -> np.ndarray:
    """Stacked local owned blocks (P, L) → global (N,) vector."""
    x = np.zeros(pm.N, dtype=xl.dtype)
    for p in range(pm.P):
        n = pm.n_owned[p]
        x[pm.rows_global[p, :n]] = xl[p, :n]
    return x
