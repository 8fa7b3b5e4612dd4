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
    # halo plan (ragged all-to-all: exact wire volume, halo.c:687-769's
    # alltoallv without the max-edge padding).  Sender p packs, per
    # destination q, the requested rows ascending by global id; receiver
    # q's ghost list is sorted (owner, global) so the received segments
    # land contiguously IN GHOST ORDER — the exchange writes the ghost
    # buffer directly, no unpack.
    Sr: int                       # padded max total packed sends per device
    ragged_send_idx: np.ndarray   # (P, Sr) local owned idx, grouped by dest
    ragged_input_offsets: np.ndarray   # (P, P) [p,q] = start of q's data in p's sendbuf
    ragged_send_sizes: np.ndarray      # (P, P) [p,q] = comm_matrix[p,q]
    ragged_output_offsets: np.ndarray  # (P, P) [p,q] = where p's run starts in q's ghosts
    ragged_recv_sizes: np.ndarray      # (P, P) [p,q] = comm_matrix[q,p]
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
                             pad_to: int = 8,
                             local_order: str = "none") -> PartitionedMatrix:
    """Partition a full-storage symmetric CSR matrix by rows.

    ``part`` is the (N,) partition vector (from partitioner.py or a
    reference-format partition file).

    ``local_order="cluster"`` reorders each part's owned rows by a
    BFS-ball cluster order of the part's own subgraph (ordering.py)
    instead of ascending global id.  The local order is a free choice —
    every downstream consumer goes through rows_global/global_to_local —
    and the chunked-gather SELL layout is ordering-sensitive: 128-row
    tiles of a clustered local order share column chunks (measured
    single-chip fill 0.102 -> 0.121); ascending-global order inside a
    METIS-style part scatters tile neighbourhoods.

    Fully vectorized: every step is an O(nnz) numpy sort / prefix-sum /
    scatter — the same sort-based construction the reference implements
    with radix sorts in C (graph.c:582-807 interface discovery,
    graph.c:813-1529 subgraph assembly, symcsrmatrix.c:685-845 operator
    split).  Hot-path dtype discipline: every nnz-length array is int32
    (nnz < 2³¹ is asserted), cumulative counts run over N-length row
    arrays rather than nnz-length entry arrays, and the ELL scatters go
    through one flat raveled index per slab — 16.7M rows / 450M nnz (the
    BASELINE 256³ 27-point config) builds in about a minute on one host
    core; the round-1 per-row Python loops took hours at that scale.
    Set ACG_SETUP_TIMING=1 to print per-phase times.
    """
    import os
    import time as _time
    timing = os.environ.get("ACG_SETUP_TIMING") == "1"
    _t = _time.perf_counter()

    def _mark(label):
        nonlocal _t
        if timing:
            now = _time.perf_counter()
            print(f"    [setup] {label}: {now - _t:.2f} s", flush=True)
            _t = now

    A = A_full.tocsr()
    N = A.shape[0]
    part = np.asarray(part, dtype=np.int64)
    P = int(part.max()) + 1 if N else 1

    rowptr, colidx, data = A.indptr, A.indices, A.data
    nnz = int(colidx.shape[0])
    assert nnz < 2**31, "nnz must fit int32 for the vectorized setup path"
    part32 = part.astype(np.int32)

    # --- classify interior/border, establish local order -------------------
    # border row: any column owned elsewhere (graph.c:946-1133).  The
    # native streaming scan produces per-row class counts and the ghost
    # (part, col) keys in one pass; the numpy fallback materializes the
    # per-entry classification.
    from .. import _native
    use_native = _native.has_ell_split() and N > 0
    if use_native:
        cnt_own, cnt_gst, pc_keys = _native.ell_scan(rowptr, colidx, part32)
        is_border = cnt_gst > 0
    else:
        rowlen = np.diff(rowptr)
        row_of = np.repeat(np.arange(N, dtype=np.int32), rowlen)
        rpart = part32[row_of]           # (nnz,) owner of each entry's row
        cpart = part32[colidx]           # (nnz,) owner of each entry's col
        offp = rpart != cpart            # off-part (interface) entries
        gst_i = np.nonzero(offp)[0]      # interface entry positions
        cnt_gst = np.bincount(row_of[gst_i], minlength=N)
        cnt_own = rowlen - cnt_gst
        is_border = np.zeros(N, dtype=bool)
        is_border[row_of[gst_i]] = True
    _mark("classify entries")
    # per part: interior rows first, then border, each ascending global id
    order = np.lexsort((is_border, part))
    n_owned = np.bincount(part, minlength=P)
    n_bor = np.bincount(part[is_border], minlength=P)
    n_int = n_owned - n_bor
    starts = np.concatenate([[0], np.cumsum(n_owned)])
    if local_order == "cluster":
        from .ordering import cluster_order
        order = order.copy()
        for p in range(P):
            s0, e0 = int(starts[p]), int(starts[p + 1])
            rows_p = order[s0:e0]
            if len(rows_p) >= 256:   # below one ball the order is moot
                sub = A[rows_p][:, rows_p].tocsr()
                perm = cluster_order(sub.indptr.astype(np.int64),
                                     sub.indices.astype(np.int64))
                order[s0:e0] = rows_p[perm]
        _mark("local cluster order")
    elif local_order != "none":
        raise ValueError(f"unknown local_order {local_order!r}")
    L = _round_up(int(n_owned.max()), pad_to)
    rows_global = np.full((P, L), -1, dtype=np.int64)
    loc = np.arange(N, dtype=np.int64) - starts[part[order]]
    rows_global[part[order], loc] = order
    global_to_local = np.empty(N, dtype=np.int32)
    global_to_local[order] = loc
    _mark("local order")

    # --- ghosts: off-part columns of owned rows, sorted (owner, global) ----
    # unique (requesting part, ghost row) pairs from the interface entries
    if use_native:
        pg = np.unique(pc_keys)
    else:
        pg = np.unique(rpart[gst_i].astype(np.int64) * N + colidx[gst_i])
    gp_p = pg // N
    gp_g = pg % N
    gp_owner = part[gp_g]
    o2 = np.lexsort((gp_g, gp_owner, gp_p))   # by (part, owner, global)
    gp_p, gp_g, gp_owner = gp_p[o2], gp_g[o2], gp_owner[o2]
    npairs = gp_p.shape[0]
    n_ghost = np.bincount(gp_p, minlength=P)
    G = _round_up(max(int(n_ghost.max()), 1), pad_to)
    gstarts = np.concatenate([[0], np.cumsum(n_ghost)])
    gloc = np.arange(npairs, dtype=np.int64) - gstarts[gp_p]
    ghost_global = np.full((P, G), -1, dtype=np.int64)
    ghost_global[gp_p, gloc] = gp_g
    _mark("ghost discovery")

    # --- halo plan: per-part send buffers (union of all requests) ----------
    # exported[q] = sorted unique global rows of q requested by any part
    exp_g = np.unique(gp_g)                  # ascending; one owner each
    exp_owner = part[exp_g]
    eo = np.argsort(exp_owner, kind="stable")   # (owner, global) order
    exp_g, exp_owner = exp_g[eo], exp_owner[eo]
    n_send = np.bincount(exp_owner, minlength=P)
    S = _round_up(max(int(n_send.max()), 1), pad_to)
    estarts = np.concatenate([[0], np.cumsum(n_send)])
    eloc = np.arange(exp_g.shape[0], dtype=np.int64) - estarts[exp_owner]
    send_idx = np.zeros((P, S), dtype=np.int64)
    send_idx[exp_owner, eloc] = global_to_local[exp_g]
    slot_global = np.full(N, -1, dtype=np.int64)  # ghost row → send-buf slot
    slot_global[exp_g] = eloc

    ghost_src_dev = np.zeros((P, G), dtype=np.int64)
    ghost_src_slot = np.zeros((P, G), dtype=np.int64)
    ghost_src_dev[gp_p, gloc] = gp_owner
    ghost_src_slot[gp_p, gloc] = slot_global[gp_g]
    comm_matrix = np.zeros((P, P), dtype=np.int64)
    np.add.at(comm_matrix, (gp_owner, gp_p), 1)

    # --- pairwise (all-to-all) halo plan ------------------------------------
    # ghosts are sorted by (part, owner, global), so each p←q edge is a
    # contiguous run; position within the run is the pair-buffer slot
    # (the alltoallv sdispls/rdispls contract of halo.h:72-186, made static
    # by padding every edge to the max count M, per halo.c:883-891).
    M = _round_up(max(int(comm_matrix.max()), 1), pad_to)
    pair_send_idx = np.zeros((P, P, M), dtype=np.int64)
    ghost_src_pair_slot = np.zeros((P, G), dtype=np.int64)
    if npairs:
        runkey = gp_p * P + gp_owner
        run_start = np.concatenate([[True], runkey[1:] != runkey[:-1]])
        first_of_run = np.nonzero(run_start)[0]
        run_idx = np.cumsum(run_start) - 1
        pos = np.arange(npairs, dtype=np.int64) - first_of_run[run_idx]
        pair_send_idx[gp_owner, gp_p, pos] = global_to_local[gp_g]
        ghost_src_pair_slot[gp_p, gloc] = pos

    # --- ragged all-to-all halo plan ----------------------------------------
    # sender-side pack order: (owner, requester, global) — each sender's
    # buffer is its destinations' runs concatenated, ascending global
    # within a run; this matches the receiver's (owner, global)-sorted
    # ghost list, so received segments ARE the ghost runs.
    n_send_tot = comm_matrix.sum(axis=1)          # packed sends per sender
    Sr = _round_up(max(int(n_send_tot.max()) if P else 0, 1), pad_to)
    ragged_send_idx = np.zeros((P, Sr), dtype=np.int64)
    ragged_input_offsets = np.zeros((P, P), dtype=np.int64)
    ragged_output_offsets = np.zeros((P, P), dtype=np.int64)
    if npairs:
        o3 = np.lexsort((gp_g, gp_p, gp_owner))   # by (owner, dest, global)
        sg, sp_, sowner = gp_g[o3], gp_p[o3], gp_owner[o3]
        sstarts = np.concatenate([[0], np.cumsum(n_send_tot)])
        spos = np.arange(npairs, dtype=np.int64) - sstarts[sowner]
        ragged_send_idx[sowner, spos] = global_to_local[sg]
        # input offsets: exclusive prefix over destinations, per sender row
        ragged_input_offsets[:, 1:] = np.cumsum(comm_matrix, axis=1)[:, :-1]
        # output offsets: where sender p's run starts in q's ghost buffer =
        # sum over owners o < p of comm_matrix[o, q]
        ragged_output_offsets[1:, :] = np.cumsum(comm_matrix, axis=0)[:-1, :]
    _mark("halo plans")

    # --- local ELL operators -------------------------------------------------
    # Column renumbering: owned col → local slot; ghost col → ghost slot.
    K_own = max(int(cnt_own.max()) if N else 0, 1)
    K_gst = max(int(cnt_gst.max()) if N else 0, 1)
    own_colidx = np.zeros((P, K_own, L), dtype=np.int32)
    own_colidx[:, :, :] = np.arange(L, dtype=np.int32)[None, None, :]
    own_vals = np.zeros((P, K_own, L), dtype=np.float64)
    ghost_colidx = np.zeros((P, K_gst, L), dtype=np.int32)
    ghost_vals = np.zeros((P, K_gst, L), dtype=np.float64)
    _mark("slab alloc")

    if use_native:
        # one streaming C++ pass over all entries (scatter + per-part
        # binary-searched ghost slots)
        _native.ell_fill(rowptr, colidx, data, part32, global_to_local,
                         K_own, K_gst, L, ghost_global, n_ghost,
                         own_colidx, own_vals, ghost_colidx, ghost_vals)
        _mark("native ELL fill")
    else:
        # Per-entry slab index = rank among same-class entries of the
        # row.  Entries of a class appear in ascending position within
        # each row, so the rank of the j-th class entry overall is j
        # minus the row's class start — an N-length exclusive prefix over
        # per-row class counts (prefixsum.c construction) instead of an
        # nnz-length cumsum.
        own_i = np.nonzero(~offp)[0]
        ownstart = np.concatenate([[0], np.cumsum(cnt_own)]).astype(np.int32)
        gststart = np.concatenate([[0], np.cumsum(cnt_gst)]).astype(np.int32)
        row_own = row_of[own_i]
        rank_own = np.arange(own_i.shape[0], dtype=np.int32) \
            - ownstart[row_own]
        # flat raveled scatter into the (P, K, L) slabs: one int64 index
        # array per slab instead of three fancy-index arrays
        flat_own = (rpart[own_i].astype(np.int64) * K_own + rank_own) * L \
            + global_to_local[row_own]
        own_colidx.reshape(-1)[flat_own] = global_to_local[colidx[own_i]]
        own_vals.reshape(-1)[flat_own] = data[own_i]
        del own_i, row_own, rank_own, flat_own
        _mark("owned ELL")

        # ghost slot of (part, col): binary search in the (part, ghost)
        # pairs
        if npairs:
            row_gst = row_of[gst_i]
            rank_gst = np.arange(gst_i.shape[0], dtype=np.int32) \
                - gststart[row_gst]
            pg_key = gp_p * np.int64(N) + gp_g
            ko = np.argsort(pg_key)
            q_key = rpart[gst_i].astype(np.int64) * N + colidx[gst_i]
            gslot = gloc[ko][np.searchsorted(pg_key[ko], q_key)]
            flat_gst = (rpart[gst_i].astype(np.int64) * K_gst + rank_gst) \
                * L + global_to_local[row_gst]
            ghost_colidx.reshape(-1)[flat_gst] = gslot.astype(np.int32)
            ghost_vals.reshape(-1)[flat_gst] = data[gst_i]
        _mark("ghost ELL")

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
        Sr=Sr, ragged_send_idx=ragged_send_idx,
        ragged_input_offsets=ragged_input_offsets,
        ragged_send_sizes=comm_matrix.copy(),
        ragged_output_offsets=ragged_output_offsets,
        ragged_recv_sizes=comm_matrix.T.copy(),
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
