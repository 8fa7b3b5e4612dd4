"""Vectorized build_partitioned_matrix vs the original per-row loop
construction (kept here as the oracle): every output array must match
exactly — same orderings, same padding, same halo plan."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.partition.graph import PartitionedMatrix, build_partitioned_matrix


def _round_up(x, m):
    return -(-x // m) * m


def build_loops(A_full, part, pad_to=8):
    """Round-1 per-row/per-entry loop construction (the semantics oracle)."""
    A = A_full.tocsr()
    N = A.shape[0]
    part = np.asarray(part, dtype=np.int64)
    P = int(part.max()) + 1 if N else 1
    rowptr, colidx, data = A.indptr, A.indices, A.data

    rows_of = [np.where(part == p)[0] for p in range(P)]
    row_owner = part
    local_order, n_int, n_bor = [], np.zeros(P, np.int64), np.zeros(P, np.int64)
    for p in range(P):
        rows = rows_of[p]
        is_border = np.zeros(len(rows), dtype=bool)
        for j, r in enumerate(rows):
            cols = colidx[rowptr[r]:rowptr[r + 1]]
            if np.any(row_owner[cols] != p):
                is_border[j] = True
        interior, border = rows[~is_border], rows[is_border]
        n_int[p], n_bor[p] = len(interior), len(border)
        local_order.append(np.concatenate([interior, border]))

    n_owned = np.array([len(r) for r in rows_of], dtype=np.int64)
    L = _round_up(int(n_owned.max()), pad_to)
    rows_global = np.full((P, L), -1, dtype=np.int64)
    global_to_local = np.full(N, -1, dtype=np.int64)
    for p in range(P):
        rows_global[p, : n_owned[p]] = local_order[p]
        global_to_local[local_order[p]] = np.arange(n_owned[p])

    ghosts = []
    for p in range(P):
        rows = local_order[p]
        cols = np.unique(np.concatenate(
            [colidx[rowptr[r]:rowptr[r + 1]] for r in rows])) \
            if len(rows) else np.array([], np.int64)
        g = cols[row_owner[cols] != p]
        ghosts.append(g[np.lexsort((g, row_owner[g]))])
    n_ghost = np.array([len(g) for g in ghosts], dtype=np.int64)
    G = _round_up(max(int(n_ghost.max()), 1), pad_to)
    ghost_global = np.full((P, G), -1, dtype=np.int64)
    for p in range(P):
        ghost_global[p, : n_ghost[p]] = ghosts[p]

    requested = [set() for _ in range(P)]
    for p in range(P):
        for g in ghosts[p]:
            requested[row_owner[g]].add(int(g))
    exported = [np.array(sorted(s), dtype=np.int64) for s in requested]
    n_send = np.array([len(e) for e in exported], dtype=np.int64)
    S = _round_up(max(int(n_send.max()), 1), pad_to)
    send_idx = np.zeros((P, S), dtype=np.int64)
    slot_of = []
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

    M = _round_up(max(int(comm_matrix.max()), 1), pad_to)
    pair_send_idx = np.zeros((P, P, M), dtype=np.int64)
    ghost_src_pair_slot = np.zeros((P, G), dtype=np.int64)
    for p in range(P):
        gsd = ghost_src_dev[p, : n_ghost[p]]
        for q in range(P):
            sel = np.where(gsd == q)[0]
            if sel.size == 0:
                continue
            ids = ghosts[p][sel]
            pair_send_idx[q, p, : sel.size] = global_to_local[ids]
            ghost_src_pair_slot[p, sel] = np.arange(sel.size)

    # ragged plan: sender packs per destination, ascending global
    Sr = _round_up(max(int(comm_matrix.sum(axis=1).max()), 1), pad_to)
    ragged_send_idx = np.zeros((P, Sr), dtype=np.int64)
    ragged_input_offsets = np.zeros((P, P), dtype=np.int64)
    ragged_output_offsets = np.zeros((P, P), dtype=np.int64)
    for p in range(P):                     # sender
        pos = 0
        for q in range(P):                 # destination
            ragged_input_offsets[p, q] = pos
            gq = ghosts[q]
            ids = gq[ghost_src_dev[q, : n_ghost[q]] == p]
            ragged_send_idx[p, pos:pos + len(ids)] = global_to_local[ids]
            pos += len(ids)
    for q in range(P):                     # receiver
        off = 0
        for p in range(P):                 # sender
            ragged_output_offsets[p, q] = off
            off += comm_matrix[p, q]

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

    K_gst, K_own = max(K_gst, 1), max(K_own, 1)
    own_colidx = np.zeros((P, K_own, L), dtype=np.int32)
    own_vals = np.zeros((P, K_own, L), dtype=np.float64)
    ghost_colidx = np.zeros((P, K_gst, L), dtype=np.int32)
    ghost_vals = np.zeros((P, K_gst, L), dtype=np.float64)
    for p in range(P):
        own_entries, gst_entries = per_part[p]
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
        Sr=Sr, ragged_send_idx=ragged_send_idx,
        ragged_input_offsets=ragged_input_offsets,
        ragged_send_sizes=comm_matrix.copy(),
        ragged_output_offsets=ragged_output_offsets,
        ragged_recv_sizes=comm_matrix.T.copy(),
        own_colidx=own_colidx, own_vals=own_vals,
        ghost_colidx=ghost_colidx, ghost_vals=ghost_vals,
    )


def _random_spd(rng, N, density=0.02):
    A = sp.random(N, N, density=density, random_state=np.random.RandomState(
        int(rng.integers(1 << 31))), format="csr")
    A = A + A.T + sp.eye(N) * (N * density + 2)
    return A.tocsr()


FIELDS = ["P", "N", "L", "G", "S", "M", "part", "rows_global",
          "global_to_local", "n_owned", "n_interior", "n_border",
          "ghost_global", "n_ghost", "send_idx", "n_send",
          "ghost_src_dev", "ghost_src_slot", "comm_matrix",
          "pair_send_idx", "ghost_src_pair_slot",
          "Sr", "ragged_send_idx", "ragged_input_offsets",
          "ragged_send_sizes", "ragged_output_offsets", "ragged_recv_sizes",
          "own_colidx", "own_vals", "ghost_colidx", "ghost_vals"]


@pytest.mark.parametrize("N,P,seed", [(60, 4, 0), (97, 3, 1), (128, 8, 2),
                                      (40, 5, 3), (33, 2, 4)])
def test_vectorized_matches_loops(N, P, seed):
    rng = np.random.default_rng(seed)
    A = _random_spd(rng, N)
    part = rng.integers(0, P, size=N)
    part[rng.permutation(N)[:P]] = np.arange(P)   # every part non-empty
    new = build_partitioned_matrix(A, part)
    old = build_loops(A, part)
    for f in FIELDS:
        a, b = getattr(new, f), getattr(old, f)
        np.testing.assert_array_equal(a, b, err_msg=f)


@pytest.mark.parametrize("N,P,seed", [(60, 4, 0), (128, 8, 2)])
def test_numpy_fallback_matches_native(N, P, seed, monkeypatch):
    """The pure-numpy ELL split (used when the native library is absent)
    produces the identical PartitionedMatrix."""
    from acg_tpu import _native
    rng = np.random.default_rng(seed)
    A = _random_spd(rng, N)
    part = rng.integers(0, P, size=N)
    part[rng.permutation(N)[:P]] = np.arange(P)
    ref = build_partitioned_matrix(A, part)
    monkeypatch.setattr(_native, "has_ell_split", lambda: False)
    fb = build_partitioned_matrix(A, part)
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(fb, f), getattr(ref, f),
                                      err_msg=f)


def test_vectorized_contiguous_stencil():
    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    offsets, vals = poisson2d_dia(12)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    part = np.repeat(np.arange(4), N // 4)
    new = build_partitioned_matrix(A, part)
    old = build_loops(A, part)
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(new, f), getattr(old, f),
                                      err_msg=f)
