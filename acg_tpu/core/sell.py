"""SELL-C-σ-style chunked-gather operator — the unstructured fast path.

The reference's merge-based CSR kernel (cg-kernels-cuda.cu:312-441) exists
to run *arbitrary* sparsity at memory speed with load balance.  The TPU
has no hardware gather from HBM (measured 0.139 Gnnz/s via XLA gather),
but Mosaic DOES lower `take_along_axis` within a (8, 128) VMEM tile —
a 1024-element gather window.  This format exploits that:

  * rows are processed in blocks of B;
  * each nonzero is assigned to the 1024-wide COLUMN CHUNK containing its
    column: chunk c = col // 1024, lane index l = col % 1024;
  * per (row block, chunk), entries pack into ELL slots (slot k holds the
    k-th entry of each row in that chunk; rows with fewer entries pad
    with value 0 / index 0 — inert by the zero-padding invariant);
  * the kernel keeps x resident in VMEM (column panels for large N),
    streams (vals, lidx) slot slabs at 8 B per stored nonzero, and
    gathers each slot's operands from one VMEM chunk with an 8-way
    masked lane-gather (ops/pallas_sell.py).

Fill efficiency (stored slots vs true nnz) is the load-balance metric —
the analogue of the merge kernel's work balance; `fill` reports it.

Layout arrays (Np = rows padded to B, C = ceil(Nx / 1024)):
    vals (S, Np) f32/f64   slot slabs, row-aligned like DIA
    lidx (S, Np) int32     lane index within the chunk, 0..1023
    cidx (nblocks, S) i32  chunk id per (row block, slot); 0 on padding
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SellOperator:
    vals: jnp.ndarray          # (S, Np//128, 128)
    lidx: jnp.ndarray          # (S, Np//128, 128) int32, 0..chunk-1
    cidx: jnp.ndarray          # (nblocks, S) int32 chunk ids
    N: int                     # logical rows
    Nx: int                    # padded x length (multiple of 1024)
    block: int                 # rows per kernel block (B)
    chunk: int                 # gather window: 128 or 1024
    nnz_true: int

    def tree_flatten(self):
        return (self.vals, self.lidx, self.cidx), \
            (self.N, self.Nx, self.block, self.chunk, self.nnz_true)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def Np(self) -> int:
        return self.vals.shape[1] * 128

    @property
    def S(self) -> int:
        return self.vals.shape[0]

    @property
    def nnz(self) -> int:
        """Stored slots (the SpMV work measure, incl. padding)."""
        return self.S * self.Np

    @property
    def fill(self) -> float:
        """True nnz / stored slots — the load-balance quality metric."""
        return self.nnz_true / max(self.nnz, 1)

    @classmethod
    def from_csr(cls, A, dtype=np.float32, block: int = 16384,
                 chunk: int = 1024,
                 vmem_budget: int = 12 * 1024 * 1024) -> "SellOperator":
        """Build the chunked-gather layout, shrinking the row block until
        the kernel's VMEM working set (double-buffered vals+lidx slabs,
        the resident x, one output block) fits the budget.  S depends on
        the block (more rows per block → more distinct chunks → more
        slots), so this is measure-and-retry on the actual layout."""
        isz = np.dtype(dtype).itemsize
        while True:
            op = cls._from_csr_block(A, dtype, block, chunk)
            need = (2 * op.S * block * (isz + 4) + op.Nx * isz
                    + 2 * block * isz)
            if need <= vmem_budget or block <= 1024:
                return op
            block //= 2

    @classmethod
    def _from_csr_block(cls, A, dtype, block: int,
                        chunk: int) -> "SellOperator":
        """Build the chunked-gather layout from a scipy CSR matrix at a
        fixed row-block size (vectorized prefix-count machinery, no
        per-row Python loops)."""
        A = A.tocsr()
        if not A.has_sorted_indices:
            A = A.copy()
            A.sort_indices()   # (row, chunk) runs must be contiguous
        N = A.shape[0]
        assert A.shape[1] == N
        rowptr = A.indptr.astype(np.int64)
        col = A.indices.astype(np.int64)
        val = A.data
        nnz = col.shape[0]
        Np = _round_up(max(N, 1), block)
        nblocks = Np // block
        # x is viewed in-kernel as (Nx//1024, 8, 128) VMEM tiles regardless
        # of the gather window, so Nx is always 1024-aligned
        Nx = _round_up(max(N, 1), 1024)

        rowlen = np.diff(rowptr)
        row = np.repeat(np.arange(N, dtype=np.int64), rowlen)
        blk = row // block
        c = col // chunk                     # chunk id per entry
        # rank of each entry within its (row, chunk) group: entries are
        # CSR-ordered (row asc, col asc) so groups are contiguous runs
        key_rc = row * (Nx // chunk + 1) + c
        run_start = np.ones(nnz, dtype=bool)
        run_start[1:] = key_rc[1:] != key_rc[:-1]
        first = np.nonzero(run_start)[0]
        run_id = np.cumsum(run_start) - 1
        rank = np.arange(nnz, dtype=np.int64) - first[run_id]

        # per (block, chunk): K_bc = max over rows of the group sizes
        grp_blk = blk[first]
        grp_chunk = c[first]
        grp_size = np.diff(np.concatenate([first, [nnz]]))
        key_bc = grp_blk * (Nx // chunk + 1) + grp_chunk
        order = np.argsort(key_bc, kind="stable")
        kb_sorted = key_bc[order]
        bc_start = np.ones(len(order), dtype=bool)
        bc_start[1:] = kb_sorted[1:] != kb_sorted[:-1]
        bc_first = np.nonzero(bc_start)[0]
        bc_id_sorted = np.cumsum(bc_start) - 1
        n_bc = int(bc_id_sorted[-1]) + 1 if len(order) else 0
        K_bc = np.zeros(n_bc, dtype=np.int64)
        np.maximum.at(K_bc, bc_id_sorted, grp_size[order])
        # slot base per (block, chunk), blocks independent
        bc_blk = grp_blk[order][bc_first]
        bc_chunk = grp_chunk[order][bc_first]
        # per block: cumulative slot offsets over its chunks (sorted by
        # chunk — key_bc order groups by block then chunk)
        slot_base = np.zeros(n_bc, dtype=np.int64)
        S_of_block = np.zeros(nblocks, dtype=np.int64)
        if n_bc:
            blk_change = np.ones(n_bc, dtype=bool)
            blk_change[1:] = bc_blk[1:] != bc_blk[:-1]
            csum = np.cumsum(K_bc) - K_bc          # exclusive
            base0 = np.zeros(n_bc, dtype=np.int64)
            base0[blk_change] = csum[blk_change]
            np.maximum.accumulate(base0, out=base0)
            slot_base = csum - base0
            ends = np.nonzero(np.concatenate([blk_change[1:], [True]]))[0]
            np.add.at(S_of_block, bc_blk[ends], slot_base[ends] + K_bc[ends])
        S = max(int(S_of_block.max()) if nblocks else 0, 1)

        # map each ENTRY to (slot, row-position)
        grp_of_entry = run_id
        bc_of_group = np.empty(len(first), dtype=np.int64)
        bc_of_group[order] = bc_id_sorted
        slot = slot_base[bc_of_group[grp_of_entry]] + rank
        vals_a = np.zeros((S, Np), dtype=dtype)
        lidx_a = np.zeros((S, Np), dtype=np.int32)
        cidx_a = np.zeros((nblocks, S), dtype=np.int32)
        vals_a[slot, row] = val
        lidx_a[slot, row] = (col % chunk).astype(np.int32)
        del run_id, rank, key_rc, run_start
        # chunk table: for every (block, chunk) pair fill its slot range
        for_blocks = np.repeat(np.arange(n_bc), K_bc)
        slot_pos = np.arange(len(for_blocks)) - \
            np.repeat(np.cumsum(K_bc) - K_bc, K_bc)
        cidx_a[bc_blk[for_blocks], slot_base[for_blocks] + slot_pos] = \
            bc_chunk[for_blocks].astype(np.int32)

        return cls(vals=jnp.asarray(vals_a.reshape(S, Np // 128, 128)),
                   lidx=jnp.asarray(lidx_a.reshape(S, Np // 128, 128)),
                   cidx=jnp.asarray(cidx_a), N=N, Nx=Nx, block=block,
                   chunk=chunk, nnz_true=int(nnz))

    # -- SpMV -----------------------------------------------------------------

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x; x is (Np,) (row-padded); gathers read x padded to
        Nx.  Uses the chunked-gather Pallas kernel."""
        from ..ops.pallas_sell import sell_spmv
        return sell_spmv(self.vals, self.lidx, self.cidx, x,
                         self.Nx, self.block, self.chunk)

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz_true

    def bytes_per_spmv(self) -> int:
        isz = self.vals.dtype.itemsize
        return self.vals.size * isz + self.lidx.size * 4 + \
            2 * self.Np * isz
