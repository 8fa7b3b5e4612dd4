"""SELL-style per-tile chunked-gather operator — the unstructured fast path.

The reference's merge-based CSR kernel (cg-kernels-cuda.cu:312-441) exists
to run *arbitrary* sparsity at memory speed with load balance.  The TPU
has no hardware gather from HBM (measured 0.139 Gnnz/s via XLA gather),
but Mosaic DOES lower a lane-gather within a 128-wide VMEM row
(tpu.dynamic_gather).  This format exploits that at the finest
granularity that survives wide-bandwidth matrices:

  * rows are grouped in TILES of 128 (the lane count);
  * columns are grouped in CHUNKS of 128: chunk c = col // 128, lane
    l = col % 128;
  * per (tile, chunk), entries pack into ELL slots: slot k holds the
    k-th entry-in-that-chunk of each row; K_tc = max over the tile's
    128 rows.  Slots are allocated in GROUPS of 8 that share one chunk
    (ceil(K_tc / 8) groups per (tile, chunk)): the kernel broadcasts
    the chunk's 128 x-values across sublanes once and resolves all
    8 slots with a single (8, 128) lane-gather — one dynamic row load
    per group instead of eight (measured 96 → ~16 cycles per group),
    at the cost of rounding each K_tc up to a multiple of 8.

Why per-TILE and chunk 128: coarser granularities explode on RCM'd 3-D
meshes — measured on a 1.95M-row bandwidth-55k mesh, stored slots are
2.0G at (tile, 128) but 39.6G at (16384-row block, 128) and 10.6G at
(block, 1024); and a 1024-wide window needs an 8-way masked gather
(~5× the VPU ops).  Fill (true nnz / stored slots) is the load-balance
metric — the analogue of the merge kernel's work split.

Layout arrays (ntiles = ceil(N / 128) rounded to the kernel's block,
G = slot groups per tile, S = 8·G stored slots):
    vals (ntiles, G, 8, 128) f32/f64    group g, sub-slot r, row rho
    lidx (ntiles, G, 8, 128) int32      lane within the chunk, 0..127
    cidx (ntiles, G) int32              chunk id per (tile, group); 0 pad
(leading axis = tile so each kernel block is one CONTIGUOUS region —
a (G, tiles, …) layout makes the per-step DMA G strided descriptors,
measured slower than the whole compute)

x is held entirely in VMEM by the kernel (ops/pallas_sell.py); N is
bounded by the VMEM x budget (~3M rows f32) — column paneling for
larger N is future work, enforced by an explicit error here.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# the kernel processes this many row tiles per grid step; ntiles is padded
# to a multiple so BlockSpecs divide evenly
BLOCK_TILES = 2


def cidx_flat_pad(cidx_a: np.ndarray):
    """(ntiles, G) chunk table → Sc-padded flat (ntiles*Sc,) int32 array,
    the exact form the kernel DMA's to SMEM (Sc = G rounded so T·Sc is a
    1024 multiple, the 1-D DMA alignment rule).  Precomputed at build
    time so the pad/reshape is not re-traced into every jitted SpMV call
    (it would otherwise re-execute per CG iteration unless XLA hoists
    it)."""
    import jax.numpy as jnp
    ntiles, G = cidx_a.shape
    q = 1024 // BLOCK_TILES
    Sc = -(-G // q) * q
    out = np.zeros((ntiles, Sc), np.int32)
    out[:, :G] = np.asarray(cidx_a)
    return jnp.asarray(out.reshape(-1))


@functools.partial(jax.jit, static_argnames=("rows2",))
def _scatter_slabs(fr, rho, val, lane, rows2: int):
    """Materialize the (rows2, 128) vals/lidx slabs on device from the
    per-entry coordinates (unique (fr, rho) pairs by construction)."""
    vals2 = jnp.zeros((rows2, 128), jnp.float32).at[fr, rho].set(
        val, unique_indices=True)
    lidx2 = jnp.zeros((rows2, 128), jnp.int32).at[fr, rho].set(
        lane, unique_indices=True)
    return vals2, lidx2

# resident x budget (f32 elements): xv scratch + double-buffered slabs
# must fit the 16M VMEM; 3M rows of f32 is 12M bytes
MAX_VMEM_ROWS = 3_000_000


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SellOperator:
    """Row tiles are SORTED by their group count and bucketed: each
    bucket stores its tiles at the bucket's own G (instead of padding
    every tile to the global max — measured 44% wasted slots on a
    600k-row mesh).  ``tile_order[s]`` is the original tile at sorted
    position s; the column space (x, chunk ids) is untouched, so only
    the SpMV OUTPUT rows come back tile-permuted and one device scatter
    restores them."""
    vals: tuple                # per bucket (ntiles_b, G_b, 8, 128)
    lidx: tuple                # per bucket (ntiles_b, G_b, 8, 128) int32
    cidx: tuple                # per bucket (ntiles_b*Sc_b,) int32 flat
                               # Sc-padded chunk table (cidx_flat_pad)
    tile_order: jnp.ndarray    # (ntiles,) original tile per sorted slot
    N: int                     # logical rows
    nnz_true: int

    def tree_flatten(self):
        return (self.vals, self.lidx, self.cidx, self.tile_order), \
            (self.N, self.nnz_true)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def dtype(self):
        return self.vals[0].dtype

    @property
    def ntiles(self) -> int:
        return sum(v.shape[0] for v in self.vals)

    @property
    def Np(self) -> int:
        return self.ntiles * 128

    @property
    def G(self) -> int:
        """Largest bucket group count (the VMEM-limiting one)."""
        return max(v.shape[1] for v in self.vals)

    @property
    def S(self) -> int:
        """Average stored slots per row (rounded up)."""
        return -(-self.nnz // self.Np)

    @property
    def nnz(self) -> int:
        """Stored slots (the SpMV work measure, incl. padding)."""
        return sum(8 * v.shape[1] * v.shape[0] * 128 for v in self.vals)

    @property
    def fill(self) -> float:
        """True nnz / stored slots — the load-balance quality metric."""
        return self.nnz_true / max(self.nnz, 1)

    @classmethod
    def from_csr(cls, A, dtype=np.float32,
                 max_stored_bytes: int = 13 * 1024**3) -> "SellOperator":
        """Build the per-tile chunked-gather layout from a scipy CSR
        matrix.  Vectorized (run-length machinery, no per-row loops).

        Raises if the padded layout would exceed ``max_stored_bytes`` on
        device (vals + lidx resident in HBM) or if x outgrows the
        kernel's VMEM residency budget."""
        A = A.tocsr()
        if not A.has_sorted_indices:
            A = A.copy()
            A.sort_indices()
        N = A.shape[0]
        assert A.shape[1] == N
        if N > MAX_VMEM_ROWS:
            raise NotImplementedError(
                f"SellOperator holds x resident in VMEM; N={N:,} exceeds "
                f"the {MAX_VMEM_ROWS:,}-row budget (column paneling not "
                "implemented)")
        rowptr = A.indptr.astype(np.int64)
        col = A.indices.astype(np.int64)
        val = A.data
        nnz = col.shape[0]
        ntiles = _round_up(max(N, 1), BLOCK_TILES * 128) // 128
        Cn = _round_up(max(N, 1), 1024) // 128 + 1   # chunk id bound

        from .. import _native
        # nnz == 0 falls through to the numpy path: the native build's
        # tile bookkeeping indexes tc_tile[ends] on an empty pair array
        if _native.has_sell() and np.dtype(dtype) == np.float32 \
                and N > 0 and nnz > 0:
            return cls._from_csr_native(A, rowptr, N, nnz, ntiles,
                                        max_stored_bytes)

        rowlen = np.diff(rowptr)
        row = np.repeat(np.arange(N, dtype=np.int64), rowlen)
        tile = row >> 7
        rho = (row & 127).astype(np.int32)
        c = col >> 7
        lane = (col & 127).astype(np.int32)

        # rank of each entry within its (row, chunk) run (CSR order makes
        # runs contiguous)
        key_rc = row * Cn + c
        run_start = np.ones(nnz, dtype=bool)
        run_start[1:] = key_rc[1:] != key_rc[:-1]
        first = np.nonzero(run_start)[0]
        run_id = np.cumsum(run_start) - 1
        rank = np.arange(nnz, dtype=np.int64) - first[run_id]

        # per (tile, chunk): K_tc = max run size over the tile's rows
        grp_tile = tile[first]
        grp_chunk = c[first]
        grp_size = np.diff(np.concatenate([first, [nnz]]))
        key_tc = grp_tile * Cn + grp_chunk
        order = np.argsort(key_tc, kind="stable")
        kt_sorted = key_tc[order]
        tc_start = np.ones(len(order), dtype=bool)
        tc_start[1:] = kt_sorted[1:] != kt_sorted[:-1]
        tc_first = np.nonzero(tc_start)[0]
        tc_id_sorted = np.cumsum(tc_start) - 1
        n_tc = int(tc_id_sorted[-1]) + 1 if len(order) else 0
        K_tc = np.zeros(n_tc, dtype=np.int64)
        np.maximum.at(K_tc, tc_id_sorted, grp_size[order])
        tc_tile = grp_tile[order][tc_first]
        tc_chunk = grp_chunk[order][tc_first]

        # group count per (tile, chunk) — slots come in same-chunk runs
        # of 8 so the kernel loads the chunk row once per group
        Kg_tc = (K_tc + 7) >> 3
        # group base per (tile, chunk): prefix of Kg_tc within each tile
        # (key_tc order groups by tile, chunks ascending)
        group_base = np.zeros(n_tc, dtype=np.int64)
        G_of_tile = np.zeros(ntiles, dtype=np.int64)
        if n_tc:
            tile_change = np.ones(n_tc, dtype=bool)
            tile_change[1:] = tc_tile[1:] != tc_tile[:-1]
            csum = np.cumsum(Kg_tc) - Kg_tc          # exclusive
            base0 = np.zeros(n_tc, dtype=np.int64)
            base0[tile_change] = csum[tile_change]
            np.maximum.accumulate(base0, out=base0)
            group_base = csum - base0
            ends = np.nonzero(np.concatenate([tile_change[1:], [True]]))[0]
            np.add.at(G_of_tile, tc_tile[ends],
                      group_base[ends] + Kg_tc[ends])
        # padded to 8: the kernel unrolls 8 groups per loop iteration
        G = _round_up(max(int(G_of_tile.max()) if ntiles else 0, 1), 8)

        isz = np.dtype(dtype).itemsize
        stored = 8 * G * ntiles * 128
        need = stored * (isz + 4)
        if need > max_stored_bytes:
            raise MemoryError(
                f"SELL layout would store {stored:,} slots "
                f"({need / 1e9:.1f} GB, fill {nnz / stored:.3f}) — exceeds "
                f"max_stored_bytes={max_stored_bytes / 1e9:.1f} GB; the "
                "matrix is too irregular for the chunked-gather format at "
                "this scale")
        # kernel VMEM working set: double-buffered vals+lidx blocks + x
        vmem = (2 * G * BLOCK_TILES * 1024 * (isz + 4)
                + _round_up(max(N, 1), 1024) * isz)
        if vmem > 14 * 1024 * 1024:
            raise MemoryError(
                f"SELL kernel working set {vmem / 1e6:.1f} MB exceeds VMEM "
                f"(G={G} slot groups/tile, N={N:,}); the matrix is too "
                "irregular/large for the single-chip chunked-gather path — "
                "partition it across devices instead")

        # map each entry to its (group, sub-slot) and scatter into the
        # 4-D slabs: within a (tile, chunk), rank k lands in group
        # base + k>>3, sub-slot k&7
        tc_of_group = np.empty(len(first), dtype=np.int64)
        tc_of_group[order] = tc_id_sorted
        gb = group_base[tc_of_group[run_id]]
        g_of = gb + (rank >> 3)
        r_of = rank & 7
        vals_a = np.zeros((ntiles, G, 8, 128), dtype=dtype)
        lidx_a = np.zeros((ntiles, G, 8, 128), dtype=np.int32)
        flat = (tile * G + g_of) * 1024 + r_of * 128 + rho
        vals_a.reshape(-1)[flat] = val
        lidx_a.reshape(-1)[flat] = lane
        del run_id, rank, key_rc, run_start, flat, gb, g_of, r_of

        # chunk table: per (tile, chunk) fill its group range
        cidx_a = np.zeros((ntiles, G), dtype=np.int32)
        rep = np.repeat(np.arange(n_tc), Kg_tc)
        grp_pos = np.arange(len(rep)) - np.repeat(np.cumsum(Kg_tc) - Kg_tc,
                                                  Kg_tc)
        cidx_a[tc_tile[rep], group_base[rep] + grp_pos] = \
            tc_chunk[rep].astype(np.int32)

        # single bucket (the fallback skips tile sorting)
        return cls(vals=(jnp.asarray(vals_a),), lidx=(jnp.asarray(lidx_a),),
                   cidx=(cidx_flat_pad(cidx_a),),
                   tile_order=jnp.arange(ntiles, dtype=jnp.int32),
                   N=N, nnz_true=int(nnz))

    @classmethod
    def _from_csr_native(cls, A, rowptr, N, nnz, ntiles,
                         max_stored_bytes) -> "SellOperator":
        """Layout build through the native streaming passes
        (acg_sell_scan/acg_sell_fill) — the numpy version's nnz-length
        argsort/unique machinery measured 418 s at 46M nnz; the C scan
        is seconds.  Chunks appear per tile in first-appearance order
        (not ascending) — an equally valid layout; tests compare SpMV
        results, not raw slabs."""
        from .. import _native
        tc_tile, tc_chunk, tc_k = _native.sell_scan(rowptr, A.indices)
        n_tc = tc_tile.shape[0]
        Kg = ((tc_k.astype(np.int64) + 7) >> 3)
        tile_change = np.ones(n_tc, dtype=bool)
        tile_change[1:] = tc_tile[1:] != tc_tile[:-1]
        csum = np.cumsum(Kg) - Kg
        base0 = np.zeros(n_tc, dtype=np.int64)
        base0[tile_change] = csum[tile_change]
        np.maximum.accumulate(base0, out=base0)
        group_base = csum - base0
        G_of_tile = np.zeros(ntiles, dtype=np.int64)
        ends = np.nonzero(np.concatenate([tile_change[1:], [True]]))[0]
        np.add.at(G_of_tile, tc_tile[ends], group_base[ends] + Kg[ends])

        # --- G-bucketed tile layout -----------------------------------
        # sort tiles by group count and give each bucket its own padded
        # G_b: padding every tile to the global max wastes ~44% of the
        # stored slots on meshes with the measured G spread (p50 77 vs
        # max 137)
        NB = 8
        sort_order = np.argsort(G_of_tile, kind="stable")
        per = _round_up(-(-ntiles // NB), BLOCK_TILES)
        starts = list(range(0, ntiles, per)) + [ntiles]
        buckets = [(starts[i], starts[i + 1])
                   for i in range(len(starts) - 1)
                   if starts[i] < starts[i + 1]]
        G_b = [int(_round_up(max(int(G_of_tile[sort_order[s:e]].max()), 1),
                             8)) for s, e in buckets]
        # flat slab-row base per ORIGINAL tile (sorted tiles contiguous,
        # bucket stride G_b)
        tile_base = np.empty(ntiles, dtype=np.int64)
        row_start = []
        acc = 0
        for (s, e), g in zip(buckets, G_b):
            row_start.append(acc)
            tile_base[sort_order[s:e]] = acc + np.arange(e - s,
                                                         dtype=np.int64) * g
            acc += (e - s) * g
        rows_total = acc

        isz = 4
        stored = 8 * rows_total * 128
        need = stored * (isz + 4)
        if need > max_stored_bytes:
            raise MemoryError(
                f"SELL layout would store {stored:,} slots "
                f"({need / 1e9:.1f} GB, fill {nnz / stored:.3f}) — exceeds "
                f"max_stored_bytes={max_stored_bytes / 1e9:.1f} GB; the "
                "matrix is too irregular for the chunked-gather format at "
                "this scale")
        vmem = (2 * max(G_b) * BLOCK_TILES * 1024 * (isz + 4)
                + _round_up(max(N, 1), 1024) * isz)
        if vmem > 14 * 1024 * 1024:
            raise MemoryError(
                f"SELL kernel working set {vmem / 1e6:.1f} MB exceeds VMEM "
                f"(G={max(G_b)} slot groups/tile, N={N:,}); the matrix is "
                "too irregular/large for the single-chip chunked-gather "
                "path — partition it across devices instead")

        # per-entry slab coordinates on the host, slab MATERIALIZATION on
        # the device: shipping the padded slabs through the device tunnel
        # measured 233 s (12.3 GB) at 46M nnz vs ~0.7 GB of entry arrays
        fr = _native.sell_entries(rowptr, A.indices, tile_base, group_base)
        rho = np.repeat(np.arange(N, dtype=np.int32),
                        np.diff(rowptr)) & np.int32(127)
        lane = (A.indices & 127).astype(np.int32)
        val = A.data.astype(np.float32)
        vals2, lidx2 = _scatter_slabs(
            jnp.asarray(fr), jnp.asarray(rho), jnp.asarray(val),
            jnp.asarray(lane), rows_total * 8)

        # chunk tables per bucket (tiles in sorted order)
        inv = np.empty(ntiles, dtype=np.int64)
        inv[sort_order] = np.arange(ntiles)
        rep = np.repeat(np.arange(n_tc), Kg)
        pos = np.arange(len(rep)) - np.repeat(csum, Kg)
        pair_tile_sorted = inv[tc_tile[rep]]
        pair_g = group_base[rep] + pos
        vals_t, lidx_t, cidx_t = [], [], []
        for (s, e), g, rs in zip(buckets, G_b, row_start):
            nb = e - s
            cidx_a = np.zeros((nb, g), dtype=np.int32)
            sel = (pair_tile_sorted >= s) & (pair_tile_sorted < e)
            cidx_a[pair_tile_sorted[sel] - s, pair_g[sel]] = \
                tc_chunk[rep[sel]]
            vals_t.append(vals2[rs * 8:(rs + nb * g) * 8]
                          .reshape(nb, g, 8, 128))
            lidx_t.append(lidx2[rs * 8:(rs + nb * g) * 8]
                          .reshape(nb, g, 8, 128))
            cidx_t.append(cidx_flat_pad(cidx_a))
        return cls(vals=tuple(vals_t), lidx=tuple(lidx_t),
                   cidx=tuple(cidx_t),
                   tile_order=jnp.asarray(sort_order.astype(np.int32)),
                   N=N, nnz_true=int(nnz))

    # -- SpMV -----------------------------------------------------------------

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x; x is (Np,) (row-padded, ORIGINAL order — columns
        are never permuted).  One chunked-gather Pallas call per bucket
        (x resident in VMEM each); the outputs cover the sorted tiles
        and one unique-index scatter restores the original row order."""
        from ..ops.pallas_sell import sell_spmv
        Nx = _round_up(max(self.N, 1), 1024)
        ys = [sell_spmv(v, l, c, x, Nx).reshape(-1, 128)
              for v, l, c in zip(self.vals, self.lidx, self.cidx)]
        y_sorted = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=0)
        y = jnp.zeros_like(y_sorted).at[self.tile_order].set(
            y_sorted, unique_indices=True)
        return y.reshape(-1)

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz_true

    def bytes_per_spmv(self) -> int:
        isz = self.vals[0].dtype.itemsize
        return sum(v.size for v in self.vals) * isz \
            + sum(l.size for l in self.lidx) * 4 + 2 * self.Np * isz
