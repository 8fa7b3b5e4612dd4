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

x is held entirely in VMEM by the kernel (ops/pallas_sell.py); a single
SellOperator's column space is bounded by the VMEM x budget (~3M f32).
Wider matrices use PaneledSellOperator / sell_from_csr: PANEL_COLS-wide
column panels, each an independent SellOperator over only the row tiles
that touch the panel, combined by tile-granular scatter-add.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# the kernel processes this many row tiles per grid step; ntiles is padded
# to a multiple so BlockSpecs divide evenly
BLOCK_TILES = 2


def pack_lidx(l4):
    """(nb, g, 8, 128) lane table → (nb, g//4, 8, 128) int32 with four
    groups packed per word along the G axis (lane ids are 7-bit: byte k
    of word [t, g, s, l] is group 4g+k's lane).  Cuts the lidx slab DMA
    4× — the kernel unpacks with one shift+mask per group
    (ops/pallas_sell.py).  Works on numpy and device arrays alike."""
    nb, g = l4.shape[0], l4.shape[1]
    w = l4.reshape(nb, g // 4, 4, 8, 128)
    return (w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16)
            | (w[:, :, 3] << 24))


def cidx_flat_pad(cidx_a: np.ndarray) -> np.ndarray:
    """(ntiles, G) chunk table → Sc-padded flat (ntiles*Sc,) int32 numpy
    array, the exact form the kernel DMA's to SMEM (Sc = G rounded so
    T·Sc is a 1024 multiple, the 1-D DMA alignment rule).  Precomputed at
    build time so the pad/reshape is not re-traced into every jitted SpMV
    call (it would otherwise re-execute per CG iteration unless XLA
    hoists it)."""
    ntiles, G = cidx_a.shape
    q = 1024 // BLOCK_TILES
    Sc = -(-G // q) * q
    out = np.zeros((ntiles, Sc), np.int32)
    out[:, :G] = np.asarray(cidx_a)
    return out.reshape(-1)


@functools.partial(jax.jit, static_argnames=("rows2",))
def _scatter_slabs(fr, rho, val, lane, rows2: int):
    """Materialize the (rows2, 128) vals slab and the 4:1-PACKED lane
    slab on device from the per-entry coordinates.  The lane table is
    scattered directly into its packed form (byte ``g mod 4`` of word
    row ``fr // 32 * 8 + fr % 8``; see pack_lidx) via scatter-ADD of
    disjoint bytes — building the unpacked int32 table first and
    packing afterwards transiently needs 4 bytes/slot extra, which
    pushed near-cap layouts past the 16 GB HBM (measured: an 8 GB-final
    build thrashed for 27+ min)."""
    vals2 = jnp.zeros((rows2, 128), jnp.float32).at[fr, rho].set(
        val, unique_indices=True)
    group, sub = fr // 8, fr % 8
    pfr = (group // 4) * 8 + sub
    shift = (group % 4).astype(jnp.int32) * 8
    lidxp = jnp.zeros((rows2 // 4, 128), jnp.int32).at[pfr, rho].add(
        lane << shift)
    return vals2, lidxp

# resident x budget (f32 elements): xv scratch + double-buffered slabs
# must fit the 16M VMEM; 3M rows of f32 is 12M bytes
MAX_VMEM_ROWS = 3_000_000

# kernel working-set budget (bytes) the builders/SpMVs guard against —
# VMEM is 16 MB; 14 MB leaves headroom for Mosaic's own scratch
VMEM_BYTES = 14 * 1024 * 1024

# column-panel width for matrices whose x outgrows the VMEM budget: 2^21
# f32 elements = 8 MB of x, leaving ~6 MB for the double-buffered slabs
# (G_b up to ~192 groups/tile) — vs 3M-wide panels which would squeeze
# the slab budget to 2 MB
PANEL_COLS = 2_097_152

# df64 (keep_lo) panels hold TWO resident x buffers (hi, lo) and double
# the slab traffic (hi + lo vals), so they are half as wide: 2^20 f32
# elements = 8 MB for the pair, ~5 MB for the double-buffered slab pairs
PANEL_COLS_DF64 = 1_048_576

# tiles are sorted by group count into this many buckets, each padded to
# its own G_b (instead of the global max — measured 44% wasted slots)
NBUCKETS = 8


def default_buckets(ntiles: int) -> list[tuple[int, int]]:
    """Sorted-tile [start, end) ranges of the G-bucketed layout.  A pure
    function of ntiles — per-part layouts of a partitioned matrix (equal
    L ⇒ equal ntiles) therefore share bucket structure, which the
    distributed operator needs for SPMD-uniform shapes."""
    per = _round_up(-(-ntiles // NBUCKETS), BLOCK_TILES)
    starts = list(range(0, ntiles, per)) + [ntiles]
    return [(starts[i], starts[i + 1]) for i in range(len(starts) - 1)
            if starts[i] < starts[i + 1]]


def bucket_groups(G_of_tile: np.ndarray, sort_order: np.ndarray,
                  buckets) -> list[int]:
    """Per-bucket padded group count G_b (max over the bucket's tiles,
    rounded to 8 — the kernel unrolls 8 groups per loop iteration)."""
    return [int(_round_up(max(int(G_of_tile[sort_order[s:e]].max()), 1), 8))
            for s, e in buckets]


def optimal_buckets(G_of_tile: np.ndarray, sort_order: np.ndarray,
                    max_buckets: int = 24) -> list[tuple[int, int]]:
    """Value-aware bucket boundaries minimizing stored slots.

    Equal-count buckets (default_buckets) pad every tile in a bucket to
    the bucket MAX group count; on skewed G distributions that wastes
    ~40% of the slots (measured on the 600k-row mesh solid: group-level
    fill 0.201 vs 0.121 achieved).  This DP picks ≤ ``max_buckets``
    boundaries over the ascending-sorted tiles minimizing
    Σ_b count_b · G_b exactly: G_b only matters rounded to 8, so the
    candidate boundaries compress to the distinct round-8 value ends —
    a tiny DP regardless of ntiles.  Boundaries are rounded down to
    BLOCK_TILES multiples (displaced tiles land in the next — larger-G —
    bucket, which is always valid).  The distributed builder runs this
    DP once on the ELEMENTWISE-MAX of the parts' sorted G histograms
    (parallel/dist_sell._common_layout), so per-part shapes stay
    SPMD-uniform while keeping the value-aware padding.
    """
    T = len(sort_order)
    g8 = np.maximum(G_of_tile[sort_order].astype(np.int64), 1)
    g8 = ((g8 + 7) >> 3) << 3
    # candidate (exclusive) ends: last index of each distinct value,
    # rounded down to BLOCK_TILES, plus T itself
    change = np.nonzero(np.diff(g8))[0] + 1          # value-start indices
    ends = (change // BLOCK_TILES) * BLOCK_TILES
    cand = np.unique(np.concatenate([ends[ends > 0], [T]]))
    if len(cand) > 256:   # degenerate near-all-distinct case: subsample
        keep = np.linspace(0, len(cand) - 1, 256).astype(int)
        cand = np.unique(np.concatenate([cand[keep], [T]]))
    C = len(cand)
    gmax = g8[cand - 1].astype(np.float64)           # G_b if bucket ends here
    k = min(max_buckets, C)
    # dp[kk][j]: min slots covering tiles [0, cand[j]) with kk+1 buckets
    dp = np.full((k, C), np.inf)
    par = np.full((k, C), -1, dtype=np.int64)
    dp[0] = cand.astype(np.float64) * gmax
    for kk in range(1, k):
        for j in range(1, C):
            c = dp[kk - 1, :j] + (cand[j] - cand[:j]) * gmax[j]
            i = int(np.argmin(c))
            if c[i] < dp[kk, j]:
                dp[kk, j] = c[i]
                par[kk, j] = i
    kk = int(np.argmin(dp[:, C - 1]))
    bounds = [T]
    j = C - 1
    while kk > 0:
        j = int(par[kk, j])
        bounds.append(int(cand[j]))
        kk -= 1
    bounds.append(0)
    bounds = sorted(set(bounds))
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def sell_scan_phase(A, ntiles: int, ncols: int, use_native: bool) -> dict:
    """Phase 1 of the layout build: distinct (tile, chunk) pairs with
    per-pair group counts, plus per-tile totals.

    Returns a dict with ``tc_tile``/``tc_chunk``/``Kg`` (per pair),
    ``group_base`` (exclusive prefix of Kg within each tile),
    ``G_of_tile`` (ntiles,), and — numpy path only — ``ent``, the
    per-entry slab coordinates consumed by the fill phase.  Pair order
    differs between paths (native: first-appearance within the row scan;
    numpy: ascending chunk) — both are valid layouts; each path's fill
    uses its own order consistently (tests compare SpMV results)."""
    rowptr = A.indptr.astype(np.int64)
    col = A.indices
    nnz = int(col.shape[0])
    N = A.shape[0]
    ent = None
    if use_native:
        from .. import _native
        tc_tile, tc_chunk, tc_k = _native.sell_scan(rowptr, col, ncols)
        tc_tile = tc_tile.astype(np.int64)
        tc_chunk = tc_chunk.astype(np.int32)
        Kg = (tc_k.astype(np.int64) + 7) >> 3
    else:
        col64 = col.astype(np.int64)
        Cn = _round_up(max(ncols, 1), 1024) // 128 + 1   # chunk id bound
        rowlen = np.diff(rowptr)
        row = np.repeat(np.arange(N, dtype=np.int64), rowlen)
        tile = row >> 7
        c = col64 >> 7
        # rank of each entry within its (row, chunk) run (CSR order
        # makes runs contiguous)
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
        n_tc0 = int(tc_id_sorted[-1]) + 1 if len(order) else 0
        K_tc = np.zeros(n_tc0, dtype=np.int64)
        np.maximum.at(K_tc, tc_id_sorted, grp_size[order])
        tc_tile = grp_tile[order][tc_first]
        tc_chunk = grp_chunk[order][tc_first].astype(np.int32)
        Kg = (K_tc + 7) >> 3
        # per-entry coordinates (everything except the bucket-dependent
        # tile base): tc pair id, rank within the run, row/lane residues
        tc_of_group = np.empty(len(first), dtype=np.int64)
        tc_of_group[order] = tc_id_sorted
        ent = dict(tile=tile, rank=rank, tc=tc_of_group[run_id],
                   rho=(row & 127).astype(np.int32),
                   lane=(col64 & 127).astype(np.int32))
    n_tc = int(tc_tile.shape[0])
    # group_base: exclusive prefix of Kg within each tile (pairs are
    # grouped by tile in both scan orders)
    group_base = np.zeros(n_tc, dtype=np.int64)
    G_of_tile = np.zeros(ntiles, dtype=np.int64)
    if n_tc:
        tile_change = np.ones(n_tc, dtype=bool)
        tile_change[1:] = tc_tile[1:] != tc_tile[:-1]
        csum = np.cumsum(Kg) - Kg                    # global exclusive
        base0 = np.zeros(n_tc, dtype=np.int64)
        base0[tile_change] = csum[tile_change]
        np.maximum.accumulate(base0, out=base0)
        group_base = csum - base0
        ends = np.nonzero(np.concatenate([tile_change[1:], [True]]))[0]
        np.add.at(G_of_tile, tc_tile[ends], group_base[ends] + Kg[ends])
    return dict(native=use_native, n_tc=n_tc, tc_tile=tc_tile,
                tc_chunk=tc_chunk, Kg=Kg, group_base=group_base,
                G_of_tile=G_of_tile, ent=ent)


def sell_fill_phase(A, scan: dict, sort_order: np.ndarray, buckets,
                    G_b, dtype, to_device: bool):
    """Phase 2: scatter entries into the per-bucket slabs.

    ``buckets``/``G_b`` may come from this matrix's own scan
    (single-chip) or be imposed from outside (the distributed builder
    takes the max G_b across parts so shard_map shapes agree — any
    G_b ≥ this part's own is valid; the extra groups hold zeros).
    Returns (vals_list, lidx_list, cidx2d_list) per bucket —
    vals/lidx are device arrays when ``to_device`` (jitted scatter,
    f32 only), numpy otherwise; cidx is always a numpy (nb, G_b)
    table (callers flatten with cidx_flat_pad)."""
    ntiles = len(sort_order)
    rowptr = A.indptr.astype(np.int64)
    N = A.shape[0]
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

    val = A.data if np.dtype(dtype) == A.data.dtype \
        else A.data.astype(dtype)
    if scan["native"]:
        from .. import _native
        fr = _native.sell_entries(rowptr, A.indices, A.shape[1], tile_base,
                                  scan["group_base"])
        rho = np.repeat(np.arange(N, dtype=np.int32),
                        np.diff(rowptr)) & np.int32(127)
        lane = (A.indices & 127).astype(np.int32)
    else:
        ent = scan["ent"]
        g_of = scan["group_base"][ent["tc"]] + (ent["rank"] >> 3)
        fr = (tile_base[ent["tile"]] + g_of) * 8 + (ent["rank"] & 7)
        rho, lane = ent["rho"], ent["lane"]
    if to_device:
        vals2, lidxp = _scatter_slabs(
            jnp.asarray(fr), jnp.asarray(rho),
            jnp.asarray(val.astype(np.float32)), jnp.asarray(lane),
            rows_total * 8)
        lidx2 = None         # device path scatters the packed table
    else:
        vals2 = np.zeros((rows_total * 8, 128), dtype=dtype)
        lidx2 = np.zeros((rows_total * 8, 128), dtype=np.int32)
        vals2[fr, rho] = val
        lidx2[fr, rho] = lane

    # chunk tables per bucket (tiles in sorted order)
    inv = np.empty(ntiles, dtype=np.int64)
    inv[sort_order] = np.arange(ntiles)
    n_tc, Kg, group_base = scan["n_tc"], scan["Kg"], scan["group_base"]
    rep = np.repeat(np.arange(n_tc), Kg)
    pos = np.arange(len(rep)) - np.repeat(np.cumsum(Kg) - Kg, Kg)
    pair_tile_sorted = inv[scan["tc_tile"][rep]]
    pair_g = group_base[rep] + pos
    chunk_rep = scan["tc_chunk"][rep]
    vals_t, lidx_t, cidx_t = [], [], []
    for (s, e), g, rs in zip(buckets, G_b, row_start):
        nb = e - s
        cidx_a = np.zeros((nb, g), dtype=np.int32)
        sel = (pair_tile_sorted >= s) & (pair_tile_sorted < e)
        cidx_a[pair_tile_sorted[sel] - s, pair_g[sel]] = chunk_rep[sel]
        vals_t.append(vals2[rs * 8:(rs + nb * g) * 8]
                      .reshape(nb, g, 8, 128))
        if lidx2 is None:    # device path: already packed (rows/4)
            lidx_t.append(lidxp[rs * 2:(rs + nb * g) * 2]
                          .reshape(nb, g // 4, 8, 128))
        else:
            lidx_t.append(pack_lidx(lidx2[rs * 8:(rs + nb * g) * 8]
                                    .reshape(nb, g, 8, 128)))
        cidx_t.append(cidx_a)
    return vals_t, lidx_t, cidx_t


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
    ncols: int                 # logical columns (= N when square)
    nnz_true: int
    vals_lo: tuple | None = None   # f64→f32 rounding-residual slabs
                                   # (same shapes as vals; None ⇒ the
                                   # matrix is exactly f32-representable)
    df64_ready: bool = False       # built with keep_lo=True (lo slabs
                                   # present, or proven unnecessary)

    def tree_flatten(self):
        return (self.vals, self.lidx, self.cidx, self.tile_order,
                self.vals_lo), (self.N, self.ncols, self.nnz_true,
                                self.df64_ready)

    @classmethod
    def tree_unflatten(cls, aux, children):
        vals, lidx, cidx, tile_order, vals_lo = children
        return cls(vals, lidx, cidx, tile_order, *aux[:3], vals_lo, aux[3])

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
                 max_stored_bytes: int = 13 * 1024**3,
                 keep_lo: bool = False) -> "SellOperator":
        """Build the per-tile chunked-gather layout from a scipy CSR
        matrix (square or rectangular — the column space is independent
        of the row tiles, so the interface/ghost blocks of a partitioned
        matrix use the same builder).

        Vectorized two-phase build (no per-row loops): phase 1 scans the
        distinct (tile, chunk) pairs (native streaming pass when built,
        numpy run-length machinery otherwise — the numpy path measured
        418 s at 46M nnz vs seconds native); phase 2 scatters entries
        into the G-bucketed slabs (device-side when native/f32: shipping
        padded slabs through the device tunnel measured 233 s at 46M nnz
        vs ~0.7 GB of entry arrays).

        Raises if the padded layout would exceed ``max_stored_bytes`` on
        device (vals + lidx resident in HBM) or if x outgrows the
        kernel's VMEM residency budget."""
        A = A.tocsr()
        if not A.has_sorted_indices:
            A = A.copy()
            A.sort_indices()
        N, ncols = A.shape
        if ncols > MAX_VMEM_ROWS:
            raise NotImplementedError(
                f"SellOperator holds x resident in VMEM; ncols={ncols:,} "
                f"exceeds the {MAX_VMEM_ROWS:,}-row budget — use "
                "sell_from_csr, which column-panels matrices this wide")
        nnz = int(A.indices.shape[0])
        ntiles = _round_up(max(N, 1), BLOCK_TILES * 128) // 128

        from .. import _native
        # nnz == 0 uses the numpy scan: the native pass has no pairs to
        # emit and its tile bookkeeping would index an empty array
        use_native = (_native.has_sell() and np.dtype(dtype) == np.float32
                      and N > 0 and nnz > 0)
        scan = sell_scan_phase(A, ntiles, ncols, use_native)
        sort_order = np.argsort(scan["G_of_tile"], kind="stable")
        nb = int(os.environ.get("ACG_SELL_BUCKETS", "24"))
        buckets = optimal_buckets(scan["G_of_tile"], sort_order, nb) \
            if nb > 0 else default_buckets(ntiles)
        G_b = bucket_groups(scan["G_of_tile"], sort_order, buckets)

        isz = np.dtype(dtype).itemsize
        rows_total = sum((e - s) * g for (s, e), g in zip(buckets, G_b))
        stored = 8 * rows_total * 128
        need = stored * (isz + 1)          # vals + 4:1-packed lidx
        if need > max_stored_bytes:
            raise MemoryError(
                f"SELL layout would store {stored:,} slots "
                f"({need / 1e9:.1f} GB, fill {nnz / stored:.3f}) — exceeds "
                f"max_stored_bytes={max_stored_bytes / 1e9:.1f} GB; the "
                "matrix is too irregular for the chunked-gather format at "
                "this scale")
        # kernel VMEM working set: double-buffered vals + packed-lidx
        # blocks + x
        vmem = (2 * max(G_b) * BLOCK_TILES * 1024 * (isz + 1)
                + _round_up(max(ncols, 1), 1024) * isz)
        if vmem > VMEM_BYTES:
            raise MemoryError(
                f"SELL kernel working set {vmem / 1e6:.1f} MB exceeds VMEM "
                f"(G={max(G_b)} slot groups/tile, ncols={ncols:,}); the "
                "matrix is too irregular/large for the single-chip "
                "chunked-gather path — partition it across devices instead")

        vals_t, lidx_t, cidx_t = sell_fill_phase(
            A, scan, sort_order, buckets, G_b, dtype,
            to_device=use_native)
        vals_lo = None
        if keep_lo:
            # f64→f32 rounding residuals in slabs sharing the hi layout
            # (structure-only scan ⇒ identical slab coordinates); skipped
            # when the matrix is exactly f32-representable
            lo = np.asarray(A.data, np.float64) \
                - A.data.astype(np.float32).astype(np.float64)
            if np.any(lo):
                import scipy.sparse as sp
                A_lo = sp.csr_matrix((lo, A.indices, A.indptr),
                                     shape=A.shape)
                lo_t, _, _ = sell_fill_phase(
                    A_lo, scan, sort_order, buckets, G_b, np.float32,
                    to_device=use_native)
                vals_lo = tuple(jnp.asarray(v) for v in lo_t)
        return cls(vals=tuple(jnp.asarray(v) for v in vals_t),
                   lidx=tuple(jnp.asarray(l) for l in lidx_t),
                   cidx=tuple(jnp.asarray(cidx_flat_pad(c))
                              for c in cidx_t),
                   tile_order=jnp.asarray(sort_order.astype(np.int32)),
                   N=N, ncols=ncols, nnz_true=nnz, vals_lo=vals_lo,
                   df64_ready=keep_lo)

    # -- SpMV -----------------------------------------------------------------

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x; x is (Np,) (row-padded, ORIGINAL order — columns
        are never permuted).  One chunked-gather Pallas call per bucket
        (x resident in VMEM each); the outputs cover the sorted tiles
        and one unique-index scatter restores the original row order."""
        from ..ops.pallas_sell import sell_spmv
        Nx = _round_up(max(self.ncols, 1), 1024)
        ys = [sell_spmv(v, l, c, x, Nx).reshape(-1, 128)
              for v, l, c in zip(self.vals, self.lidx, self.cidx)]
        y_sorted = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=0)
        y = jnp.zeros_like(y_sorted).at[self.tile_order].set(
            y_sorted, unique_indices=True)
        return y.reshape(-1)

    def spmv_df64(self, xh: jnp.ndarray, xl: jnp.ndarray):
        """(yh, yl) ≈ A @ (xh + xl) to df64 accuracy — the f64-parity
        SpMV for the general-partition fast path (ops/pallas_sell.py
        sell_spmv_df64).  Uses the low-residual slabs when present
        (build with from_csr(keep_lo=True) for matrices that are not
        exactly f32-representable)."""
        from ..ops.pallas_sell import sell_spmv_df64
        Nx = _round_up(max(self.ncols, 1), 1024)
        # df64 working set doubles the resident x (two VMEM buffers) and,
        # with low slabs, the double-buffered vals blocks
        nslab = 2 if self.vals_lo is not None else 1
        vmem = (2 * self.G * BLOCK_TILES * 1024 * (4 * nslab + 1)
                + 2 * Nx * 4)
        if vmem > VMEM_BYTES:
            raise MemoryError(
                f"df64 SELL kernel working set {vmem / 1e6:.1f} MB exceeds "
                f"VMEM (G={self.G}, ncols={self.ncols:,}); partition the "
                "matrix across devices for the df64 fast path")
        los = self.vals_lo if self.vals_lo is not None \
            else (None,) * len(self.vals)
        ys = [sell_spmv_df64(v, lo, l, c, xh, xl, Nx)
              for v, lo, l, c in zip(self.vals, los, self.lidx, self.cidx)]
        out = []
        for comp in range(2):
            y_sorted = jnp.concatenate(
                [y[comp].reshape(-1, 128) for y in ys], axis=0) \
                if len(ys) > 1 else ys[0][comp].reshape(-1, 128)
            y = jnp.zeros_like(y_sorted).at[self.tile_order].set(
                y_sorted, unique_indices=True)
            out.append(y.reshape(-1))
        return tuple(out)

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz_true

    def bytes_per_spmv(self) -> int:
        isz = self.vals[0].dtype.itemsize
        return sum(v.size for v in self.vals) * isz \
            + sum(l.size for l in self.lidx) * 4 + 2 * self.Np * isz


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PaneledSellOperator:
    """Column-paneled chunked-gather operator for matrices whose x
    outgrows the kernel's VMEM residency budget (the reference's merge
    kernel streams x from global memory and has no such cap,
    cg-kernels-cuda.cu:358-441; on TPU the analogue is paneling).

    The column space splits into PANEL_COLS-wide ranges and
    y = Σ_p A[:, p] @ x[p].  Each panel's SellOperator covers ONLY the
    row tiles with at least one entry in that panel (``panel_tiles``) —
    on a banded/RCM'd matrix most tiles touch one panel, so without the
    subset every panel would carry min-8-group all-zero slabs for every
    foreign tile (≈8 KB of dead traffic per (tile, panel) pair, GBs at
    4M rows).  Group counts are per (tile, chunk) and every chunk lands
    in exactly one panel, so the TOTAL stored slots stay close to the
    unpaneled layout; the overhead is per-panel bucket padding plus one
    tile-granular scatter-add per panel."""

    panels: tuple              # of SellOperator over the panel's tiles
    panel_tiles: tuple         # of (ntiles_p,) int32 — global tile ids
    col_starts: tuple          # static: first column of each panel
    N: int
    ncols: int
    nnz_true: int

    def tree_flatten(self):
        return (self.panels, self.panel_tiles), \
            (self.col_starts, self.N, self.ncols, self.nnz_true)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def dtype(self):
        return self.panels[0].dtype if self.panels \
            else jnp.dtype(jnp.float32)

    @property
    def Np(self) -> int:
        return _round_up(max(self.N, 1), 128)

    @property
    def ntiles(self) -> int:
        return self.Np // 128

    @property
    def S(self) -> int:
        return -(-self.nnz // self.Np)

    @property
    def G(self) -> int:
        return max((p.G for p in self.panels), default=0)

    @property
    def nnz(self) -> int:
        return sum(p.nnz for p in self.panels)

    @property
    def fill(self) -> float:
        return self.nnz_true / max(self.nnz, 1)

    @property
    def vals_lo(self):
        """None iff every panel is f32-exact (solve() reads this to
        specialize the df64 kernels)."""
        for p in self.panels:
            if p.vals_lo is not None:
                return p.vals_lo
        return None

    @property
    def df64_ready(self) -> bool:
        """True when built with sell_from_csr(keep_lo=True): every panel
        carries its lo residual slabs (or proved itself f32-exact)."""
        return bool(self.panels) and all(p.df64_ready for p in self.panels)

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = Σ panels.  Panel boundaries and tile subsets are static,
        so the x slices trace to free views; each panel's sub-SpMV runs
        the normal bucketed kernels over its own tiles and one
        tile-granular scatter-add (indices unique WITHIN a panel)
        accumulates into the global row space."""
        y2 = jnp.zeros((self.ntiles, 128), self.dtype)
        for op, tiles, s in zip(self.panels, self.panel_tiles,
                                self.col_starts):
            yp = op.spmv(x[s:s + op.ncols])
            yp = yp.reshape(-1, 128)[:tiles.shape[0]]
            y2 = y2.at[tiles].add(yp, unique_indices=True)
        return y2.reshape(-1)

    def spmv_df64(self, xh: jnp.ndarray, xl: jnp.ndarray):
        """(yh, yl) ≈ A @ (xh + xl) to df64 accuracy at any width — the
        f64-parity SpMV the reference computes natively at any size
        (cg-kernels-cuda.cu:358-441 has no N cap).  Panel contributions
        accumulate with an error-free df_add on the panel's own tiles
        (gather → df_add → unique-index set), so the cross-panel sum
        keeps the full (hi, lo) accuracy."""
        from ..ops import df64 as _df
        yh = jnp.zeros((self.ntiles, 128), jnp.float32)
        yl = jnp.zeros((self.ntiles, 128), jnp.float32)
        for op, tiles, s in zip(self.panels, self.panel_tiles,
                                self.col_starts):
            th, tl = op.spmv_df64(xh[s:s + op.ncols], xl[s:s + op.ncols])
            k = tiles.shape[0]
            th = th.reshape(-1, 128)[:k]
            tl = tl.reshape(-1, 128)[:k]
            nh, nl = _df.df_add(yh[tiles], yl[tiles], th, tl)
            yh = yh.at[tiles].set(nh, unique_indices=True)
            yl = yl.at[tiles].set(nl, unique_indices=True)
        return yh.reshape(-1), yl.reshape(-1)

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz_true

    def bytes_per_spmv(self) -> int:
        isz = self.dtype.itemsize
        slabs = sum(sum(v.size for v in p.vals) * isz
                    + sum(l.size for l in p.lidx) * 4 for p in self.panels)
        return slabs + self.ncols * isz + 2 * self.Np * isz


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CappedSellOperator:
    """Cap-and-tail-split chunked-gather operator — the fill lever.

    Per-(row, chunk) entry runs longer than ``cap`` are the load-balance
    tail: a handful of heavy rows force extra slot groups on all 128
    rows of their tile (the exact imbalance the reference's merge-CSR
    split exists to avoid, cg-kernels-cuda.cu:312-441).  Split them out:

      * MAIN: every (row, chunk) run truncated at ``cap`` entries — at
        cap=8 exactly one slot group per touched (tile, chunk);
      * TAIL: the beyond-cap entries of the heavy rows, COMPACTED into
        a dense small matrix (rows renumbered 0..ntail-1) and laid out
        as its own SellOperator — dense because only heavy rows remain.

    y = main·x + scatter_add(tail_rows, tail·x).  Host-side accounting
    on the 600k-row mesh solid (scripts/exp_fill_levers.py): cluster-
    order fill 0.121 → ~0.24 effective, i.e. ~half the slot traffic.
    """

    main: "SellOperator"
    tail: "SellOperator | None"
    tail_rows: jnp.ndarray      # (ntail,) int32 global row per tail row
    N: int
    ncols: int
    nnz_true: int
    cap: int = 8

    def tree_flatten(self):
        return (self.main, self.tail, self.tail_rows), \
            (self.N, self.ncols, self.nnz_true, self.cap)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def dtype(self):
        return self.main.dtype

    @property
    def Np(self) -> int:
        return self.main.Np

    @property
    def ntiles(self) -> int:
        return self.main.ntiles

    @property
    def G(self) -> int:
        return max(self.main.G, self.tail.G if self.tail else 0)

    @property
    def nnz(self) -> int:
        return self.main.nnz + (self.tail.nnz if self.tail else 0)

    @property
    def S(self) -> int:
        return -(-self.nnz // self.Np)

    @property
    def fill(self) -> float:
        return self.nnz_true / max(self.nnz, 1)

    @property
    def vals_lo(self):
        """None iff both blocks are f32-exact (solve() reads this)."""
        if self.main.vals_lo is not None:
            return self.main.vals_lo
        return self.tail.vals_lo if self.tail is not None else None

    @property
    def df64_ready(self) -> bool:
        return self.main.df64_ready and \
            (self.tail is None or self.tail.df64_ready)

    @classmethod
    def from_csr(cls, A, cap: int = 8, dtype=np.float32,
                 max_stored_bytes: int = 13 * 1024**3,
                 keep_lo: bool = False) -> "CappedSellOperator":
        import scipy.sparse as sp
        A = A.tocsr()
        A.sort_indices()
        N, ncols = A.shape
        nnz = int(A.nnz)
        rowlen = np.diff(A.indptr)
        row = np.repeat(np.arange(N, dtype=np.int64), rowlen)
        c = A.indices.astype(np.int64) >> 7
        Cn = (max(ncols, 1) + 127) // 128 + 1
        key = row * Cn + c                       # runs are contiguous
        run_start = np.ones(nnz, dtype=bool)
        if nnz > 1:
            run_start[1:] = key[1:] != key[:-1]
        first = np.nonzero(run_start)[0]
        run_id = np.cumsum(run_start) - 1
        rank = np.arange(nnz, dtype=np.int64) - first[run_id] \
            if nnz else np.zeros(0, np.int64)
        tail_mask = rank >= cap
        ntail_nnz = int(tail_mask.sum())

        def sub_csr(mask, rows, shape):
            return sp.csr_matrix(
                (A.data[mask], (rows, A.indices[mask].astype(np.int64))),
                shape=shape)

        main_csr = sub_csr(~tail_mask, row[~tail_mask], (N, ncols))
        main = SellOperator.from_csr(main_csr, dtype=dtype,
                                     max_stored_bytes=max_stored_bytes,
                                     keep_lo=keep_lo)
        tail = None
        tail_rows = jnp.zeros((0,), jnp.int32)
        if ntail_nnz:
            trow = row[tail_mask]
            rows_u, trow_c = np.unique(trow, return_inverse=True)
            tail_csr = sub_csr(tail_mask, trow_c, (len(rows_u), ncols))
            tail = SellOperator.from_csr(tail_csr, dtype=dtype,
                                         max_stored_bytes=max_stored_bytes,
                                         keep_lo=keep_lo)
            tail_rows = jnp.asarray(rows_u.astype(np.int32))
        return cls(main=main, tail=tail, tail_rows=tail_rows,
                   N=N, ncols=ncols, nnz_true=nnz, cap=cap)

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        # the tail shares the full column space: the kernel sizes its
        # VMEM-resident x by ncols (prep_x), so x passes through whole
        y = self.main.spmv(x)
        if self.tail is not None:
            yt = self.tail.spmv(x)
            y = y.at[self.tail_rows].add(
                yt[:self.tail_rows.shape[0]], unique_indices=True)
        return y

    def spmv_df64(self, xh: jnp.ndarray, xl: jnp.ndarray):
        yh, yl = self.main.spmv_df64(xh, xl)
        if self.tail is not None:
            from ..ops import df64 as _df
            th, tl = self.tail.spmv_df64(xh, xl)
            k = self.tail_rows.shape[0]
            zh = jnp.zeros_like(yh).at[self.tail_rows].set(
                th[:k], unique_indices=True)
            zl = jnp.zeros_like(yl).at[self.tail_rows].set(
                tl[:k], unique_indices=True)
            yh, yl = _df.df_add(yh, yl, zh, zl)
        return yh, yl

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz_true

    def bytes_per_spmv(self) -> int:
        b = self.main.bytes_per_spmv()
        if self.tail is not None:
            b += self.tail.bytes_per_spmv()
        return b


def sell_from_csr(A, dtype=np.float32,
                  max_stored_bytes: int = 13 * 1024**3,
                  cap: int = 0, keep_lo: bool = False,
                  heavy: bool = False):
    """Build the chunked-gather operator for a CSR matrix of ANY width:
    a plain SellOperator when x fits VMEM (CappedSellOperator with
    ``cap`` > 0 — the fill lever), a PaneledSellOperator above that
    (scipy's contiguous column slicing and tile-row extraction are
    single C passes per panel).  ``keep_lo`` builds the df64 residual
    slabs at any width (paneled keep_lo uses half-width panels so the
    (xh, xl) pair stays within the VMEM budget).  ``heavy`` splits
    heavy-but-LOCAL rows into the dense run-tail operator (core/heavy.py)
    when any qualify — the auto gate IS the detection: a uniform mesh
    has no qualifying rows and builds the plain layout unchanged."""
    A = A.tocsr()
    N, ncols = A.shape
    if heavy and cap:
        raise ValueError(
            "heavy and cap are competing split strategies; pick one "
            "(cap-and-tail measured NEGATIVE in all regimes — "
            "BENCHMARKS.md — so heavy is almost always the answer)")
    if heavy and np.dtype(dtype) != np.float32:
        raise NotImplementedError(
            "the heavy split stores f32 slabs (run-tail kernel); pass "
            "keep_lo=True for the df64-parity path instead of an f64 dtype")
    if ncols <= MAX_VMEM_ROWS:
        if heavy:
            from .heavy import HeavySplitOperator
            try:
                return HeavySplitOperator.from_csr(
                    A, dtype=dtype, max_stored_bytes=max_stored_bytes,
                    keep_lo=keep_lo)
            except ValueError:
                pass   # no heavy-local rows: plain layout
        if cap:
            return CappedSellOperator.from_csr(
                A, cap=cap, dtype=dtype,
                max_stored_bytes=max_stored_bytes, keep_lo=keep_lo)
        return SellOperator.from_csr(A, dtype=dtype,
                                     max_stored_bytes=max_stored_bytes,
                                     keep_lo=keep_lo)
    if cap:
        raise NotImplementedError(
            "cap is not implemented for column-paneled operators "
            f"(ncols={ncols:,} > {MAX_VMEM_ROWS:,}); partition the matrix "
            "across devices for the capped path")
    if heavy:
        # detection IS the gate (same contract as the VMEM path): a
        # uniform matrix has no qualifying segments and builds the plain
        # paneled layout; an actual heavy regime at paneled width is
        # unsupported and must be loud, not silently fill-poisoned
        from .heavy import heavy_segments
        if len(heavy_segments(A)[0]):
            raise NotImplementedError(
                "the heavy split is not implemented for column-paneled "
                f"operators (ncols={ncols:,} > {MAX_VMEM_ROWS:,}); "
                "partition the matrix across devices so each part fits "
                "the VMEM-resident path (build_dist_sell(heavy=True))")
    import scipy.sparse as sp
    Np = _round_up(max(N, 1), 128)
    # pad rows to the tile multiple once so tile slicing is exact
    indptr = np.concatenate(
        [A.indptr, np.full(Np - N, A.indptr[-1], A.indptr.dtype)])
    Ar = sp.csr_matrix((A.data, A.indices, indptr), shape=(Np, ncols))
    # keep_lo panels hold an (xh, xl) pair resident → half the width
    panel_cols = PANEL_COLS_DF64 if keep_lo else PANEL_COLS
    npanels = -(-ncols // panel_cols)
    width = _round_up(-(-ncols // npanels), 1024)
    panels, tiles_l, starts = [], [], []
    budget = max_stored_bytes
    for s in range(0, ncols, width):
        Ac = Ar[:, s:min(s + width, ncols)].tocsr()
        tile_nnz = np.add.reduceat(np.diff(Ac.indptr),
                                   np.arange(0, Np, 128))
        tiles = np.nonzero(tile_nnz)[0].astype(np.int32)
        if not len(tiles):
            continue
        rows = (tiles.astype(np.int64)[:, None] * 128
                + np.arange(128)).ravel()
        p = SellOperator.from_csr(Ac[rows], dtype=dtype,
                                  max_stored_bytes=budget, keep_lo=keep_lo)
        lo_b = 4 if (keep_lo and p.vals_lo is not None) else 0
        budget -= p.nnz * (np.dtype(dtype).itemsize + 4 + lo_b)
        panels.append(p)
        tiles_l.append(jnp.asarray(tiles))
        starts.append(s)
    return PaneledSellOperator(panels=tuple(panels),
                               panel_tiles=tuple(tiles_l),
                               col_starts=tuple(starts),
                               N=N, ncols=ncols, nnz_true=int(A.nnz))
