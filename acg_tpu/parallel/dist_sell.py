"""Distributed SELL operator: owned + interface chunked-gather blocks.

The multi-device analogue of the reference's per-rank load-balanced SpMV:
every rank runs the merge-based CSR kernel on both its owned full block
(`fa`) and its interface block (`oa`) (cg-kernels-cuda.cu:312-441,
dispatched per rank from cgcuda.c:855-899; blocks built by
acgsymcsrmatrix_dsymv_init, symcsrmatrix.c:760-845).  Here each device
runs the chunked-gather SELL kernel (ops/pallas_sell.py) on

  * the owned block     — L local rows x L owned-local columns, and
  * the interface block — L local rows x G ghost-buffer columns,

where the ghost buffer is filled by the halo exchange (parallel/halo.py).
The owned product has no data dependence on the halo, so XLA's scheduler
is free to overlap the collective with it — the commstream/stream overlap
of cgcuda.c:855-899 as a compiler artifact.  This replaces the gather-ELL
fallback (measured 0.139 Gnnz/s — 50x off the SELL kernel) as the fast
path for multi-chip unstructured solves.

SPMD shape uniformity: `shard_map` stacks per-part arrays on a leading
axis, so every part's layout must share (ntiles, bucket structure, G_b).
ntiles is a pure function of the shared padded L; the bucket boundaries
and G_b come from ONE value-aware DP (core/sell.optimal_buckets) run on
the elementwise-max of the parts' ascending-sorted G histograms — the
same boundaries/G_b serve every part, and parts with fewer groups carry
zero-valued padded slots, inert by the zero-value invariant.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..core.sell import (BLOCK_TILES, bucket_groups, cidx_flat_pad,
                         default_buckets, optimal_buckets, sell_fill_phase,
                         sell_scan_phase, _round_up)
from ..partition.graph import PartitionedMatrix


@dataclasses.dataclass
class SellBlocks:
    """One stacked block type (owned or interface) across all parts.

    vals/lidx: per bucket (P, nb_b, G_b, 8, 128); cidx: per bucket
    (P, nb_b*Sc_b) flat Sc-padded chunk tables; tile_order: (P, ntiles).
    ``ncols`` is the block's column-space length (L for owned, G for
    interface)."""

    vals: tuple
    lidx: tuple
    cidx: tuple
    tile_order: np.ndarray
    ncols: int
    vals_lo: tuple | None = None   # f64→f32 rounding residuals (df64 path)

    def tree(self) -> dict:
        """The pytree handed to shard_map (leading axis = part)."""
        d = dict(vals=self.vals, lidx=self.lidx, cidx=self.cidx,
                 tile_order=self.tile_order)
        if self.vals_lo is not None:
            d["vals_lo"] = self.vals_lo
        return d

    @property
    def stored_slots(self) -> int:
        return sum(int(np.prod(v.shape[1:])) * v.shape[0]
                   for v in self.vals)


@dataclasses.dataclass
class DistSellOperator:
    """Host-built stacked SELL blocks for the general partitioned SpMV."""

    own: SellBlocks
    gst: SellBlocks
    P: int
    L: int
    nnz_true: int
    df64_ready: bool = False   # built with keep_lo=True (lo slabs present,
    #                            or proven unnecessary: matrix is f32-exact)
    # optional per-part dense run-tails for heavy-segment rows of the
    # OWNED blocks (build_dist_sell(heavy=True)): dict of stacked
    # SPMD-uniform arrays — tvals (P, nsteps, R, WSUB, 8, 128), tbase
    # (P, nsteps*R), trows (P, nsteps*R) with pads at L, tocc
    # (P, nsteps*R) occurrence rank per slot (pads -1), and optionally
    # tvals_lo (keep_lo: f64→f32 residual windows)
    tail: dict | None = None
    # static: number of occurrence ranks (max segments any row owns,
    # maxed across parts) — the df64 tail scatter runs one exact
    # masked-add round per rank
    tail_K: int = 0

    @property
    def fill(self) -> float:
        stored = self.own.stored_slots + self.gst.stored_slots
        if self.tail is not None:
            stored += int(self.tail["tvals"].size)
        return self.nnz_true / max(stored, 1)


def _ell_to_csr(colidx: np.ndarray, vals: np.ndarray, nrows: int,
                ncols: int) -> sp.csr_matrix:
    """(K, L) ELL slabs → scipy CSR, dropping zero-valued (padding)
    slots.  Structural zeros never affect the SpMV, so dropping them is
    exact."""
    K, L = vals.shape
    keep = vals.reshape(-1) != 0.0
    rows = np.tile(np.arange(L, dtype=np.int64), K)[keep]
    cols = colidx.reshape(-1).astype(np.int64)[keep]
    data = vals.reshape(-1)[keep]
    A = sp.csr_matrix((data, (rows, cols)), shape=(nrows, ncols))
    A.sort_indices()
    return A


def _common_layout(csrs: list[sp.csr_matrix], L: int, ncols: int,
                   dtype=np.float32, keep_lo: bool = False) -> SellBlocks:
    """SELL layouts for P same-shape CSR blocks with SPMD-uniform
    shapes: shared bucket structure (a function of ntiles alone) and
    per-bucket G_b maxed across parts.  ``keep_lo`` additionally fills
    f64→f32 rounding-residual slabs sharing the hi layout (the df64
    matrix representation; skipped when every part is f32-exact)."""
    import os

    from .. import _native
    ntiles = _round_up(max(L, 1), BLOCK_TILES * 128) // 128
    scans, orders, natives = [], [], []
    for A in csrs:
        use_native = (_native.has_sell() and np.dtype(dtype) == np.float32
                      and A.indices.shape[0] > 0)
        scan = sell_scan_phase(A, ntiles, ncols, use_native)
        scans.append(scan)
        natives.append(use_native)
        orders.append(np.argsort(scan["G_of_tile"], kind="stable"))
    # Value-aware bucket boundaries on the ELEMENTWISE-MAX of the parts'
    # ascending-sorted G histograms: every part sorts its own tiles, so
    # position i of each sorted sequence is comparable across parts and
    # h[i] = max_p sorted_G_p[i] (still ascending) is exactly the G the
    # shared bucket ending at i must pad to.  Running the optimal_buckets
    # DP on h keeps shapes SPMD-uniform (same boundaries, same G_b for
    # every part) while removing the equal-count padding waste (measured
    # single-chip: 44%; distributed fill 0.094 -> the single-chip 0.10+
    # class).  ACG_SELL_BUCKETS=0 falls back to equal-count buckets.
    h = np.maximum.reduce([s["G_of_tile"][o]
                           for s, o in zip(scans, orders)])
    ident = np.arange(ntiles)
    nb = int(os.environ.get("ACG_SELL_BUCKETS", "24"))
    buckets = optimal_buckets(h, ident, nb) if nb > 0 \
        else default_buckets(ntiles)
    G_b = bucket_groups(h, ident, buckets)
    # fill ON DEVICE when the native scan ran (f32): shipping host-padded
    # slabs through the device tunnel measured 230 s at 46M nnz vs ~20 s
    # for entry arrays + a jitted scatter (same trade as SellOperator)
    per_part = [sell_fill_phase(A, s, o, buckets, G_b, dtype, to_device=n)
                for A, s, o, n in zip(csrs, scans, orders, natives)]
    nb = len(buckets)
    stack = jnp.stack if any(natives) else np.stack
    vals = tuple(stack([pp[0][b] for pp in per_part]) for b in range(nb))
    lidx = tuple(stack([pp[1][b] for pp in per_part]) for b in range(nb))
    cidx = tuple(np.stack([cidx_flat_pad(pp[2][b]) for pp in per_part])
                 for b in range(nb))
    tile_order = np.stack([o.astype(np.int32) for o in orders])
    vals_lo = None
    if keep_lo:
        los = [np.asarray(A.data, np.float64)
               - A.data.astype(np.float32).astype(np.float64)
               for A in csrs]
        if any(np.any(lo) for lo in los):
            # structure-only scan ⇒ the residual slabs reuse each part's
            # scan/order; an all-zero part still fills (zero slabs keep
            # the stacked shapes SPMD-uniform)
            lo_parts = [
                sell_fill_phase(
                    sp.csr_matrix((lo, A.indices, A.indptr), shape=A.shape),
                    s, o, buckets, G_b, np.float32, to_device=n)
                for A, lo, s, o, n in zip(csrs, los, scans, orders, natives)]
            vals_lo = tuple(stack([pp[0][b] for pp in lo_parts])
                            for b in range(nb))
    return SellBlocks(vals=vals, lidx=lidx, cidx=cidx,
                      tile_order=tile_order, ncols=ncols, vals_lo=vals_lo)


def build_dist_sell(pm: PartitionedMatrix, dtype=np.float32,
                    keep_lo: bool = False, heavy: bool = False,
                    heavy_threshold: int | None = None) -> DistSellOperator:
    """Build the stacked owned/interface SELL blocks from a partitioned
    matrix.  Entries come from the partition's ELL slabs (zero-valued
    padding slots dropped), so no access to the original global matrix
    is needed.  ``keep_lo`` builds the df64 rounding-residual slabs
    (see _common_layout) for the distributed pipelined-df64 solver.

    ``heavy`` detects dense window segments in each part's OWNED block
    (core/heavy.heavy_segments over the local column space) and moves
    them to per-part dense run-tails so the SELL layouts recover their
    mesh fill — the distributed twin of sell_from_csr(heavy=True)
    (measured single-chip: 2.67 → 8.71 Gnnz/s on the ACG_HEAVY=2
    regime, BENCHMARKS.md).  Tails stack SPMD-uniform: nsteps is maxed
    across parts and parts with fewer segments pad with zero slabs.
    Ghost-block runs are not split (ghost columns are an arbitrary
    permutation of remote rows, so contiguous runs do not survive the
    renumbering).  Detection operates in the pm's LOCAL column order:
    runs must be contiguous there, so heavy inputs should be built with
    local_order="none" — the per-part cluster relabeling fragments runs
    below the threshold (measured on the chip: 172 of 528 segments
    survived, fill 0.062; the CLI gates this automatically).
    heavy + keep_lo composes: the tail keeps (hi, lo)
    window pairs, and the df64 scatter runs one masked-ADD round per
    occurrence rank (each row appears at most once per rank, and the
    masked-out slots contribute exact 0.0 adds — SPMD-uniform shapes,
    unlike the single-device unique-set groups)."""
    if heavy and np.dtype(dtype) != np.float32:
        raise NotImplementedError(
            "the heavy split stores f32 slabs (run-tail kernel)")
    P, L, G = pm.P, pm.L, pm.G
    own_csrs = [_ell_to_csr(pm.own_colidx[p], pm.own_vals[p], L, L)
                for p in range(P)]
    gst_csrs = [_ell_to_csr(pm.ghost_colidx[p], pm.ghost_vals[p], L, G)
                for p in range(P)]
    nnz_true = sum(int(a.nnz) for a in own_csrs) \
        + sum(int(a.nnz) for a in gst_csrs)
    tail = None
    tail_K = 0
    if heavy:
        from ..core.heavy import (R, WSUB, heavy_segments, mirror_strip,
                                  strip_segments, tail_arrays)
        segs = [heavy_segments(A, heavy_threshold) for A in own_csrs]
        nsteps = max((-(-len(s[0]) // R) for s in segs), default=0)
        if nsteps > 0:
            tv, tl, tb, tr, to, sv = [], [], [], [], [], []
            any_lo = False
            any_sym = False
            for p in range(P):
                tvals, tlo, tbase, trows, mask = tail_arrays(
                    own_csrs[p], *segs[p], nsteps=nsteps, pad_row=L,
                    keep_lo=keep_lo)
                svals = None
                if not keep_lo:
                    # symmetric-mirror strip of the OWNED block (the
                    # dense-column twins; core/heavy.mirror_strip).
                    # Ghost-side mirrors stay put: a stripped row
                    # segment's transpose lands in the owning part of
                    # the COLUMN rows, i.e. in their owned blocks —
                    # which this per-part pass covers exactly when the
                    # segment's window is within one part (the
                    # contiguous-partition heavy contract).
                    svals, mask = mirror_strip(
                        own_csrs[p], *segs[p], mask, tvals, tbase,
                        nsteps)
                    any_sym = any_sym or svals is not None
                sv.append(svals)
                if mask.any():
                    own_csrs[p] = strip_segments(own_csrs[p], mask)
                tv.append(tvals.reshape(nsteps, R, WSUB, 8, 128))
                tl.append(tlo.reshape(nsteps, R, WSUB, 8, 128)
                          if tlo is not None
                          else np.zeros((nsteps, R, WSUB, 8, 128),
                                        np.float32))
                any_lo = any_lo or tlo is not None
                tb.append(tbase)
                tr.append(trows)
                # occurrence rank per slot (pads -1): seg_row is sorted,
                # so rank = index - first index of that row
                seg_row = segs[p][0]
                occ = np.full((nsteps * R,), -1, np.int32)
                if len(seg_row):
                    occ[:len(seg_row)] = (
                        np.arange(len(seg_row))
                        - np.searchsorted(seg_row, seg_row)).astype(np.int32)
                    tail_K = max(tail_K, int(occ[:len(seg_row)].max()) + 1)
                to.append(occ)
            tail = dict(tvals=jnp.asarray(np.stack(tv)),
                        tbase=jnp.asarray(np.stack(tb)),
                        trows=jnp.asarray(np.stack(tr)),
                        tocc=jnp.asarray(np.stack(to)))
            if keep_lo and any_lo:
                tail["tvals_lo"] = jnp.asarray(np.stack(tl))
            if any_sym:
                W = WSUB * 1024
                tail["svals"] = jnp.asarray(np.stack(
                    [(np.zeros((nsteps * R, W), np.float32)
                      if s_ is None else s_).reshape(nsteps, R, WSUB,
                                                     8, 128)
                     for s_ in sv]))
    own = _common_layout(own_csrs, L, L, dtype, keep_lo=keep_lo)
    gst = _common_layout(gst_csrs, L, G, dtype, keep_lo=keep_lo)
    return DistSellOperator(own=own, gst=gst, P=P, L=L, nnz_true=nnz_true,
                            df64_ready=keep_lo, tail=tail, tail_K=tail_K)


def sell_block_spmv(blk: dict, x: jnp.ndarray, ncols: int,
                    L: int) -> jnp.ndarray:
    """y = A_blk @ x for one device's block (leading part axis already
    squeezed by the shard_map caller).  One kernel call per bucket; the
    bucket outputs cover the sorted tiles and one unique-index scatter
    restores the original row order."""
    from ..ops.pallas_sell import sell_spmv
    Nx = _round_up(max(ncols, 1), 1024)
    ys = [sell_spmv(v, l, c, x, Nx).reshape(-1, 128)
          for v, l, c in zip(blk["vals"], blk["lidx"], blk["cidx"])]
    y_sorted = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=0)
    y = jnp.zeros_like(y_sorted).at[blk["tile_order"]].set(
        y_sorted, unique_indices=True)
    return y.reshape(-1)[:L]


def dist_sell_spmv_with_ghosts(own: dict, gst: dict, x_own: jnp.ndarray,
                               ghosts: jnp.ndarray, own_ncols: int,
                               gst_ncols: int) -> jnp.ndarray:
    """Owned-block + interface-block SELL SpMV given a filled ghost
    buffer — the fa/oa operator split of symcsrmatrix.h:249-292 at
    kernel speed.  The owned term does not consume ``ghosts``, so XLA
    overlaps the halo collective with it.  When the owned dict carries
    dense run-tail slabs (build_dist_sell(heavy=True)), the tail term
    scatter-adds into the owned rows (pads masked to zero and clamped
    in-range — an out-of-bounds scatter index is dropped silently,
    which would hide a real bug)."""
    L = x_own.shape[0]
    y_own = sell_block_spmv(own, x_own, own_ncols, L)
    y_gst = sell_block_spmv(gst, ghosts, gst_ncols, L)
    y = y_own + y_gst
    if "tvals" in own:
        from ..ops.pallas_runtail import runtail_scatter, runtail_spmv
        Nx = _round_up(max(own_ncols, 1), 1024)
        trows = own["trows"]
        if "svals" in own:
            xr = jnp.where(trows < L,
                           x_own[jnp.minimum(trows, L - 1)], 0.0
                           ).astype(jnp.float32)
            ys = runtail_scatter(own["svals"], own["tbase"], xr, Nx)
            y = y + ys[:y.shape[0]]
        yt = runtail_spmv(own["tvals"], own["tbase"], x_own, Nx)
        yt = jnp.where(trows < L, yt, 0.0)
        y = y.at[jnp.minimum(trows, L - 1)].add(yt)
    return y


def sell_block_spmv_df64(blk: dict, xh: jnp.ndarray, xl: jnp.ndarray,
                         ncols: int, L: int):
    """(yh, yl) ≈ A_blk @ (xh + xl) for one device's block — the df64
    counterpart of sell_block_spmv (ops/pallas_sell.sell_spmv_df64).
    Uses the ``vals_lo`` residual slabs when the block carries them
    (build_dist_sell(keep_lo=True))."""
    from ..ops.pallas_sell import sell_spmv_df64
    Nx = _round_up(max(ncols, 1), 1024)
    los = blk["vals_lo"] if "vals_lo" in blk else (None,) * len(blk["vals"])
    ys = [sell_spmv_df64(v, lo, l, c, xh, xl, Nx)
          for v, lo, l, c in zip(blk["vals"], los, blk["lidx"], blk["cidx"])]
    out = []
    for comp in range(2):
        y_sorted = jnp.concatenate([y[comp].reshape(-1, 128) for y in ys],
                                   axis=0) if len(ys) > 1 \
            else ys[0][comp].reshape(-1, 128)
        y = jnp.zeros_like(y_sorted).at[blk["tile_order"]].set(
            y_sorted, unique_indices=True)
        out.append(y.reshape(-1)[:L])
    return tuple(out)


def dist_sell_spmv_with_ghosts_df64(own: dict, gst: dict,
                                    xh: jnp.ndarray, xl: jnp.ndarray,
                                    gh: jnp.ndarray, gl: jnp.ndarray,
                                    own_ncols: int, gst_ncols: int,
                                    tail_K: int = 0):
    """df64 owned + interface SpMV: both block products are (hi, lo)
    pairs combined with an error-free df_add, giving the general-
    partition f64-parity q = A·w (what the reference's per-rank merge
    kernel computes in native f64, cg-kernels-cuda.cu:358-441).

    ``tail_K`` > 0 adds the df64 run-tail (heavy + keep_lo build): one
    masked scatter-ADD round per occurrence rank — within a rank every
    live row appears once (the add is a set), masked/pad slots add an
    exact 0.0, so each round composes with one error-free df_add and
    shapes stay SPMD-uniform."""
    from ..ops import df64
    L = xh.shape[0]
    yh, yl = sell_block_spmv_df64(own, xh, xl, own_ncols, L)
    bh, bl = sell_block_spmv_df64(gst, gh, gl, gst_ncols, L)
    yh, yl = df64.df_add(yh, yl, bh, bl)
    if tail_K > 0:
        from ..ops.pallas_runtail import runtail_spmv_df64
        Nx = _round_up(max(own_ncols, 1), 1024)
        th, tl = runtail_spmv_df64(own["tvals"],
                                   own.get("tvals_lo"), own["tbase"],
                                   xh, xl, Nx)
        trows = own["trows"]
        live = trows < L
        rowsc = jnp.minimum(trows, L - 1)
        for k in range(tail_K):
            m = live & (own["tocc"] == k)
            zh = jnp.zeros_like(yh).at[rowsc].add(jnp.where(m, th, 0.0))
            zl = jnp.zeros_like(yl).at[rowsc].add(jnp.where(m, tl, 0.0))
            yh, yl = df64.df_add(yh, yl, zh, zl)
    return yh, yl
