"""Heavy-segment split operator: SELL main block + dense run-tail.

The load-balance capability the reference's merge-based CSR kernel has
by construction (cg-kernels-cuda.cu:312-441, perfect nnz split across
threads regardless of row lengths), re-expressed for the chunked-gather
SELL format's actual failure mode.  Measured on the real chip
(BENCHMARKS.md ACG_HEAVY=2): 4,688 rows with contiguous 2,048-entry
runs interleaved into a 600k-row mesh drop the SELL layout from fill
0.121 / 8.0 Gnnz/s to fill 0.039 / 2.67 Gnnz/s — each heavy row forces
~run/8 slot groups onto all 128 rows of its tile — and a SELL-format
tail is scatter-regime after compaction (every row's window differs, so
G explodes past VMEM; see the cap-and-tail section).

Split by contiguous column SEGMENT, not by whole row: a heavy row in
the wild is its mesh entries (near the diagonal) PLUS a dense run
somewhere else (the arrow/constraint pattern — exactly the ACG_HEAVY=2
generator), so a whole-row locality test never fires.  Per candidate
row, a greedy left-to-right scan finds maximal column stretches that
fit one WSUB*1024 window with >= threshold entries:

  * each detected segment becomes one dense run-tail slot
    (ops/pallas_runtail.py): a WSUB*1024-element value window, the x
    window DMA'd at a dynamic aligned offset — zero slot padding, pure
    streaming;
  * the row's REMAINING entries (the mesh part) stay in the SELL main
    block, whose layout recovers its mesh-only fill.

y = main.spmv(x) + scatter_add(seg_rows, runtail(x)); a row may own
several segments, so the scatter-add makes no uniqueness promise.
Zero-padding invariant: padded tail slots carry zero values and base 0,
and their outputs are forced to zero before the scatter (a NaN in a pad
window must not leak into y's padded region).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_runtail import (R, WSUB, runtail_scatter, runtail_spmv,
                                  runtail_spmv_df64)
from .sell import SellOperator, _round_up

# worst-case span a segment may cover and still fit one WSUB-subrow
# window at any 1024-alignment (base = start // 1024 -> offset < 1024)
SPAN_LIMIT = (WSUB - 1) * 1024


def heavy_segments(A, threshold: int | None = None):
    """Detect dense window segments: per candidate row (nnz >= the
    threshold), maximal contiguous column stretches spanning less than
    SPAN_LIMIT with >= threshold entries.

    Returns (seg_row, seg_lo, seg_hi): global row id and [lo, hi) entry
    ranges into the CSR arrays, sorted by row.  Safe on unsorted-index
    input (sorts a copy)."""
    A = A.tocsr()
    if not A.has_sorted_indices:
        A = A.copy()
        A.sort_indices()
    counts = np.diff(A.indptr)
    if threshold is None:
        threshold = max(256, int(8 * counts.mean()) if len(counts) else 0)
    cand = np.nonzero(counts >= threshold)[0]
    seg_row, seg_lo, seg_hi = [], [], []
    for r in cand:
        lo, hi = int(A.indptr[r]), int(A.indptr[r + 1])
        cols = A.indices[lo:hi]
        i = 0
        n = hi - lo
        while i < n:
            # widest window starting at entry i (cols sorted)
            j = int(np.searchsorted(cols, cols[i] + SPAN_LIMIT))
            if j - i >= threshold:
                seg_row.append(r)
                seg_lo.append(lo + i)
                seg_hi.append(lo + j)
                i = j
            else:
                i += 1
    return (np.asarray(seg_row, dtype=np.int64),
            np.asarray(seg_lo, dtype=np.int64),
            np.asarray(seg_hi, dtype=np.int64))


def tail_arrays(A, seg_row, seg_lo, seg_hi, nsteps: int, pad_row: int,
                keep_lo: bool = False):
    """Dense run-tail slabs from detected segments.

    Returns (tvals (nsteps*R, WSUB*1024) f32, tlo same-or-None, tbase
    (nsteps*R,) i32, trows (nsteps*R,) i32 with pads at ``pad_row``,
    tail_mask (nnz,) bool).  ``nsteps`` may exceed the minimum (SPMD-
    uniform stacking across parts pads with zero slabs)."""
    nseg = len(seg_row)
    W = WSUB * 1024
    tvals = np.zeros((nsteps * R, W), np.float32)
    tlo = np.zeros((nsteps * R, W), np.float32) if keep_lo else None
    tbase = np.zeros((nsteps * R,), np.int32)
    trows = np.full((nsteps * R,), pad_row, np.int32)
    tail_mask = np.zeros(A.nnz, dtype=bool)
    for i in range(nseg):
        lo, hi = seg_lo[i], seg_hi[i]
        cols = A.indices[lo:hi]
        base = int(cols[0]) // 1024
        off = cols - base * 1024
        d = A.data[lo:hi]
        tvals[i, off] = d
        if keep_lo:
            tlo[i, off] = (np.asarray(d, np.float64)
                           - tvals[i, off].astype(np.float64))
        tbase[i] = base
        trows[i] = seg_row[i]
        tail_mask[lo:hi] = True
    if keep_lo and not tlo.any():
        tlo = None                     # tail exactly f32-representable
    return tvals, tlo, tbase, trows, tail_mask


def strip_segments(A, tail_mask):
    """Copy of CSR ``A`` with the masked (tail) entries removed — same
    row/column space, so the main-block layout sees only mesh rows."""
    import scipy.sparse as sp
    N = A.shape[0]
    keep = ~tail_mask
    rowlen = np.diff(A.indptr)
    row_of = np.repeat(np.arange(N, dtype=np.int64), rowlen)
    counts = np.bincount(row_of[keep], minlength=N)
    indptr = np.zeros(N + 1, A.indptr.dtype)
    np.cumsum(counts, out=indptr[1:])
    return sp.csr_matrix((A.data[keep], A.indices[keep], indptr),
                         shape=A.shape)


def mirror_strip(A, seg_row, seg_lo, seg_hi, tail_mask, tvals,
                 tbase, nsteps: int):
    """Symmetric-mirror extension of the tail: for every stripped row-
    segment slot (r, c) whose TRANSPOSE entry (c, r) exists in A with
    the exact same value (symmetric input), strip (c, r) from the main
    block too and mark the slot in a separate scatter slab ``svals`` —
    the transpose contribution y[c] += A[c, r]·x[r] is then computed by
    runtail_scatter from the same window geometry.

    Per-SLOT granularity sidesteps every double-count hazard: the
    diagonal (its own mirror) and entries already inside another row
    segment's window stay un-stripped and their scatter slots stay
    zero.  Returns (svals (nsteps*R, WSUB*1024) or None, updated
    tail_mask) — ``tail_mask`` is modified in place."""
    nseg = len(seg_row)
    if nseg == 0:
        return None, tail_mask
    N, ncols = A.shape
    # entries sorted by (row, col) ⇒ this key is strictly increasing
    rowlen = np.diff(A.indptr)
    row_of = np.repeat(np.arange(N, dtype=np.int64), rowlen)
    key = row_of * ncols + A.indices.astype(np.int64)
    pos = np.nonzero(tail_mask)[0]                 # row-segment entries
    # segments are disjoint [lo, hi) ranges in entry order
    seg_of = np.searchsorted(seg_lo, pos, side="right") - 1
    r_all = seg_row[seg_of]
    c_all = A.indices[pos].astype(np.int64)
    mkey = c_all * ncols + r_all
    p2 = np.searchsorted(key, mkey)
    p2c = np.minimum(p2, len(key) - 1)
    ok = (key[p2c] == mkey) & ~tail_mask[p2c] \
        & (A.data[p2c] == A.data[pos]) & (c_all != r_all)
    if not ok.any():
        return None, tail_mask
    W = WSUB * 1024
    svals = np.zeros((nsteps * R, W), np.float32)
    off = (c_all - tbase[seg_of].astype(np.int64) * 1024)[ok]
    svals[seg_of[ok], off] = A.data[pos[ok]]
    tail_mask[p2c[ok]] = True
    return svals, tail_mask


def heavy_rows(A, threshold: int | None = None) -> np.ndarray:
    """Row ids owning at least one dense window segment (see
    heavy_segments) — the detection gate sell_from_csr(heavy=True)
    uses."""
    seg_row, _, _ = heavy_segments(A, threshold)
    return np.unique(seg_row)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HeavySplitOperator:
    """SELL main block (heavy segments removed) + dense run-tail.

    ``keep_lo`` builds carry the df64 story: the main block keeps its
    low-residual slabs (core/sell.py keep_lo) and the tail keeps a
    second (hi, lo) window slab pair, so ``spmv_df64`` delivers the
    f64-parity SpMV on heavy matrices — the capability the reference's
    f64 merge kernel has with no special casing
    (cg-kernels-cuda.cu:358-441).  ``groups`` are the duplicate-free
    scatter rounds for the df64 tail add: a row may own several
    segments, and a componentwise .add would round away the pair's low
    bits, so each occurrence rank gets its own unique-index set + one
    error-free df_add."""

    main: SellOperator
    tvals: jnp.ndarray       # (nsteps, R, WSUB, 8, 128) f32
    tvals_lo: "jnp.ndarray | None"   # same shape; None = tail f32-exact
    tbase: jnp.ndarray       # (nsteps*R,) int32, units of 1024 elements
    trows: jnp.ndarray       # (nsteps*R,) int32 global rows (pad → N)
    groups: tuple            # ((idx_k, rows_k), ...) unique-row rounds
    N: int
    ncols: int
    nnz_true: int
    # static: tail built with keep_lo (lo slab present OR proved exact)
    _tail_df64_ready: bool = False
    # symmetric-mirror scatter slab (core/heavy.mirror_strip): window
    # values whose transpose entries were stripped from the main block;
    # None when no mirrors were stripped (asymmetric input / keep_lo)
    svals: "jnp.ndarray | None" = None

    def tree_flatten(self):
        return (self.main, self.tvals, self.tvals_lo, self.tbase,
                self.trows, self.groups, self.svals), \
            (self.N, self.ncols, self.nnz_true, self._tail_df64_ready)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (main, tvals, tvals_lo, tbase, trows, groups, svals) = children
        return cls(main, tvals, tvals_lo, tbase, trows, groups, *aux[:3],
                   _tail_df64_ready=aux[3], svals=svals)

    @property
    def dtype(self):
        return self.main.dtype

    @property
    def vals_lo(self):
        """None iff both blocks are f32-exact (solve() reads this to
        specialize the df64 kernels)."""
        if self.main.vals_lo is not None:
            return self.main.vals_lo
        return self.tvals_lo

    @property
    def df64_ready(self) -> bool:
        """True when built with from_csr(keep_lo=True): both blocks
        carry lo residuals (or proved themselves f32-exact)."""
        return self.main.df64_ready and self._tail_df64_ready

    @property
    def Np(self) -> int:
        return self.main.Np

    @property
    def ntail(self) -> int:
        return int(self.trows.shape[0])

    @property
    def nnz(self) -> int:
        n = self.main.nnz + self.tvals.size
        if self.svals is not None:
            n += self.svals.size
        return n

    @property
    def S(self) -> int:
        """Average stored slots per row (rounded up)."""
        return -(-self.nnz // self.Np)

    @property
    def fill(self) -> float:
        return self.nnz_true / max(self.nnz, 1)

    @classmethod
    def from_csr(cls, A, dtype=np.float32, threshold: int | None = None,
                 max_stored_bytes: int = 13 * 1024**3,
                 keep_lo: bool = False, sym: bool = True):
        """Split a scipy CSR matrix by segment regime and build both
        parts.  ``keep_lo`` keeps the f64→f32 rounding residuals of BOTH
        blocks so spmv_df64/pipelined-df64 see the exact matrix.

        ``sym`` (default on; f32 builds only) additionally strips the
        SYMMETRIC MIRRORS of the detected segments — the dense COLUMNS
        a symmetric heavy row implies, which otherwise stay in the main
        block and poison its fill from the transpose side (measured:
        stripping rows alone left 9.6M mirror entries and G up to 232
        on the ACG_HEAVY=2 system) — and computes their contribution
        with the runtail_scatter kernel from the same window slabs.
        Entry-exact: only mirrors that exist with bit-equal values are
        moved, so asymmetric inputs degrade gracefully to rows-only.

        Raises ValueError when no segment qualifies — callers should use
        the plain builder then (the split only pays when dense window
        segments exist; uniform meshes measured NEGATIVE for splitting,
        BENCHMARKS.md cap-and-tail)."""
        if np.dtype(dtype) != np.float32:
            raise NotImplementedError(
                "HeavySplitOperator is f32-only (run-tail kernel; use "
                "keep_lo=True for the df64-parity path)")
        A = A.tocsr()
        if not A.has_sorted_indices:
            A = A.copy()
            A.sort_indices()
        N, ncols = A.shape
        seg_row, seg_lo, seg_hi = heavy_segments(A, threshold)
        nseg = len(seg_row)
        if nseg == 0:
            raise ValueError("no dense window segments; use sell_from_csr")

        nsteps = -(-nseg // R)
        tvals, tlo, tbase, trows, tail_mask = tail_arrays(
            A, seg_row, seg_lo, seg_hi, nsteps, pad_row=N, keep_lo=keep_lo)
        svals = None
        if sym and not keep_lo:
            # (keep_lo: mirrors stay in the main block — the df64 path
            # has no EFT scatter kernel; document over silently degrade)
            svals, tail_mask = mirror_strip(
                A, seg_row, seg_lo, seg_hi, tail_mask, tvals, tbase,
                nsteps)

        # duplicate-free scatter rounds for the df64 tail add: k-th round
        # holds each live row's k-th segment (unique rows by construction;
        # seg_row is sorted by row — heavy_segments contract)
        occ = np.arange(nseg) - np.searchsorted(seg_row, seg_row)
        groups = []
        for k in range(int(occ.max()) + 1 if nseg else 0):
            idx_k = np.nonzero(occ == k)[0].astype(np.int32)
            groups.append((jnp.asarray(idx_k),
                           jnp.asarray(seg_row[idx_k].astype(np.int32))))

        # main block: same row/column space, segment entries removed
        Am = strip_segments(A, tail_mask)
        main = SellOperator.from_csr(Am, dtype=dtype,
                                     max_stored_bytes=max_stored_bytes,
                                     keep_lo=keep_lo)
        return cls(main=main,
                   tvals=jnp.asarray(
                       tvals.reshape(nsteps, R, WSUB, 8, 128)),
                   tvals_lo=None if tlo is None else jnp.asarray(
                       tlo.reshape(nsteps, R, WSUB, 8, 128)),
                   tbase=jnp.asarray(tbase),
                   trows=jnp.asarray(trows),
                   groups=tuple(groups),
                   N=N, ncols=ncols, nnz_true=int(A.nnz),
                   _tail_df64_ready=keep_lo,
                   svals=None if svals is None else jnp.asarray(
                       svals.reshape(nsteps, R, WSUB, 8, 128)))

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        Nx = _round_up(max(self.ncols, 1), 1024)
        y = self.main.spmv(x)
        if self.svals is not None:
            # transpose-side tail: y[window_i] += svals_i * x[row_i]
            xr = jnp.where(self.trows < self.N,
                           x[jnp.minimum(self.trows, self.N - 1)], 0.0
                           ).astype(jnp.float32)
            ys = runtail_scatter(self.svals, self.tbase, xr, Nx)
            y = y + ys[:y.shape[0]]
        yt = runtail_spmv(self.tvals, self.tbase, x, Nx)
        # Pad slots all map to row N (NOT unique — no uniqueness promise
        # on the scatter; rows owning several segments also repeat) and
        # their values are forced to zero so a NaN/Inf in a pad window
        # cannot leak into y's padded region (dots/norms are unmasked).
        yt = jnp.where(self.trows < self.N, yt, 0.0)
        if self.N < self.Np:
            return y.at[self.trows].add(yt)
        return jnp.concatenate([y, jnp.zeros((1,), y.dtype)]) \
            .at[self.trows].add(yt)[:-1]

    def spmv_df64(self, xh: jnp.ndarray, xl: jnp.ndarray):
        """(yh, yl) ≈ A @ (xh + xl) to df64 accuracy: SELL df64 main
        pass + df64 run-tail, combined with error-free df_adds.  Each
        scatter round has unique rows, so .set + df_add keeps the pair's
        low bits (a plain componentwise .add would round them away)."""
        from ..ops import df64 as _df
        if not self.df64_ready:
            raise ValueError(
                "spmv_df64 needs the operator built with "
                "from_csr(keep_lo=True): without it the matrix would "
                "silently round to f32")
        Nx = _round_up(max(self.ncols, 1), 1024)
        yh, yl = self.main.spmv_df64(xh, xl)
        th, tl = runtail_spmv_df64(self.tvals, self.tvals_lo, self.tbase,
                                   xh, xl, Nx)
        for idx_k, rows_k in self.groups:
            zh = jnp.zeros_like(yh).at[rows_k].set(
                th[idx_k], unique_indices=True)
            zl = jnp.zeros_like(yl).at[rows_k].set(
                tl[idx_k], unique_indices=True)
            yh, yl = _df.df_add(yh, yl, zh, zl)
        return yh, yl

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz_true

    def bytes_per_spmv(self) -> int:
        isz = self.dtype.itemsize
        b = self.main.bytes_per_spmv() + 2 * self.tvals.size * isz
        if self.tvals_lo is not None:
            b += self.tvals_lo.size * isz
        if self.svals is not None:
            b += self.svals.size * isz
        return b
