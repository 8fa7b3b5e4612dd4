"""Heavy-row split operator: SELL main block + dense run-tail.

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

Split instead by ROW, with a format per regime:

  * rows whose (row-nnz, column span) mark them heavy-but-LOCAL move to
    a dense run-tail (ops/pallas_runtail.py): per-row WSUB*1024-element
    value windows, x windows DMA'd at dynamic aligned offsets — zero
    slot padding, pure streaming;
  * everything else stays in the normal SELL main block, whose layout
    recovers its mesh-only fill.

y = main.spmv(x) + scatter_add(rows, runtail(x)).  Zero-padding
invariant: padded tail rows carry zero values and base 0, so no masks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_runtail import R, WSUB, runtail_spmv
from .sell import SellOperator, _round_up

SPAN_LIMIT = (WSUB - 1) * 1024   # worst-case in-window span (off < 1024)


def heavy_rows(A, threshold: int | None = None) -> np.ndarray:
    """Row ids that qualify for the run-tail: nnz ≥ threshold (default
    8× the mean row nnz, min 256) AND column span small enough that the
    row fits one WSUB-subrow window at any 1024-alignment."""
    A = A.tocsr()
    if not A.has_sorted_indices:   # public helper: don't trust the caller
        A = A.copy()
        A.sort_indices()
    counts = np.diff(A.indptr)
    if threshold is None:
        threshold = max(256, int(8 * counts.mean()) if len(counts) else 0)
    cand = np.nonzero(counts >= threshold)[0]
    keep = []
    for r in cand:
        cols = A.indices[A.indptr[r]:A.indptr[r + 1]]
        if cols[-1] - cols[0] < SPAN_LIMIT:   # sorted indices
            keep.append(r)
    return np.asarray(keep, dtype=np.int64)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HeavySplitOperator:
    """SELL main block (heavy rows removed) + dense run-tail."""

    main: SellOperator
    tvals: jnp.ndarray       # (nsteps, R, WSUB, 8, 128) f32
    tbase: jnp.ndarray       # (nsteps*R,) int32, units of 1024 elements
    trows: jnp.ndarray       # (nsteps*R,) int32 global rows (pad → N)
    N: int
    ncols: int
    nnz_true: int

    def tree_flatten(self):
        return (self.main, self.tvals, self.tbase, self.trows), \
            (self.N, self.ncols, self.nnz_true)

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
    def ntail(self) -> int:
        return int(self.trows.shape[0])

    @property
    def nnz(self) -> int:
        return self.main.nnz + self.tvals.size

    @property
    def S(self) -> int:
        """Average stored slots per row (rounded up)."""
        return -(-self.nnz // self.Np)

    @property
    def fill(self) -> float:
        return self.nnz_true / max(self.nnz, 1)

    @classmethod
    def from_csr(cls, A, dtype=np.float32, threshold: int | None = None,
                 max_stored_bytes: int = 13 * 1024**3):
        """Split a scipy CSR matrix by row regime and build both parts.

        Raises ValueError when no row qualifies — callers should use the
        plain builder then (the split only pays when heavy-local rows
        exist; uniform meshes measured NEGATIVE for splitting,
        BENCHMARKS.md cap-and-tail)."""
        if np.dtype(dtype) != np.float32:
            raise NotImplementedError(
                "HeavySplitOperator is f32-only (run-tail kernel)")
        import scipy.sparse as sp
        A = A.tocsr()
        if not A.has_sorted_indices:
            A = A.copy()
            A.sort_indices()
        N, ncols = A.shape
        rows = heavy_rows(A, threshold)
        if len(rows) == 0:
            raise ValueError("no heavy-local rows; use sell_from_csr")

        ntail = len(rows)
        nsteps = -(-ntail // R)
        W = WSUB * 1024
        tvals = np.zeros((nsteps * R, W), np.float32)
        tbase = np.zeros((nsteps * R,), np.int32)
        trows = np.full((nsteps * R,), N, np.int32)   # pad rows → slot N
        for i, r in enumerate(rows):
            lo, hi = A.indptr[r], A.indptr[r + 1]
            cols = A.indices[lo:hi]
            start = int(cols[0])
            base = start // 1024
            off = cols - base * 1024
            tvals[i, off] = A.data[lo:hi]
            tbase[i] = base
            trows[i] = r

        # main block: same row/column space, heavy rows emptied
        keep = np.ones(N, bool)
        keep[rows] = False
        counts = np.where(keep, np.diff(A.indptr), 0)
        indptr = np.zeros(N + 1, A.indptr.dtype)
        np.cumsum(counts, out=indptr[1:])
        mask = np.repeat(keep, np.diff(A.indptr))
        Am = sp.csr_matrix((A.data[mask], A.indices[mask], indptr),
                           shape=A.shape)
        main = SellOperator.from_csr(Am, dtype=dtype,
                                     max_stored_bytes=max_stored_bytes)
        return cls(main=main,
                   tvals=jnp.asarray(
                       tvals.reshape(nsteps, R, WSUB, 8, 128)),
                   tbase=jnp.asarray(tbase),
                   trows=jnp.asarray(trows),
                   N=N, ncols=ncols, nnz_true=int(A.nnz))

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        Nx = _round_up(max(self.ncols, 1), 1024)
        y = self.main.spmv(x)
        yt = runtail_spmv(self.tvals, self.tbase, x, Nx)
        # Pad slots all map to row N and are therefore NOT unique, so no
        # unique_indices promise (UB otherwise); their values are forced
        # to zero — a NaN/Inf anywhere in a pad slot's x window must not
        # leak into y's padded region (dots/norms are unmasked).
        yt = jnp.where(self.trows < self.N, yt, 0.0)
        if self.N < self.Np:
            return y.at[self.trows].add(yt)
        return jnp.concatenate([y, jnp.zeros((1,), y.dtype)]) \
            .at[self.trows].add(yt)[:-1]

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz_true

    def bytes_per_spmv(self) -> int:
        isz = self.dtype.itemsize
        return self.main.bytes_per_spmv() + 2 * self.tvals.size * isz
