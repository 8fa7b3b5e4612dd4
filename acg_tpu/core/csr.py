"""Host-side symmetric CSR container and format conversions.

The analogue of the reference's ``struct acgsymcsrmatrix``
(acg/symcsrmatrix.h:62-292): a symmetric sparse matrix assembled from
Matrix Market triples, deduplicated, stored as the upper triangle in CSR,
expandable to full storage with an optional diagonal shift (the reference
builds the full-storage owned block in ``acgsymcsrmatrix_dsymv_init``,
symcsrmatrix.c:760-845).

This is setup-path code: plain numpy/scipy on the host.  The TPU operator
formats (DIA/ELL) are derived from here.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from ..errors import InvalidFormatError
from ..io.mtxfile import MtxFile


@dataclasses.dataclass
class SymCSRMatrix:
    """Symmetric sparse matrix, upper triangle stored in CSR (0-based)."""

    N: int
    rowptr: np.ndarray   # (N+1,)
    colidx: np.ndarray   # (nnz_upper,)
    a: np.ndarray        # (nnz_upper,)

    @property
    def nnz_stored(self) -> int:
        return int(self.a.size)

    @property
    def nnz_full(self) -> int:
        """Nonzeros of the full (symmetric) matrix."""
        ndiag = int(np.sum(self.colidx == np.repeat(np.arange(self.N), np.diff(self.rowptr))))
        return 2 * self.nnz_stored - ndiag

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_coo(cls, N: int, rowidx, colidx, a) -> "SymCSRMatrix":
        """Build from COO triples of either triangle; dedupes by summation."""
        rowidx = np.asarray(rowidx, dtype=np.int64)
        colidx = np.asarray(colidx, dtype=np.int64)
        a = np.asarray(a, dtype=np.float64)
        # Map every entry to the upper triangle.
        swap = rowidx > colidx
        r = np.where(swap, colidx, rowidx)
        c = np.where(swap, rowidx, colidx)
        m = sp.coo_matrix((a, (r, c)), shape=(N, N)).tocsr()
        m.sum_duplicates()
        return cls(N=N, rowptr=m.indptr.astype(np.int64),
                   colidx=m.indices.astype(np.int64), a=m.data)

    @classmethod
    def from_mtx(cls, mtx: MtxFile) -> "SymCSRMatrix":
        """From a Matrix Market file (acgsymcsrmatrix_init_real_double analogue).

        A ``general`` file must be numerically symmetric (only the upper
        triangle is kept, as the reference does); a ``symmetric`` file may
        store either triangle.
        """
        if mtx.object != "matrix" or mtx.format != "coordinate":
            raise InvalidFormatError("expected a coordinate-format matrix")
        if mtx.nrows != mtx.ncols:
            raise InvalidFormatError("matrix must be square")
        data = mtx.data if mtx.data is not None else np.ones(mtx.nnz)
        if mtx.symmetry == "general":
            keep = mtx.rowidx <= mtx.colidx
            return cls.from_coo(mtx.nrows, mtx.rowidx[keep], mtx.colidx[keep], data[keep])
        return cls.from_coo(mtx.nrows, mtx.rowidx, mtx.colidx, data)

    # -- conversions ---------------------------------------------------------

    def to_scipy_upper(self) -> sp.csr_matrix:
        return sp.csr_matrix((self.a, self.colidx, self.rowptr), shape=(self.N, self.N))

    def to_scipy_full(self, epsilon: float = 0.0) -> sp.csr_matrix:
        """Full-storage CSR with both triangles and diagonal shift ``epsilon``
        (the reference's +eps diagonal, symcsrmatrix.c:760-845 / --epsilon)."""
        u = self.to_scipy_upper()
        d = sp.diags(u.diagonal())
        full = (u + u.T - d).tocsr()
        if epsilon:
            full = (full + epsilon * sp.eye(self.N)).tocsr()
        full.sort_indices()
        return full

    def to_dia_arrays(self, epsilon: float = 0.0,
                      max_diagonals: int = 512) -> tuple[np.ndarray, np.ndarray] | None:
        """Full-storage DIA arrays (offsets, (K, N) slabs), or None if the
        matrix has more distinct diagonals than ``max_diagonals``.

        dia_vals[k, i] = A[i, i + offsets[k]].
        """
        full = self.to_scipy_full(epsilon).tocoo()
        offs = np.unique(full.col - full.row)
        if offs.size > max_diagonals:
            return None
        K = offs.size
        vals = np.zeros((K, self.N), dtype=np.float64)
        kmap = {int(o): k for k, o in enumerate(offs)}
        k_of = np.array([kmap[int(o)] for o in (full.col - full.row)])
        vals[k_of, full.row] = full.data
        return offs.astype(np.int64), vals

    def to_ell_arrays(self, epsilon: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
        """Full-storage ELL arrays: (colidx (K, N), vals (K, N)), K = max row
        degree; padding slots point at the row itself with value 0."""
        full = self.to_scipy_full(epsilon)
        deg = np.diff(full.indptr)
        K = int(deg.max()) if self.N else 0
        colidx = np.tile(np.arange(self.N, dtype=np.int64), (K, 1))
        vals = np.zeros((K, self.N), dtype=np.float64)
        # slot index of each nonzero within its row
        slot = np.arange(full.nnz) - np.repeat(full.indptr[:-1], deg)
        rows = np.repeat(np.arange(self.N), deg)
        colidx[slot, rows] = full.indices
        vals[slot, rows] = full.data
        return colidx, vals

    def permuted(self, perm: np.ndarray) -> "SymCSRMatrix":
        """Symmetric permutation B = P A Pᵀ with B[i,j] = A[perm[i], perm[j]]
        (used by --reorder to reduce bandwidth for the DIA fast path)."""
        perm = np.asarray(perm, dtype=np.int64)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        coo = self.to_scipy_upper().tocoo()
        return SymCSRMatrix.from_coo(self.N, inv[coo.row], inv[coo.col],
                                     coo.data)

    # -- reference ops (oracles) ---------------------------------------------

    def matvec(self, x: np.ndarray, epsilon: float = 0.0) -> np.ndarray:
        """Host SpMV oracle (acgsymcsrmatrix_dsymv analogue)."""
        return self.to_scipy_full(epsilon) @ np.asarray(x)
