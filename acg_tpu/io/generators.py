"""Poisson model-problem generators.

The reference ships a 12-line scipy generator for the 2-D 5-point Poisson
matrix on an n×n grid (matrices_generator/poisson.py: T = tridiag(-1,4,-1),
A = I⊗T + tridiag(-1,-1)⊗I, written for n=2048) and benchmarks exclusively
on it (scripts/mpi_combined.sh:41).  BASELINE.md additionally specifies 3-D
Poisson 7-point and 27-point configs at 64³/256³/512³.

These generators build the matrices directly in memory — in both COO
(MtxFile, for file parity) and banded/DIA form (the TPU-native operator,
constructed analytically without any sparse assembly, which matters at
512³ = 134M rows).
"""

from __future__ import annotations

import itertools

import numpy as np

from .mtxfile import MtxFile

# ---------------------------------------------------------------------------
# Analytic DIA construction: offsets + (K, N) diagonal slabs.
# dia_vals[k, i] = A[i, i + offset_k] (0 where out of range / off stencil).


def poisson2d_dia(n: int, dtype=np.float64) -> tuple[np.ndarray, np.ndarray]:
    """2-D 5-point Poisson on an n×n grid, natural (row-major) ordering.

    Returns (offsets, dia_vals) with offsets = [-n, -1, 0, 1, n].
    Matches the reference generator exactly: diagonal 4, off-diagonals -1
    (matrices_generator/poisson.py:7-10).
    """
    N = n * n
    offsets = np.array([-n, -1, 0, 1, n], dtype=np.int64)
    vals = np.zeros((5, N), dtype=dtype)
    i = np.arange(N)
    ix = i % n  # x coordinate within a grid row
    vals[0] = np.where(i - n >= 0, -1.0, 0.0)            # south
    vals[1] = np.where(ix - 1 >= 0, -1.0, 0.0)           # west
    vals[2] = 4.0                                        # center
    vals[3] = np.where(ix + 1 < n, -1.0, 0.0)            # east
    vals[4] = np.where(i + n < N, -1.0, 0.0)             # north
    return offsets, vals


def poisson3d_dia(n: int, stencil: int = 7, dtype=np.float64) -> tuple[np.ndarray, np.ndarray]:
    """3-D Poisson on an n³ grid, 7-point or 27-point stencil, natural order.

    7-point: center 6, neighbours -1.  27-point: center 26, all 26
    neighbours -1 (diagonally dominant ⇒ SPD).
    """
    N = n * n * n
    i = np.arange(N)
    iz = i // (n * n)
    iy = (i // n) % n
    ix = i % n
    if stencil == 7:
        # ascending diagonal offsets (sz·n² + sy·n + sx), the invariant
        # dia_to_csr and the pallas kernels rely on
        shifts = [(-1, 0, 0), (0, -1, 0), (0, 0, -1), (0, 0, 0),
                  (0, 0, 1), (0, 1, 0), (1, 0, 0)]
        center = 6.0
    elif stencil == 27:
        shifts = sorted(
            itertools.product((-1, 0, 1), repeat=3),
            key=lambda s: s[0] * n * n + s[1] * n + s[2],
        )
        center = 26.0
    else:
        raise ValueError(f"stencil must be 7 or 27, got {stencil}")
    offsets = np.array([sz * n * n + sy * n + sx for (sz, sy, sx) in shifts], dtype=np.int64)
    vals = np.zeros((len(shifts), N), dtype=dtype)
    for k, (sz, sy, sx) in enumerate(shifts):
        if (sz, sy, sx) == (0, 0, 0):
            vals[k] = center
            continue
        ok = ((ix + sx >= 0) & (ix + sx < n)
              & (iy + sy >= 0) & (iy + sy < n)
              & (iz + sz >= 0) & (iz + sz < n))
        vals[k] = np.where(ok, -1.0, 0.0)
    return offsets, vals


# ---------------------------------------------------------------------------
# COO / MtxFile construction (for file-format parity and unstructured paths).


def dia_to_coo(offsets: np.ndarray, vals: np.ndarray,
               upper_only: bool = False) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Expand a DIA operator to COO triples (rowidx, colidx, a, N)."""
    K, N = vals.shape
    rows, cols, data = [], [], []
    for k in range(K):
        off = int(offsets[k])
        if upper_only and off < 0:
            continue
        lo, hi = max(0, -off), min(N, N - off)
        r = np.arange(lo, hi)
        v = vals[k, lo:hi]
        nz = v != 0
        rows.append(r[nz])
        cols.append(r[nz] + off)
        data.append(v[nz])
    rowidx = np.concatenate(rows)
    colidx = np.concatenate(cols)
    a = np.concatenate(data)
    order = np.lexsort((colidx, rowidx))
    return rowidx[order], colidx[order], a[order], N


def dia_to_csr(offsets: np.ndarray, vals: np.ndarray):
    """Expand a DIA operator directly to a scipy CSR matrix, vectorized.

    Avoids the COO detour (dia_to_coo + coo→csr re-sorts all nnz — minutes
    at the 450M-nnz BASELINE 256³ scale); here entries are emitted already
    in (row, col) order because offsets are ascending: one boolean-mask
    pass over the (N, K) view.  Explicit zeros (boundary-masked slots) are
    dropped.  Peak extra memory ≈ (K·N) int64 + outputs."""
    import scipy.sparse as sp

    K, N = vals.shape
    offsets = np.asarray(offsets, dtype=np.int64)
    assert np.all(np.diff(offsets) > 0), "offsets must be strictly ascending"
    cols = offsets[None, :] + np.arange(N, dtype=np.int64)[:, None]  # (N, K)
    vt = np.ascontiguousarray(vals.T)                                # (N, K)
    valid = (vt != 0) & (cols >= 0) & (cols < N)
    rowlen = valid.sum(axis=1)
    rowptr = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(rowlen, out=rowptr[1:])
    colidx = cols[valid]          # row-major scan ⇒ sorted by (row, col)
    data = vt[valid]
    return sp.csr_matrix((data, colidx, rowptr), shape=(N, N))


def poisson2d_mtx(n: int, symmetric: bool = False) -> MtxFile:
    """2-D Poisson as a Matrix Market file object.

    ``symmetric=False`` writes the full general matrix exactly like the
    reference generator (scipy mmwrite of a general CSR); ``symmetric=True``
    stores the lower triangle with symmetry=symmetric.
    """
    offsets, vals = poisson2d_dia(n)
    if symmetric:
        # upper-triangle entries (off ≥ 0), transposed → lower triangle
        # (the Matrix Market convention for symmetric storage)
        rowidx, colidx, a, N = dia_to_coo(offsets, vals, upper_only=True)
        rowidx, colidx = colidx, rowidx
        order = np.lexsort((colidx, rowidx))
        rowidx, colidx, a = rowidx[order], colidx[order], a[order]
        sym = "symmetric"
    else:
        rowidx, colidx, a, N = dia_to_coo(offsets, vals)
        sym = "general"
    return MtxFile(object="matrix", format="coordinate", field="real",
                   symmetry=sym, nrows=N, ncols=N, nnz=a.size,
                   rowidx=rowidx, colidx=colidx, data=a)


def poisson3d_mtx(n: int, stencil: int = 7, symmetric: bool = False) -> MtxFile:
    offsets, vals = poisson3d_dia(n, stencil)
    if symmetric:
        keep = offsets >= 0
        rowidx, colidx, a, N = dia_to_coo(offsets[keep], vals[keep], upper_only=True)
        rowidx, colidx = colidx, rowidx
        order = np.lexsort((colidx, rowidx))
        rowidx, colidx, a = rowidx[order], colidx[order], a[order]
        sym = "symmetric"
    else:
        rowidx, colidx, a, N = dia_to_coo(offsets, vals)
        sym = "general"
    return MtxFile(object="matrix", format="coordinate", field="real",
                   symmetry=sym, nrows=N, ncols=N, nnz=a.size,
                   rowidx=rowidx, colidx=colidx, data=a)
