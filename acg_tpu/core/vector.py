"""Packed vectors with ghost tails (acg/vector.{h,c} analogue).

The reference's ``struct acgvector`` is a dense vector in either *full*
storage (size = num_rows) or *packed* storage: ``num_nonzeros`` stored
entries with a global index map ``idx[]``, where the final
``num_ghost_nonzeros`` entries are ghosts — present for halo-delivered
reads, but **excluded from every reduction** (vector.h:104-161) so dot
products and norms count each global entry exactly once across ranks.

This container is host-side glue (numpy): the solvers operate on device
arrays directly, with the same exclude-ghosts rule enforced there by the
zero-padding invariant (parallel/dist.py).  It exists for (a) parity with
the reference's vector API surface, (b) the driver's gather/scatter of
RHS/solution vectors, and (c) unit-testable semantics of the packed
ghost-tail layout.

BLAS-1 naming follows the reference: dscal/daxpy/daypx/ddot/dnrm2/dasum/
iamax (vector.h:335-415); usga/usgz/ussc are the sparse-BLAS gather/
scatter ops (vector.h:435-479).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class PackedVector:
    """A full- or packed-storage vector with an optional ghost tail."""

    size: int                      # global length (num_rows analogue)
    data: np.ndarray               # (num_nonzeros,) stored entries
    idx: np.ndarray | None = None  # (num_nonzeros,) global index per entry;
    #                                None = full storage (identity map)
    num_ghost: int = 0             # ghost entries at the END of data

    def __post_init__(self):
        self.data = np.asarray(self.data)
        if self.idx is not None:
            self.idx = np.asarray(self.idx, dtype=np.int64)
            if self.idx.shape != self.data.shape:
                raise ValueError("idx and data must have matching shapes")
        elif self.data.shape[0] != self.size:
            raise ValueError("full-storage vector must have size entries")
        if not 0 <= self.num_ghost <= self.data.shape[0]:
            raise ValueError("invalid ghost count")

    # --- constructors ------------------------------------------------------

    @classmethod
    def full(cls, x: np.ndarray) -> "PackedVector":
        x = np.asarray(x)
        return cls(size=x.shape[0], data=x.copy())

    @classmethod
    def packed(cls, size: int, idx: np.ndarray, data: np.ndarray | None = None,
               num_ghost: int = 0) -> "PackedVector":
        idx = np.asarray(idx, dtype=np.int64)
        if data is None:
            data = np.zeros(idx.shape[0])
        return cls(size=size, data=np.asarray(data).copy(), idx=idx,
                   num_ghost=num_ghost)

    # --- properties ---------------------------------------------------------

    @property
    def num_nonzeros(self) -> int:
        return self.data.shape[0]

    @property
    def owned(self) -> np.ndarray:
        """The non-ghost entries (the reduction domain)."""
        n = self.num_nonzeros - self.num_ghost
        return self.data[:n]

    @property
    def owned_idx(self) -> np.ndarray:
        n = self.num_nonzeros - self.num_ghost
        return self.idx[:n] if self.idx is not None else np.arange(n)

    # --- BLAS-1 (ghosts excluded from reductions, vector.h:335-415) --------

    def dscal(self, a: float) -> "PackedVector":
        self.data *= a
        return self

    def daxpy(self, a: float, x: "PackedVector") -> "PackedVector":
        """self += a*x (conformal layouts required, as in the reference)."""
        self._check_conformal(x)
        self.data += a * x.data
        return self

    def daypx(self, a: float, x: "PackedVector") -> "PackedVector":
        """self = a*self + x."""
        self._check_conformal(x)
        self.data *= a
        self.data += x.data
        return self

    def ddot(self, y: "PackedVector") -> float:
        self._check_conformal(y)
        return float(np.dot(self.owned, y.owned))

    def dnrm2(self) -> float:
        return float(np.linalg.norm(self.owned))

    def dnrm2sqr(self) -> float:
        return float(np.dot(self.owned, self.owned))

    def dasum(self) -> float:
        return float(np.sum(np.abs(self.owned)))

    def iamax(self) -> int:
        """Index (local) of the first entry of maximum absolute value."""
        return int(np.argmax(np.abs(self.owned)))

    def _check_conformal(self, other: "PackedVector") -> None:
        if self.num_nonzeros != other.num_nonzeros \
                or self.num_ghost != other.num_ghost:
            raise ValueError("vectors are not conformally partitioned")

    # --- sparse gather/scatter (vector.h:435-479) ---------------------------

    def usga(self, src: np.ndarray) -> "PackedVector":
        """Gather: data[i] = src[idx[i]] for every stored entry."""
        if self.idx is None:
            self.data[:] = np.asarray(src)[: self.size]
        else:
            self.data[:] = np.asarray(src)[self.idx]
        return self

    def usgz(self, src: np.ndarray) -> "PackedVector":
        """Gather-and-zero: gather, then zero the gathered source entries."""
        src = np.asarray(src)
        self.usga(src)
        src[self.idx if self.idx is not None else slice(0, self.size)] = 0
        return self

    def ussc(self, dst: np.ndarray, include_ghosts: bool = False) -> np.ndarray:
        """Scatter stored entries into a full vector: dst[idx[i]] = data[i].

        Ghost entries are skipped by default so concurrent per-part scatters
        write each global entry exactly once (the owner writes it).
        """
        if self.idx is None:
            dst[: self.size] = self.data
            return dst
        if include_ghosts:
            dst[self.idx] = self.data
        else:
            dst[self.owned_idx] = self.owned
        return dst

    def to_full(self) -> np.ndarray:
        out = np.zeros(self.size, dtype=self.data.dtype)
        return self.ussc(out)
