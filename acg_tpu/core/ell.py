"""ELL operator — general-sparsity fallback format.

For matrices whose sparsity does not collapse to a manageable set of
diagonals, rows are padded to the maximum degree K and stored as (K, N)
column-index/value slabs; SpMV gathers x[colidx[k]] per slab.

On the current TPU, XLA lowers gather poorly (measured ~0.1 Gnnz/s), so
this path is a correctness fallback; the DIA path (core/dia.py) is the
performance path, reached via bandwidth-reducing (RCM) reordering when
possible.  A Pallas gather kernel over VMEM-blocked columns is the planned
optimization for truly unstructured matrices.
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
class EllOperator:
    colidx: jnp.ndarray   # (K, Np) int32 — padding slots point at own row
    vals: jnp.ndarray     # (K, Np) — padding slots are zero
    N: int

    def tree_flatten(self):
        return (self.colidx, self.vals), (self.N,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(colidx=children[0], vals=children[1], N=aux[0])

    @property
    def Np(self) -> int:
        return self.vals.shape[1]

    @property
    def nnz(self) -> int:
        return self.vals.shape[0] * self.N

    @classmethod
    def from_arrays(cls, colidx, vals, dtype=None, pad_to: int = 1024) -> "EllOperator":
        colidx = np.asarray(colidx)
        vals = np.asarray(vals)
        K, N = vals.shape
        Np = _round_up(max(N, 1), pad_to)
        if dtype is not None:
            vals = vals.astype(dtype)
        if Np != N:
            vals = np.pad(vals, ((0, 0), (0, Np - N)))
            pad_cols = np.tile(np.arange(N, Np, dtype=colidx.dtype), (K, 1))
            colidx = np.concatenate([colidx, pad_cols], axis=1)
        return cls(colidx=jnp.asarray(colidx, dtype=jnp.int32),
                   vals=jnp.asarray(vals), N=N)

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x; x is (Np,) with zero padding beyond N."""
        return jnp.sum(self.vals * x[self.colidx], axis=0)

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz

    def bytes_per_spmv(self) -> int:
        isz = self.vals.dtype.itemsize
        return (self.vals.size * (isz + 4) + 2 * self.Np * isz)
