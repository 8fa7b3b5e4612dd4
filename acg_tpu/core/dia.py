"""DIA (diagonal) operator — the primary TPU SpMV format.

The reference meets "SpMV at memory roofline with load balance over
irregular rows" with a merge-based CSR kernel (cg-kernels-cuda.cu:312-441).
On TPU, per-element gather is the wrong primitive (measured ~0.1 Gnnz/s via
XLA gather on the target chip); the same goal is met by a different layout:
matrices from PDE discretizations are (after bandwidth-reducing ordering)
collections of a few hundred nonzero diagonals, and

    y = Σ_k  vals[k, :] ⊙ x[offset_k : offset_k + N]

is pure shifted streaming — VPU work at HBM bandwidth, no gather at all.
The slabs are laid out (K, N): the long axis on the 128-lane dimension
(an (N, K) layout tile-pads ~25× on TPU).

Out-of-range slots hold zero values, so shifts can be implemented over a
zero-padded extended vector without masking.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiaOperator:
    """Static-offset diagonal operator.

    ``offsets`` are static Python ints (they become compile-time constants
    in the SpMV); ``vals`` is a (K, Np) device array where Np = N padded to
    a lane multiple; rows ≥ N are zero.
    """

    vals: jnp.ndarray                 # (K, Np)
    offsets: tuple[int, ...]          # static
    N: int                            # logical size (static)
    backend: str = "xla"              # "xla" | "pallas" SpMV implementation

    # -- pytree plumbing (offsets/N/backend are static aux data) --------------
    def tree_flatten(self):
        return (self.vals,), (self.offsets, self.N, self.backend)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(vals=children[0], offsets=aux[0], N=aux[1],
                   backend=aux[2] if len(aux) > 2 else "xla")

    # -------------------------------------------------------------------------

    @property
    def Np(self) -> int:
        return self.vals.shape[1]

    @property
    def halo_width(self) -> int:
        return max(max(abs(o) for o in self.offsets), 1) if self.offsets else 1

    @property
    def nnz(self) -> int:
        """Stored (padded) nonzero slots — the analytic SpMV work measure."""
        return len(self.offsets) * self.N

    @classmethod
    def from_arrays(cls, offsets, vals, dtype=None, pad_to: int = 1024,
                    backend: str = "xla") -> "DiaOperator":
        """From host (offsets, (K, N) slabs); pads N up to a multiple of
        ``pad_to`` with zero columns (the zero-padding invariant makes padded
        rows inert in SpMV and reductions)."""
        offsets = tuple(int(o) for o in np.asarray(offsets))
        vals = np.asarray(vals)
        K, N = vals.shape
        Np = _round_up(max(N, 1), pad_to)
        if dtype is not None:
            vals = vals.astype(dtype)
        if Np != N:
            vals = np.pad(vals, ((0, 0), (0, Np - N)))
        op = cls(vals=jnp.asarray(vals), offsets=offsets, N=N,
                 backend=backend)
        # static property cached while vals is still a host array (the df64
        # solver specializes its kernel on it; checking per solve would cost
        # a full device→host fetch of the operator every call)
        op._vals_exact = bool(
            np.all(vals == vals.astype(np.float32).astype(vals.dtype)))
        return op

    # -- SpMV -----------------------------------------------------------------

    def spmv_ext(self, x_ext: jnp.ndarray, hw: int) -> jnp.ndarray:
        """SpMV against an extended vector x_ext = [pad(hw) | x (Np) | pad(hw)],
        where the pads hold whatever the halo filled in (zeros on a single
        device).  This is the hot loop; all slicing is static.

        backend="xla": shifted slices, which XLA fuses and keeps
        VMEM-resident across loop iterations — fastest when the working set
        approaches VMEM capacity.  backend="pallas": single-pass streaming
        kernel (ops/pallas_dia.py) — wins when vectors are far larger than
        VMEM.  Measured on v5e, Poisson-2D n=2048 f32: XLA 68 µs, Pallas
        187 µs (VMEM-resident regime)."""
        if self.backend == "pallas":
            from ..ops.pallas_dia import dia_spmv_pallas, pick_block
            block = pick_block(self.Np, len(self.offsets), hw,
                               self.vals.dtype.itemsize)
            return dia_spmv_pallas(self.vals, x_ext, self.offsets, hw, block)
        y = None
        for k, off in enumerate(self.offsets):
            xk = jax.lax.slice_in_dim(x_ext, hw + off, hw + off + self.Np)
            term = self.vals[k] * xk
            y = term if y is None else y + term
        return y

    def extend(self, x: jnp.ndarray, hw: int | None = None) -> jnp.ndarray:
        """Zero-pad x (Np,) to the extended layout."""
        hw = self.halo_width if hw is None else hw
        z = jnp.zeros((hw,), dtype=x.dtype)
        return jnp.concatenate([z, x, z])

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x for a single-device operator; x, y are (Np,).

        pallas backend: picks between the windowed kernel (one
        (B+2hw)-wide window DMA per block — x read (1+2hw/B)×) and the
        ring kernel (x streamed exactly once, any width) by estimated
        extra HBM traffic.  Wide stencils (hw ≳ B/8, in particular the
        27-point 3-D matrices where hw ≈ n² ≫ B) take the ring."""
        hw = self.halo_width
        if self.backend == "pallas":
            from ..ops.pallas_dia import (dia_spmv_pallas_np, dia_spmv_ring,
                                          pallas_halo_width, pick_block,
                                          pick_block_ring)
            isz = self.vals.dtype.itemsize
            K = len(self.offsets)
            hw_p = pallas_halo_width(hw)
            block_np = pick_block(self.Np, K, hw_p, isz)
            block_r = pick_block_ring(self.Np, K, hw, isz)
            # extra x bytes beyond the single mandatory read, per SpMV:
            extra_np = 2 * hw_p / block_np + (2 if hw_p > block_np else 0)
            if block_r is not None:
                m = -(-hw // block_r)
                # <= : at equal estimated traffic the ring measured faster
                # (172 vs 192 us on 2-D n=2048 — deeper DMA pipelining)
                if 1.0 / (2 * m + 2) <= extra_np:
                    return dia_spmv_ring(self.vals, x, self.offsets, block_r)
            return dia_spmv_pallas_np(self.vals, x, self.offsets, hw_p,
                                      block_np)
        return self.spmv_ext(self.extend(x, hw), hw)

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz

    def bytes_per_spmv(self) -> int:
        isz = self.vals.dtype.itemsize
        return (self.vals.size + 2 * self.Np) * isz
