"""BLAS-1 helpers with explicit accumulation dtype.

The analogue of the reference's vector kernels (acg/vector.h:335-415 and the
fused CUDA kernels cg-kernels-cuda.cu:119-303).  On TPU there is nothing to
hand-fuse — XLA fuses elementwise chains into single passes — but the dot
products need care: the fast path stores vectors in f32 while CG's recurrences
want f64 dot accumulation, so ``dot``/``nrm2sqr`` upcast per-element before
reducing (the TPU cost is one VPU convert on the way into the reduce).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray, dot_dtype=jnp.float64) -> jnp.ndarray:
    """Σ aᵢ bᵢ accumulated in ``dot_dtype`` (acgvector_ddot analogue)."""
    return jnp.sum(a.astype(dot_dtype) * b.astype(dot_dtype))


def nrm2sqr(a: jnp.ndarray, dot_dtype=jnp.float64) -> jnp.ndarray:
    """Σ aᵢ² in ``dot_dtype`` (acgvector_dnrm2sqr analogue)."""
    a64 = a.astype(dot_dtype)
    return jnp.sum(a64 * a64)


def dot2(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray,
         dot_dtype=jnp.float64) -> jnp.ndarray:
    """Stacked pair of dots (Σ aᵢbᵢ, Σ cᵢdᵢ) returned as a (2,) vector so a
    distributed caller can reduce both with ONE collective — the analogue of
    pipelined CG's single 2-element allreduce (cgcuda.c:1713-1735)."""
    g = jnp.sum(a.astype(dot_dtype) * b.astype(dot_dtype))
    d_ = jnp.sum(c.astype(dot_dtype) * d.astype(dot_dtype))
    return jnp.stack([g, d_])
