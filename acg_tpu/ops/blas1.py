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

# Block length of the "mixed" accumulation mode: native-dtype sums within
# blocks (VPU speed), float64 across block partials.  Worst-case relative
# error grows like MIXED_BLOCK * eps(f32) per block — ~1e-4 at 1024 — far
# below what CG's scalar recurrences need for the reference tolerances,
# while avoiding the emulated-f64 reduction on TPU (no native f64 ALUs).
MIXED_BLOCK = 1024


def _reduce(prod: jnp.ndarray, dot_dtype) -> jnp.ndarray:
    if dot_dtype == "mixed":
        n = prod.shape[0]
        if n % MIXED_BLOCK:
            return jnp.sum(prod.astype(jnp.float64))
        parts = jnp.sum(prod.reshape(n // MIXED_BLOCK, MIXED_BLOCK), axis=1)
        return jnp.sum(parts.astype(jnp.float64))
    return jnp.sum(prod.astype(dot_dtype))


def dot(a: jnp.ndarray, b: jnp.ndarray, dot_dtype=jnp.float64) -> jnp.ndarray:
    """Σ aᵢ bᵢ accumulated in ``dot_dtype`` (acgvector_ddot analogue).

    ``dot_dtype="mixed"``: products and intra-block sums in the storage
    dtype, float64 across blocks.
    """
    if dot_dtype == "mixed":
        return _reduce(a * b, dot_dtype)
    return jnp.sum(a.astype(dot_dtype) * b.astype(dot_dtype))


def nrm2sqr(a: jnp.ndarray, dot_dtype=jnp.float64) -> jnp.ndarray:
    """Σ aᵢ² in ``dot_dtype`` (acgvector_dnrm2sqr analogue)."""
    if dot_dtype == "mixed":
        return _reduce(a * a, dot_dtype)
    a64 = a.astype(dot_dtype)
    return jnp.sum(a64 * a64)


def dot2(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray,
         dot_dtype=jnp.float64) -> jnp.ndarray:
    """Stacked pair of dots (Σ aᵢbᵢ, Σ cᵢdᵢ) returned as a (2,) vector so a
    distributed caller can reduce both with ONE collective — the analogue of
    pipelined CG's single 2-element allreduce (cgcuda.c:1713-1735)."""
    if dot_dtype == "mixed":
        return jnp.stack([_reduce(a * b, dot_dtype),
                          _reduce(c * d, dot_dtype)])
    g = jnp.sum(a.astype(dot_dtype) * b.astype(dot_dtype))
    d_ = jnp.sum(c.astype(dot_dtype) * d.astype(dot_dtype))
    return jnp.stack([g, d_])
