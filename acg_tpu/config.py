"""Global configuration for acg_tpu.

Plays the role of the reference's compile-time config (config.h:59-94):
the index width ``ACG_IDX_SIZE`` becomes a runtime numpy dtype choice, and
the value/accumulation dtypes are explicit instead of hard-coded f64.

f64 on TPU is emulated by XLA; it works but costs ~2x on streaming ops.
The framework therefore supports:
  * value dtype  — storage/compute dtype of matrix and vectors (default f64)
  * dot dtype    — accumulation dtype for dot products / norms (default f64)
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

# Enable 64-bit types in JAX once, on first import of the package.  The
# reference is a double-precision code (all solvers are f64,
# e.g. acg/cg.c, acg/cgcuda.c); without x64 JAX silently downcasts.
_X64_ENABLED = False


def ensure_x64() -> None:
    global _X64_ENABLED
    if _X64_ENABLED:
        return
    if os.environ.get("ACG_TPU_X64", "1") not in ("0", "false", "False"):
        import jax

        jax.config.update("jax_enable_x64", True)
    _X64_ENABLED = True
    _maybe_enable_compile_cache()


def _maybe_enable_compile_cache() -> None:
    """Opt-in persistent XLA compilation cache (``ACG_COMPILE_CACHE=dir``).

    TPU compiles of the big solve programs take minutes; the reference
    pays its analogous cost (cuSPARSE analysis + kernel JIT) per run
    with no cache.  With a cache dir set, repeat CLI invocations on the
    same (matrix shape, solver config) skip straight to execution —
    jax persists compiled executables keyed by HLO + compile options.
    Off by default: a shared/stale dir can mask compiler-flag changes
    when debugging, so enabling is an explicit deployment choice."""
    cache = os.environ.get("ACG_COMPILE_CACHE")
    if not cache:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    # cache every program regardless of compile time (default threshold
    # skips sub-second compiles — harmless either way, but the CLI's
    # small setup programs recompile surprisingly often through the CLI)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# Index dtype: the ACG_IDX_SIZE=32/64 analogue (config.h:59-94).
IDX_SIZES = {32: np.int32, 64: np.int64}
DEFAULT_IDX_SIZE = 64


def idx_dtype(idx_size: int = DEFAULT_IDX_SIZE):
    try:
        return IDX_SIZES[idx_size]
    except KeyError:
        raise ValueError(f"invalid idx size {idx_size}; expected 32 or 64")


@dataclasses.dataclass(frozen=True)
class Precision:
    """Value/accumulation precision policy for a solve."""

    dtype: str = "float64"       # matrix/vector storage & compute
    dot_dtype: str = "float64"   # dot-product / norm accumulation

    @property
    def np_dtype(self):
        return np.dtype(self.dtype)

    @property
    def np_dot_dtype(self):
        return np.dtype(self.dot_dtype)


F64 = Precision("float64", "float64")
F32_F64 = Precision("float32", "float64")   # fast path: f32 storage, f64 dots
F32 = Precision("float32", "float32")
