"""double-f32 ("df64") arithmetic: ~f64 precision from f32 pairs.

The TPU has no native f64 ALUs; XLA emulates f64 with float-float pairs
but its emulation materializes intermediates and cannot be used inside
Pallas (Mosaic has no f64 tiling).  This module implements the classic
error-free transformations (Knuth two-sum, Dekker split/two-prod — no FMA
required) over EXPLICIT (hi, lo) f32 pairs, usable both in jitted XLA
code and inside Pallas kernels, so the framework's f64-parity path can
run at VPU speed.

A df64 value x is represented as (hi, lo) with x = hi + lo, |lo| ≤
ulp(hi)/2.  Relative accuracy ~2^-48 — slightly below true f64 (2^-53)
but far beyond f32, and sufficient for CG on the reference's tolerances
(validated against numpy f64 in tests/test_df64.py).

IMPORTANT: these algorithms rely on exact f32 rounding of each individual
op.  They hold under Mosaic and under XLA as long as the compiler does
not contract a*b±c into FMAs or reassociate; the tests assert the
invariants numerically so any regression is caught.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLIT = 4097.0   # 2^12 + 1 (Dekker split constant for f32); kept a Python
#                   literal so pallas kernels don't capture an array const

# XLA's algebraic simplifier (excess precision is enabled by default)
# folds patterns like b - ((a+b) - a) to 0 and/or evaluates f32 chains in
# f64, destroying error-free transformations.  Every rounded intermediate
# therefore goes through an optimization barrier in XLA-land.  Mosaic
# (Pallas TPU) neither implements the barrier nor reassociates floats, so
# kernel bodies build barrier-free graphs via the ``no_barriers`` context
# (a trace-time switch).
_opaque = jax.lax.optimization_barrier

_BARRIERS = True


class no_barriers:
    """Trace-time context: build df64 ops without optimization barriers
    (REQUIRED inside Pallas kernels, where Mosaic lacks the primitive and
    preserves f32 rounding anyway)."""

    def __enter__(self):
        global _BARRIERS
        self._prev = _BARRIERS
        _BARRIERS = False
        return self

    def __exit__(self, *exc):
        global _BARRIERS
        _BARRIERS = self._prev
        return False


def _f(x):
    """One exactly-rounded f32 operation, opaque to the simplifier."""
    return _opaque(x) if _BARRIERS else x


def two_sum(a, b):
    """s + e = a + b exactly (Knuth; 6 flops, no ordering assumption)."""
    s = _f(a + b)
    bb = _f(s - a)
    e = _f(_f(a - _f(s - bb)) + _f(b - bb))
    return s, e


def fast_two_sum(a, b):
    """s + e = a + b exactly, REQUIRES |a| >= |b| (3 flops)."""
    s = _f(a + b)
    e = _f(b - _f(s - a))
    return s, e


def _split(a):
    """a = hi + lo with hi, lo representable in 12 bits (Dekker)."""
    c = _f(_SPLIT * a)
    hi = _f(c - _f(c - a))
    return hi, _f(a - hi)


def two_prod(a, b):
    """p + e = a * b exactly (Dekker; 17 flops, FMA-free)."""
    p = _f(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    e = _f(_f(_f(_f(_f(ah * bh) - p) + _f(ah * bl)) + _f(al * bh)) + _f(al * bl))
    return p, e


# ---------------------------------------------------------------------------
# df64 = (hi, lo) operations


def df_from_f64(x):
    """Host-side split of a float64 array into an f32 (hi, lo) pair."""
    import numpy as np

    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_to_f64(hi, lo):
    import numpy as np

    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def df_add(xh, xl, yh, yl):
    """(xh,xl) + (yh,yl), double-double addition (Knuth/Dekker, ~20 flops)."""
    sh, se = two_sum(xh, yh)
    te = _f(_f(xl + yl) + se)
    return fast_two_sum(sh, te)


def df_mul(xh, xl, yh, yl):
    """(xh,xl) * (yh,yl) (~25 flops)."""
    ph, pe = two_prod(xh, yh)
    pe = _f(pe + _f(_f(xh * yl) + _f(xl * yh)))
    return fast_two_sum(ph, pe)


def df_mul_f32(xh, xl, a):
    """(xh,xl) * a for plain f32 a."""
    ph, pe = two_prod(xh, a)
    pe = _f(pe + _f(xl * a))
    return fast_two_sum(ph, pe)


def df_neg(xh, xl):
    return -xh, -xl


def df_axpy(ah, al, xh, xl, yh, yl):
    """(yh,yl) + (ah,al)*(xh,xl) — the CG update primitive."""
    ph, pl = df_mul(ah, al, xh, xl)
    return df_add(yh, yl, ph, pl)
