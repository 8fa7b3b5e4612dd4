"""In-place-style prefix sums (acg/prefixsum.{h,c} analogue).

The reference provides OpenMP-parallel inclusive/exclusive scans used to
build CSR row pointers during assembly (symcsrmatrix.c:785).  numpy's
``cumsum`` is the vectorized equivalent; both variants are exposed with the
reference's semantics (exclusive scan of x is [0, x0, x0+x1, ...]).
"""

from __future__ import annotations

import numpy as np


def inclusive_prefixsum(x: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """out[i] = x[0] + ... + x[i] (acgprefixsum_inplace_* inclusive mode)."""
    x = np.asarray(x)
    if out is None:
        out = np.empty_like(x)
    np.cumsum(x, out=out)
    return out


def exclusive_prefixsum(x: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """out[i] = x[0] + ... + x[i-1], out[0] = 0 (exclusive mode).

    When ``out`` has one more element than ``x`` the final total is stored
    in out[-1] — the CSR-rowptr construction pattern.
    """
    x = np.asarray(x)
    n = x.shape[0]
    if out is None:
        out = np.empty_like(x)
    if out.shape[0] == n + 1:
        out[0] = 0
        np.cumsum(x, out=out[1:])
        return out
    if n:
        out[0] = 0
        np.cumsum(x[:-1], out=out[1:])
    return out
