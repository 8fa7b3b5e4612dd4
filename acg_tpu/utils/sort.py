"""Integer (pair) sorting with permutation output (acg/sort.{h,c} analogue).

The reference implements LSD radix sort for 32/64-bit keys and key pairs
with an optional sorting-permutation output, used to find interface edges
between subgraphs (graph.c:641-643, 773-787).  Here the native C++ radix
sort (native/acg_native.cpp) is used when built; numpy's stable sorts are
the always-available fallback.  Both are stable, matching the reference's
guarantee (required for deterministic neighbour lists).
"""

from __future__ import annotations

import numpy as np

from .. import _native


def radix_sort(keys: np.ndarray, return_perm: bool = True):
    """Stable sort of integer keys (acgradixsort_* analogue).

    Returns (sorted_keys, perm) with keys_sorted = keys[perm], or just
    sorted_keys when ``return_perm`` is False.
    """
    keys = np.asarray(keys)
    if _native.available() and keys.dtype == np.int64 \
            and keys.flags.c_contiguous and keys.size > 1:
        perm = _native.radix_sort_idx(keys)
        if perm is not None:
            skeys = keys[perm]
            return (skeys, perm) if return_perm else skeys
    perm = np.argsort(keys, kind="stable")
    skeys = keys[perm]
    return (skeys, perm) if return_perm else skeys


def radix_sort_pair(keys1: np.ndarray, keys2: np.ndarray,
                    return_perm: bool = True):
    """Stable lexicographic sort of key pairs, keys1 major
    (acgradixsortpair_* analogue).

    Returns (sorted_keys1, sorted_keys2, perm) or the sorted pair.
    """
    keys1 = np.asarray(keys1)
    keys2 = np.asarray(keys2)
    perm = np.lexsort((keys2, keys1))
    if return_perm:
        return keys1[perm], keys2[perm], perm
    return keys1[perm], keys2[perm]
