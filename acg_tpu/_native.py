"""ctypes bindings for the native C++ helpers (native/acg_native.cpp).

Every function has a pure-Python fallback; ``available()`` gates use.
Build with ``make -C native``.  The library provides:
  * acg_parse_coord  — parallel Matrix Market triple parser
  * acg_partition_graph — recursive-bisection partitioner w/ refinement
  * acg_rcm_order — reverse Cuthill-McKee bandwidth reduction
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "native", "libacg_native.so"),
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "libacg_native.so"),
]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.acg_parse_coord.restype = ctypes.c_int
            lib.acg_parse_coord.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double)]
            lib.acg_partition_graph.restype = ctypes.c_int
            lib.acg_partition_graph.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int64)]
            if hasattr(lib, "acg_partition_graph_ml"):
                lib.acg_partition_graph_ml.restype = ctypes.c_int
                lib.acg_partition_graph_ml.argtypes = \
                    lib.acg_partition_graph.argtypes
            lib.acg_rcm_order.restype = ctypes.c_int
            lib.acg_rcm_order.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
            if hasattr(lib, "acg_radix_sort_i64"):
                lib.acg_radix_sort_i64.restype = ctypes.c_int
                lib.acg_radix_sort_i64.argtypes = [
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64)]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def parse_coord(buf: bytes, nnz: int, has_values: bool):
    """Parse nnz 'row col [val]' lines; returns (rowidx, colidx, vals|None),
    0-based.  Raises ValueError on malformed input."""
    lib = _load()
    assert lib is not None
    rowidx = np.empty(nnz, dtype=np.int64)
    colidx = np.empty(nnz, dtype=np.int64)
    vals = np.empty(nnz, dtype=np.float64) if has_values else None
    err = lib.acg_parse_coord(
        buf, len(buf), nnz, 1 if has_values else 0,
        rowidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        colidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if has_values
        else ctypes.POINTER(ctypes.c_double)(),
    )
    if err != 0:
        raise ValueError(f"native mtx parse failed with code {err}")
    return rowidx, colidx, vals


def partition_graph(rowptr: np.ndarray, colidx: np.ndarray, nparts: int,
                    seed: int = 0, multilevel: bool = True) -> np.ndarray:
    """Native k-way edge-cut partition.  ``multilevel=True`` (default)
    uses the METIS-style pipeline (HEM coarsening + weighted coarse
    bisection + per-level FM-style refinement); False uses the flat
    single-level recursive bisection."""
    lib = _load()
    assert lib is not None
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    n = rowptr.shape[0] - 1
    part = np.empty(n, dtype=np.int64)
    fn = (lib.acg_partition_graph_ml
          if multilevel and hasattr(lib, "acg_partition_graph_ml")
          else lib.acg_partition_graph)
    err = fn(
        rowptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        colidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, nparts, seed,
        part.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if err != 0:
        raise ValueError(f"native partitioner failed with code {err}")
    return part


def radix_sort_idx(keys: np.ndarray) -> np.ndarray | None:
    """Stable sorting permutation of int64 keys; None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "acg_radix_sort_i64"):
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    perm = np.empty(keys.shape[0], dtype=np.int64)
    err = lib.acg_radix_sort_i64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        keys.shape[0],
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if err != 0:
        return None
    return perm


def rcm_order(rowptr: np.ndarray, colidx: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    n = rowptr.shape[0] - 1
    perm = np.empty(n, dtype=np.int64)
    err = lib.acg_rcm_order(
        rowptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        colidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if err != 0:
        raise ValueError(f"native RCM failed with code {err}")
    return perm
