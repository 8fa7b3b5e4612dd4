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
            if hasattr(lib, "acg_cluster_order"):
                lib.acg_cluster_order.restype = ctypes.c_int
                lib.acg_cluster_order.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64)]
            if hasattr(lib, "acg_radix_sort_i64"):
                lib.acg_radix_sort_i64.restype = ctypes.c_int
                lib.acg_radix_sort_i64.argtypes = [
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64)]
            if hasattr(lib, "acg_sell_scan"):
                i64p_ = ctypes.POINTER(ctypes.c_int64)
                i32p_ = ctypes.POINTER(ctypes.c_int32)
                lib.acg_sell_scan.restype = ctypes.c_int
                lib.acg_sell_scan.argtypes = [
                    i64p_, i32p_, ctypes.c_int64, ctypes.c_int64,
                    i64p_, i32p_, i32p_, i64p_]
                lib.acg_sell_entries.restype = ctypes.c_int
                lib.acg_sell_entries.argtypes = [
                    i64p_, i32p_, ctypes.c_int64, ctypes.c_int64, i64p_,
                    i64p_, i32p_]
            if hasattr(lib, "acg_ell_scan"):
                i64p = ctypes.POINTER(ctypes.c_int64)
                i32p = ctypes.POINTER(ctypes.c_int32)
                f64p = ctypes.POINTER(ctypes.c_double)
                lib.acg_ell_scan.restype = ctypes.c_int
                lib.acg_ell_scan.argtypes = [
                    i64p, i32p, i32p, ctypes.c_int64,
                    i32p, i32p, i64p, i64p]
                lib.acg_ell_fill.restype = ctypes.c_int
                lib.acg_ell_fill.argtypes = [
                    i64p, i32p, f64p, i32p, i32p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                    i32p, f64p, i32p, f64p]
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


def has_cluster_order() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "acg_cluster_order")


def cluster_order(rowptr: np.ndarray, colidx: np.ndarray,
                  ball: int = 128) -> np.ndarray:
    """Greedy BFS-ball clustering permutation (see acg_cluster_order)."""
    lib = _load()
    assert lib is not None and hasattr(lib, "acg_cluster_order")
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    n = rowptr.shape[0] - 1
    perm = np.empty(n, dtype=np.int64)
    err = lib.acg_cluster_order(
        rowptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        colidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, ball, perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if err != 0:
        raise ValueError(f"native cluster order failed with code {err}")
    return perm


def has_ell_split() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "acg_ell_scan")


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def ell_scan(rowptr: np.ndarray, colidx: np.ndarray, part: np.ndarray):
    """Per-row owned/ghost counts and the (part*N + col) key of every
    off-part entry, in one streaming pass (symcsrmatrix.c:685-845 scan).
    Returns (cnt_own (N,) i32, cnt_gst (N,) i32, pc_keys (total_gst,) i64).
    """
    lib = _load()
    assert lib is not None and hasattr(lib, "acg_ell_scan")
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    part = np.ascontiguousarray(part, dtype=np.int32)
    n = rowptr.shape[0] - 1
    nnz = int(rowptr[-1])
    cnt_own = np.empty(n, dtype=np.int32)
    cnt_gst = np.empty(n, dtype=np.int32)
    pc_keys = np.empty(nnz, dtype=np.int64)
    total = ctypes.c_int64(0)
    err = lib.acg_ell_scan(
        _ptr(rowptr, ctypes.c_int64), _ptr(colidx, ctypes.c_int32),
        _ptr(part, ctypes.c_int32), n,
        _ptr(cnt_own, ctypes.c_int32), _ptr(cnt_gst, ctypes.c_int32),
        _ptr(pc_keys, ctypes.c_int64), ctypes.byref(total))
    if err != 0:
        raise ValueError(f"native ell_scan failed with code {err}")
    return cnt_own, cnt_gst, pc_keys[:total.value].copy()


def ell_fill(rowptr, colidx, data, part, g2l,
             K_own: int, K_gst: int, L: int,
             ghost_global: np.ndarray, n_ghost: np.ndarray,
             own_colidx: np.ndarray, own_vals: np.ndarray,
             ghost_colidx: np.ndarray, ghost_vals: np.ndarray) -> None:
    """Scatter every CSR entry into the stacked (P, K, L) ELL slabs in one
    streaming pass; ghost columns resolve to slots by per-part binary
    search over a global-sorted view of ghost_global."""
    lib = _load()
    assert lib is not None and hasattr(lib, "acg_ell_fill")
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float64)
    part = np.ascontiguousarray(part, dtype=np.int32)
    g2l = np.ascontiguousarray(g2l, dtype=np.int32)
    n = rowptr.shape[0] - 1
    G = ghost_global.shape[1]
    slot_of = np.argsort(ghost_global, axis=1)           # (P, G)
    sorted_g = np.take_along_axis(ghost_global, slot_of, axis=1)
    sorted_g = np.ascontiguousarray(sorted_g, dtype=np.int64)
    slot_of = np.ascontiguousarray(slot_of, dtype=np.int64)
    n_ghost = np.ascontiguousarray(n_ghost, dtype=np.int64)
    err = lib.acg_ell_fill(
        _ptr(rowptr, ctypes.c_int64), _ptr(colidx, ctypes.c_int32),
        _ptr(data, ctypes.c_double), _ptr(part, ctypes.c_int32),
        _ptr(g2l, ctypes.c_int32), n,
        K_own, K_gst, L,
        _ptr(sorted_g, ctypes.c_int64), _ptr(slot_of, ctypes.c_int64),
        _ptr(n_ghost, ctypes.c_int64), G, ghost_global.shape[0],
        _ptr(own_colidx, ctypes.c_int32), _ptr(own_vals, ctypes.c_double),
        _ptr(ghost_colidx, ctypes.c_int32), _ptr(ghost_vals, ctypes.c_double))
    if err != 0:
        raise ValueError(f"native ell_fill failed with code {err} "
                         "(ghost plan inconsistency)")


def has_sell() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "acg_sell_scan")


def sell_scan(rowptr: np.ndarray, colidx: np.ndarray, ncols: int):
    """Distinct (tile, chunk) pairs in row-scan order with per-pair max
    run length K (the SELL layout's pass 1).  ``ncols`` sizes the chunk
    map — blocks may be rectangular (interface blocks are L x G).
    Returns (tc_tile i64, tc_chunk i32, tc_k i32)."""
    lib = _load()
    assert lib is not None and hasattr(lib, "acg_sell_scan")
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    n = rowptr.shape[0] - 1
    nnz = int(rowptr[-1])
    tc_tile = np.empty(nnz, dtype=np.int64)
    tc_chunk = np.empty(nnz, dtype=np.int32)
    tc_k = np.empty(nnz, dtype=np.int32)
    n_tc = ctypes.c_int64(0)
    err = lib.acg_sell_scan(
        _ptr(rowptr, ctypes.c_int64), _ptr(colidx, ctypes.c_int32), n,
        int(ncols),
        _ptr(tc_tile, ctypes.c_int64), _ptr(tc_chunk, ctypes.c_int32),
        _ptr(tc_k, ctypes.c_int32), ctypes.byref(n_tc))
    if err != 0:
        raise ValueError(f"native sell_scan failed with code {err}")
    m = n_tc.value
    return tc_tile[:m].copy(), tc_chunk[:m].copy(), tc_k[:m].copy()


def sell_entries(rowptr, colidx, ncols: int, tile_base: np.ndarray,
                 group_base: np.ndarray) -> np.ndarray:
    """Per-entry slab row index fr = (tile_base[t] + g)·8 + sub-slot
    (slabs viewed as flat (·, 128) rows; tile_base places sorted tiles
    contiguously with per-bucket strides); group_base is per
    (tile, chunk) pair in sell_scan order; ``ncols`` sizes the chunk
    map (rectangular blocks)."""
    lib = _load()
    assert lib is not None and hasattr(lib, "acg_sell_entries")
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    tile_base = np.ascontiguousarray(tile_base, dtype=np.int64)
    group_base = np.ascontiguousarray(group_base, dtype=np.int64)
    n = rowptr.shape[0] - 1
    fr = np.empty(int(rowptr[-1]), dtype=np.int32)
    err = lib.acg_sell_entries(
        _ptr(rowptr, ctypes.c_int64), _ptr(colidx, ctypes.c_int32),
        n, int(ncols), _ptr(tile_base, ctypes.c_int64),
        _ptr(group_base, ctypes.c_int64), _ptr(fr, ctypes.c_int32))
    if err != 0:
        raise ValueError(f"native sell_entries failed with code {err}")
    return fr
