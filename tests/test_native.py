"""Native C++ helper tests (skipped when native/libacg_native.so is absent)."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu import _native
from acg_tpu.io.generators import poisson2d_mtx
from acg_tpu.partition.partitioner import edge_cut, partition_bfs_recursive

pytestmark = pytest.mark.skipif(not _native.available(),
                                reason="native library not built")


def test_parse_coord_matches_python():
    m = poisson2d_mtx(16)
    lines = []
    for r, c, v in zip(m.rowidx, m.colidx, m.data):
        lines.append(f"{r+1} {c+1} {v:.17g}")
    buf = ("\n".join(lines) + "\n").encode()
    rowidx, colidx, vals = _native.parse_coord(buf, m.nnz, True)
    np.testing.assert_array_equal(rowidx, m.rowidx)
    np.testing.assert_array_equal(colidx, m.colidx)
    np.testing.assert_allclose(vals, m.data, rtol=0)


def test_parse_coord_handles_comments_and_blanks():
    buf = b"1 1 2.0\n% comment\n\n2 2 -3.5e1\n"
    rowidx, colidx, vals = _native.parse_coord(buf, 2, True)
    np.testing.assert_array_equal(rowidx, [0, 1])
    np.testing.assert_allclose(vals, [2.0, -35.0])


def test_parse_coord_truncated_fails():
    with pytest.raises(ValueError):
        _native.parse_coord(b"1 1 2.0\n", 5, True)


def test_native_read_mtx_path(tmp_path):
    """read_mtx must produce identical results via the native parser."""
    from acg_tpu.io import read_mtx, write_mtx
    m = poisson2d_mtx(12)
    p = tmp_path / "a.mtx"
    write_mtx(p, m)
    m2 = read_mtx(p)
    np.testing.assert_array_equal(m2.rowidx, m.rowidx)
    np.testing.assert_allclose(m2.data, m.data)


def test_native_partition_quality():
    m = poisson2d_mtx(24)
    A = sp.coo_matrix((m.data, (m.rowidx, m.colidx)),
                      shape=(m.nrows, m.ncols)).tocsr()
    part = _native.partition_graph(A.indptr, A.indices, 4, seed=1)
    sizes = np.bincount(part, minlength=4)
    assert sizes.min() > 0
    assert sizes.max() <= 1.1 * sizes.mean()
    cut_native = edge_cut(A.indptr, A.indices.astype(np.int64), part)
    # sanity: no worse than 3x the python BFS partitioner
    part_py = partition_bfs_recursive(A.indptr, A.indices, 4, seed=1)
    cut_py = edge_cut(A.indptr, A.indices.astype(np.int64), part_py)
    assert cut_native <= 3 * max(cut_py, 1)


def test_rcm_reduces_bandwidth():
    rng = np.random.default_rng(3)
    # random sparse SPD-ish structure with scattered bandwidth
    n = 200
    A = sp.random(n, n, density=0.02, random_state=np.random.RandomState(3))
    A = ((A + A.T) > 0).astype(np.float64) + sp.eye(n)
    A = A.tocsr()
    perm = _native.rcm_order(A.indptr, A.indices)
    assert sorted(perm.tolist()) == list(range(n))
    coo = A.tocoo()
    bw0 = int(np.abs(coo.row - coo.col).max())
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    bw1 = int(np.abs(inv[coo.row] - inv[coo.col]).max())
    assert bw1 < bw0
