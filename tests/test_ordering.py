"""Ordering tests: RCM bandwidth reduction, nested dissection validity,
and the --reorder CLI path recovering a DIA-able matrix from a shuffled one."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.core.csr import SymCSRMatrix
from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
from acg_tpu.partition.ordering import (bandwidth, nd_order, permute_csr,
                                        rcm_order)


def shuffled_poisson(n, rng):
    """2-D Poisson with rows/cols randomly permuted (bandwidth ~ N)."""
    offsets, vals = poisson2d_dia(n)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    p = rng.permutation(N)
    return permute_csr(A, p), A


def test_rcm_reduces_bandwidth(rng):
    Ashuf, Aorig = shuffled_poisson(12, rng)
    bw_shuf = bandwidth(Ashuf.indptr, Ashuf.indices)
    perm = rcm_order(Ashuf.indptr.astype(np.int64),
                     Ashuf.indices.astype(np.int64))
    B = permute_csr(Ashuf, perm)
    bw_rcm = bandwidth(B.indptr, B.indices)
    assert sorted(perm) == list(range(Ashuf.shape[0]))
    # natural ordering of the 12x12 grid has bandwidth 12; RCM should get
    # within a small factor, far below the shuffled bandwidth (~N)
    assert bw_rcm <= 3 * 12
    assert bw_rcm < bw_shuf / 3


def test_rcm_python_fallback_matches_contract(rng):
    from acg_tpu.partition.ordering import _rcm_python
    Ashuf, _ = shuffled_poisson(8, rng)
    perm = _rcm_python(Ashuf.indptr.astype(np.int64),
                       Ashuf.indices.astype(np.int64))
    assert sorted(perm) == list(range(Ashuf.shape[0]))
    B = permute_csr(Ashuf, perm)
    assert bandwidth(B.indptr, B.indices) <= 3 * 8


def test_nd_order_valid_permutation(rng):
    Ashuf, _ = shuffled_poisson(8, rng)
    perm = nd_order(Ashuf.indptr.astype(np.int64),
                    Ashuf.indices.astype(np.int64), leaf_size=16)
    assert sorted(perm) == list(range(Ashuf.shape[0]))


def test_permuted_symcsr_spectrum_preserved(rng):
    """P A Pᵀ must be the same operator up to relabeling: matvec results
    map through the permutation."""
    offsets, vals = poisson2d_dia(6)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals, upper_only=True)
    A = SymCSRMatrix.from_coo(N, rowidx, colidx, a)
    perm = rng.permutation(N)
    B = A.permuted(perm)
    x = rng.standard_normal(N)
    # B (Px) = P (A x) with (Pv)[i] = v[perm[i]]
    np.testing.assert_allclose(B.matvec(x[perm]), A.matvec(x)[perm],
                               rtol=1e-13)


def test_cli_reorder_rcm(tmp_path, rng):
    """End-to-end: shuffled Poisson solved with --reorder rcm, solution
    written back in the INPUT ordering."""
    from acg_tpu.cli.main import main as cli_main
    from acg_tpu.io.mtxfile import MtxFile, read_mtx, write_mtx

    Ashuf, _ = shuffled_poisson(6, rng)
    coo = Ashuf.tocoo()
    m = MtxFile(object="matrix", format="coordinate", field="real",
                symmetry="general", nrows=coo.shape[0], ncols=coo.shape[1],
                nnz=coo.nnz, rowidx=coo.row.astype(np.int64),
                colidx=coo.col.astype(np.int64), data=coo.data)
    apath = tmp_path / "Ashuf.mtx"
    write_mtx(str(apath), m)
    # RHS for a known solution in the input ordering
    xstar = rng.standard_normal(coo.shape[0])
    bvec = Ashuf @ xstar
    bpath = tmp_path / "b.mtx"
    from acg_tpu.io.mtxfile import vector_to_mtx
    write_mtx(str(bpath), vector_to_mtx(bvec))
    out = tmp_path / "x.mtx"
    rc = cli_main([str(apath), str(bpath), "--reorder", "rcm",
                   "--residual-rtol", "1e-12", "--max-iterations", "500",
                   "-o", str(out)])
    assert rc == 0
    x = read_mtx(str(out)).to_dense_vector()
    assert np.linalg.norm(x - xstar) < 1e-6


def test_cluster_order_is_permutation_and_improves_fill(rng):
    """BFS-ball clustering: valid permutation; on a shuffled geometric
    graph the per-(tile, chunk) SELL group count drops vs the shuffled
    order (the fill lever it exists for)."""
    import scipy.sparse as sp
    from acg_tpu.partition.ordering import cluster_order, _cluster_python

    n = 3000
    pts = rng.random((n, 2))
    from scipy.spatial import cKDTree
    pairs = cKDTree(pts).query_pairs(0.035, output_type="ndarray")
    G = sp.coo_matrix((np.ones(len(pairs)), (pairs[:, 0], pairs[:, 1])),
                      shape=(n, n)).tocsr()
    G = (G + G.T + sp.eye(n)).tocsr()
    sh = rng.permutation(n)
    A = G[sh][:, sh].tocsr()

    def groups(M):
        rowptr, col = M.indptr.astype(np.int64), M.indices
        row = np.repeat(np.arange(M.shape[0], dtype=np.int64),
                        np.diff(rowptr))
        key = (row >> 7) * ((M.shape[1] >> 7) + 2) + (col.astype(np.int64) >> 7)
        return len(np.unique(key))

    perm = cluster_order(A.indptr, A.indices, ball=128)
    assert sorted(perm.tolist()) == list(range(n))
    B = A[perm][:, perm].tocsr()
    assert groups(B) < groups(A) // 2

    # python fallback is also a valid permutation and clusters comparably
    perm2 = _cluster_python(A.indptr.astype(np.int64),
                            A.indices.astype(np.int64), 128)
    assert sorted(perm2.tolist()) == list(range(n))
    B2 = A[perm2][:, perm2].tocsr()
    assert groups(B2) < groups(A) // 2
