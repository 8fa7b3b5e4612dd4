"""Operator format tests: CSR container, DIA/ELL conversions, SpMV oracles."""

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.core.csr import SymCSRMatrix
from acg_tpu.core.dia import DiaOperator
from acg_tpu.core.ell import EllOperator
from acg_tpu.io.generators import (dia_to_coo, poisson2d_dia, poisson2d_mtx,
                                   poisson3d_dia, poisson3d_mtx)


def random_spd(rng, n=50, density=0.1):
    A = sp.random(n, n, density=density, random_state=np.random.RandomState(7))
    A = A + A.T + n * sp.eye(n)
    return A.tocsr()


def test_symcsr_from_coo_dedupe():
    # duplicate entries must sum (reference dedupes in init_real_double)
    m = SymCSRMatrix.from_coo(3, [0, 0, 1, 2], [1, 1, 1, 2], [1.0, 2.0, 5.0, 7.0])
    full = m.to_scipy_full()
    assert full[0, 1] == 3.0 and full[1, 0] == 3.0
    assert full[1, 1] == 5.0 and full[2, 2] == 7.0


def test_symcsr_roundtrip_spd(rng):
    A = random_spd(rng)
    coo = sp.triu(A).tocoo()
    m = SymCSRMatrix.from_coo(A.shape[0], coo.row, coo.col, coo.data)
    full = m.to_scipy_full()
    assert abs(full - A).max() < 1e-12


def test_epsilon_diagonal_shift(rng):
    A = random_spd(rng)
    coo = sp.triu(A).tocoo()
    m = SymCSRMatrix.from_coo(A.shape[0], coo.row, coo.col, coo.data)
    full = m.to_scipy_full(epsilon=0.5)
    assert abs((full - A) - 0.5 * sp.eye(A.shape[0])).max() < 1e-12


@pytest.mark.parametrize("gen,args", [
    (poisson2d_dia, (6,)),
    (poisson3d_dia, (4, 7)),
    (poisson3d_dia, (3, 27)),
])
def test_dia_generators_match_coo_expansion(gen, args):
    offsets, vals = gen(*args)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    # symmetric and SPD-ish (diagonally dominant)
    assert abs(A - A.T).max() == 0
    assert np.all(A.diagonal() >= np.abs(A).sum(axis=1).A1 - A.diagonal() - 1e-12)


def test_poisson3d_27pt_rowsums():
    offsets, vals = poisson3d_dia(4, 27)
    # interior rows: 26 neighbours of -1 and center 26 → row sum 0
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    interior = 1 + 4 + 16 + 21  # an interior grid point for n=4 (1,1,1)
    assert A[interior].sum() == 0


def test_dia_operator_spmv_matches_scipy(rng):
    offsets, vals = poisson2d_dia(10)
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    x = rng.standard_normal(N)
    import jax.numpy as jnp
    xp = jnp.zeros((op.Np,), jnp.float64).at[:N].set(jnp.asarray(x))
    y = np.asarray(op.spmv(xp))[:N]
    np.testing.assert_allclose(y, A @ x, rtol=1e-11, atol=1e-11)


def test_dia_from_csr_general_matrix(rng):
    A = random_spd(rng, n=40)
    coo = sp.triu(A).tocoo()
    m = SymCSRMatrix.from_coo(40, coo.row, coo.col, coo.data)
    res = m.to_dia_arrays()
    assert res is not None
    offsets, vals = res
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    x = rng.standard_normal(40)
    import jax.numpy as jnp
    xp = jnp.zeros((op.Np,), jnp.float64).at[:40].set(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(op.spmv(xp))[:40], A @ x, rtol=1e-11, atol=1e-11)


def test_ell_operator_spmv_matches_scipy(rng):
    A = random_spd(rng, n=64)
    coo = sp.triu(A).tocoo()
    m = SymCSRMatrix.from_coo(64, coo.row, coo.col, coo.data)
    colidx, vals = m.to_ell_arrays()
    op = EllOperator.from_arrays(colidx, vals, pad_to=128)
    x = rng.standard_normal(64)
    import jax.numpy as jnp
    xp = jnp.zeros((op.Np,), jnp.float64).at[:64].set(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(op.spmv(xp))[:64], A @ x, rtol=1e-11, atol=1e-11)


def test_symcsr_matvec_oracle(rng):
    A = random_spd(rng, n=32)
    coo = sp.triu(A).tocoo()
    m = SymCSRMatrix.from_coo(32, coo.row, coo.col, coo.data)
    x = rng.standard_normal(32)
    np.testing.assert_allclose(m.matvec(x), A @ x, rtol=1e-11, atol=1e-11)


def test_padding_rows_inert(rng):
    """Padded rows/cols beyond N must contribute nothing (zero invariant)."""
    offsets, vals = poisson2d_dia(5)  # N=25, pads to 128
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    import jax.numpy as jnp
    x = jnp.ones((op.Np,), jnp.float64)  # even with nonzero padding values in x
    y = np.asarray(op.spmv(x))
    assert np.all(y[25:] == 0)


def test_mtx_symmetric_storage_roundtrip():
    m = poisson2d_mtx(6, symmetric=True)
    s = SymCSRMatrix.from_mtx(m)
    m2 = poisson2d_mtx(6, symmetric=False)
    s2 = SymCSRMatrix.from_mtx(m2)
    assert abs(s.to_scipy_full() - s2.to_scipy_full()).max() == 0
