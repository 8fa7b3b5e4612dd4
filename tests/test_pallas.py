"""Pallas DIA kernel tests (interpret mode on CPU; compiled path is
exercised on real TPU by bench/scripts)."""

import jax
import numpy as np
import pytest
import scipy.sparse as sp
from jax.experimental import pallas as pl

import acg_tpu.ops.pallas_dia as pallas_dia
from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import dia_to_coo, poisson2d_dia, poisson3d_dia


@pytest.fixture(autouse=True)
def interpret_mode():
    # the kernels auto-select interpret mode on the CPU backend; just bust
    # the jit cache so traces from other fixtures aren't reused
    pallas_dia.dia_spmv_pallas._clear_cache()
    yield
    pallas_dia.dia_spmv_pallas._clear_cache()


def _check(offsets, vals, hw, block, dtype=np.float64):
    import jax.numpy as jnp
    K, N = vals.shape
    rowidx, colidx, a, _ = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    rng = np.random.default_rng(1)
    x = rng.standard_normal(N).astype(dtype)
    xe = jnp.asarray(np.concatenate([np.zeros(hw, dtype), x, np.zeros(hw, dtype)]))
    y = np.asarray(pallas_dia.dia_spmv_pallas(
        jnp.asarray(vals.astype(dtype)), xe,
        tuple(int(o) for o in offsets), hw, block))
    np.testing.assert_allclose(y[:N], A @ x, rtol=1e-5 if dtype == np.float32 else 1e-12,
                               atol=1e-5 if dtype == np.float32 else 1e-12)


def test_poisson2d_exact():
    offsets, vals = poisson2d_dia(32)     # N=1024
    _check(offsets, vals, hw=32, block=256)


def test_poisson3d_27pt():
    offsets, vals = poisson3d_dia(8, 27)  # N=512, hw=73
    _check(offsets, vals, hw=73, block=128)


def test_float32():
    offsets, vals = poisson2d_dia(16)
    _check(offsets, vals, hw=16, block=128, dtype=np.float32)


def test_block_must_divide():
    import jax.numpy as jnp
    offsets, vals = poisson2d_dia(16)
    xe = jnp.zeros((256 + 32,))
    with pytest.raises(AssertionError):
        pallas_dia.dia_spmv_pallas(jnp.asarray(vals), xe,
                                   tuple(int(o) for o in offsets), 16, 100)


def test_operator_backend_switch():
    import jax.numpy as jnp
    offsets, vals = poisson2d_dia(16)
    op_x = DiaOperator.from_arrays(offsets, vals, pad_to=128, backend="xla")
    op_p = DiaOperator.from_arrays(offsets, vals, pad_to=128, backend="pallas")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(op_x.Np))
    np.testing.assert_allclose(np.asarray(op_p.spmv(x)),
                               np.asarray(op_x.spmv(x)), rtol=1e-12)


def test_np_kernel_wide_halo_regression():
    """hw > block (the 3-D 27-point regime: hw≈n² while blocks cap at
    VMEM size): the in-kernel boundary scheme only covers hw <= block, so
    dia_spmv_pallas_np must route wide halos through the zero-extended
    kernel.  Round-1 silently miscomputed rows near the edges here."""
    import jax.numpy as jnp
    offsets, vals = poisson3d_dia(8, 27)   # N=512, hw=73
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    rng = np.random.default_rng(3)
    x = rng.standard_normal(N)
    # hw=128 > block=64, nblocks=8 > 2: several non-edge blocks need clamps
    y = np.asarray(pallas_dia.dia_spmv_pallas_np(
        jnp.asarray(vals), jnp.asarray(x),
        tuple(int(o) for o in offsets), 128, 64))
    np.testing.assert_allclose(y[:N], A @ x, rtol=1e-12, atol=1e-12)


def test_np_kernel_matches_ext_all_regimes():
    """dia_spmv_pallas_np == spmv via extension for hw below, at, and
    above the block size."""
    import jax.numpy as jnp
    offsets, vals = poisson2d_dia(16)      # N=256, hw=16
    rng = np.random.default_rng(4)
    x = rng.standard_normal(256)
    xj = jnp.asarray(x)
    vj = jnp.asarray(vals)
    offs = tuple(int(o) for o in offsets)
    for hw, block in [(16, 64), (64, 64), (128, 64), (256, 32)]:
        xe = jnp.asarray(np.concatenate([np.zeros(hw), x, np.zeros(hw)]))
        ref = np.asarray(pallas_dia.dia_spmv_pallas(vj, xe, offs, hw, block))
        got = np.asarray(pallas_dia.dia_spmv_pallas_np(vj, xj, offs, hw, block))
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def _ring_check(offsets, vals, block, dtype=np.float64, seed=7):
    import jax.numpy as jnp
    K, N = vals.shape
    rowidx, colidx, a, _ = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    x = np.random.default_rng(seed).standard_normal(N).astype(dtype)
    y = np.asarray(pallas_dia.dia_spmv_ring(
        jnp.asarray(vals.astype(dtype)), jnp.asarray(x),
        tuple(int(o) for o in offsets), block))
    tol = 1e-4 if dtype == np.float32 else 1e-12
    np.testing.assert_allclose(y[:N], A @ x, rtol=tol, atol=tol)


def test_ring_narrow_halo():
    offsets, vals = poisson2d_dia(16)       # N=256, hw=16
    _ring_check(offsets, vals, block=64)    # m=1, several blocks


def test_ring_wide_halo_3d():
    """hw ≈ n² > block: the regime the ring kernel exists for."""
    offsets, vals = poisson3d_dia(8, 27)    # N=512, hw=73
    _ring_check(offsets, vals, block=64)    # m=2, R=6, nb=8


def test_ring_halo_wider_than_matrix_span():
    offsets, vals = poisson3d_dia(8, 27)
    _ring_check(offsets, vals, block=32)    # m=3, R=8, nb=16


def test_ring_single_block():
    offsets, vals = poisson2d_dia(16)
    _ring_check(offsets, vals, block=256)   # nb=1: all boundary


def test_ring_two_blocks_f32():
    offsets, vals = poisson2d_dia(16)
    _ring_check(offsets, vals, block=128, dtype=np.float32)


def test_ring_asymmetric_random_offsets():
    """Arbitrary (non-stencil) offsets exercise every wrap phase."""
    rng = np.random.default_rng(11)
    N = 768
    offs = np.unique(np.concatenate([[0], rng.integers(-700, 700, 40)]))
    vals = rng.standard_normal((len(offs), N))
    # zero out-of-range slots (the DIA zero-padding invariant)
    for k, off in enumerate(offs):
        if off > 0:
            vals[k, N - off:] = 0.0
        elif off < 0:
            vals[k, :-off] = 0.0
    _ring_check(offs, vals, block=64)       # m=11, R=24, nb=12


def test_ring_matches_windowed_kernel():
    import jax.numpy as jnp
    offsets, vals = poisson2d_dia(16)
    x = np.random.default_rng(5).standard_normal(256)
    offs = tuple(int(o) for o in offsets)
    ring = np.asarray(pallas_dia.dia_spmv_ring(
        jnp.asarray(vals), jnp.asarray(x), offs, 64))
    windowed = np.asarray(pallas_dia.dia_spmv_pallas_np(
        jnp.asarray(vals), jnp.asarray(x), offs, 16, 64))
    np.testing.assert_allclose(ring, windowed, rtol=1e-13, atol=1e-13)


def test_pick_block_ring():
    b = pallas_dia.pick_block_ring(2048 * 2048, 5, 2048, 4)
    assert b is not None and 2048 * 2048 % b == 0
    # huge K × huge hw: phase-unroll budget exceeded → None (fall back)
    assert pallas_dia.pick_block_ring(1 << 24, 600, 1 << 22, 4) is None


def test_pick_block():
    assert pallas_dia.pick_block(4096 * 1024, 5, 2048, 4) >= 1024
    b = pallas_dia.pick_block(5 * 1024, 27, 512, 8)
    assert 5 * 1024 % b == 0


def test_dist_stencil_pallas_backend(rng):
    """Distributed stencil solve with the pallas SpMV per device must match
    the xla backend bit-for-bit (same reduction order)."""
    from acg_tpu.solvers.cg import CGOptions
    from acg_tpu.solvers.dist_cg import solve_dist_stencil

    offsets, vals = poisson2d_dia(16)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    xstar = rng.standard_normal(N)
    b = A @ xstar
    opt = CGOptions(max_iterations=200, residual_rtol=1e-10)
    xp, ip = solve_dist_stencil(offsets, vals, b, nparts=4, opt=opt,
                                method="pipelined", pad_to=128,
                                backend="pallas")
    xx, ix = solve_dist_stencil(offsets, vals, b, nparts=4, opt=opt,
                                method="pipelined", pad_to=128,
                                backend="xla")
    assert ip.converged
    assert ip.niterations == ix.niterations
    np.testing.assert_allclose(xp, xx, rtol=1e-12, atol=1e-12)
