"""Packed-vector semantics (acg/vector.{h,c} analogue): ghost-tail
exclusion from reductions, sparse gather/scatter, BLAS-1."""

import numpy as np
import pytest

from acg_tpu.core.vector import PackedVector


def test_full_storage_blas1():
    v = PackedVector.full(np.array([3.0, -4.0, 0.0]))
    assert v.dnrm2() == pytest.approx(5.0)
    assert v.dasum() == pytest.approx(7.0)
    assert v.iamax() == 1
    w = PackedVector.full(np.array([1.0, 1.0, 2.0]))
    assert v.ddot(w) == pytest.approx(-1.0)
    v.daxpy(2.0, w)
    assert list(v.data) == [5.0, -2.0, 4.0]
    v.daypx(0.5, w)   # v = 0.5 v + w
    assert list(v.data) == [3.5, 0.0, 4.0]
    v.dscal(2.0)
    assert list(v.data) == [7.0, 0.0, 8.0]


def test_ghosts_excluded_from_reductions():
    # two owned entries + one ghost; reductions must ignore the ghost
    v = PackedVector.packed(size=5, idx=[0, 2, 4], data=[1.0, 2.0, 100.0],
                            num_ghost=1)
    assert v.dnrm2sqr() == pytest.approx(5.0)
    assert v.dasum() == pytest.approx(3.0)
    w = PackedVector.packed(size=5, idx=[0, 2, 4], data=[1.0, 1.0, 1.0],
                            num_ghost=1)
    assert v.ddot(w) == pytest.approx(3.0)
    # cross-part double counting is what this prevents: sum of per-part
    # dnrm2sqr over conformal parts equals the global value exactly once
    # (the zero-padding invariant of the device solvers mirrors this).


def test_conformality_enforced():
    v = PackedVector.packed(size=4, idx=[0, 1], data=[1.0, 2.0])
    w = PackedVector.packed(size=4, idx=[0, 1, 2], data=[1.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        v.ddot(w)


def test_usga_ussc_roundtrip():
    x = np.array([10.0, 11.0, 12.0, 13.0, 14.0])
    v = PackedVector.packed(size=5, idx=[3, 0, 4], num_ghost=1)
    v.usga(x)
    assert list(v.data) == [13.0, 10.0, 14.0]
    out = np.zeros(5)
    v.ussc(out)                       # ghost (idx 4) skipped
    assert list(out) == [10.0, 0.0, 0.0, 13.0, 0.0]
    out2 = np.zeros(5)
    v.ussc(out2, include_ghosts=True)
    assert list(out2) == [10.0, 0.0, 0.0, 13.0, 14.0]


def test_usgz_zeroes_source():
    x = np.array([1.0, 2.0, 3.0])
    v = PackedVector.packed(size=3, idx=[1], num_ghost=0)
    v.usgz(x)
    assert list(v.data) == [2.0]
    assert list(x) == [1.0, 0.0, 3.0]


def test_to_full():
    v = PackedVector.packed(size=4, idx=[2, 1], data=[5.0, 6.0])
    assert list(v.to_full()) == [0.0, 6.0, 5.0, 0.0]
