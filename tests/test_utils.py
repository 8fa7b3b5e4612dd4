"""Tests for the L0 utility layer (sort / prefixsum / fmtspec)."""

import numpy as np
import pytest

from acg_tpu.utils import (exclusive_prefixsum, inclusive_prefixsum,
                           parse_fmtspec, radix_sort, radix_sort_pair,
                           validate_numfmt)


def test_radix_sort_basic():
    rng = np.random.default_rng(0)
    keys = rng.integers(-(2**62), 2**62, size=10_000, dtype=np.int64)
    skeys, perm = radix_sort(keys)
    assert np.array_equal(skeys, np.sort(keys))
    assert np.array_equal(keys[perm], skeys)


def test_radix_sort_stability():
    keys = np.array([3, 1, 3, 1, 2, 2, 1], dtype=np.int64)
    _, perm = radix_sort(keys)
    # equal keys keep original relative order
    assert list(perm) == [1, 3, 6, 4, 5, 0, 2]


def test_radix_sort_negative_and_small_dtypes():
    keys = np.array([5, -7, 0, -7, 3], dtype=np.int64)
    skeys, perm = radix_sort(keys)
    assert list(skeys) == [-7, -7, 0, 3, 5]
    assert list(perm) == [1, 3, 2, 4, 0]
    # int32 path (numpy fallback)
    k32 = keys.astype(np.int32)
    s32 = radix_sort(k32, return_perm=False)
    assert list(s32) == [-7, -7, 0, 3, 5]


def test_radix_sort_pair():
    k1 = np.array([1, 0, 1, 0, 1], dtype=np.int64)
    k2 = np.array([2, 9, 1, 3, 1], dtype=np.int64)
    s1, s2, perm = radix_sort_pair(k1, k2)
    assert list(s1) == [0, 0, 1, 1, 1]
    assert list(s2) == [3, 9, 1, 1, 2]
    assert np.array_equal(k1[perm], s1) and np.array_equal(k2[perm], s2)
    # stability among fully equal pairs: original order preserved
    assert list(perm) == [3, 1, 2, 4, 0]


def test_prefixsum_inclusive_exclusive():
    x = np.array([3, 1, 4, 1, 5], dtype=np.int64)
    assert list(inclusive_prefixsum(x)) == [3, 4, 8, 9, 14]
    assert list(exclusive_prefixsum(x)) == [0, 3, 4, 8, 9]
    # rowptr mode: out has n+1 entries, last = total
    out = np.empty(6, dtype=np.int64)
    assert list(exclusive_prefixsum(x, out)) == [0, 3, 4, 8, 9, 14]


@pytest.mark.parametrize("fmt,conv,prec", [
    ("%g", "g", None), ("%.17g", "g", 17), ("%12.4e", "e", 4),
    ("%-+8.3f", "f", 3), ("%d", "d", None), ("%08x", "x", None),
])
def test_parse_fmtspec_valid(fmt, conv, prec):
    spec = parse_fmtspec(fmt)
    assert spec.conversion == conv
    assert spec.precision == prec
    assert str(spec) == fmt


@pytest.mark.parametrize("bad", ["", "g", "%", "%q", "%5", "%.g2", "%%g",
                                 "%s", "%c", "%p", "%g %g"])
def test_parse_fmtspec_invalid(bad):
    with pytest.raises(ValueError):
        parse_fmtspec(bad)


def test_validate_numfmt():
    assert validate_numfmt("%.17g") == "%.17g"
    assert validate_numfmt("%Lf") == "%f"          # length modifier stripped
    assert validate_numfmt("%d", field="integer") == "%d"
    with pytest.raises(ValueError):
        validate_numfmt("%d", field="real")        # int conversion for reals
    with pytest.raises(ValueError):
        validate_numfmt("%g", field="integer")
    with pytest.raises(ValueError):
        validate_numfmt("%*.2f")                    # '*' width unsupported
    # the validated format is directly usable by numpy text formatting
    assert np.char.mod(validate_numfmt("%.3e"), 1.5) == "1.500e+00"


def test_compile_cache_env(tmp_path, monkeypatch):
    """ACG_COMPILE_CACHE points jax's persistent compilation cache at
    the given directory; compiled executables land there and reload in
    a fresh process (the CLI-level check is in the commit that added
    config._maybe_enable_compile_cache)."""
    import jax

    from acg_tpu import config as cfg

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("ACG_COMPILE_CACHE", str(tmp_path))
        cfg._maybe_enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)

        @jax.jit
        def f(x):
            return x * 2.0 + 1.0

        f(np.arange(8.0)).block_until_ready()
        assert any(tmp_path.iterdir()), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
