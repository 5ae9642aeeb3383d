"""rANS coder: native/golden bytestream equality, roundtrip, rate optimality."""

import numpy as np
import pytest

from simple_image_compression_network_tpu.codec import entropy, rans


@pytest.fixture(scope="module")
def native_available():
    return rans.load_native() is not None


def _random_cdf(rng, L, prec=16):
    pmf = rng.dirichlet(np.ones(L) * 0.5)
    return entropy.quantize_cdf(pmf, prec)


def test_native_builds(native_available):
    assert native_available, "g++ build of native/rans.cpp failed"


def test_roundtrip_python(rng):
    L = 16
    cdf = np.stack([_random_cdf(rng, L) for _ in range(4)])
    n = 500
    ctx = rng.integers(0, 4, n)
    syms = rng.integers(0, L - 1, n)  # avoid escape here
    data = rans.encode(syms, ctx, cdf, use_native=False)
    dec, raw = rans.decode(data, n, ctx, cdf, use_native=False)
    np.testing.assert_array_equal(dec, syms)
    np.testing.assert_array_equal(raw, 0)


def test_native_matches_python_bytestream(rng, native_available):
    if not native_available:
        pytest.skip("no native lib")
    L = 32
    cdf = np.stack([_random_cdf(rng, L) for _ in range(3)])
    n = 2000
    ctx = rng.integers(0, 3, n)
    syms = rng.integers(0, L - 1, n)
    d_py = rans.encode(syms, ctx, cdf, use_native=False)
    d_nat = rans.encode(syms, ctx, cdf, use_native=True)
    assert d_py == d_nat
    dec, _ = rans.decode(d_nat, n, ctx, cdf, use_native=True)
    np.testing.assert_array_equal(dec, syms)
    dec2, _ = rans.decode(d_py, n, ctx, cdf, use_native=False)
    np.testing.assert_array_equal(dec2, syms)


def test_escape_bypass_roundtrip(rng, native_available):
    L = 8
    cdf = np.stack([_random_cdf(rng, L)])
    n = 64
    ctx = np.zeros(n, np.int64)
    syms = rng.integers(0, L - 1, n)
    raw = np.zeros(n, np.int64)
    esc = L - 1
    idx = rng.choice(n, 10, replace=False)
    syms[idx] = esc
    raw[idx] = rng.integers(-2**30, 2**30, 10)
    for native in ([False, True] if native_available else [False]):
        data = rans.encode(syms, ctx, cdf, raw=raw, use_native=native)
        dec, draw = rans.decode(data, n, ctx, cdf, use_native=native)
        np.testing.assert_array_equal(dec, syms)
        np.testing.assert_array_equal(draw[idx], raw[idx])


def test_rate_near_entropy(rng, native_available):
    # Coding cost should be within ~1% + constant of the empirical entropy.
    L = 65
    scale = 3.0
    cdf = entropy.gaussian_cdf_table(scale, max_abs=(L - 2) // 2)[None]
    n = 50_000
    vals = np.clip(np.round(rng.normal(0, scale, n)), -31, 31).astype(np.int64)
    syms = vals + 31
    ctx = np.zeros(n, np.int64)
    data = rans.encode(syms, ctx, cdf, use_native=native_available)
    pmf = np.diff(cdf[0]) / float(cdf[0, -1])
    ideal_bits = -np.sum(np.log2(pmf[syms]))
    actual_bits = 8 * len(data)
    assert actual_bits < ideal_bits * 1.01 + 64
    dec, _ = rans.decode(data, n, ctx, cdf, use_native=native_available)
    np.testing.assert_array_equal(dec, syms)
