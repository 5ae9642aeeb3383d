"""JAX int conv/deconv vs the NumPy golden model — bit-exact."""

import numpy as np
import jax.numpy as jnp

from simple_image_compression_network_tpu.ops import conv_int, integer


def _rand_case(rng, ci=3, co=8, ix=12, iy=10, n=2):
    x = rng.integers(0, 256, size=(n, ix, iy, ci), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(co, 5, 5, ci), dtype=np.int8)
    b = rng.integers(-128, 128, size=(co,), dtype=np.int8)
    return x, w, b


def test_conv2d_int8_matches_golden(rng):
    x, w, b = _rand_case(rng)
    golden = integer.conv2d_golden(x, w, b)
    out = conv_int.conv2d_int8(conv_int.to_wire_int8(jnp.asarray(x)),
                               jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_conv2d_int8_large_channels(rng):
    x, w, b = _rand_case(rng, ci=32, co=24, ix=16, iy=16, n=1)
    golden = integer.conv2d_golden(x, w, b)
    out = conv_int.conv2d_int8(conv_int.to_wire_int8(jnp.asarray(x)),
                               jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_deconv2d_int8_matches_golden(rng):
    x, w, b = _rand_case(rng, ci=6, co=4, ix=8, iy=6)
    # deconv inputs are previous-layer outputs: non-negative int8
    x = (x % 128).astype(np.uint8)
    golden = integer.deconv2d_golden(x, w, b)
    out = conv_int.deconv2d_int8(jnp.asarray(x.view(np.int8)),
                                 jnp.asarray(w), jnp.asarray(b))
    assert out.shape == (2, 16, 12, 4)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_deconv2d_phased_matches_dilated(rng):
    x, w, b = _rand_case(rng, ci=5, co=7, ix=9, iy=11)
    x = (x % 128).astype(np.uint8)
    ref = conv_int.deconv2d_int8(jnp.asarray(x.view(np.int8)),
                                 jnp.asarray(w), jnp.asarray(b))
    fast = conv_int.deconv2d_int8_phased(jnp.asarray(x.view(np.int8)),
                                         jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fast))


def test_deconv2d_phased_matches_golden(rng):
    x, w, b = _rand_case(rng, ci=3, co=5, ix=4, iy=4, n=1)
    x = (x % 128).astype(np.uint8)
    golden = integer.deconv2d_golden(x, w, b)
    fast = conv_int.deconv2d_int8_phased(jnp.asarray(x.view(np.int8)),
                                         jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(fast), golden)


def test_wrap_to_int8_jnp():
    acc = jnp.arange(-1000, 1000, dtype=jnp.int32)
    w = conv_int.wrap_to_int8(acc)
    np.testing.assert_array_equal(
        np.asarray(w), integer.wrap_to_int8(np.arange(-1000, 1000)))


def test_conv2d_int8_dilated_matches_golden(rng):
    """Dilated-conv parity op (slidingwindow.h:1529-1631, x-only dilation)."""
    x, w, b = _rand_case(rng, ci=5, co=7, ix=14, iy=12)
    for dilation, stride, pad in (((2, 1), 1, 0), ((2, 1), 1, 2),
                                  ((3, 2), 1, 3), ((2, 2), 2, 2)):
        golden = integer.conv2d_golden_dilated(x, w, b, stride=stride,
                                               padding=pad,
                                               dilation=dilation)
        out = conv_int.conv2d_int8_dilated(
            conv_int.to_wire_int8(jnp.asarray(x)), jnp.asarray(w),
            jnp.asarray(b), stride=stride, padding=pad, dilation=dilation)
        np.testing.assert_array_equal(np.asarray(out), golden)


def test_conv2d_dilation_one_equals_plain(rng):
    x, w, b = _rand_case(rng)
    plain = integer.conv2d_golden(x, w, b, stride=2, padding=2)
    dil = integer.conv2d_golden_dilated(x, w, b, stride=2, padding=2,
                                        dilation=(1, 1))
    np.testing.assert_array_equal(plain, dil)


def test_conv2d_f32_matches_golden(rng):
    """f32-accumulated conv is bit-exact (sums < 2^24, exact in f32)."""
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.ops import conv_int, integer
    x = rng.integers(0, 256, size=(2, 16, 12, 3), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(8, 5, 5, 3), dtype=np.int8)
    b = rng.integers(-128, 128, size=(8,), dtype=np.int8)
    golden = integer.conv2d_golden(x, w, b)
    out = conv_int.conv2d_int8_f32(jnp.asarray(x.view(np.int8)),
                                   jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(out), golden)
