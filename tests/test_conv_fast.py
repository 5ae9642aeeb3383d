"""MXU-shaped conv rewrites (s2d / d2s / GEMM) vs the baseline int ops."""

import numpy as np
import jax.numpy as jnp

from simple_image_compression_network_tpu.ops import conv_fast, conv_int, integer


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.integers(-128, 128, size=(2, 8, 6, 5), dtype=np.int8))
    xs = conv_fast.space_to_depth(x)
    assert xs.shape == (2, 4, 3, 20)
    np.testing.assert_array_equal(np.asarray(conv_fast.depth_to_space(xs)),
                                  np.asarray(x))
    # phase layout: xs[v,w,(a*2+b)*C + c] == x[2v+a, 2w+b, c]
    xn = np.asarray(x)
    np.testing.assert_array_equal(np.asarray(xs)[0, 1, 1, 5:10],
                                  xn[0, 2, 3, :])  # (a,b)=(0,1), c block 1


def test_conv_s2d_matches_golden(rng):
    x = rng.integers(0, 256, size=(2, 12, 10, 3), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(8, 5, 5, 3), dtype=np.int8)
    b = rng.integers(-128, 128, size=(8,), dtype=np.int8)
    golden = integer.conv2d_golden(x, w, b)
    out = conv_fast.conv2d_int8_s2d(jnp.asarray(x.view(np.int8)),
                                    jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_conv_gemm_matches_golden(rng):
    x = rng.integers(0, 256, size=(2, 16, 12, 3), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(16, 5, 5, 3), dtype=np.int8)
    b = rng.integers(-128, 128, size=(16,), dtype=np.int8)
    golden = integer.conv2d_golden(x, w, b)
    out = conv_fast.conv2d_int8_gemm(jnp.asarray(x.view(np.int8)),
                                     jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_deconv_d2s_matches_golden(rng):
    x = (rng.integers(0, 256, size=(2, 6, 8, 4), dtype=np.uint8) % 128)
    w = rng.integers(-8, 8, size=(6, 5, 5, 4), dtype=np.int8)
    b = rng.integers(-128, 128, size=(6,), dtype=np.int8)
    golden = integer.deconv2d_golden(x.astype(np.uint8), w, b)
    out = conv_fast.deconv2d_int8_d2s(jnp.asarray(x.view(np.int8)),
                                      jnp.asarray(w), jnp.asarray(b))
    assert out.shape == (2, 12, 16, 6)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_s2d_matches_conv_int_many_channels(rng):
    x = rng.integers(-128, 128, size=(1, 8, 8, 16), dtype=np.int8)
    w = rng.integers(-8, 8, size=(32, 5, 5, 16), dtype=np.int8)
    b = rng.integers(-128, 128, size=(32,), dtype=np.int8)
    ref = conv_int.conv2d_int8(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    out = conv_fast.conv2d_int8_s2d(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_d2s_matches_conv_int_many_channels(rng):
    x = rng.integers(0, 128, size=(1, 8, 8, 16), dtype=np.int8)
    w = rng.integers(-8, 8, size=(24, 5, 5, 16), dtype=np.int8)
    b = rng.integers(-128, 128, size=(24,), dtype=np.int8)
    ref = conv_int.deconv2d_int8(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    out = conv_fast.deconv2d_int8_d2s(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_deconv_tapn_matches_golden(rng):
    # taps-in-N GEMM form (narrow output channels), full int8 range
    x = rng.integers(-128, 128, size=(2, 6, 8, 16), dtype=np.int8)
    w = rng.integers(-8, 8, size=(3, 5, 5, 16), dtype=np.int8)
    b = rng.integers(-128, 128, size=(3,), dtype=np.int8)
    ref = conv_int.deconv2d_int8(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b))
    out = conv_fast.deconv2d_int8_tapn(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b))
    assert out.shape == (2, 12, 16, 3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_tail_fused_matches_chained_deconvs(rng):
    # phase-domain fusion of an adjacent deconv pair == d2s(b) o d2s(a)
    x = rng.integers(-128, 128, size=(2, 5, 7, 12), dtype=np.int8)
    wa = rng.integers(-8, 8, size=(8, 5, 5, 12), dtype=np.int8)
    ba = rng.integers(-128, 128, size=(8,), dtype=np.int8)
    wb = rng.integers(-8, 8, size=(3, 5, 5, 8), dtype=np.int8)
    bb = rng.integers(-128, 128, size=(3,), dtype=np.int8)
    j = jnp.asarray
    ref = conv_int.deconv2d_int8(
        conv_int.deconv2d_int8(j(x), j(wa), j(ba)), j(wb), j(bb))
    out = conv_fast.deconv2d_int8_tail_fused(j(x), j(wa), j(ba), j(wb),
                                             j(bb))
    assert out.shape == (2, 20, 28, 3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_space_to_depth4_roundtrip(rng):
    x = jnp.asarray(rng.integers(-128, 128, size=(2, 8, 12, 5),
                                 dtype=np.int8))
    xs = conv_fast.space_to_depth4(x)
    assert xs.shape == (2, 2, 3, 80)
    np.testing.assert_array_equal(np.asarray(conv_fast.depth_to_space4(xs)),
                                  np.asarray(x))
