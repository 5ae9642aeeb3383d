"""Native C++ golden vs NumPy golden vs JAX — three-way cross-check."""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_image_compression_network_tpu.ops import conv_int, integer
from simple_image_compression_network_tpu.utils import native_golden


@pytest.fixture(scope="module")
def available():
    ok = native_golden.load() is not None
    assert ok, "g++ build of native/golden.cpp failed"
    return ok


def test_conv2d_three_way(rng, available):
    x = rng.integers(0, 256, size=(2, 12, 10, 5), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(7, 5, 5, 5), dtype=np.int8)
    b = rng.integers(-128, 128, size=(7,), dtype=np.int8)
    numpy_g = integer.conv2d_golden(x, w, b)
    native_g = native_golden.conv2d(x, w, b)
    jax_g = np.asarray(conv_int.conv2d_int8(jnp.asarray(x.view(np.int8)),
                                            jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_array_equal(native_g, numpy_g)
    np.testing.assert_array_equal(native_g, jax_g)


def test_deconv2d_three_way(rng, available):
    x = (rng.integers(0, 128, size=(1, 6, 8, 4), dtype=np.uint8))
    w = rng.integers(-8, 8, size=(5, 5, 5, 4), dtype=np.int8)
    b = rng.integers(-128, 128, size=(5,), dtype=np.int8)
    numpy_g = integer.deconv2d_golden(x, w, b)
    native_g = native_golden.deconv2d(x, w, b)
    jax_g = np.asarray(conv_int.deconv2d_int8(jnp.asarray(x.view(np.int8)),
                                              jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_array_equal(native_g, numpy_g)
    np.testing.assert_array_equal(native_g, jax_g)
