"""Pallas fused conv kernel vs goldens (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from simple_image_compression_network_tpu.ops import (conv_fast, integer,
                                                      pallas_conv)


def test_conv3x3_kernel_matches_lax(rng):
    x = jnp.asarray(rng.integers(-128, 128, size=(2, 16, 8, 12),
                                 dtype=np.int8))
    w3 = jnp.asarray(rng.integers(-8, 8, size=(3, 3, 12, 16), dtype=np.int8))
    b = jnp.asarray(rng.integers(-128, 128, size=(16,), dtype=np.int8))
    out = pallas_conv.conv3x3_s1_int8(x, w3, b, tx=4, interpret=True)
    # reference: lax conv + epilogue
    from jax import lax
    from simple_image_compression_network_tpu.ops.conv_int import (
        DIMNUMS, bias_relu_epilogue)
    acc = lax.conv_general_dilated(x, w3, (1, 1), [(1, 1), (1, 1)],
                                   dimension_numbers=DIMNUMS,
                                   preferred_element_type=jnp.int32)
    ref = bias_relu_epilogue(acc, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_conv2d_pallas_matches_golden(rng):
    x = rng.integers(0, 256, size=(1, 16, 12, 3), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(8, 5, 5, 3), dtype=np.int8)
    b = rng.integers(-128, 128, size=(8,), dtype=np.int8)
    golden = integer.conv2d_golden(x, w, b)
    out = pallas_conv.conv2d_int8_pallas(jnp.asarray(x.view(np.int8)),
                                         jnp.asarray(w), jnp.asarray(b),
                                         tx=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_deconv2d_pallas_matches_golden(rng):
    x = (rng.integers(0, 128, size=(1, 8, 6, 4), dtype=np.uint8))
    w = rng.integers(-8, 8, size=(6, 5, 5, 4), dtype=np.int8)
    b = rng.integers(-128, 128, size=(6,), dtype=np.int8)
    golden = integer.deconv2d_golden(x, w, b)
    out = pallas_conv.deconv2d_int8_pallas(jnp.asarray(x.view(np.int8)),
                                           jnp.asarray(w), jnp.asarray(b),
                                           tx=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_conv3x3_kernel_valid_modes(rng):
    """x_valid/y_valid: input carries the 1-px halo (sharded-net form)."""
    from jax import lax
    from simple_image_compression_network_tpu.ops.conv_int import (
        DIMNUMS, bias_relu_epilogue)
    x = jnp.asarray(rng.integers(-128, 128, size=(2, 18, 9, 12),
                                 dtype=np.int8))
    w3 = jnp.asarray(rng.integers(-8, 8, size=(3, 3, 12, 16), dtype=np.int8))
    b = jnp.asarray(rng.integers(-128, 128, size=(16,), dtype=np.int8))
    for xv, yv in ((True, False), (False, True), (True, True)):
        out = pallas_conv.conv3x3_s1_int8(x, w3, b, tx=4, x_valid=xv,
                                          y_valid=yv, interpret=True)
        acc = lax.conv_general_dilated(
            x, w3, (1, 1), [(0, 0) if xv else (1, 1),
                            (0, 0) if yv else (1, 1)],
            dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
        ref = bias_relu_epilogue(acc, b)
        assert out.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_conv3x3_flat_kernel_matches_lax(rng):
    from jax import lax
    from simple_image_compression_network_tpu.ops.conv_int import (
        DIMNUMS, bias_relu_epilogue)
    x = jnp.asarray(rng.integers(-128, 128, size=(2, 16, 9, 12),
                                 dtype=np.int8))
    w3 = jnp.asarray(rng.integers(-8, 8, size=(3, 3, 12, 16), dtype=np.int8))
    b = jnp.asarray(rng.integers(-128, 128, size=(16,), dtype=np.int8))
    out = pallas_conv.conv3x3_s1_int8_flat(x, w3, b, tx=8, interpret=True)
    acc = lax.conv_general_dilated(x, w3, (1, 1), [(1, 1), (1, 1)],
                                   dimension_numbers=DIMNUMS,
                                   preferred_element_type=jnp.int32)
    ref = bias_relu_epilogue(acc, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_conv3x3_flat_valid_modes(rng):
    from jax import lax
    from simple_image_compression_network_tpu.ops.conv_int import (
        DIMNUMS, bias_relu_epilogue)
    x = jnp.asarray(rng.integers(-128, 128, size=(2, 18, 9, 12),
                                 dtype=np.int8))
    w3 = jnp.asarray(rng.integers(-8, 8, size=(3, 3, 12, 16), dtype=np.int8))
    b = jnp.asarray(rng.integers(-128, 128, size=(16,), dtype=np.int8))
    for xv, yv in ((True, False), (False, True), (True, True)):
        out = pallas_conv.conv3x3_s1_int8_flat(x, w3, b, tx=8, x_valid=xv,
                                               y_valid=yv, interpret=True)
        acc = lax.conv_general_dilated(
            x, w3, (1, 1), [(0, 0) if xv else (1, 1),
                            (0, 0) if yv else (1, 1)],
            dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
        ref = bias_relu_epilogue(acc, b)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_conv2d_deconv2d_pallas2_match_golden(rng):
    x = rng.integers(0, 256, size=(1, 16, 12, 3), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(8, 5, 5, 3), dtype=np.int8)
    b = rng.integers(-128, 128, size=(8,), dtype=np.int8)
    golden = integer.conv2d_golden(x, w, b)
    out = pallas_conv.conv2d_int8_pallas2(jnp.asarray(x.view(np.int8)),
                                          jnp.asarray(w), jnp.asarray(b),
                                          tx=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), golden)

    xd = (rng.integers(0, 128, size=(1, 8, 6, 4), dtype=np.uint8))
    wd = rng.integers(-8, 8, size=(6, 5, 5, 4), dtype=np.int8)
    bd = rng.integers(-128, 128, size=(6,), dtype=np.int8)
    golden = integer.deconv2d_golden(xd, wd, bd)
    out = pallas_conv.deconv2d_int8_pallas2(jnp.asarray(xd.view(np.int8)),
                                            jnp.asarray(wd), jnp.asarray(bd),
                                            tx=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_conv2d_pallas3_sparse_matches_golden(rng):
    """Block-sparse tap kernel (25 real taps): exact vs scalar golden."""
    x = rng.integers(0, 256, size=(2, 32, 24, 128), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(192, 5, 5, 128), dtype=np.int8)
    b = rng.integers(-128, 128, size=(192,), dtype=np.int8)
    golden = integer.conv2d_golden(x, w, b)
    out = pallas_conv.conv2d_int8_pallas3(jnp.asarray(x.view(np.int8)),
                                          jnp.asarray(w), jnp.asarray(b),
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_deconv2d_pallas3_sparse_matches_golden(rng):
    """Output-phase-blocked sparse deconv (9/6/6/4 taps): exact, incl.
    the lane-padded ci=192 contraction."""
    x = rng.integers(0, 128, size=(2, 16, 8, 192), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(128, 5, 5, 192), dtype=np.int8)
    b = rng.integers(-128, 128, size=(128,), dtype=np.int8)
    golden = integer.deconv2d_golden(x, w, b)
    out = pallas_conv.deconv2d_int8_pallas3(jnp.asarray(x.view(np.int8)),
                                            jnp.asarray(w), jnp.asarray(b),
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_pallas3_valid_modes(rng):
    """Sparse kernels with pre-haloed inputs (sharded-net form)."""
    from simple_image_compression_network_tpu.ops import conv_int
    # conv: input with 2-px halo on both axes; expect k5/s2 SAME == crop
    x = rng.integers(0, 256, size=(2, 36, 28, 128), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(128, 5, 5, 128), dtype=np.int8)
    b = rng.integers(-128, 128, size=(128,), dtype=np.int8)
    full = integer.conv2d_golden(x, w, b)        # (2, 18, 14, 128)
    got = pallas_conv.conv2d_int8_pallas3(
        jnp.asarray(x.view(np.int8)), jnp.asarray(w), jnp.asarray(b),
        x_valid=True, y_valid=True, interpret=True)
    # the haloed input's interior (1 s2d row in) equals SAME-pad rows 1..-1
    np.testing.assert_array_equal(np.asarray(got), full[:, 1:-1, 1:-1])

    # deconv: 1-px halo input
    xd = rng.integers(0, 128, size=(2, 18, 10, 128), dtype=np.uint8)
    wd = rng.integers(-8, 8, size=(128, 5, 5, 128), dtype=np.int8)
    bd = rng.integers(-128, 128, size=(128,), dtype=np.int8)
    fulld = integer.deconv2d_golden(xd, wd, bd)  # (2, 36, 20, 128)
    gotd = pallas_conv.deconv2d_int8_pallas3(
        jnp.asarray(xd.view(np.int8)), jnp.asarray(wd), jnp.asarray(bd),
        x_valid=True, y_valid=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(gotd), fulld[:, 2:-2, 2:-2])
