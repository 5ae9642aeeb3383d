"""Capability-parity ops: pooling, depthwise, FC, thresholds, TMR."""

import numpy as np
import jax.numpy as jnp

from simple_image_compression_network_tpu.ops import nn, tmr, integer


def test_maxpool2d(rng):
    x = rng.integers(-128, 128, size=(1, 8, 8, 4), dtype=np.int8)
    out = np.asarray(nn.maxpool2d(jnp.asarray(x), 2))
    assert out.shape == (1, 4, 4, 4)
    ref = x.reshape(1, 4, 2, 4, 2, 4).max(axis=(2, 4))
    np.testing.assert_array_equal(out, ref)


def test_maxpool1d_and_binary(rng):
    x = rng.integers(0, 2, size=(1, 8, 3), dtype=np.int8)
    out = np.asarray(nn.maxpool1d(jnp.asarray(x), 2))
    np.testing.assert_array_equal(out, x.reshape(1, 4, 2, 3).max(2))
    x2 = rng.integers(0, 2, size=(1, 4, 4, 2), dtype=np.uint8)
    outb = np.asarray(nn.binary_maxpool2d(jnp.asarray(x2), 2))
    np.testing.assert_array_equal(outb, x2.reshape(1, 2, 2, 2, 2, 2)
                                  .max(axis=(2, 4)))


def test_avgpool_quant_and_accpool(rng):
    x = rng.integers(0, 100, size=(1, 4, 4, 2), dtype=np.int8)
    out = np.asarray(nn.avgpool2d_quant(jnp.asarray(x), 2, shift=2))
    ref = x.astype(np.int64).reshape(1, 2, 2, 2, 2, 2).sum(axis=(2, 4)) >> 2
    np.testing.assert_array_equal(out, ref)
    acc = np.asarray(nn.accpool(jnp.asarray(x)))
    np.testing.assert_array_equal(acc, x.astype(np.int64).sum((1, 2)))


def test_label_select(rng):
    x = jnp.asarray([[3, 9, 1, 7], [0, -1, 5, 2]], jnp.int32)
    idx = np.asarray(nn.label_select(x, 2))
    np.testing.assert_array_equal(idx, [[1, 3], [2, 3]])


def test_depthwise_conv_matches_scalar(rng):
    x = rng.integers(0, 256, size=(1, 6, 6, 3), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(3, 3, 3), dtype=np.int8)
    b = rng.integers(-128, 128, size=(3,), dtype=np.int8)
    out = np.asarray(nn.depthwise_conv2d_int8(
        jnp.asarray(x.view(np.int8)), jnp.asarray(w), jnp.asarray(b),
        stride=1, padding=1))
    # scalar golden (dwsconv semantics, conv.hpp:127-176)
    xp = np.zeros((8, 8, 3), np.int64)
    xp[1:7, 1:7] = x[0]
    acc = np.zeros((6, 6, 3), np.int64)
    for kx in range(3):
        for ky in range(3):
            acc += xp[kx:kx + 6, ky:ky + 6] * w[:, kx, ky].T.astype(np.int64)
    ref = integer.bias_relu_epilogue(acc[None], b)
    np.testing.assert_array_equal(out, ref)


def test_fc_int8_wrap(rng):
    x = rng.integers(0, 256, size=(2, 16), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(5, 16), dtype=np.int8)
    b = rng.integers(-128, 128, size=(5,), dtype=np.int8)
    out = np.asarray(nn.fc_int8(jnp.asarray(x.view(np.int8)), jnp.asarray(w),
                                jnp.asarray(b)))
    acc = x.astype(np.int64) @ w.astype(np.int64).T
    ref = integer.bias_relu_epilogue(acc, b)
    np.testing.assert_array_equal(out, ref)


def test_threshold_activation():
    x = jnp.asarray([[-5, 0, 3, 100]], jnp.int32).T  # (4,1)
    th = jnp.asarray([[0, 2, 50]], jnp.int32)        # C=1, T=3
    out = np.asarray(nn.threshold_activation(x, th))
    np.testing.assert_array_equal(out[:, 0], [0, 1, 2, 3])


def test_add_streams_wraps():
    a = jnp.asarray([100, -100], jnp.int8)
    b = jnp.asarray([100, -100], jnp.int8)
    out = np.asarray(nn.add_streams(a, b))
    np.testing.assert_array_equal(out, [-56, 56])  # 200-256, -200+256


def test_tmr_vote_and_flags(rng):
    x = rng.integers(0, 256, size=(1, 8, 8, 3), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(4, 5, 5, 3), dtype=np.int8)
    b = rng.integers(-128, 128, size=(4,), dtype=np.int8)
    clean = integer.conv2d_golden(x, w, b)
    voted, err = tmr.conv2d_int8_tmr(jnp.asarray(w), jnp.asarray(b),
                                     jnp.asarray(x.view(np.int8)))
    np.testing.assert_array_equal(np.asarray(voted), clean)
    assert int(err) == 0
    # inject a single-replica fault: still corrected, flag LSB set
    mask = np.zeros((1, 4, 4, 12), np.int32)
    mask[0, 1, 1, 0] = 0x7F  # flip bits of replica 0 of channel 0
    voted2, err2 = tmr.conv2d_int8_tmr(jnp.asarray(w), jnp.asarray(b),
                                       jnp.asarray(x.view(np.int8)),
                                       fault_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(voted2), clean)
    assert int(err2) == 1
    # all-three-distinct fault: MSB set
    mask3 = np.zeros((1, 4, 4, 12), np.int32)
    mask3[0, 0, 0, 3] = 0x11
    mask3[0, 0, 0, 4] = 0x22
    voted3, err3 = tmr.conv2d_int8_tmr(jnp.asarray(w), jnp.asarray(b),
                                       jnp.asarray(x.view(np.int8)),
                                       fault_mask=jnp.asarray(mask3))
    assert int(err3) & 2


def test_xnor_popcount_fc(rng):
    x = rng.integers(0, 2, size=(2, 16)).astype(np.int8)
    w = rng.integers(0, 2, size=(3, 16)).astype(np.int8)
    out = np.asarray(nn.xnor_popcount_fc(jnp.asarray(x), jnp.asarray(w)))
    ref = np.array([[np.sum(x[i] == w[j]) for j in range(3)]
                    for i in range(2)])
    np.testing.assert_array_equal(out, ref)
    signed = np.asarray(nn.binary_fc(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_array_equal(signed, 2 * ref - 16)
