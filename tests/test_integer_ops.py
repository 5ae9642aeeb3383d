"""Golden-model self-consistency: wide accumulation == wrapping accumulation.

The reference accumulates MACs in an int8 that wraps after every add
(conv.hpp:110-117).  The whole TPU build rests on the equivalence
wide-acc-then-wrap == wrap-every-step (associativity mod 256) and on the
uint8/int8 reinterpretation being mod-256-invariant; property-test both here.
"""

import numpy as np

from simple_image_compression_network_tpu.ops import integer


def test_wrap_to_int8_range():
    acc = np.arange(-1000, 1000, dtype=np.int64)
    w = integer.wrap_to_int8(acc)
    assert w.dtype == np.int8
    np.testing.assert_array_equal(w.astype(np.int64) % 256, acc % 256)


def test_wide_acc_equals_wrapping_acc(rng):
    # Small conv, exhaustive elementwise comparison vs the literal
    # wrap-every-MAC transcription.
    x = rng.integers(0, 256, size=(1, 8, 6, 3), dtype=np.uint8)
    w = rng.integers(-8, 8, size=(4, 5, 5, 3), dtype=np.int8)
    b = rng.integers(-128, 128, size=(4,), dtype=np.int8)
    fast = integer.conv2d_golden(x, w, b, stride=2, padding=2)
    slow = integer.conv2d_golden_wrapping_acc(x, w, b, stride=2, padding=2)
    np.testing.assert_array_equal(fast, slow)


def test_uint8_int8_reinterpretation_invariance(rng):
    # Products w*x change by multiples of 256 when x>=128 is reinterpreted
    # as negative int8 — the wrapped accumulator must not change.
    x = rng.integers(0, 256, size=(1, 8, 8, 5), dtype=np.uint8)
    xi = x.view(np.int8)
    w = rng.integers(-8, 8, size=(7, 5, 5, 5), dtype=np.int8)
    b = rng.integers(-128, 128, size=(7,), dtype=np.int8)
    ref = integer.conv2d_golden(x, w, b)
    # same computation but accumulating signed-reinterpreted activations
    n, ix, iy, ci = x.shape
    p, s, k, o = 2, 2, 5, 7
    xp = np.zeros((n, ix + 2 * p, iy + 2 * p, ci), np.int64)
    xp[:, p:p + ix, p:p + iy, :] = xi.astype(np.int64)
    ox, oy = (ix + 2 * p - k) // s + 1, (iy + 2 * p - k) // s + 1
    acc = np.zeros((n, ox, oy, o), np.int64)
    for kx in range(k):
        for ky in range(k):
            acc += np.einsum("nxyc,oc->nxyo",
                             xp[:, kx:kx + s * ox:s, ky:ky + s * oy:s, :],
                             w[:, kx, ky, :].astype(np.int64))
    out = integer.bias_relu_epilogue(acc, b)
    np.testing.assert_array_equal(ref, out)


def test_bias_relu_epilogue_wraps_and_clamps():
    acc = np.array([0, 127, 128, 255, 256, -1, -128, -129, 1000], np.int64)
    b = np.zeros(acc.shape, np.int8)
    out = integer.bias_relu_epilogue(acc, b)
    # 128 wraps to -128 -> ReLU 0; 255 -> -1 -> 0; 256 -> 0; -129 -> +127
    # survives ReLU; 1000 -> -24 -> 0
    np.testing.assert_array_equal(out, [0, 127, 0, 0, 0, 0, 0, 127, 0])
    # bias add itself wraps: 127 + 1 -> -128 -> 0
    out2 = integer.bias_relu_epilogue(np.array([127], np.int64),
                                      np.array([1], np.int8))
    np.testing.assert_array_equal(out2, [0])


def test_zero_insert_upsample_positions(rng):
    x = rng.integers(0, 256, size=(1, 3, 4, 2), dtype=np.uint8)
    up = integer.zero_insert_upsample(x)
    assert up.shape == (1, 2 * 3 + 4, 2 * 4 + 4, 2)
    # nonzeros exactly at (2 + 2i, 2 + 2j)
    for i in range(3):
        for j in range(4):
            np.testing.assert_array_equal(up[0, 2 + 2 * i, 2 + 2 * j], x[0, i, j])
    mask = np.zeros_like(up, bool)
    mask[:, 2:2 + 6:2, 2:2 + 8:2, :] = True
    assert (up[~mask] == 0).all()
