"""JAX integer conv / transposed-conv with the reference's exact wrap semantics.

These are the XLA-native compute ops for the bit-exact decode path: int8xint8
convolutions accumulated in int32 on the MXU, then wrapped mod 256 and passed
through the bias+MSB-ReLU epilogue.  Bit-exact to ``ops.integer`` goldens
(and hence to the reference HLS pipeline, ``conv_nonsquare_top.cpp:216-280``
and ``:82-195``); the equivalence argument is documented in ``ops/integer.py``.

Activations are carried as int8.  The raw image input (uint8 0..255) must be
bitcast to int8 first (``to_wire_int8``) — mod 256 this changes nothing.

Weights: ``(O, kx, ky, I)`` int8 holding int4 values, converted internally to
HWIO ``(kx, ky, I, O)`` for ``lax.conv_general_dilated``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# N,X,Y,C feature maps; kx,ky,I,O kernels.  H==x, W==y (see config.py).
DIMNUMS = ("NHWC", "HWIO", "NHWC")


def to_wire_int8(x: jax.Array) -> jax.Array:
    """Bitcast uint8 wire activations to int8 (mod-256-preserving)."""
    if x.dtype == jnp.uint8:
        return lax.bitcast_convert_type(x, jnp.int8)
    return x.astype(jnp.int8)


def wrap_to_int8(acc: jax.Array) -> jax.Array:
    """Wrap int32 mod 256 into int8 — the 8-bit accumulator semantics."""
    return (((acc & 0xFF) ^ 0x80) - 0x80).astype(jnp.int8)


def bias_relu_epilogue(acc: jax.Array, bias: jax.Array) -> jax.Array:
    """wrap(acc + bias) then MSB-ReLU (conv_nonsquare_top.cpp:267-278)."""
    out = wrap_to_int8(acc + bias.astype(jnp.int32))
    return jnp.maximum(out, 0)


def _w_hwio(w: jax.Array) -> jax.Array:
    return jnp.transpose(w.astype(jnp.int8), (1, 2, 3, 0))


def conv2d_int8_acc(x: jax.Array, w: jax.Array, *, stride: int = 2,
                    padding: int = 2) -> jax.Array:
    """Strided conv, int32 accumulator, no epilogue.  x int8 NXYC."""
    return lax.conv_general_dilated(
        x.astype(jnp.int8), _w_hwio(w),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMNUMS,
        preferred_element_type=jnp.int32)


def conv2d_int8(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                stride: int = 2, padding: int = 2) -> jax.Array:
    """The reference's conv2d layer (conv_nonsquare_top.cpp:216-280), int8->int8."""
    return bias_relu_epilogue(conv2d_int8_acc(x, w, stride=stride,
                                              padding=padding), bias)


def conv2d_int8_f32(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                    stride: int = 2, padding: int = 2) -> jax.Array:
    """The conv2d layer computed in f32 — bit-exact by range analysis.

    Every partial sum is an integer with |acc| <= K * 128 * 128 (int8
    minima are -128 for both operands; layer 0: 75 taps -> < 2^21), so
    f32 (24-bit mantissa) represents the accumulation exactly and the
    rounded i32 equals the int path.  XLA's f32 conv handles tiny channel
    counts (the RGB input layer) with its image-layer path instead of
    padding C=3 to 128 int8 lanes.
    """
    k = w.shape[1]
    assert k * k * w.shape[3] * 128 * 128 <= (1 << 24)
    acc = lax.conv_general_dilated(
        x.astype(jnp.int8).astype(jnp.float32),
        _w_hwio(w).astype(jnp.float32),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMNUMS,
        preferred_element_type=jnp.float32)
    return bias_relu_epilogue(acc.astype(jnp.int32), bias)


def conv2d_int8_dilated(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                        stride: int = 1, padding: int = 0,
                        dilation: tuple = (2, 1)) -> jax.Array:
    """Dilated conv with the exact integer contract (rhs_dilation on MXU).

    TPU counterpart of ``ConvolutionInputGenerator_NonSquare_Dilated``
    (/root/reference/slidingwindow.h:1529-1631): kernel taps stride by
    ``dilation`` over the input.  Golden: ``integer.conv2d_golden_dilated``.
    """
    acc = lax.conv_general_dilated(
        x.astype(jnp.int8), _w_hwio(w),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=dilation,
        dimension_numbers=DIMNUMS,
        preferred_element_type=jnp.int32)
    return bias_relu_epilogue(acc, bias)


def deconv2d_int8_acc(x: jax.Array, w: jax.Array, *, stride: int = 2,
                      padding: int = 2) -> jax.Array:
    """deconv522 accumulator via lhs-dilated conv.

    The reference expands the input by zero-insertion (2D-1), one appended
    zero row/col (2D), and an outer pad of k-p-1=2 (2D+4), then runs a VALID
    stride-1 5x5 conv (``conv_nonsquare_top.cpp:110-181``).  That is exactly
    ``lhs_dilation=2`` with asymmetric padding (2, 3): dilated extent 2D-1,
    left pad 2, right pad 3.
    """
    k = w.shape[1]
    lo = k - padding - 1          # 2
    hi = lo + (stride - 1)        # 3: the appended zero row/col
    return lax.conv_general_dilated(
        x.astype(jnp.int8), _w_hwio(w),
        window_strides=(1, 1),
        padding=[(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMNUMS,
        preferred_element_type=jnp.int32)


def deconv2d_int8(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                  stride: int = 2, padding: int = 2) -> jax.Array:
    """The reference's deconv522 layer (conv_nonsquare_top.cpp:82-195)."""
    return bias_relu_epilogue(deconv2d_int8_acc(x, w, stride=stride,
                                                padding=padding), bias)


def deconv2d_int8_acc_phased(x: jax.Array, w: jax.Array, *, stride: int = 2,
                             padding: int = 2) -> jax.Array:
    """deconv522 accumulator via sub-pixel (phase) decomposition — the fast path.

    lhs-dilation makes 3/4 of the conv input zeros; the MXU then burns 4x the
    needed FLOPs.  Instead split the k5 s2 transposed conv into the 4 output
    phases (px, py) in {0,1}^2: output pixel (2i+px, 2j+py) only sees input
    taps where the dilated index aligns, i.e. kernel taps with
    (kx % 2) == ((px + k - padding - 1) % 2).  Each phase is a small stride-1
    conv (3x3 or 3x2/2x3/2x2 taps); the phases are interleaved back with a
    reshape (depth-to-space).  Bit-identical to ``deconv2d_int8_acc``.
    """
    n, ix, iy, ci = x.shape
    o, k, _, _ = w.shape
    lo = k - padding - 1  # left pad of the dilated buffer
    xi8 = x.astype(jnp.int8)
    w8 = w.astype(jnp.int8)

    # Padded dilated buffer index: u = lo + 2*i  holds x[i].
    # Output pixel X = 2*a + px (a in [0, ix)) reads taps u = X + kx.
    # X + kx = lo + 2*i  =>  kx ≡ (lo - px) mod 2, i = (2a + px + kx - lo)/2.
    outs = []
    for px in range(stride):
        row = []
        for py in range(stride):
            kxs = [kx for kx in range(k) if (kx - (lo - px)) % 2 == 0]
            kys = [ky for ky in range(k) if (ky - (lo - py)) % 2 == 0]
            # i offsets: i = a + (px + kx - lo)/2 ; collect the tap range.
            di = [(px + kx - lo) // 2 for kx in kxs]
            dj = [(py + ky - lo) // 2 for ky in kys]
            # Build a dense sub-kernel over the offset ranges and let one
            # conv handle it: sub-kernel tap (ii, jj) maps to w[kx, ky].
            pad_x = (-min(di), max(di))
            pad_y = (-min(dj), max(dj))
            sub = jnp.zeros((len(set(di)), len(set(dj)), ci, o), jnp.int8)
            for a, kx in zip(di, kxs):
                for b, ky in zip(dj, kys):
                    sub = sub.at[a - min(di), b - min(dj)].set(
                        jnp.transpose(w8[:, kx, ky, :], (1, 0)))
            acc = lax.conv_general_dilated(
                xi8, sub, window_strides=(1, 1),
                padding=[pad_x, pad_y],
                dimension_numbers=DIMNUMS,
                preferred_element_type=jnp.int32)
            row.append(acc)
        outs.append(row)
    # Interleave phases: out[2a+px, 2b+py] = outs[px][py][a, b].
    stacked = jnp.stack([jnp.stack(r, axis=0) for r in outs], axis=0)
    # (px, py, n, ix, iy, o) -> (n, ix, px, iy, py, o) -> (n, 2ix, 2iy, o)
    stacked = jnp.transpose(stacked, (2, 3, 0, 4, 1, 5))
    return stacked.reshape(n, stride * ix, stride * iy, o)


def deconv2d_int8_phased(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                         stride: int = 2, padding: int = 2) -> jax.Array:
    return bias_relu_epilogue(
        deconv2d_int8_acc_phased(x, w, stride=stride, padding=padding), bias)
