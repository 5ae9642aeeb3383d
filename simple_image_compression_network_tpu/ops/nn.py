"""Capability-parity NN ops beyond the 8-layer model's conv/deconv.

The reference library (FINN hlslib) ships more kernels than the codec uses;
each gets a TPU-native equivalent here so a user of the reference finds the
same toolbox (SURVEY.md §2.1):

* pooling family            (``maxpool.h:66-577``, ``pool.hpp:59-226``)
* depthwise conv / VVAU     (``vvau.hpp:85-154``)
* fully-connected layer     (``fclayer.h:94-111``)
* threshold activations     (``activations.hpp:143-190``)
* channel-wise affine ops   (``activations.hpp:208-224``)
* top-K label select        (``maxpool.h:449-501``)
* stream utils: residual add, duplicate, cast
                            (``streamtools.h:617-762``)

All integer ops keep the library's exact semantics: int32 accumulation is
wrapped to the 8-bit activation type via ``wrap_to_int8`` where the reference
accumulates in the output type.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .conv_int import DIMNUMS, bias_relu_epilogue, wrap_to_int8


# ---------------------------------------------------------------------------
# Pooling (maxpool.h, pool.hpp)
# ---------------------------------------------------------------------------

def maxpool2d(x: jax.Array, k: int, stride: int | None = None) -> jax.Array:
    """Precision maxpool (StreamingMaxPool_Precision_Batch, maxpool.h:140-219).

    x: (N, X, Y, C); window k x k, stride defaults to k (the reference pools
    non-overlapping windows).
    """
    s = stride or k
    init = (jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
            if jnp.issubdtype(x.dtype, jnp.integer)
            else jnp.asarray(-jnp.inf, x.dtype))
    return lax.reduce_window(x, init, lax.max, (1, k, k, 1), (1, s, s, 1),
                             "VALID")


def maxpool1d(x: jax.Array, k: int) -> jax.Array:
    """1-D precision maxpool (StreamingMaxPool_Precision_Batch_1d,
    maxpool.h:242-314).  x: (N, L, C)."""
    init = (jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
            if jnp.issubdtype(x.dtype, jnp.integer)
            else jnp.asarray(-jnp.inf, x.dtype))
    return lax.reduce_window(x, init, lax.max, (1, k, 1), (1, k, 1), "VALID")


def binary_maxpool2d(x: jax.Array, k: int) -> jax.Array:
    """Binary OR-maxpool (StreamingMaxPool_Batch, maxpool.h:66-118): the
    window reduction is a logical OR over 1-bit activations."""
    return maxpool2d((x != 0).astype(jnp.uint8), k).astype(x.dtype)


def avgpool2d_quant(x: jax.Array, k: int, *, shift: int = 0) -> jax.Array:
    """Quantized average pool (QuantAvgPoolFunction, pool.hpp:190-226):
    integer sum over the window followed by an arithmetic right-shift."""
    s = lax.reduce_window(x.astype(jnp.int32), 0, lax.add, (1, k, k, 1),
                          (1, k, k, 1), "VALID")
    return s >> shift


def accpool(x: jax.Array) -> jax.Array:
    """Accumulate-pool (AccPool_Batch, maxpool.h:388-423): per-channel sum
    over all spatial positions.  x: (N, X, Y, C) -> (N, C) int32."""
    return jnp.sum(x.astype(jnp.int32), axis=(1, 2))


def relu_batch(x: jax.Array) -> jax.Array:
    """Standalone ReLU layer (ReLU_Batch, maxpool.h:337-366)."""
    return jnp.maximum(x, 0)


def label_select(x: jax.Array, k: int) -> jax.Array:
    """Top-K label select (LabelSelect_Batch, maxpool.h:449-501):
    x (N, C) scores -> (N, K) indices of the K largest, descending."""
    _, idx = lax.top_k(x, k)
    return idx


# ---------------------------------------------------------------------------
# Depthwise conv / VVAU (vvau.hpp)
# ---------------------------------------------------------------------------

def depthwise_conv2d_int8(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                          stride: int = 1, padding: int = 0) -> jax.Array:
    """Vector_Vector_Activate_Batch equivalent (vvau.hpp:85-154): each channel
    convolved with its own k x k filter, int32 accumulate, wrap/bias/ReLU
    epilogue (same integer contract as the MVAU path).

    x: (N, X, Y, C) int8; w: (C, k, k) int8; bias: (C,) int8.
    """
    c, k, _ = w.shape
    wk = jnp.transpose(w.astype(jnp.int8), (1, 2, 0)).reshape(k, k, 1, c)
    acc = lax.conv_general_dilated(
        x.astype(jnp.int8), wk, (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=DIMNUMS, feature_group_count=c,
        preferred_element_type=jnp.int32)
    return bias_relu_epilogue(acc, bias)


# ---------------------------------------------------------------------------
# Fully-connected layer (fclayer.h)
# ---------------------------------------------------------------------------

def fc_int8(x: jax.Array, w: jax.Array, bias: jax.Array | None = None, *,
            relu: bool = True) -> jax.Array:
    """StreamingFCLayer_Batch equivalent (fclayer.h:94-111): W @ x with the
    MVAU's integer semantics.  x: (N, K) int8; w: (O, K) int8."""
    acc = lax.dot_general(x.astype(jnp.int8), w.astype(jnp.int8),
                          dimension_numbers=(((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.int32)
    if bias is None:
        return wrap_to_int8(acc)
    out = wrap_to_int8(acc + bias.astype(jnp.int32))
    return jnp.maximum(out, 0) if relu else out


# ---------------------------------------------------------------------------
# Threshold activations (activations.hpp)
# ---------------------------------------------------------------------------

def threshold_activation(x: jax.Array, thresholds: jax.Array) -> jax.Array:
    """Multi-threshold quantized activation (ThresholdsActivation,
    activations.hpp:168-190 / Thresholding_Batch :246-284): the output is the
    number of thresholds the accumulator meets or exceeds.

    x: (..., C) int; thresholds: (C, T) int (per-channel, ascending).
    Returns uint8 counts in [0, T].
    """
    return jnp.sum(x[..., None] >= thresholds, axis=-1).astype(jnp.uint8)


def channelwise_op(x: jax.Array, params: jax.Array, op: str = "add"
                   ) -> jax.Array:
    """Per-channel affine op (ChannelWiseOperation, activations.hpp:208-224)."""
    if op == "add":
        return wrap_to_int8(x.astype(jnp.int32) + params.astype(jnp.int32))
    if op == "mul":
        return wrap_to_int8(x.astype(jnp.int32) * params.astype(jnp.int32))
    raise ValueError(op)


# ---------------------------------------------------------------------------
# Binary / XNOR algebra (interpret.hpp:57-108) — BNN capability parity
# ---------------------------------------------------------------------------

def xnor_popcount_fc(x_bits: jax.Array, w_bits: jax.Array) -> jax.Array:
    """Binary GEMV via XNOR-popcount (XnorMul semantics, interpret.hpp:57-79).

    Bits encode {-1,+1} as {0,1}; the MAC counts agreements:
    out = sum XNOR(x, w) = K - popcount(x ^ w).  x: (N, K) {0,1};
    w: (O, K) {0,1} -> (N, O) int32 agreement counts.
    """
    k = x_bits.shape[-1]
    xs = x_bits.astype(jnp.int32) * 2 - 1
    ws = w_bits.astype(jnp.int32) * 2 - 1
    pm = lax.dot_general(xs, ws, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.int32)
    return (pm + k) // 2


def binary_fc(x_bits: jax.Array, w_bits: jax.Array) -> jax.Array:
    """±1 binary matmul (Binary recast, interpret.hpp:81-108): returns the
    signed dot product in int32."""
    xs = x_bits.astype(jnp.int8) * 2 - 1
    ws = w_bits.astype(jnp.int8) * 2 - 1
    return lax.dot_general(xs, ws, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.int32)


# ---------------------------------------------------------------------------
# Stream utilities (streamtools.h) — the FIFO fabric becomes plain jnp
# ---------------------------------------------------------------------------

def add_streams(a: jax.Array, b: jax.Array) -> jax.Array:
    """AddStreams_Batch (streamtools.h:675-724): elementwise int add of two
    activations with output-type wrap — the residual-connection primitive."""
    return wrap_to_int8(a.astype(jnp.int32) + b.astype(jnp.int32))


def duplicate_streams(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """DuplicateStreams_Batch (streamtools.h:617-651): fan-out for bypass
    paths.  On TPU this is free — XLA shares the value."""
    return x, x


def streaming_cast(x: jax.Array, dtype) -> jax.Array:
    """StreamingCast (streamtools.h:232-237)."""
    return x.astype(dtype)
