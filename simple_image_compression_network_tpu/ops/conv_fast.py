"""MXU-shaped rewrites of the k5/s2/p2 conv and transposed conv.

Same integers, better hardware mapping.  XLA's TPU int8 convolutions handle
3x3 stride-1 shapes far better than 5x5 stride-2 (and collapse entirely for
3-channel tensors), so both layer types are rewritten around stride-1 3x3
convs with channel dims that are multiples of the input channel count x4:

* Strided conv (``conv2d_int8_s2d``): a 5x5/s2/p2 conv equals a 3x3/s1/p1
  conv over the space-to-depth input.  With ``u = 2i + kx - 2`` and phase
  ``a = kx mod 2``, ``kx = 2*mx + a`` gives
  ``out[i,j,o] = sum w[o,2mx+a,2my+b,c] * phase_ab[i+mx-1, j+my-1, c]``
  where ``phase_ab[v,w,c] = x[2v+a, 2w+b, c]``.  The (mx=2, a=1) taps don't
  exist in a 5-tap kernel and are zero-filled.

* Transposed conv (``deconv2d_int8_d2s``): the 4 output phases of deconv522
  (zero-insertion algebra of ``conv_nonsquare_top.cpp:94-156``) are each a
  stride-1 conv of the *un*-dilated input with tap offsets in {-1,0,1}; one
  3x3/s1/p1 conv with 4*Cout output channels computes all phases, and a
  depth-to-space reshuffle interleaves them.  Output phase (px,py) at
  (2i+px, 2j+py) reads input (i + (px+kx-2)/2) for kx = 2 - px mod 2 ...
  concretely: tap offset d = (px + kx - 2)/2 for the kx with matching parity.

Both are bit-exact to ``ops.conv_int`` / the NumPy goldens (tested), since
they compute the identical sum of products before the identical epilogue.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .conv_int import DIMNUMS, bias_relu_epilogue


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, 2V, 2W, C) -> (B, V, W, 4C) with xs[v,w,(a,b,c)] = x[2v+a, 2w+b, c]."""
    b, x2, y2, c = x.shape
    v, w = x2 // 2, y2 // 2
    return (x.reshape(b, v, 2, w, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, v, w, 4 * c))


def depth_to_space(y: jax.Array) -> jax.Array:
    """(B, V, W, 4C) -> (B, 2V, 2W, C): inverse of space_to_depth."""
    b, v, w, c4 = y.shape
    c = c4 // 4
    return (y.reshape(b, v, w, 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, 2 * v, 2 * w, c))


def conv_weights_s2d(w: np.ndarray | jax.Array) -> jax.Array:
    """[O, kx, ky, I] 5x5 kernel -> 3x3 HWIO kernel over s2d channels.

    W3[mx, my, (a,b,c), o] = w[o, 2mx+a, 2my+b, c]; taps with 2m+phase > 4
    are zero.
    """
    w = jnp.asarray(w, jnp.int8)
    o, k, _, ci = w.shape
    assert k == 5
    w3 = jnp.zeros((3, 3, 4 * ci, o), jnp.int8)
    for mx in range(3):
        for a in range(2):
            kx = 2 * mx + a
            if kx >= k:
                continue
            for my in range(3):
                for b in range(2):
                    ky = 2 * my + b
                    if ky >= k:
                        continue
                    g = (a * 2 + b) * ci
                    w3 = w3.at[mx, my, g:g + ci, :].set(
                        jnp.transpose(w[:, kx, ky, :], (1, 0)))
    return w3


def conv2d_int8_s2d_acc(x: jax.Array, w3: jax.Array) -> jax.Array:
    """5x5/s2/p2 conv accumulator via one 3x3/s1/p1 conv over s2d(x).

    w3 must come from ``conv_weights_s2d``.
    """
    xs = space_to_depth(x.astype(jnp.int8))
    return lax.conv_general_dilated(
        xs, w3, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)


def conv2d_int8_s2d(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    return bias_relu_epilogue(conv2d_int8_s2d_acc(x, conv_weights_s2d(w)), bias)


def deconv_weights_d2s(w: np.ndarray | jax.Array) -> jax.Array:
    """[O, kx, ky, I] 5x5 deconv kernel -> 3x3 HWIO kernel with 4O outputs.

    Output phase (px,py) at global (2i+px): contributing kernel taps kx
    satisfy kx ≡ (2 - px) mod 2 with input offset d = (px + kx - 2)/2
    (see conv_int.deconv2d_int8_acc_phased).  K3[d+1, e+1, c, (px,py,o)]
    = w[o, kx, ky, c]; phases with only 2 valid offsets get a zero tap.
    """
    w = jnp.asarray(w, jnp.int8)
    o, k, _, ci = w.shape
    assert k == 5
    lo = 2  # k - padding - 1
    w3 = jnp.zeros((3, 3, ci, 4 * o), jnp.int8)
    for px in range(2):
        for py in range(2):
            for kx in range(k):
                if (kx - (lo - px)) % 2:
                    continue
                d = (px + kx - lo) // 2
                for ky in range(k):
                    if (ky - (lo - py)) % 2:
                        continue
                    e = (py + ky - lo) // 2
                    g = (px * 2 + py) * o
                    w3 = w3.at[d + 1, e + 1, :, g:g + o].set(
                        jnp.transpose(w[:, kx, ky, :], (1, 0)))
    return w3


def deconv2d_int8_d2s_acc(x: jax.Array, w3: jax.Array) -> jax.Array:
    """deconv522 accumulator via one 3x3/s1/p1 conv producing all 4 phases."""
    y = lax.conv_general_dilated(
        x.astype(jnp.int8), w3, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
    return depth_to_space(y)


def deconv2d_int8_d2s(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """Epilogue runs on the PHASE-FORM (V, W, 4*O) accumulator, then
    depth-to-space moves int8: for the RGB output layer (O=3) the d2s'd
    tensor has a 3-lane channel dim, so an epilogue after d2s wastes
    125/128 vector lanes and shuffles i32 instead of i8 — measured as
    ~2/3 of the whole layer's time (scripts/profile_l0l7.py).  The
    per-channel bias tiles across the 4 phase blocks (phase-major column
    order of ``deconv_weights_d2s``); the wrap/MSB-ReLU epilogue is
    elementwise, so reordering it before the spatial interleave is
    bit-exact."""
    y = lax.conv_general_dilated(
        x.astype(jnp.int8), deconv_weights_d2s(w), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=DIMNUMS,
        preferred_element_type=jnp.int32)
    bias12 = jnp.tile(jnp.asarray(bias), 4)
    return depth_to_space(bias_relu_epilogue(y, bias12))


def depth_to_space4(y: jax.Array) -> jax.Array:
    """(B, V, W, 16C) -> (B, 4V, 4W, C): inverse of space_to_depth4."""
    b, v, w, c16 = y.shape
    c = c16 // 16
    return (y.reshape(b, v, w, 4, 4, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, 4 * v, 4 * w, c))


def deconv_weights_s2dtail(w: np.ndarray | jax.Array) -> jax.Array:
    """[O, 5, 5, I] deconv kernel -> 3x3 HWIO kernel consuming the
    UPSTREAM deconv's phase form: input channels (rx, ry, c) are the
    s2d cells of this layer's input, output channels (ax, ay, o) the
    4x4 fine offsets of its output.

    With input fine index 2u+r and output 4v+a, the deconv relation
    o_g = 2*i_f + 2 - kx (``deconv_weights_d2s`` orientation) gives
    kx = 4*(u-v) + 2r + 2 - a, valid when 0 <= kx < 5 — at most 3 coarse
    taps per dim, so one 3x3/s1/p1 conv with K = 4I, N = 16O computes
    the whole layer on the coarse grid."""
    w = jnp.asarray(w, jnp.int8)
    o, k, _, ci = w.shape
    assert k == 5
    w3 = jnp.zeros((3, 3, 4 * ci, 16 * o), jnp.int8)
    for ax in range(4):
        for rx in range(2):
            for dx in (-1, 0, 1):
                kx = 4 * dx + 2 * rx + 2 - ax
                if not 0 <= kx < k:
                    continue
                for ay in range(4):
                    for ry in range(2):
                        for dy in (-1, 0, 1):
                            ky = 4 * dy + 2 * ry + 2 - ay
                            if not 0 <= ky < k:
                                continue
                            gin = (rx * 2 + ry) * ci
                            gout = (ax * 4 + ay) * o
                            w3 = w3.at[dx + 1, dy + 1,
                                       gin:gin + ci, gout:gout + o].set(
                                jnp.transpose(w[:, kx, ky, :], (1, 0)))
    return w3


def deconv2d_int8_tail_fused(x: jax.Array, w_a, b_a, w_b, b_b) -> jax.Array:
    """TWO chained deconv522 layers fused in the phase domain.

    The first layer's phase-form accumulator (V, W, 4*Oa) IS the
    space-to-depth of its output (identical (px, py, c) channel order),
    so the second layer can consume it directly via
    ``deconv_weights_s2dtail`` — the depth-to-space materialization
    between the layers (1.2 GB for L6->L7 at batch 96, measured ~9 ms
    of relayout traffic, scripts/profile_layers.py round 5) never
    happens.  Both epilogues are elementwise and run in their phase
    forms, so the fusion is bit-exact with d2s(layer_b) o d2s(layer_a)
    (tested).  Output interleaves 4x4 fine offsets in one shuffle."""
    oa = w_a.shape[0]
    ob = w_b.shape[0]
    ya = lax.conv_general_dilated(
        x.astype(jnp.int8), deconv_weights_d2s(w_a), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=DIMNUMS,
        preferred_element_type=jnp.int32)
    ha = bias_relu_epilogue(ya, jnp.tile(jnp.asarray(b_a), 4))
    yb = lax.conv_general_dilated(
        ha, deconv_weights_s2dtail(w_b), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=DIMNUMS,
        preferred_element_type=jnp.int32)
    hb = bias_relu_epilogue(yb, jnp.tile(jnp.asarray(b_b), 16))
    return depth_to_space4(hb)


def space_to_depth4(x: jax.Array) -> jax.Array:
    """(B, 4V, 4W, C) -> (B, V, W, 16C): 4x4 cells onto channels."""
    b, x4, y4, c = x.shape
    v, w = x4 // 4, y4 // 4
    return (x.reshape(b, v, 4, w, 4, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, v, w, 16 * c))


def conv_weights_s4d(w: np.ndarray | jax.Array) -> jax.Array:
    """[O, 5, 5, I] k5/s2 kernel -> 3x3 HWIO kernel over s4d channels
    producing all four output phases.

    Output pixel (2v+pi, 2w+pj) reads input row 4v + u, u = 2*pi + kx - 2
    in [-2, 5]: s4d tap m = floor(u/4), cell row a = u mod 4.  So
    W4[mx, my, (ax, ay, c), (pi, pj, o)] = w[o, kx, ky, c] — one 3x3/s1
    conv (B, V, W, 16I) -> (B, V, W, 4O) whose channel dims are MXU-lane
    dense (K = 9*16*I, N = 4*O), where the direct form's I=3 collapses
    XLA's conv path (the L0 lane-structure wall, docs/KERNELS.md)."""
    w = jnp.asarray(w, jnp.int8)
    o, k, _, ci = w.shape
    assert k == 5
    w4 = jnp.zeros((3, 3, 16 * ci, 4 * o), jnp.int8)
    for pi in range(2):
        for kx in range(k):
            ux = 2 * pi + kx - 2
            mx, ax = ux // 4 + 1, ux % 4   # +1: taps -1..1 -> kernel 0..2
            for pj in range(2):
                for ky in range(k):
                    uy = 2 * pj + ky - 2
                    my, ay = uy // 4 + 1, uy % 4
                    gin = (ax * 4 + ay) * ci
                    gout = (pi * 2 + pj) * o
                    w4 = w4.at[mx, my, gin:gin + ci, gout:gout + o].set(
                        jnp.transpose(w[:, kx, ky, :], (1, 0)))
    return w4


def conv2d_int8_s4d(x: jax.Array, w: jax.Array, bias: jax.Array
                    ) -> jax.Array:
    """k5/s2/p2 conv via one 3x3/s1/p1 conv over s4d(x) + d2s of the four
    output phases.  Epilogue runs on the lane-dense phase form; both
    reshuffles move int8.  Bit-exact with ``conv_int.conv2d_int8``."""
    o = w.shape[0]
    xs = space_to_depth4(x.astype(jnp.int8))
    y = lax.conv_general_dilated(
        xs, conv_weights_s4d(w), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=DIMNUMS,
        preferred_element_type=jnp.int32)
    bias4 = jnp.tile(jnp.asarray(bias), 4)
    return depth_to_space(bias_relu_epilogue(y, bias4))


def conv2d_int8_gemm_acc(x: jax.Array, w: jax.Array) -> jax.Array:
    """5x5/s2/p2 conv accumulator as an explicit im2col GEMM over s2d patches.

    For small channel counts (layer 0: Cin=3) XLA's conv path collapses; an
    explicit patches @ weights matmul with K = 9*4*Cin keeps the MXU fed.
    """
    o, k, _, ci = w.shape
    xs = space_to_depth(x.astype(jnp.int8))          # (B, V, W, 4C)
    b, v, ww, c4 = xs.shape
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, mx:mx + v, my:my + ww, :] for mx in range(3)
            for my in range(3)]
    patches = jnp.concatenate(cols, axis=-1)         # (B, V, W, 9*4C)
    w3 = conv_weights_s2d(w)                          # (3, 3, 4C, O)
    wmat = w3.reshape(9 * c4, o)
    acc = jax.lax.dot_general(
        patches.reshape(b * v * ww, 9 * c4), wmat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.reshape(b, v, ww, o)


def conv2d_int8_gemm(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    return bias_relu_epilogue(conv2d_int8_gemm_acc(x, w), bias)


def deconv_weights_tapn(w: np.ndarray | jax.Array) -> jax.Array:
    """[O, 5, 5, I] deconv kernel -> (I, 9*4O) GEMM weights, tap-major.

    Column block t*4O..(t+1)*4O holds the d2s phase-form weights of 3x3
    tap t = dx*3 + dy (``deconv_weights_d2s`` column order inside each
    block), so slicing the GEMM output per tap yields shiftable phase
    planes."""
    w3 = deconv_weights_d2s(w)                       # (3, 3, I, 4O)
    ci, c4o = w3.shape[2], w3.shape[3]
    return jnp.transpose(w3, (2, 0, 1, 3)).reshape(ci, 9 * c4o)


def deconv2d_int8_tapn(x: jax.Array, w: jax.Array, bias: jax.Array
                       ) -> jax.Array:
    """deconv522 for NARROW output channels: taps folded into the GEMM N dim.

    The phase-form conv (``deconv2d_int8_d2s``) has N = 4*O output
    columns; for the RGB layer (O=3) that is 12 of the MXU's 128 lanes —
    ~90% of every systolic pass wasted, measured 64 effective TOPS at
    batch 96 (scripts/profile_layers.py, round 5).  Folding the 3x3 taps
    into N instead gives ONE plain GEMM with K = I, N = 9*4*O = 108
    (84% lane-dense), followed by 9 spatially shifted adds of the tap
    planes.  mod-256 wrap is a ring homomorphism, so the tap planes are
    wrapped to int8 STRAIGHT OUT of the GEMM (the convert fuses into the
    dot epilogue) and the shift-adds run in int8 — the intermediate is
    1 byte/element instead of the 4 an i32 accumulator would need.
    Bit-exact with ``conv_int.deconv2d_int8`` (tested); the epilogue is
    the usual wrap + bias + MSB-ReLU, algebraically reassociated:
    wrap(acc + b) == wrap(sum_t wrap(acc_t) + b)."""
    o = w.shape[0]
    xi = x.astype(jnp.int8)
    b, v, ww, ci = xi.shape
    z = jax.lax.dot_general(
        xi, deconv_weights_tapn(w),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.int8)
    # Materialize the int8 tap planes: without the barrier XLA fuses the
    # 9-way shifted consumer into the GEMM epilogue and the layer runs
    # measurably slower (the fusion re-walks the GEMM output per tap).
    z = jax.lax.optimization_barrier(z)
    # Shift-add stays on the 4D (…, 9*4O) layout: reshaping to a
    # (…, 9, 4O) minor dim of 12 would pad each tap plane to a full
    # 128-lane tile (~10x physical memory) — measured 1.6ms slower.
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    c4o = 4 * o
    acc = zp[:, 0:v, 0:ww, 0:c4o]
    for t in range(1, 9):
        dx, dy = t // 3, t % 3
        acc = acc + zp[:, dx:dx + v, dy:dy + ww, t * c4o:(t + 1) * c4o]
    bias4 = jnp.tile(jnp.asarray(bias).astype(jnp.int8), 4)
    return depth_to_space(jnp.maximum(acc + bias4, 0))
