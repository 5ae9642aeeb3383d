"""Pallas TPU kernel: fused 3x3/stride-1 int8 conv — the MVAU of this build.

One kernel covers every layer of the reference net via the rewrites in
``ops/conv_fast.py``:
  * strided 5x5/s2 conv  == this kernel on the space-to-depth input
    (4*Cin channels), replacing the reference's SWG + MVAU pipeline
    (``slidingwindow.h:1254``, ``mvau.hpp:92``);
  * transposed 5x5/s2 conv == this kernel emitting 4*Cout phase channels,
    followed by a depth-to-space interleave.

Mapping of the reference's folding vocabulary (SURVEY.md §2.5): SIMD -> the
GEMM K dim (tap x channel contraction on the MXU), PE -> the N dim (output
channels), MMV -> the M dim (pixels per tile).  The wrap-mod-256 + bias +
MSB-ReLU epilogue (``conv_nonsquare_top.cpp:267-278``) runs in-register on
the VPU before the int8 store.

Memory layout (Mosaic alignment): channels are padded to a multiple of 128
(lanes) and the (Y, C) dims are flattened so that a kernel-tap shift of one
pixel in Y becomes a 128-aligned *lane* slice; the X halo lives on an untiled
leading dim, so the HBM->VMEM DMA of each (TX+2, Y*Cp) slab (the line-buffer
analog of ``slidingwindow.h``) is alignment-free.  Grid is (batch, X tiles);
each step runs 9 tap-GEMMs on the MXU accumulating int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import conv_fast


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _conv3x3_kernel(x_hbm, w_ref, b_ref, out_ref, xtile, sems, *, tx, yd, cp,
                    cout, relu, n_x):
    t = pl.program_id(0)
    b, i = t // n_x, t % n_x

    # Double-buffered input slabs: wait for this tile's DMA (started by the
    # previous grid step), immediately start the next tile's.  Aligned DMA:
    # offset i*tx and extent tx+8 are sublane-aligned (tx % 8 == 0); the
    # 1-pixel X halo sits inside the 8-row over-read.
    def start(tt, slot):
        bb, ii = tt // n_x, tt % n_x
        pltpu.make_async_copy(
            x_hbm.at[bb].at[pl.ds(ii * tx, tx + 8)],
            xtile.at[slot], sems.at[slot]).start()

    @pl.when(t == 0)
    def _():
        start(0, 0)

    slot = t % 2
    pltpu.make_async_copy(
        x_hbm.at[b].at[pl.ds(i * tx, tx + 8)],
        xtile.at[slot], sems.at[slot]).wait()

    @pl.when(t + 1 < pl.num_programs(0))
    def _():
        start(t + 1, (t + 1) % 2)

    acc = jnp.zeros((tx * yd, cout), jnp.int32)
    for mx in range(3):
        for my in range(3):
            a = (xtile[slot, mx:mx + tx, my * cp:(my + yd) * cp]
                 .reshape(tx * yd, cp))
            acc = acc + jnp.dot(a, w_ref[3 * mx + my],
                                preferred_element_type=jnp.int32)
    # epilogue: wrap mod 256 after bias add, then MSB-ReLU
    v = ((acc + b_ref[:] + 128) & 0xFF) - 128
    if relu:
        v = jnp.maximum(v, 0)
    out_ref[0] = v.reshape(tx, yd, cout).astype(jnp.int8)


def _conv3x3_xla(x: jax.Array, w3: jax.Array, bias: jax.Array, *,
                 relu: bool = True, x_valid: bool = False,
                 y_valid: bool = False) -> jax.Array:
    """Bit-identical XLA lowering of the fused 3x3 kernel (fallback path)."""
    from .conv_int import DIMNUMS
    from jax import lax
    acc = lax.conv_general_dilated(
        x, w3, (1, 1), [(0, 0) if x_valid else (1, 1),
                        (0, 0) if y_valid else (1, 1)],
        dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
    out = ((acc + bias.astype(jnp.int32) + 128) & 0xFF) - 128
    if relu:
        out = jnp.maximum(out, 0)
    return out.astype(jnp.int8)


def conv3x3_s1_int8_any(x: jax.Array, w3: jax.Array, bias: jax.Array, *,
                        relu: bool = True, x_valid: bool = False,
                        y_valid: bool = False, tx: int = 8) -> jax.Array:
    """Backend-dispatching fused 3x3: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() != "tpu":
        return _conv3x3_xla(x, w3, bias, relu=relu, x_valid=x_valid,
                            y_valid=y_valid)
    return conv3x3_s1_int8(x, w3, bias, relu=relu, x_valid=x_valid,
                           y_valid=y_valid, tx=tx)


def conv3x3_s1_int8(x: jax.Array, w3: jax.Array, bias: jax.Array, *,
                    tx: int = 8, relu: bool = True, x_valid: bool = False,
                    y_valid: bool = False,
                    interpret: bool = False) -> jax.Array:
    """Fused 3x3/s1 conv + wrap/bias/ReLU epilogue.

    x: (B, X, Y, C) int8; w3: (3, 3, C, N) int8 (HWIO); bias: (N,) int8.
    Default is SAME padding (p1) -> (B, X, Y, N) int8.  With
    ``x_valid``/``y_valid`` the input already carries a 1-pixel halo on
    that axis (e.g. from an ICI ``ppermute`` exchange in the spatially
    sharded net) and the conv is VALID there: output extent shrinks by 2.
    """
    b, xd, yd, cin = x.shape
    cout = w3.shape[-1]
    assert w3.shape == (3, 3, cin, cout)
    xo = xd - 2 if x_valid else xd     # output X extent
    yo = yd - 2 if y_valid else yd     # output Y extent
    if xo % 8 == 0:
        tx = max(8, tx)
        while xo % tx:
            tx -= 8
    if xo % 8 or tx % 8 or xo % tx:
        # small/odd X: fall back to the XLA path (kernel wants 8-row tiles)
        return _conv3x3_xla(x, w3, bias, relu=relu, x_valid=x_valid,
                            y_valid=y_valid)
    cp = _round_up(cin, 128)
    # pad: X 1 left + 7 right (halo + DMA alignment; the left pad is the
    # halo unless the input already carries it), Y halo 1 each side
    # (lane-flattened) unless carried, C->cp
    x_lo = 0 if x_valid else 1
    xp = jnp.pad(x, ((0, 0), (x_lo, xo + 8 - xd - x_lo),
                     (0, 0) if y_valid else (1, 1), (0, cp - cin)))
    xp = xp.reshape(b, xo + 8, (yo + 2) * cp)
    w9 = jnp.pad(w3.astype(jnp.int8),
                 ((0, 0), (0, 0), (0, cp - cin), (0, 0))).reshape(9, cp, cout)
    bias_i32 = bias.astype(jnp.int32).reshape(1, cout)
    n_x = xo // tx
    kernel = functools.partial(_conv3x3_kernel, tx=tx, yd=yo, cp=cp,
                               cout=cout, relu=relu, n_x=n_x)
    flops = 2 * b * xo * yo * cout * 9 * cp
    return pl.pallas_call(
        kernel,
        grid=(b * n_x,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec((9, cp, cout), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tx, yo, cout),
            lambda t, n_x=n_x: (t // n_x, t % n_x, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, xo, yo, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 8, (yo + 2) * cp), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=x.size + 9 * w9.size,
                                      transcendentals=0),
        interpret=interpret,
    )(xp, w9, bias_i32)


def _flat_kernel(x_hbm, w_ref, b_ref, out_ref, xtile, sems, *, tx, yp, cp,
                 coutp, relu, n_x):
    """Flat-M variant: one grid step computes tx*yp output rows.

    The activation lives in HBM as (B, Xp*Yp, cp) — pixels flattened
    row-major onto the SUBLANE axis, channels on lanes.  Every kernel tap
    (dx, dy) is then the pure sublane-offset view
    ``xtile[dx*Yp + dy : dx*Yp + dy + tx*Yp]``: a vreg rotate, not the
    lane-dim refold of ``_conv3x3_kernel`` (which re-tiles the whole slab
    9x per step and dominates bandwidth-heavy layers).
    """
    t = pl.program_id(0)
    b, i = t // n_x, t % n_x

    def start(tt, slot):
        bb, ii = tt // n_x, tt % n_x
        pltpu.make_async_copy(
            x_hbm.at[bb].at[pl.ds(ii * tx * yp, (tx + 2) * yp + 8)],
            xtile.at[slot], sems.at[slot]).start()

    @pl.when(t == 0)
    def _():
        start(0, 0)

    slot = t % 2
    pltpu.make_async_copy(
        x_hbm.at[b].at[pl.ds(i * tx * yp, (tx + 2) * yp + 8)],
        xtile.at[slot], sems.at[slot]).wait()

    @pl.when(t + 1 < pl.num_programs(0))
    def _():
        start(t + 1, (t + 1) % 2)

    acc = jnp.zeros((tx * yp, coutp), jnp.int32)
    for dx in range(3):
        for dy in range(3):
            a = xtile[slot, pl.ds(dx * yp + dy, tx * yp), :]
            acc = acc + jnp.dot(a, w_ref[3 * dx + dy],
                                preferred_element_type=jnp.int32)
    v = ((acc + b_ref[:] + 128) & 0xFF) - 128
    if relu:
        v = jnp.maximum(v, 0)
    out_ref[0] = v.astype(jnp.int8)


def conv3x3_s1_int8_flat(x: jax.Array, w3: jax.Array, bias: jax.Array, *,
                         tx: int = 8, relu: bool = True,
                         x_valid: bool = False, y_valid: bool = False,
                         interpret: bool = False) -> jax.Array:
    """Fused 3x3/s1 conv, flat-M layout (see ``_flat_kernel``).

    Same contract as ``conv3x3_s1_int8``; output channels are padded to
    the 128-lane MXU width in-kernel and sliced after (identical MXU
    cycles, aligned stores).
    """
    b, xd, yd, cin = x.shape
    cout = w3.shape[-1]
    assert w3.shape == (3, 3, cin, cout)
    xo = xd - 2 if x_valid else xd
    yo = yd - 2 if y_valid else yd
    if xo % 8 == 0:
        tx = max(8, tx)
        while xo % tx:
            tx -= 8
    if xo % 8 or tx % 8 or xo % tx:
        return _conv3x3_xla(x, w3, bias, relu=relu, x_valid=x_valid,
                            y_valid=y_valid)
    cp = _round_up(cin, 128)
    coutp = _round_up(cout, 128)
    yp = _round_up(yo + 2, 8)
    x_lo = 0 if x_valid else 1
    y_lo = 0 if y_valid else 1
    # +3 X rows (not +2): tap row m + dx*yp + dy reaches (tx+2)*yp + 1,
    # and the slab DMA length is rounded to (tx+2)*yp + 8 for tiling
    xp = jnp.pad(x, ((0, 0), (x_lo, xo + 3 - xd - x_lo),
                     (y_lo, yp - yd - y_lo), (0, cp - cin)))
    xp = xp.reshape(b, (xo + 3) * yp, cp)
    w9 = jnp.pad(w3.astype(jnp.int8),
                 ((0, 0), (0, 0), (0, cp - cin),
                  (0, coutp - cout))).reshape(9, cp, coutp)
    bias_i32 = jnp.pad(bias.astype(jnp.int32), (0, coutp - cout)
                       ).reshape(1, coutp)
    n_x = xo // tx
    kernel = functools.partial(_flat_kernel, tx=tx, yp=yp, cp=cp,
                               coutp=coutp, relu=relu, n_x=n_x)
    flops = 2 * b * xo * yp * coutp * 9 * cp
    out = pl.pallas_call(
        kernel,
        grid=(b * n_x,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec((9, cp, coutp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, coutp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tx * yp, coutp),
            lambda t, n_x=n_x: (t // n_x, t % n_x, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, xo * yp, coutp), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, (tx + 2) * yp + 8, cp), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=xp.size + 9 * w9.size,
                                      transcendentals=0),
        interpret=interpret,
    )(xp, w9, bias_i32)
    return out.reshape(b, xo, yp, coutp)[:, :, :yo, :cout]


def _sparse_kernel(x_hbm, w_ref, b_ref, out_ref, xtile, sems, *, tx, yp,
                   cp, n_blocks, blk_n, taps, relu, n_x):
    """Block-sparse tap variant of ``_flat_kernel``.

    The s2d/d2s weight rewrites (``conv_fast.conv_weights_s2d`` /
    ``deconv_weights_d2s``) leave 11 of 36 (tap, channel-block) products
    structurally zero — the 5-tap kernel has no (m=2, phase=1) row/column
    (``slidingwindow.h:1254`` geometry).  The dense kernels spend 44%
    extra MXU cycles on those zeros; this kernel enumerates only the 25
    real blocks as lane-aligned K=ci GEMMs.

    taps: static tuple of (row_off, in_lane_lo, out_block, w_idx) — one
    GEMM per entry: acc[out_block] += slab[row_off:, in_lane_lo:+kb] @
    w_ref[w_idx].  For the strided conv there is 1 output block and 4
    input phase blocks; for the transposed conv 1 input block and 4
    output phase blocks (9/6/6/4 taps each).
    """
    t = pl.program_id(0)
    b, i = t // n_x, t % n_x
    kb = w_ref.shape[1]

    def start(tt, slot):
        bb, ii = tt // n_x, tt % n_x
        pltpu.make_async_copy(
            x_hbm.at[bb].at[pl.ds(ii * tx * yp, (tx + 2) * yp + 8)],
            xtile.at[slot], sems.at[slot]).start()

    @pl.when(t == 0)
    def _():
        start(0, 0)

    slot = t % 2
    pltpu.make_async_copy(
        x_hbm.at[b].at[pl.ds(i * tx * yp, (tx + 2) * yp + 8)],
        xtile.at[slot], sems.at[slot]).wait()

    @pl.when(t + 1 < pl.num_programs(0))
    def _():
        start(t + 1, (t + 1) % 2)

    m = tx * yp
    accs = [jnp.zeros((m, blk_n), jnp.int32) for _ in range(n_blocks)]
    for row_off, in_lo, out_blk, w_idx in taps:
        a = xtile[slot, pl.ds(row_off, m), in_lo:in_lo + kb]
        accs[out_blk] = accs[out_blk] + jnp.dot(
            a, w_ref[w_idx], preferred_element_type=jnp.int32)
    vs = []
    for ob in range(n_blocks):
        v = ((accs[ob] + b_ref[:, ob * blk_n:(ob + 1) * blk_n] + 128)
             & 0xFF) - 128
        if relu:
            v = jnp.maximum(v, 0)
        vs.append(v.astype(jnp.int8))
    out_ref[0] = vs[0] if n_blocks == 1 else jnp.concatenate(vs, axis=-1)


def _sparse_call(xp, w_taps, bias_row, *, b, xo, yp, cp, n_blocks, blk_n,
                 taps, relu, tx, interpret):
    """Shared pallas_call plumbing for the block-sparse tap kernel.

    xp: (B, (xo+3)*yp, cp) flat slab (see ``conv3x3_s1_int8_flat``);
    w_taps: (T, kb, blk_n); bias_row: (1, n_blocks*blk_n).
    Returns (B, xo*yp, n_blocks*blk_n) int8 (caller reshapes/slices).
    """
    n_x = xo // tx
    t_count, kb, _ = w_taps.shape
    kernel = functools.partial(_sparse_kernel, tx=tx, yp=yp, cp=cp,
                               n_blocks=n_blocks, blk_n=blk_n, taps=taps,
                               relu=relu, n_x=n_x)
    flops = 2 * b * xo * yp * blk_n * t_count * kb
    return pl.pallas_call(
        kernel,
        grid=(b * n_x,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec((t_count, kb, blk_n), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks * blk_n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tx * yp, n_blocks * blk_n),
            lambda t, n_x=n_x: (t // n_x, t % n_x, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, xo * yp, n_blocks * blk_n),
                                       jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, (tx + 2) * yp + 8, cp), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=xp.size
                                      + w_taps.size,
                                      transcendentals=0),
        interpret=interpret,
    )(xp, w_taps, bias_row)


def conv2d_int8_pallas3(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                        tx: int = 8, x_valid: bool = False,
                        y_valid: bool = False,
                        interpret: bool = False) -> jax.Array:
    """Reference conv2d layer (k5/s2/p2): s2d + block-sparse tap kernel.

    Skips the 11 structurally-zero tap blocks of the s2d rewrite (30%
    fewer MXU FLOPs than ``conv2d_int8_pallas2``).  Requires the input
    channel count to be a multiple of 128 (lane-aligned phase blocks);
    falls back to the dense flat kernel otherwise.  Bit-identical to
    every other conv2d lowering.

    With ``x_valid``/``y_valid`` the input already carries a 2-pixel
    halo on that axis (the spatially sharded net's ppermute exchange)
    and the conv is VALID there: output extent = (dim - 4) / 2.
    """
    ci = x.shape[-1]
    if (not interpret and not _tpu_available()) or ci % 128:
        if x_valid or y_valid:
            from .conv_int import DIMNUMS, bias_relu_epilogue
            from jax import lax
            acc = lax.conv_general_dilated(
                x.astype(jnp.int8),
                jnp.transpose(w.astype(jnp.int8), (1, 2, 3, 0)), (2, 2),
                [(0, 0) if x_valid else (2, 2),
                 (0, 0) if y_valid else (2, 2)],
                dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
            return bias_relu_epilogue(acc, bias)
        return conv2d_int8_pallas2(x, w, bias, tx=tx, interpret=interpret)
    b, xd, yd, _ = x.shape
    cout = w.shape[0]
    vx, vy = xd // 2, yd // 2                 # s2d extents
    xo = vx - 2 if x_valid else vx            # output extents
    yo = vy - 2 if y_valid else vy
    if xo % 8:
        if x_valid or y_valid:
            from .conv_int import DIMNUMS, bias_relu_epilogue
            from jax import lax
            acc = lax.conv_general_dilated(
                x.astype(jnp.int8),
                jnp.transpose(w.astype(jnp.int8), (1, 2, 3, 0)), (2, 2),
                [(0, 0) if x_valid else (2, 2),
                 (0, 0) if y_valid else (2, 2)],
                dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
            return bias_relu_epilogue(acc, bias)
        return conv2d_int8_pallas2(x, w, bias, tx=tx, interpret=interpret)
    tx = max(8, tx)
    while xo % tx:
        tx -= 8
    cp = 4 * ci
    coutp = _round_up(cout, 128)
    yp = _round_up(yo + 2, 8)
    # flat s2d slab with halo 1 (SAME padding of the 3x3 rewrite, unless
    # the input already carries it: a 2-px original halo == 1 s2d row)
    xs = conv_fast.space_to_depth(x.astype(jnp.int8))
    x_lo = 0 if x_valid else 1
    y_lo = 0 if y_valid else 1
    xp = jnp.pad(xs, ((0, 0), (x_lo, xo + 3 - vx - x_lo),
                      (y_lo, yp - vy - y_lo),
                      (0, 0))).reshape(b, (xo + 3) * yp, cp)
    # 25 real taps: W3[mx,my,(a,b)] nonzero iff 2mx+a < 5 and 2my+b < 5
    taps = []
    mats = []
    for mx in range(3):
        for a in range(2):
            if 2 * mx + a >= 5:
                continue
            for my in range(3):
                for bph in range(2):
                    if 2 * my + bph >= 5:
                        continue
                    taps.append((mx * yp + my, (a * 2 + bph) * ci, 0,
                                 len(mats)))
                    mats.append(jnp.transpose(
                        w.astype(jnp.int8)[:, 2 * mx + a, 2 * my + bph, :],
                        (1, 0)))
    w_taps = jnp.stack(mats)                       # (25, ci, cout)
    w_taps = jnp.pad(w_taps, ((0, 0), (0, 0), (0, coutp - cout)))
    bias_row = jnp.pad(bias.astype(jnp.int32), (0, coutp - cout)
                       ).reshape(1, coutp)
    out = _sparse_call(xp, w_taps, bias_row, b=b, xo=xo, yp=yp, cp=cp,
                       n_blocks=1, blk_n=coutp, taps=tuple(taps),
                       relu=True, tx=tx, interpret=interpret)
    return out.reshape(b, xo, yp, coutp)[:, :, :yo, :cout]


def deconv2d_int8_pallas3(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                          tx: int = 8, x_valid: bool = False,
                          y_valid: bool = False,
                          interpret: bool = False) -> jax.Array:
    """Reference deconv522 layer: block-sparse d2s kernel + depth-to-space.

    One accumulator per output phase (9/6/6/4 taps — 25 GEMMs instead of
    36 dense blocks).  Requires the output channel count to be a multiple
    of 128; falls back to the dense kernels otherwise (e.g. the RGB
    output layer).  Bit-identical to every other deconv lowering.

    With ``x_valid``/``y_valid`` the input carries a 1-pixel halo on
    that axis (sharded-net form): output extent = 2 * (dim - 2).
    """
    o = w.shape[0]
    if (not interpret and not _tpu_available()) or o % 128:
        if x_valid or y_valid:
            # XLA fallback handles every geometry, including valid halos
            w3 = conv_fast.deconv_weights_d2s(w)
            y = _conv3x3_xla(
                x.astype(jnp.int8), w3,
                jnp.tile(bias.reshape(1, o), (4, 1)).reshape(4 * o),
                x_valid=x_valid, y_valid=y_valid)
            return conv_fast.depth_to_space(y)
        return deconv2d_int8_pallas(x, w, bias, tx=tx, interpret=interpret)
    b, xd, yd, ci = x.shape
    xo = xd - 2 if x_valid else xd
    yo = yd - 2 if y_valid else yd
    if xo % 8:
        if x_valid or y_valid:
            w3 = conv_fast.deconv_weights_d2s(w)
            y = _conv3x3_xla(
                x.astype(jnp.int8), w3,
                jnp.tile(bias.reshape(1, o), (4, 1)).reshape(4 * o),
                x_valid=x_valid, y_valid=y_valid)
            return conv_fast.depth_to_space(y)
        return deconv2d_int8_pallas(x, w, bias, tx=tx, interpret=interpret)
    tx = max(8, tx)
    while xo % tx:
        tx -= 8
    cp = _round_up(ci, 128)   # lane-align the contraction (zeros are inert)
    yp = _round_up(yo + 2, 8)
    x_lo = 0 if x_valid else 1
    y_lo = 0 if y_valid else 1
    xp = jnp.pad(x.astype(jnp.int8),
                 ((0, 0), (x_lo, xo + 3 - xd - x_lo),
                  (y_lo, yp - yd - y_lo), (0, cp - ci))
                 ).reshape(b, (xo + 3) * yp, cp)
    # output phase (px,py) taps: kx ≡ (2-px) mod 2, offset d=(px+kx-2)/2
    # (deconv_weights_d2s geometry, conv_nonsquare_top.cpp:94-156)
    taps = []
    mats = []
    for px in range(2):
        for py in range(2):
            for kx in range(5):
                if (kx - (2 - px)) % 2:
                    continue
                d = (px + kx - 2) // 2
                for ky in range(5):
                    if (ky - (2 - py)) % 2:
                        continue
                    e = (py + ky - 2) // 2
                    taps.append(((d + 1) * yp + (e + 1), 0, px * 2 + py,
                                 len(mats)))
                    mats.append(jnp.pad(jnp.transpose(
                        w.astype(jnp.int8)[:, kx, ky, :], (1, 0)),
                        ((0, cp - ci), (0, 0))))
    w_taps = jnp.stack(mats)                       # (25, cp, o)
    bias_row = jnp.tile(bias.astype(jnp.int32).reshape(1, o), (1, 4))
    y = _sparse_call(xp, w_taps, bias_row, b=b, xo=xo, yp=yp, cp=cp,
                     n_blocks=4, blk_n=o, taps=tuple(taps), relu=True,
                     tx=tx, interpret=interpret)
    y = y.reshape(b, xo, yp, 4 * o)[:, :, :yo, :]
    return conv_fast.depth_to_space(y)


def conv2d_int8_pallas2(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                        tx: int = 8, interpret: bool = False) -> jax.Array:
    """Reference conv2d layer (k5/s2/p2) via s2d + the flat-M kernel."""
    if not interpret and not _tpu_available():
        return conv_fast.conv2d_int8_s2d(x, w, bias)
    xs = conv_fast.space_to_depth(x.astype(jnp.int8))
    w3 = conv_fast.conv_weights_s2d(w)
    return conv3x3_s1_int8_flat(xs, w3, bias, tx=tx, interpret=interpret)


def deconv2d_int8_pallas2(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                          tx: int = 8, interpret: bool = False) -> jax.Array:
    """Reference deconv522 layer via the flat-M kernel + depth-to-space."""
    if not interpret and not _tpu_available():
        return conv_fast.deconv2d_int8_d2s(x, w, bias)
    w3 = conv_fast.deconv_weights_d2s(w)  # (3, 3, C, 4*Cout)
    o = w.shape[0]
    bias4 = jnp.tile(bias.reshape(1, o), (4, 1)).reshape(4 * o)
    y = conv3x3_s1_int8_flat(x.astype(jnp.int8), w3, bias4, tx=tx,
                             interpret=interpret)
    return conv_fast.depth_to_space(y)


def _tpu_available() -> bool:
    return jax.default_backend() == "tpu"


def conv2d_int8_pallas(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                       tx: int = 8, interpret: bool = False) -> jax.Array:
    """Reference conv2d layer (k5/s2/p2) via s2d + the Pallas kernel.

    On non-TPU backends this lowers to the bit-identical XLA s2d form
    (resource-tag semantics: same math, different engine).
    """
    if not interpret and not _tpu_available():
        return conv_fast.conv2d_int8_s2d(x, w, bias)
    xs = conv_fast.space_to_depth(x.astype(jnp.int8))
    w3 = conv_fast.conv_weights_s2d(w)
    return conv3x3_s1_int8(xs, w3, bias, tx=tx, interpret=interpret)


def deconv2d_int8_pallas(x: jax.Array, w: jax.Array, bias: jax.Array, *,
                         tx: int = 8, interpret: bool = False) -> jax.Array:
    """Reference deconv522 layer via the Pallas kernel + depth-to-space.

    Falls back to the bit-identical XLA d2s form off-TPU.  Small output
    widths (e.g. the RGB output layer: 4 phases x 3 ch = 12) are padded
    to the 128-lane MXU width with zero weight columns and sliced after:
    the systolic array spends identical cycles on N=12 and N=128, while
    12-lane stores force Mosaic into unaligned layouts (measured 3x
    slower end to end).
    """
    if not interpret and not _tpu_available():
        return conv_fast.deconv2d_int8_d2s(x, w, bias)
    w3 = conv_fast.deconv_weights_d2s(w)  # (3, 3, C, 4*Cout)
    o = w.shape[0]
    bias4 = jnp.tile(bias.reshape(1, o), (4, 1)).reshape(4 * o)
    n_pad = _round_up(4 * o, 128) - 4 * o
    if n_pad:
        w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, 0), (0, n_pad)))
        bias4 = jnp.pad(bias4, (0, n_pad))
    y = conv3x3_s1_int8(x.astype(jnp.int8), w3, bias4, tx=tx,
                        interpret=interpret)
    if n_pad:
        y = y[..., : 4 * o]
    return conv_fast.depth_to_space(y)
