"""Pallas TPU kernel: interleaved-rANS decode — the VPU entropy engine.

The north-star component (BASELINE.json): the serial arithmetic-coding
loop (the FPGA analog is the II=1 MVAU pipeline, ``mvau.hpp:122-178``)
rebuilt for VPU throughput.  One kernel invocation decodes a whole batch
of independent ilrans streams (``codec/ilrans.py`` format): grid over
stream groups, the full t-step loop runs IN-KERNEL over vector registers
— no per-step XLA dispatch, no HBM roundtrips for coder state.

Per step, for G streams x N lanes at once:
  * symbol search + CDF start/end: one fused pass over the transposed CDF
    columns (running count / max / min — no gathers),
  * state update: u32 wrap arithmetic on the VPU,
  * renorm: per-stream contiguous window from the (transposed) word
    buffer + one-hot selection by renorm rank (rank via prefix-sum).

Bit-identical to ``device_rans.decode`` / the NumPy golden / the C++
coder (tested in interpret mode and on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ilrans

# The word buffer enters the kernel as a (1, cap + N, G) VMEM block whose
# minor (stream-group) axis G << 128 is padded to the full 128-lane vreg
# width by Mosaic, so its true VMEM footprint is (cap + N) * 128 * 4 bytes
# regardless of G.  Past ~half of VMEM, Mosaic refuses to compile (the
# round-2 bench fed the unbucketed 2N+tN worst-case capacity here and got
# an opaque INTERNAL).  Capacities are guarded against this limit and
# callers fall back to the bit-identical lax.scan decoder above it.
_WORDS_VMEM_LIMIT = 8 * 1024 * 1024


def _expand_words(chunk_cols, rank, eye_f32, g_streams, n_lanes):
    """Renorm word distribution: w[g, l] = chunk[g, rank[g, l]].

    chunk_cols: (N, G) i32 per-stream window columns (sublane-major, as
    the transposed words buffer yields them); rank: (G, N) i32 exclusive
    prefix sum of the renorm mask.  Two steps:

      1. ONE MXU matmul against the identity transposes the window
         columns to (G, N) lane-major rows (u16-valued words exceed
         bf16's mantissa -> Precision.HIGHEST),
      2. a log2(N)-stage butterfly expand: because rank is a prefix sum,
         the per-lane right-shift l - rank[g, l] is monotone
         non-decreasing in l and bounded by l, so the classic masked
         static-roll expand is exact (verified against a NumPy golden in
         tests) and garbage never wraps in.

    Replaces the per-stream (N, N) one-hot select — the decode kernel's
    dominant VPU cost (~N^2/128 vector ops per stream per step) — with
    ~9 lane-rolls total."""
    chunk_rows = jax.lax.dot_general(
        chunk_cols.astype(jnp.float32), eye_f32,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)  # (G, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (g_streams, n_lanes), 1)
    shift = lane - rank
    w = chunk_rows
    for b in reversed(range(max(1, (n_lanes - 1).bit_length()))):
        take = ((shift >> b) & 1) == 1
        w = jnp.where(take, pltpu.roll(w, 1 << b, 1), w)
    return w



def pick_g(s: int, pref: int = 8) -> int:
    """Streams per grid block.  Mosaic requires a block's sublane dim to
    be a multiple of 8 OR equal to the full array dim, so the old
    "largest divisor of S up to 8" choice produced invalid blocks for
    stream counts like 12 (g=6).  Prefer 8 when it divides S; otherwise
    one block covering all S streams (block dim == array dim is always
    legal; the VMEM guards take the actual g)."""
    return pref if (s % pref == 0 and s >= pref) else s


def max_supported_cap(n_lanes: int, g: int = 8) -> int:
    """Largest words-buffer capacity (in u16 words) ``decode`` accepts.

    ``g`` is the stream-group block width (``pick_g``): the words block's
    minor axis is g, lane-padded to a multiple of 128 by Mosaic, so a
    whole-array group (g > 128 for stream counts not divisible by 8)
    shrinks the admissible cap proportionally — guarding with the default
    128-lane assumption would admit buffers that blow the VMEM window
    (ADVICE r4; same class as the decode_ctx_vmem_ok fix)."""
    g_lanes = 128 * max(1, -(-g // 128))
    return _WORDS_VMEM_LIMIT // (g_lanes * 4) - 2 * n_lanes


def decode_ctx_vmem_ok(t_steps: int, n_lanes: int, cap: int,
                       g: int = 8) -> bool:
    """True iff ``decode_ctx``'s whole-kernel VMEM footprint fits: the
    words window (bounded by ``max_supported_cap``) PLUS the per-step
    context input block and i32 symbol output block, which scale with
    t_steps and overflow VMEM for large images even when the words
    window fits (the encode-side analog is ``encode_vmem_ok``).  Callers
    fall back to the bit-identical lax.scan decoder."""
    if cap > max_supported_cap(n_lanes, g):
        return False
    # The words block's minor (stream-group) axis is g, lane-padded to a
    # multiple of 128 by Mosaic — pick_g can return a whole-array g > 128
    # (any stream count not divisible by 8), so the padded width must use
    # the ACTUAL g, not the single-vreg 128 floor.
    g_lanes = 128 * max(1, -(-g // 128))
    words = (cap + n_lanes) * g_lanes * 4
    blk = t_steps * g * n_lanes * 4
    return words + 4 * blk <= _ENCODE_VMEM_BUDGET


def _decode_kernel(x0_ref, words_ref, cdft_ref, syms_ref, xfin_ref,
                   cons_ref, pos_smem, *, g_streams, n_lanes, t_steps,
                   prec, n_sym):
    """One grid step: decode t_steps symbols for g_streams streams.

    x0_ref:    (G, N) u32   initial coder states (flush words pre-split)
    words_ref: (1, cap, G) u32 word stream, TRANSPOSED so the per-stream
               renorm window is a sublane-dim dynamic slice (the leading
               unit dim is the grid-blocked stream-group axis: Mosaic
               requires the block's minor dims to equal the array's)
    cdft_ref:  (L+1, N) i32 transposed per-lane CDF rows
    syms_ref:  (t_steps, G, N) i8 out
    xfin_ref:  (G, N) u32 out — final states (validity: == 2^16)
    cons_ref:  (G, 1) i32 out — words consumed (validity: == true count)
    pos_smem:  (G,) i32 scratch word cursors
    """
    for g in range(g_streams):
        pos_smem[g] = 2 * n_lanes
    mask = jnp.uint32((1 << prec) - 1)
    lb = jnp.uint32(ilrans.STATE_LB)
    # loop-invariant lane matrices (hoisted out of the step loop):
    # strictly-lower-triangular f32 for the renorm-rank prefix sum (Mosaic
    # has no cumsum primitive; counts <= N are exact in f32 on the MXU)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 1)
    tri = (k_iota < j_iota).astype(jnp.float32)            # (N, N)
    eye_f32 = (k_iota == j_iota).astype(jnp.float32)

    def step(t, carry):
        x, cnt = carry
        slot = (x & mask).astype(jnp.int32)                    # (G, N)

        # fused symbol search, fully vectorized over the CDF table:
        # sym = #{j in 1..L-1: cdf[j] <= slot}, start = max such cdf[j]
        # (rows increase), end = min cdf[j] > slot.  One (L+1, N) compare
        # + three masked sublane reductions per stream — no serial loop.
        # Row 0 (cdf=0) is always <= slot: subtract 1 from the count; its
        # value 0 is the max-identity.  Row L (2^prec) is always > slot:
        # exactly the min-identity the old loop initialized `end` with.
        cdf_rows = cdft_ref[:, :]                              # (L+1, N)
        syms, starts, ends = [], [], []
        for g in range(g_streams):
            le = cdf_rows <= slot[g:g + 1, :]                  # (L+1, N)
            syms.append(jnp.sum(le.astype(jnp.int32), axis=0,
                                keepdims=True))
            starts.append(jnp.max(jnp.where(le, cdf_rows, 0), axis=0,
                                  keepdims=True))
            ends.append(jnp.min(jnp.where(le, 1 << prec, cdf_rows), axis=0,
                                keepdims=True))
        sym = jnp.concatenate(syms, axis=0) - 1                # (G, N)
        start = jnp.concatenate(starts, axis=0)
        end = jnp.concatenate(ends, axis=0)

        freq = (end - start).astype(jnp.uint32)
        x = freq * (x >> prec) + (slot - start).astype(jnp.uint32)
        need = x < lb                                          # (G, N)

        # renorm rank = exclusive prefix sum of `need` along lanes, as a
        # (G,N) @ strict-lower-tri (N,N) MXU matmul (no cumsum in Mosaic)
        need_i = need.astype(jnp.int32)
        rank = jnp.dot(need.astype(jnp.float32), tri,
                       preferred_element_type=jnp.float32).astype(jnp.int32)

        # per-stream window reads (words are u16-valued: i32 columns),
        # then one MXU transpose + butterfly expand for all G at once
        cols = []
        for g in range(g_streams):
            cols.append(words_ref[0, pl.ds(pos_smem[g], n_lanes),
                                  pl.ds(g, 1)].astype(jnp.int32))  # (N, 1)
            pos_smem[g] = pos_smem[g] + jnp.sum(need_i[g:g + 1, :])
        w = _expand_words(jnp.concatenate(cols, axis=1), rank, eye_f32,
                          g_streams, n_lanes).astype(jnp.uint32)  # (G, N)

        x = jnp.where(need, (x << 16) | w, x)
        syms_ref[pl.ds(t, 1)] = sym.astype(jnp.int8)[None]
        return x, cnt + jnp.sum(need_i, axis=1, keepdims=True)

    cnt0 = jnp.full((g_streams, 1), 2 * n_lanes, jnp.int32)
    x_fin, cnt_fin = jax.lax.fori_loop(0, t_steps, step,
                                       (x0_ref[:, :], cnt0))
    xfin_ref[:, :] = x_fin
    # scalar VMEM stores are unsupported: consumption is tracked as a
    # (G, 1) vector in the loop carry and stored whole
    cons_ref[:, :] = cnt_fin


@functools.partial(jax.jit,
                   static_argnames=("t_steps", "prec", "g_streams",
                                    "interpret"))
def decode(words: jax.Array, x0: jax.Array, lane_cdf: jax.Array, *,
           t_steps: int, prec: int = 16, g_streams: int = 8,
           interpret: bool = False
           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode S interleaved streams with the Pallas kernel.

    words: (S, cap) u16/u32 stream words (header stripped; includes the
           2N flush words at the front so cursors line up with the scan /
           golden decoders).
    x0:    (S, N) u32 initial states (pre-split flush words; use
           ``split_init``).
    lane_cdf: (N, L+1) i32 per-lane CDF rows.
    Returns (syms (S, t_steps, N) i8, consumed (S,) i32, x_fin (S, N) u32).
    """
    s, cap = words.shape
    n_lanes = x0.shape[1]
    g = pick_g(s, g_streams)
    if cap > max_supported_cap(n_lanes, g):
        raise ValueError(
            f"word buffer cap={cap} exceeds the VPU kernel's VMEM window "
            f"({max_supported_cap(n_lanes, g)} words for {n_lanes} lanes, "
            f"stream group {g}); bucket the capacity to the true payload "
            "(device_rans.bucket_words) or use the scan decoder")
    n_sym = lane_cdf.shape[1] - 1
    n_blocks = s // g
    # pad cap so in-kernel windows never run off the block
    words_p = jnp.pad(words.astype(jnp.uint32), ((0, 0), (0, n_lanes)))
    # (n_blocks, cap', g): stream-group axis leading so each grid step's
    # block is (1, cap', g) — minor dims equal the array's (Mosaic rule)
    words_t = jnp.swapaxes(words_p.reshape(n_blocks, g, cap + n_lanes), 1, 2)
    cdft = jnp.swapaxes(lane_cdf.astype(jnp.int32), 0, 1)      # (L+1, N)

    kernel = functools.partial(
        _decode_kernel, g_streams=g, n_lanes=n_lanes, t_steps=t_steps,
        prec=prec, n_sym=n_sym)
    syms_t, xfin, cons = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((g, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # x0
            pl.BlockSpec((1, cap + n_lanes, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # words_t
            pl.BlockSpec((n_sym + 1, n_lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),             # cdft
        ],
        out_specs=[
            pl.BlockSpec((t_steps, g, n_lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, s, n_lanes), jnp.int8),
            jax.ShapeDtypeStruct((s, n_lanes), jnp.uint32),
            jax.ShapeDtypeStruct((s, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((g,), jnp.int32)],
        interpret=interpret,
    )(x0.astype(jnp.uint32), words_t, cdft)
    return (jnp.swapaxes(syms_t, 0, 1), cons[:, 0], xfin)


def _decode_ctx_kernel(x0_ref, words_ref, cdft_ref, ctx_ref, syms_ref,
                       xfin_ref, cons_ref, pos_smem, *, g_streams, n_lanes,
                       t_steps, prec, n_rows):
    """Per-step-context variant of ``_decode_kernel``.

    cdft_ref: (L+1, R) transposed shared table (R context rows, e.g. the
    hyperprior's 64 scale bins); ctx_ref: (t_steps, G, N) i32 row index
    per symbol.  Each step materializes the per-lane CDF rows with a
    one-hot MXU matmul — rows_g = cdfT @ onehot(ctx) — instead of a
    gather (values <= 2^prec are exact in f32); the symbol search and
    renorm machinery are identical to the fixed-lane kernel.
    """
    for g in range(g_streams):
        pos_smem[g] = 2 * n_lanes
    mask = jnp.uint32((1 << prec) - 1)
    lb = jnp.uint32(ilrans.STATE_LB)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 1)
    tri = (k_iota < j_iota).astype(jnp.float32)
    eye_f32 = (k_iota == j_iota).astype(jnp.float32)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_lanes), 0)
    cdft_f = cdft_ref[:, :].astype(jnp.float32)            # (L+1, R)

    def step(t, carry):
        x, cnt = carry
        slot = (x & mask).astype(jnp.int32)                # (G, N)
        ctx_t = ctx_ref[0, pl.ds(t, 1)][0]                 # (G, N)
        syms, starts, ends = [], [], []
        for g in range(g_streams):
            oh_r = (r_iota == ctx_t[g:g + 1, :]).astype(jnp.float32)
            # Precision.HIGHEST: the MXU's default single-pass bf16 mode
            # rounds CDF values (> 8-bit mantissa) and silently corrupts
            # the symbol search on hardware; the 3-pass mode is exact for
            # these < 2^17 integers (caught by scripts/smoke_tpu.py)
            rows_g = jnp.dot(cdft_f, oh_r,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST
                             ).astype(jnp.int32)           # (L+1, N)
            le = rows_g <= slot[g:g + 1, :]
            syms.append(jnp.sum(le.astype(jnp.int32), axis=0,
                                keepdims=True))
            starts.append(jnp.max(jnp.where(le, rows_g, 0), axis=0,
                                  keepdims=True))
            ends.append(jnp.min(jnp.where(le, 1 << prec, rows_g), axis=0,
                                keepdims=True))
        sym = jnp.concatenate(syms, axis=0) - 1
        start = jnp.concatenate(starts, axis=0)
        end = jnp.concatenate(ends, axis=0)

        freq = (end - start).astype(jnp.uint32)
        x = freq * (x >> prec) + (slot - start).astype(jnp.uint32)
        need = x < lb
        need_i = need.astype(jnp.int32)
        rank = jnp.dot(need.astype(jnp.float32), tri,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        cols = []
        for g in range(g_streams):
            cols.append(words_ref[0, pl.ds(pos_smem[g], n_lanes),
                                  pl.ds(g, 1)].astype(jnp.int32))
            pos_smem[g] = pos_smem[g] + jnp.sum(need_i[g:g + 1, :])
        w = _expand_words(jnp.concatenate(cols, axis=1), rank, eye_f32,
                          g_streams, n_lanes).astype(jnp.uint32)
        x = jnp.where(need, (x << 16) | w, x)
        # symbols can exceed int8 range for wide alphabets: store i32
        syms_ref[pl.ds(t, 1)] = sym[None]
        return x, cnt + jnp.sum(need_i, axis=1, keepdims=True)

    cnt0 = jnp.full((g_streams, 1), 2 * n_lanes, jnp.int32)
    x_fin, cnt_fin = jax.lax.fori_loop(0, t_steps, step,
                                       (x0_ref[:, :], cnt0))
    xfin_ref[:, :] = x_fin
    cons_ref[:, :] = cnt_fin


@functools.partial(jax.jit,
                   static_argnames=("t_steps", "prec", "g_streams",
                                    "interpret"))
def decode_ctx(words: jax.Array, x0: jax.Array, cdfs: jax.Array,
               ctx: jax.Array, *, t_steps: int, prec: int = 16,
               g_streams: int = 8, interpret: bool = False
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode S streams whose per-symbol CDF row varies (shared table).

    words: (S, cap) u16/u32; x0: (S, N) u32; cdfs: (R, L+1) i32 shared
    context table; ctx: (S, t_steps, N) i32 row indices.
    Returns (syms (S, t_steps, N) i32, consumed (S,), x_fin (S, N)).
    """
    s, cap = words.shape
    n_lanes = x0.shape[1]
    g = pick_g(s, g_streams)
    if cap > max_supported_cap(n_lanes, g):
        raise ValueError(
            f"word buffer cap={cap} exceeds the VPU kernel's VMEM window "
            f"(stream group {g}); bucket the capacity or use the scan "
            "decoder")
    n_rows, l1 = cdfs.shape
    n_blocks = s // g
    words_p = jnp.pad(words.astype(jnp.uint32), ((0, 0), (0, n_lanes)))
    words_t = jnp.swapaxes(words_p.reshape(n_blocks, g, cap + n_lanes), 1, 2)
    cdft = jnp.swapaxes(cdfs.astype(jnp.int32), 0, 1)      # (L+1, R)
    ctx_t = jnp.swapaxes(ctx.astype(jnp.int32).reshape(
        n_blocks, g, t_steps, n_lanes), 1, 2)              # (nb, t, g, N)

    kernel = functools.partial(
        _decode_ctx_kernel, g_streams=g, n_lanes=n_lanes, t_steps=t_steps,
        prec=prec, n_rows=n_rows)
    syms_t, xfin, cons = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((g, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),             # x0
            pl.BlockSpec((1, cap + n_lanes, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # words_t
            pl.BlockSpec((l1, n_rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),             # cdft
            pl.BlockSpec((1, t_steps, g, n_lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),             # ctx
        ],
        out_specs=[
            pl.BlockSpec((t_steps, g, n_lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, s, n_lanes), jnp.int32),
            jax.ShapeDtypeStruct((s, n_lanes), jnp.uint32),
            jax.ShapeDtypeStruct((s, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((g,), jnp.int32)],
        interpret=interpret,
    )(x0.astype(jnp.uint32), words_t, cdft, ctx_t)
    return (jnp.swapaxes(syms_t, 0, 1), cons[:, 0], xfin)


def _encode_kernel(syms_ref, cdft_ref, emit_ref, need_ref, xfin_ref, *,
                   g_streams, n_lanes, t_steps, prec):
    """One grid step: encode t_steps symbols for g_streams streams.

    The reverse of ``_decode_kernel``: iterate t descending, per step do
    the one-hot CDF start/freq select (symbols are known — no search),
    then the u32 state update with a VPU integer division.  Emitted
    renorm words land DENSE at their step index; the shared XLA scatter
    (``device_rans.assemble_stream``) compacts them afterwards, so the
    stream bytes are bit-identical to the scan encoder's.

    syms_ref: (t_steps, G, N) i32 symbols
    cdft_ref: (L+1, N) i32 transposed per-lane CDF rows
    emit_ref: (t_steps, G, N) i32 out — candidate renorm words (x & 0xFFFF)
    need_ref: (t_steps, G, N) i32 out — 1 where the word is really emitted
    xfin_ref: (G, N) u32 out — final states (the stream's flush header)
    """
    lb = jnp.uint32(ilrans.STATE_LB)
    mask16 = jnp.uint32(0xFFFF)   # renorm word size is 16-bit, not prec
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (cdft_ref.shape[0],
                                                  n_lanes), 0)

    def step(i, x):
        t = t_steps - 1 - i
        sym = syms_ref[pl.ds(t, 1)][0]                     # (G, N)
        cdf_rows = cdft_ref[:, :]                          # (L+1, N)
        starts, ends = [], []
        for g in range(g_streams):
            oh_s = l_iota == sym[g:g + 1, :]               # (L+1, N)
            oh_e = l_iota == sym[g:g + 1, :] + 1
            starts.append(jnp.sum(jnp.where(oh_s, cdf_rows, 0), axis=0,
                                  keepdims=True))
            ends.append(jnp.sum(jnp.where(oh_e, cdf_rows, 0), axis=0,
                                keepdims=True))
        start = jnp.concatenate(starts, axis=0).astype(jnp.uint32)
        freq = (jnp.concatenate(ends, axis=0).astype(jnp.uint32) - start)

        need = (x >> 16) >= freq
        emit = x & mask16
        x = jnp.where(need, x >> 16, x)
        q = x // freq
        x = (q << prec) + (x - q * freq) + start
        emit_ref[pl.ds(t, 1)] = emit.astype(jnp.int32)[None]
        need_ref[pl.ds(t, 1)] = need.astype(jnp.int32)[None]
        return x

    x_fin = jax.lax.fori_loop(0, t_steps,  step,
                              jnp.full((g_streams, n_lanes), lb,
                                       jnp.uint32))
    xfin_ref[:, :] = x_fin


@functools.partial(jax.jit, static_argnames=("prec", "g_streams",
                                             "interpret"))
def encode_batch(syms: jax.Array, lane_cdf: jax.Array, *,
                 prec: int = 16, g_streams: int = 8,
                 interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Encode S fixed-lane-context streams with the Pallas kernel.

    syms: (S, t_steps, N) int; lane_cdf: (N, L+1) int32 per-lane rows.
    Returns (words (S, 2N + tN) u32, counts (S,) i32) — bit-identical to
    ``jax.vmap(lambda s: device_rans.encode(s, lane_cdf, None))``.
    """
    s, t_steps, n_lanes = syms.shape
    g = pick_g(s, g_streams)
    n_blocks = s // g
    n_sym = lane_cdf.shape[1] - 1
    syms_t = jnp.swapaxes(syms.astype(jnp.int32), 0, 1)    # (t, S, N)
    cdft = jnp.swapaxes(lane_cdf.astype(jnp.int32), 0, 1)  # (L+1, N)
    kernel = functools.partial(_encode_kernel, g_streams=g,
                               n_lanes=n_lanes, t_steps=t_steps, prec=prec)
    emits, needs, xfin = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((t_steps, g, n_lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),         # syms_t
            pl.BlockSpec((n_sym + 1, n_lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),         # cdft
        ],
        out_specs=[
            pl.BlockSpec((t_steps, g, n_lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_steps, g, n_lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, s, n_lanes), jnp.int32),
            jax.ShapeDtypeStruct((t_steps, s, n_lanes), jnp.int32),
            jax.ShapeDtypeStruct((s, n_lanes), jnp.uint32),
        ],
        interpret=interpret,
    )(syms_t, cdft)
    from . import device_rans
    asm = jax.vmap(device_rans.assemble_stream)
    return asm(jnp.swapaxes(emits, 0, 1).astype(jnp.uint32),
               jnp.swapaxes(needs, 0, 1), xfin)


def _encode_compact_kernel(syms_ref, cdft_ref, words_any, cnt_ref, xfin_ref,
                           emit_s, need_s, stage, pos_smem, sem, *,
                           g_streams, n_lanes, t_steps, prec, cap):
    """Two-pass encode: reverse state loop, then forward compaction.

    Pass 1 (t descending) runs the rANS state recurrence (symbols known,
    so start/freq come from one-hot CDF selects — no search) and stores
    candidate renorm words + emit flags in VMEM scratch.  Pass 2
    (t ascending) computes each step's per-stream emit ranks (prefix sum
    via the strict-lower-tri MXU matmul), left-packs the emitted words
    with the LSB-first butterfly network, then appends them to a
    per-stream CARRY RING held in vector registers: a circular
    lane-roll (bit-decomposed over the ring's fill offset) places the
    packed chunk at the cursor, and only when the ring fills does one
    row store flush it to the staging buffer — a (1, C*N) row at a
    dynamic sublane index, the one layout Mosaic stores cheaply.  The
    previous design stored a transposed (N, 1) column at a per-stream
    cursor EVERY step; measured on v5e those per-step dynamic stores
    were ~6.5 us each and made pass 2 ~77% of the kernel (the vector
    work — butterfly + rank matmul — is ~0.5 ms total).  The ring
    amortizes one store over ~C*N/E(emits) steps and removes the MXU
    transpose entirely: encode ~11.7 -> ~4.8 ms at the serving
    geometry, and the staging block shrinks 16x (rows are dense, the
    column layout padded 8 used lanes to 128).

    Streams whose payload exceeds ``cap`` skip the store but keep
    counting: the caller detects count > cap and falls back to the XLA
    assembly path.  Bytes are bit-identical to the scan encoder.
    """
    _compact_encode_body(syms_ref, cdft_ref, None, words_any, cnt_ref,
                         xfin_ref, emit_s, need_s, stage, pos_smem, sem,
                         g_streams=g_streams, n_lanes=n_lanes,
                         t_steps=t_steps, prec=prec, cap=cap)


def _encode_compact_ctx_kernel(syms_ref, cdft_ref, ctx_ref, words_any,
                               cnt_ref, xfin_ref, emit_s, need_s, stage,
                               pos_smem, sem, *, g_streams, n_lanes,
                               t_steps, prec, cap):
    """Per-symbol-context variant: cdft_ref is the transposed shared
    (L+1, R) table and ctx_ref (t, G, N) selects each symbol's row (the
    hyperprior y path).  Same two-pass structure."""
    _compact_encode_body(syms_ref, cdft_ref, ctx_ref, words_any, cnt_ref,
                         xfin_ref, emit_s, need_s, stage, pos_smem, sem,
                         g_streams=g_streams, n_lanes=n_lanes,
                         t_steps=t_steps, prec=prec, cap=cap)


def _compact_encode_body(syms_ref, cdft_ref, ctx_ref, words_any, cnt_ref,
                         xfin_ref, emit_s, need_s, stage, pos_smem, sem, *,
                         g_streams, n_lanes, t_steps, prec, cap):
    i = pl.program_id(0)
    lb = jnp.uint32(ilrans.STATE_LB)
    mask16 = jnp.uint32(0xFFFF)
    l1 = cdft_ref.shape[0]
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (l1, n_lanes), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 1)
    tri = (k_iota < j_iota).astype(jnp.float32)
    if ctx_ref is not None:
        n_rows = cdft_ref.shape[1]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_lanes), 0)
        cdft_f = cdft_ref[:, :].astype(jnp.float32)

    def rows_of(t, g):
        """Per-lane CDF rows (L+1, N) for stream g at step t."""
        if ctx_ref is None:
            return cdft_ref[:, :]
        ctx_t = ctx_ref[pl.ds(t, 1)][0]                    # (G, N)
        oh_r = (r_iota == ctx_t[g:g + 1, :]).astype(jnp.float32)
        # Precision.HIGHEST: default bf16 MXU passes round table values
        return jnp.dot(cdft_f, oh_r, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST
                       ).astype(jnp.int32)

    def step1(it, x):
        t = t_steps - 1 - it
        sym = syms_ref[pl.ds(t, 1)][0]                     # (G, N)
        starts, ends = [], []
        for g in range(g_streams):
            cdf_rows = rows_of(t, g)
            oh_s = l_iota == sym[g:g + 1, :]
            oh_e = l_iota == sym[g:g + 1, :] + 1
            starts.append(jnp.sum(jnp.where(oh_s, cdf_rows, 0), axis=0,
                                  keepdims=True))
            ends.append(jnp.sum(jnp.where(oh_e, cdf_rows, 0), axis=0,
                                keepdims=True))
        start = jnp.concatenate(starts, axis=0).astype(jnp.uint32)
        freq = jnp.concatenate(ends, axis=0).astype(jnp.uint32) - start
        need = (x >> 16) >= freq
        emit = x & mask16
        x = jnp.where(need, x >> 16, x)
        q = x // freq
        x = (q << prec) + (x - q * freq) + start
        emit_s[pl.ds(t, 1)] = emit.astype(jnp.int32)[None]
        need_s[pl.ds(t, 1)] = need.astype(jnp.int32)[None]
        return x

    x_fin = jax.lax.fori_loop(0, t_steps, step1,
                              jnp.full((g_streams, n_lanes), lb,
                                       jnp.uint32))
    xfin_ref[:, :] = x_fin

    # stage rows are one carry ring each: (G * blk_rows, C*N) — dense,
    # DMA'd to HBM once per grid block, flattening row-major into each
    # stream's word sequence
    blk_rows = stage.shape[0] // g_streams
    cn = stage.shape[1]                                   # ring = C*N lanes
    stage[:, :] = jnp.zeros(stage.shape, jnp.int32)
    for g in range(g_streams):
        pos_smem[g] = 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (g_streams, n_lanes), 1)
    lane_cn = jax.lax.broadcasted_iota(jnp.int32, (g_streams, cn), 1)
    nbits = max(1, (n_lanes - 1).bit_length())
    nbits_cn = max(1, (cn - 1).bit_length())

    def step2(t, carry_state):
        carry, f_vec, pos_vec = carry_state
        need_all = need_s[pl.ds(t, 1)][0]                  # (G, N)
        emit_all = emit_s[pl.ds(t, 1)][0]
        rank_all = jnp.dot(need_all.astype(jnp.float32), tri,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
        # batched LSB-first butterfly compress: left-pack each stream's
        # emitted words.  The shift l - rank is a monotone prefix-sum
        # quantity, so the masked-roll network is exact and collision-
        # free (NumPy-golden property test).  Lanes past a row's packed
        # count hold stale values; the ring merge below masks them out.
        d = emit_all
        s_ride = lane - rank_all
        v = need_all  # 0/1 i32 (Mosaic cannot lane-roll i1 vectors)
        for b in range(nbits):
            k = 1 << b
            d2 = pltpu.roll(d, n_lanes - k, 1)
            s2 = pltpu.roll(s_ride, n_lanes - k, 1)
            v2 = pltpu.roll(v, n_lanes - k, 1)
            take = jnp.logical_and(v2 != 0, ((s2 >> b) & 1) == 1)
            stay = jnp.logical_and(v != 0, ((s_ride >> b) & 1) == 0)
            d = jnp.where(take, d2, d)
            s_ride = jnp.where(take, s2, s_ride)
            v = jnp.where(jnp.logical_or(take, stay), 1, 0)
        # circular roll RIGHT by each stream's ring fill f (static rolls
        # selected by f's bits), then merge the c new words at [f, f+c)
        # — lanes past c carry compress garbage and are masked off here
        dz = jnp.concatenate(
            [d] + [jnp.zeros_like(d)] * (cn // n_lanes - 1), axis=1)
        rolled = dz
        for b in range(nbits_cn):
            r2 = pltpu.roll(rolled, (1 << b) % cn, 1)
            rolled = jnp.where(((f_vec >> b) & 1) == 1, r2, rolled)
        c_vec = jnp.sum(need_all, axis=1, keepdims=True)   # (G, 1)
        end = f_vec + c_vec
        merged = jnp.where(
            jnp.logical_and(lane_cn >= f_vec, lane_cn < end), rolled, carry)
        wrapped = jnp.where(lane_cn < end - cn, rolled, jnp.int32(0))
        flush = end >= cn
        for g in range(g_streams):
            p = pos_smem[g]
            c_g = jnp.sum(need_all[g:g + 1, :])
            blk = p // cn
            f_g = p - blk * cn

            @pl.when(jnp.logical_and(f_g + c_g >= cn, blk < blk_rows))
            def _():
                stage[pl.ds(g * blk_rows + blk, 1), :] = merged[g:g + 1, :]
            pos_smem[g] = p + c_g
        carry = jnp.where(flush, wrapped, merged)
        f_vec = jnp.where(flush, end - cn, end)
        return carry, f_vec, pos_vec + c_vec

    carry_fin, _, pos_fin = jax.lax.fori_loop(
        0, t_steps, step2,
        (jnp.zeros((g_streams, cn), jnp.int32),
         jnp.zeros((g_streams, 1), jnp.int32),
         jnp.zeros((g_streams, 1), jnp.int32)))
    # drain each stream's partial ring (garbage past the fill offset is
    # fine: bytes past counts[s] are never read)
    for g in range(g_streams):
        p = pos_smem[g]
        blk = p // cn

        @pl.when(jnp.logical_and(p - blk * cn > 0, blk < blk_rows))
        def _():
            stage[pl.ds(g * blk_rows + blk, 1), :] = carry_fin[g:g + 1, :]
    cnt_ref[:, :] = pos_fin
    dma = pltpu.make_async_copy(stage, words_any.at[i], sem)
    dma.start()
    dma.wait()


# Rows of the per-stream carry ring held in vector registers: flushes to
# the staging buffer happen every ~C*N/E(emits) steps instead of every
# step, amortizing the ~6.5 us cost a dynamic VMEM store measures on v5e
# (the pass-2 bottleneck — see _encode_compact_kernel's docstring).
# 4 rows x 384 lanes = 12 vregs/stream of carry: comfortably in-register
# at g=8, and the bit-decomposed align roll stays 11 stages.
_CARRY_ROWS = 4

# Whole-kernel VMEM budget for the compact encoder (VMEM is ~16 MB/core;
# the largest verified-compiling configuration [hyper y ctx encode at
# 768x512] totals ~13.6 MB, so 14 MiB keeps a safety margin while
# admitting everything known to work).  Larger images overflow through
# the emit/need scratch, which scales with t_steps — the round-2 failure
# mode the decode side already guards via ``max_supported_cap``.
_ENCODE_VMEM_BUDGET = 14 * 1024 * 1024


def encode_vmem_ok(t_steps: int, n_lanes: int, has_ctx: bool,
                   g: int = 8) -> bool:
    """True iff the compact encode kernel's total VMEM footprint (input
    blocks incl. double buffering + emit/need scratch + staging block)
    fits the budget for this geometry; callers fall back to the
    bit-identical lax.scan encoder otherwise (ADVICE r3: compress must
    degrade like decompress instead of hitting an opaque Mosaic error)."""
    blk = t_steps * g * n_lanes * 4
    n_in_blocks = 4 if has_ctx else 2      # (syms [+ctx]) double-buffered
    cap = default_encode_cap(t_steps, n_lanes)
    # staging = g dense carry-ring rows per stream (the row-staged layout;
    # the pre-round-5 column layout padded g=8 lanes to 128 and was 16x
    # bigger)
    cn = _CARRY_ROWS * n_lanes
    blk_rows = -(-(cap + n_lanes) // cn) + 1
    stage = g * blk_rows * cn * 4
    return n_in_blocks * blk + 2 * blk + stage <= _ENCODE_VMEM_BUDGET


def default_encode_cap(t_steps: int, n_lanes: int,
                       vmem_limit: int = 8 * 1024 * 1024) -> int:
    """Payload capacity (words) for the compact encode kernel's staging
    buffer: half the 1-word/symbol worst case, bucketed, shrunk until the
    dense row-staged block (g=8 streams x ceil((cap+N)/C*N)+1 rings of
    C*N words) fits the VMEM budget."""
    from .device_rans import WORD_BUCKET, bucket_words
    cap = bucket_words(max(WORD_BUCKET, (t_steps * n_lanes) // 2))
    cn = _CARRY_ROWS * n_lanes
    while (cap > WORD_BUCKET
           and 8 * (-(-(cap + n_lanes) // cn) + 1) * cn * 4 > vmem_limit):
        cap -= WORD_BUCKET
    return cap


@functools.partial(jax.jit, static_argnames=("cap_words", "prec",
                                             "g_streams", "interpret"))
def encode_batch_compact(syms: jax.Array, lane_cdf: jax.Array,
                         ctx: jax.Array | None = None, *,
                         cap_words: int, prec: int = 16, g_streams: int = 8,
                         interpret: bool = False
                         ) -> Tuple[jax.Array, jax.Array]:
    """Fully on-device encode: state loop AND stream compaction in-kernel.

    With ``ctx`` (S, t_steps, N), ``lane_cdf`` is the shared (R, L+1)
    context table and each symbol's row is selected per step (the
    hyperprior path); without, it is the fixed (N, L+1) per-lane table.
    Returns (words (S, 2N + cap_words + N) u32, counts (S,) i32) where
    words[s, :counts[s]] is the stream (flush header + payload),
    bit-identical to the scan encoder — PROVIDED the payload fits:
    any stream with counts[s] > 2N + cap_words was truncated and must be
    re-encoded via the scan path (the caller's fallback).
    """
    s, t_steps, n_lanes = syms.shape
    g = pick_g(s, g_streams)
    n_blocks = s // g
    n_sym = lane_cdf.shape[1] - 1
    # carry-ring geometry: each stream stages blk_rows rows of C*N words
    # (the last row is drain slack for a just-under-cap partial ring)
    cn = _CARRY_ROWS * n_lanes
    blk_rows = -(-(cap_words + n_lanes) // cn) + 1
    syms_t = jnp.swapaxes(syms.astype(jnp.int32), 0, 1)    # (t, S, N)
    cdft = jnp.swapaxes(lane_cdf.astype(jnp.int32), 0, 1)
    if ctx is None:
        kernel = functools.partial(_encode_compact_kernel, g_streams=g,
                                   n_lanes=n_lanes, t_steps=t_steps,
                                   prec=prec, cap=cap_words)
        extra_in, extra_specs = [], []
    else:
        kernel = functools.partial(_encode_compact_ctx_kernel, g_streams=g,
                                   n_lanes=n_lanes, t_steps=t_steps,
                                   prec=prec, cap=cap_words)
        extra_in = [jnp.swapaxes(ctx.astype(jnp.int32), 0, 1)]
        extra_specs = [pl.BlockSpec((t_steps, g, n_lanes),
                                    lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)]
    words_t, cnt, xfin = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((t_steps, g, n_lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),         # syms_t
            pl.BlockSpec((n_sym + 1, n_lanes if ctx is None
                          else lane_cdf.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),         # cdft
        ] + extra_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # words (HBM)
            pl.BlockSpec((g, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, g * blk_rows, cn), jnp.int32),
            jax.ShapeDtypeStruct((s, 1), jnp.int32),
            jax.ShapeDtypeStruct((s, n_lanes), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_steps, g, n_lanes), jnp.int32),  # emit_s
            pltpu.VMEM((t_steps, g, n_lanes), jnp.int32),  # need_s
            pltpu.VMEM((g * blk_rows, cn), jnp.int32),     # stage
            pltpu.SMEM((g,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(syms_t, cdft, *extra_in)
    payload = words_t.reshape(s, blk_rows * cn)[:, :cap_words + n_lanes]
    hdr = jnp.stack([xfin >> 16, xfin & jnp.uint32(0xFFFF)],
                    axis=2).reshape(s, 2 * n_lanes)
    words = jnp.concatenate([hdr, payload.astype(jnp.uint32)], axis=1)
    return words, 2 * n_lanes + cnt[:, 0]


def split_init(words: jax.Array, n_lanes: int) -> jax.Array:
    """(S, cap) words -> (S, N) u32 initial states from the flush prefix."""
    init = words[:, : 2 * n_lanes].astype(jnp.uint32)
    hi = init[:, 0::2][:, :n_lanes]
    lo = init[:, 1::2][:, :n_lanes]
    return (hi << 16) | lo
