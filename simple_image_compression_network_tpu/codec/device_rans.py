"""On-device interleaved rANS: the entropy stage as TPU vector code.

The north-star requirement (BASELINE.json): "a range/arithmetic coder
entropy-codes the quantized latents on-device", replacing the reference's
II=1 serial pipeline discipline (``mvau.hpp:122-178``) with VPU-parallel
lanes.  The format is ``codec/ilrans.py`` — N interleaved rANS states, one
shared u16 word stream — whose 32-bit-state / 16-bit-renorm variant makes
every per-symbol step a fixed branchless block:

decode step (all N lanes at once, inside ``lax.scan``):
    slot = x & 0xFFFF
    sym  = #{j in 1..L-1 : cdf[ctx, j] <= slot}          (VPU compare+sum)
    x    = freq * (x >> 16) + slot - start
    x    = (x << 16) | words[pos + rank]  where x < 2^16 (<=1 renorm, gather
                                           rank = per-lane prefix sum)
encode is the exact inverse, run as a reverse scan; emitted words are
compacted into the stream with one scatter (total words <= 2N + n, so the
output buffer is static-shape).

Streams are bit-identical with the NumPy golden (``ilrans``) and the C++
native coder (``native/rans.cpp``); tests assert all three agree.  Batched
coding = ``jax.vmap`` over streams.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ilrans

_U16 = jnp.uint32(0xFFFF)
_LB = jnp.uint32(ilrans.STATE_LB)


def _rows(cdf: jax.Array, ctx_t: Optional[jax.Array]) -> jax.Array:
    """Per-lane CDF rows for one step: gather, or fixed (N, L+1) table."""
    return cdf if ctx_t is None else cdf[ctx_t]


@functools.partial(jax.jit, static_argnames=("t_steps", "prec"))
def decode(words: jax.Array, cdf: jax.Array, ctx: Optional[jax.Array],
           *, t_steps: int, prec: int = 16
           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode t_steps * N symbols from one interleaved stream.

    words: (W,) uint32 holding u16 stream words (header already stripped;
           padding past the end is ignored).
    cdf:   int32 (R, L+1) with ctx (t_steps, N) int32 row indices, or a
           pre-gathered (N, L+1) when every lane's context is fixed
           (ctx=None) — the int8 codec's channel-interleaved layout.
    Returns (syms (t_steps, N) int32, words_consumed, final_states).
    Validity check (host-side): words_consumed == true word count and all
    final states == 2^16.
    """
    n_lanes = cdf.shape[0] if ctx is None else ctx.shape[1]
    L = cdf.shape[-1] - 1
    cdf = cdf.astype(jnp.int32)
    words = words.astype(jnp.uint32)
    init = words[: 2 * n_lanes].reshape(n_lanes, 2)
    x0 = (init[:, 0] << 16) | init[:, 1]
    lane_iota = jnp.arange(L + 1, dtype=jnp.int32)
    # <=1 renorm word per lane per step, so a contiguous N-word window at
    # `pos` always covers this step's reads.  Pad so dynamic_slice never
    # clamps (XLA clamps OOB starts, which would misalign the window).
    words_pad = jnp.concatenate(
        [words, jnp.zeros((n_lanes,), jnp.uint32)])
    rank_iota = jnp.arange(n_lanes, dtype=jnp.int32)

    # + 0*words[0]: ties the scan-carry init's type to the input stream so
    # shard_map sees it device-varying from step 0 (a plain constant init
    # would flip replicated->varying inside the scan, which is rejected).
    pos0 = jnp.int32(2 * n_lanes) + (words[0] * 0).astype(jnp.int32)

    def step(carry, ctx_t):
        x, pos = carry
        row = _rows(cdf, ctx_t)                          # (N, L+1)
        slot = (x & _U16).astype(jnp.int32)
        sym = jnp.sum(row[:, 1:L] <= slot[:, None], axis=1).astype(jnp.int32)
        # start = row[sym], end = row[sym+1] without gathers: one-hot sums
        onehot_s = (lane_iota[None, :] == sym[:, None])
        onehot_e = (lane_iota[None, :] == sym[:, None] + 1)
        start = jnp.sum(jnp.where(onehot_s, row, 0), axis=1)
        end = jnp.sum(jnp.where(onehot_e, row, 0), axis=1)
        freq = (end - start).astype(jnp.uint32)
        x = freq * (x >> prec) + (slot - start).astype(jnp.uint32)
        need = x < _LB
        rank = jnp.cumsum(need.astype(jnp.int32)) - need.astype(jnp.int32)
        # Gather-free renorm: one contiguous vector load of the next N
        # words, then per-lane selection of word[rank] via a one-hot
        # reduction (an HBM-array gather here costs ~N scalar loads/step
        # on TPU and dominated the whole decode).
        chunk = jax.lax.dynamic_slice(words_pad, (pos,), (n_lanes,))
        onehot_w = (rank_iota[None, :] == rank[:, None])
        w = jnp.sum(jnp.where(onehot_w, chunk[None, :], 0), axis=1)
        x = jnp.where(need, (x << 16) | w, x)
        pos = pos + jnp.sum(need.astype(jnp.int32))
        return (x, pos), sym

    ctx_scan = None if ctx is None else ctx.reshape(t_steps, n_lanes)
    (x_fin, pos_fin), syms = jax.lax.scan(
        step, (x0, pos0), ctx_scan, length=t_steps)
    return syms, pos_fin, x_fin


@functools.partial(jax.jit, static_argnames=("prec",))
def encode(syms: jax.Array, cdf: jax.Array, ctx: Optional[jax.Array],
           *, prec: int = 16) -> Tuple[jax.Array, jax.Array]:
    """Encode syms (t_steps, N) int32 -> (words (2N + t*N,) uint32, count).

    The inverse reverse-scan of ``decode``; words[: count] is the stream
    (bit-identical with ilrans.encode after the 8-byte header).

    Unlike decode, the encoder KNOWS each step's symbol, so the CDF
    start/freq of every (step, lane) is precomputed with one bulk gather
    before the scan — the serial loop is pure u32 arithmetic (no per-step
    one-hot table reductions), which roughly halves its depth.
    """
    t_steps, n_lanes = syms.shape
    cdf = cdf.astype(jnp.int32)
    s32 = syms.astype(jnp.int32)
    L = cdf.shape[-1] - 1
    # Bulk start/end lookup, GATHER-FREE (XLA TPU gathers serialize to
    # scalar loads and are slower than the scan they replace — measured):
    # one-hot select over the table's symbol axis, vectorized over all
    # (t, N) at once; the ctx path first expands per-element rows with an
    # MXU one-hot matmul (values <= 2^16 are exact in f32).
    iota_l = jnp.arange(L + 1, dtype=jnp.int32)
    if ctx is None:
        rows = jnp.broadcast_to(cdf[None], (t_steps,) + cdf.shape)
    else:
        r = cdf.shape[0]
        oh_r = (jnp.arange(r, dtype=jnp.int32)[None, :]
                == ctx.reshape(t_steps * n_lanes, 1))
        # Precision.HIGHEST: TPU's default single-pass bf16 matmul rounds
        # CDF values > 8-bit mantissa and corrupts start/freq silently
        rows = jnp.dot(oh_r.astype(jnp.float32), cdf.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        rows = rows.astype(jnp.int32).reshape(t_steps, n_lanes, L + 1)
    oh_s = (iota_l[None, None, :] == s32[..., None])         # (t, N, L+1)
    oh_e = (iota_l[None, None, :] == s32[..., None] + 1)
    starts = jnp.sum(jnp.where(oh_s, rows, 0), axis=2)
    ends = jnp.sum(jnp.where(oh_e, rows, 0), axis=2)
    starts = starts.astype(jnp.uint32)
    freqs = (ends - starts).astype(jnp.uint32)
    # + 0*syms[...]: see decode — keeps the carry device-varying under
    # shard_map.
    x0 = (jnp.full((n_lanes,), ilrans.STATE_LB, jnp.uint32)
          + (syms[0] * 0).astype(jnp.uint32))

    def step(x, inp):
        start, freq = inp
        need = (x >> 16) >= freq
        emit = x & _U16
        x = jnp.where(need, x >> 16, x)
        x = ((x // freq) << prec) + x % freq + start
        return x, (emit, need)

    x_fin, (emits, needs) = jax.lax.scan(
        step, x0, (starts, freqs), reverse=True)
    return assemble_stream(emits, needs, x_fin)


def assemble_stream(emits: jax.Array, needs: jax.Array, x_fin: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """(t, N) emitted words + flags + final states -> (stream words, count).

    Stream assembly shared by the scan encoder above and the Pallas
    encode kernel (``pallas_rans.encode_batch``): flush header (hi, lo
    per lane) + emitted words in natural (t asc, lane asc) order.
    """
    t_steps, n_lanes = emits.shape
    flags = needs.ravel().astype(bool)
    vals = emits.ravel().astype(jnp.uint32)
    cap = 2 * n_lanes + t_steps * n_lanes
    fl = flags.astype(jnp.int32)
    pos = 2 * n_lanes + jnp.cumsum(fl) - fl
    idx = jnp.where(flags, pos, cap)                     # OOB -> dropped
    buf = jnp.zeros((cap,), jnp.uint32).at[idx].set(vals, mode="drop")
    hdr = jnp.stack([x_fin.astype(jnp.uint32) >> 16,
                     x_fin.astype(jnp.uint32) & _U16], axis=1).ravel()
    buf = buf.at[: 2 * n_lanes].set(hdr)
    count = 2 * n_lanes + jnp.sum(fl)
    return buf, count


# ---------------------------------------------------------------------------
# Host-side helpers bridging bytes <-> device words
# ---------------------------------------------------------------------------

WORD_BUCKET = 4096  # words; buffer lengths round up to this (compile reuse)


def bucket_words(n: int) -> int:
    return -(-n // WORD_BUCKET) * WORD_BUCKET


def words_from_bytes(data: bytes, cap: int) -> np.ndarray:
    """Stream bytes (past the ilrans header) -> u16 word array of length cap.

    u16 halves the host->device transfer (``decode`` widens on device);
    cap only needs to cover the stream's true word count — callers bucket
    the max over a batch (``bucket_words``), far below the 2N + t*N
    worst case for compressible data."""
    w = np.frombuffer(data, "<u2")
    out = np.zeros(cap, np.uint16)
    out[: w.size] = w
    return out


def bytes_from_words(words: np.ndarray, count: int, n_syms: int,
                     n_lanes: int, prec: int = 16) -> bytes:
    """Device encode output -> ilrans container bytes (header + words)."""
    return (ilrans.pack_header(n_syms, n_lanes, prec)
            + np.ascontiguousarray(words[:count]).astype(
                "<u2", copy=False).tobytes())


def streams_from_words(words: np.ndarray, counts: np.ndarray, n_syms: int,
                       n_lanes: int, prec: int = 16) -> list:
    """Batched ``bytes_from_words``: (S, cap) words + (S,) counts -> S
    ilrans streams.  The header is constant across streams, so it is
    packed once; each stream is then a single memcpy slice."""
    hdr = ilrans.pack_header(n_syms, n_lanes, prec)
    w2 = np.ascontiguousarray(words).astype("<u2", copy=False)
    mv = memoryview(w2).cast("B")
    row = w2.shape[1] * 2
    return [hdr + bytes(mv[i * row: i * row + 2 * int(counts[i])])
            for i in range(w2.shape[0])]


def decode_bytes(data: bytes, cdf: np.ndarray,
                 ctx: Optional[np.ndarray]) -> np.ndarray:
    """Convenience host API: full ilrans stream bytes -> symbols (device)."""
    n, n_lanes, prec, off = ilrans.unpack_header(data)
    if n == 0:
        return np.zeros(0, np.int32)
    n_pad = -(-n // n_lanes) * n_lanes
    t_steps = n_pad // n_lanes
    if ctx is not None:
        ctx = ilrans.pad_ctx(np.asarray(ctx, np.int32).ravel()[:n], n_lanes)
        ctx = jnp.asarray(ctx.reshape(t_steps, n_lanes))
    words = jnp.asarray(words_from_bytes(
        data[off:], bucket_words((len(data) - off) // 2)))
    syms, consumed, x_fin = decode(words, jnp.asarray(cdf), ctx,
                                   t_steps=t_steps, prec=prec)
    true_words = (len(data) - off) // 2
    if int(consumed) != true_words or not bool(
            (np.asarray(x_fin) == ilrans.STATE_LB).all()):
        raise ValueError("corrupt ilrans stream (device decode)")
    return np.asarray(syms).ravel()[:n]
