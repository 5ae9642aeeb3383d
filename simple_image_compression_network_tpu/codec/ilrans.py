"""Interleaved N-lane rANS — the parallel entropy-coding format.

This replaces the single serial stream of ``codec/rans.py`` (the analog of the
reference's II=1 serial pipeline discipline, ``mvau.hpp:122-178``) with the
standard N-way interleaved rANS construction: N independent coder states share
ONE word stream, renormalizing in a fixed round-robin order.  Because the
encoder (processing symbols in exact reverse order) pushes words precisely
when the decoder will pop them, no per-lane offsets are stored — the stream
stays as compact as a single-lane stream plus 4 bytes/lane of state flush.

The variant is chosen for branchless vector hardware (TPU VPU):

* 32-bit state in [2^16, 2^32), renormalization in 16-bit words, CDF
  precision <= 16.  This guarantees **at most one** renormalization per
  symbol in both directions, so the per-symbol work is a fixed straight-line
  block — `lax.scan`-able on TPU (``codec/device_rans.py``) and trivially
  vectorizable in NumPy (this file's golden) and C++ (``native/rans.cpp``).
* Symbol j is handled by lane j % N at step j // N; the symbol count is
  padded up to a multiple of N by repeating the final (symbol, context)
  (decoders truncate; the pad costs a few bytes).
* Word-consumption bound: 2 init words per lane + <= 1 word per symbol, so a
  (2N + n)-word buffer never overflows — fixed-size device output.

Out-of-alphabet values are NOT bypass-coded inside the stream (that would put
data-dependent extra steps in the vector loop); callers map them to an escape
symbol and carry raw values in a side section (``codec/escape.py``).

All three implementations (NumPy here, C++ native, JAX on-device) produce and
consume bit-identical streams; tests assert equality.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

STATE_LB = 1 << 16  # lower bound of the state interval; also the renorm base
DEFAULT_LANES = 192
MAGIC = 0x53_49  # "IS"

_HEADER = struct.Struct("<HHBBHI")  # magic, n_lanes, prec, pad, rsvd, n_syms


def pad_to_lanes(syms: np.ndarray, ctx: np.ndarray, n_lanes: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad (syms, ctx) to a multiple of n_lanes by repeating the last entry."""
    n = syms.size
    pad = (-n) % n_lanes
    if pad:
        syms = np.concatenate([syms, np.full(pad, syms[-1], syms.dtype)])
        ctx = np.concatenate([ctx, np.full(pad, ctx[-1], ctx.dtype)])
    return syms, ctx


def pad_ctx(ctx: np.ndarray, n_lanes: int) -> np.ndarray:
    """Decoder-side context padding — must mirror ``pad_to_lanes``."""
    pad = (-ctx.size) % n_lanes
    if pad:
        ctx = np.concatenate([ctx, np.full(pad, ctx[-1], ctx.dtype)])
    return ctx


def pack_header(n_syms: int, n_lanes: int, prec: int) -> bytes:
    return _HEADER.pack(MAGIC, n_lanes, prec, 0, 0, n_syms)


def unpack_header(data: bytes) -> Tuple[int, int, int, int]:
    """-> (n_syms, n_lanes, prec, payload_offset)."""
    magic, n_lanes, prec, _, _, n_syms = _HEADER.unpack_from(data)
    if magic != MAGIC:
        raise ValueError("bad ilrans magic")
    return n_syms, n_lanes, prec, _HEADER.size


def encode(syms: np.ndarray, ctx: np.ndarray, cdf: np.ndarray,
           n_lanes: int = DEFAULT_LANES, prec: int = 16) -> bytes:
    """Vectorized golden encoder.

    syms: (n,) int, values in [0, L-1] where L = cdf.shape[1] - 1.
    ctx:  (n,) int CDF-row index per symbol.
    cdf:  (rows, L+1) int32, cdf[r, 0] = 0, cdf[r, L] = 2^prec, increasing.
    Returns header + little-endian u16 word stream.
    """
    syms = np.ascontiguousarray(syms, np.int64).ravel()
    ctx = np.ascontiguousarray(ctx, np.int64).ravel()
    cdf = np.ascontiguousarray(cdf, np.int64)
    n = syms.size
    header = pack_header(n, n_lanes, prec)
    if n == 0:
        return header
    syms, ctx = pad_to_lanes(syms, ctx, n_lanes)
    t_steps = syms.size // n_lanes
    s2 = syms.reshape(t_steps, n_lanes)
    c2 = ctx.reshape(t_steps, n_lanes)
    lanes = np.arange(n_lanes)

    x = np.full(n_lanes, STATE_LB, np.uint64)
    chunks = []
    for t in range(t_steps - 1, -1, -1):
        row = cdf[c2[t]]                       # (N, L+1)
        s = s2[t]
        start = row[lanes, s].astype(np.uint64)
        freq = (row[lanes, s + 1] - row[lanes, s]).astype(np.uint64)
        # renormalize before encoding: x must be < freq << 16
        need = (x >> np.uint64(16)) >= freq
        if need.any():
            vals = (x & np.uint64(0xFFFF)).astype(np.uint16)
            # decoder pops lane-ascending within a step -> push descending
            chunks.append(vals[need][::-1])
            x = np.where(need, x >> np.uint64(16), x)
        x = (x // freq << np.uint64(prec)) + x % freq + start
        assert (x < (np.uint64(1) << np.uint64(32))).all()
    # state flush: decoder reads (hi, lo) per lane in lane order first
    flush = np.stack([(x & np.uint64(0xFFFF)), (x >> np.uint64(16))],
                     axis=1)[::-1].ravel().astype(np.uint16)
    chunks.append(flush)
    words = np.concatenate(chunks)[::-1]
    return header + words.astype("<u2").tobytes()


def decode(data: bytes, ctx: np.ndarray, cdf: np.ndarray,
           n_syms: int | None = None) -> np.ndarray:
    """Vectorized golden decoder.

    ctx: (n,) decoder-known context per symbol (padded internally).
    Returns (n,) int32 symbols.
    """
    n_hdr, n_lanes, prec, off = unpack_header(data)
    n = n_hdr if n_syms is None else n_syms
    assert n == n_hdr, f"symbol count mismatch ({n} vs header {n_hdr})"
    if n == 0:
        return np.zeros(0, np.int32)
    ctx = pad_ctx(np.ascontiguousarray(ctx, np.int64).ravel()[:n], n_lanes)
    cdf = np.ascontiguousarray(cdf, np.int64)
    t_steps = ctx.size // n_lanes
    c2 = ctx.reshape(t_steps, n_lanes)
    lanes = np.arange(n_lanes)
    L = cdf.shape[1] - 1

    words = np.frombuffer(data, "<u2", offset=off).astype(np.uint64)
    init = words[: 2 * n_lanes].reshape(n_lanes, 2)
    x = (init[:, 0] << np.uint64(16)) | init[:, 1]
    pos = 2 * n_lanes
    mask = np.uint64((1 << prec) - 1)
    out = np.empty((t_steps, n_lanes), np.int32)
    for t in range(t_steps):
        row = cdf[c2[t]]
        slot = (x & mask).astype(np.int64)
        s = (row[:, 1:L] <= slot[:, None]).sum(axis=1)
        start = row[lanes, s]
        freq = row[lanes, s + 1] - start
        x = (freq.astype(np.uint64) * (x >> np.uint64(prec))
             + np.uint64(0) + (slot - start).astype(np.uint64))
        need = x < np.uint64(STATE_LB)
        if need.any():
            nw = words[pos: pos + int(need.sum())]
            x = x.copy()
            x[need] = (x[need] << np.uint64(16)) | nw
            pos += nw.size
        out[t] = s
    assert pos == words.size, "stream length mismatch"
    assert (x == np.uint64(STATE_LB)).all(), "final state mismatch"
    return out.ravel()[:n]
