"""Escape / bypass side-channel for bounded-alphabet entropy coding.

The device/ilrans rANS formats (``codec/ilrans.py``, ``codec/device_rans.py``)
keep every per-symbol step a fixed branchless vector block, which requires a
bounded alphabet: out-of-range values cannot be bypass-coded in-stream
(data-dependent extra steps would break the vector loop).  Instead callers
map any value outside [-max_abs, max_abs] to a dedicated ESCAPE symbol
(coded in-stream with the tables' overflow bucket) and carry the raw values
in a side section, in scan order.

This is the TPU-native analog of the overflow handling the host serial
coder does inline (``codec/rans.py`` ``raw=``): same information, but the
rare path is lifted out of the vectorized hot loop.  The side section is
tiny in practice (escapes are the tables' overflow mass, ~2^-16).

Layout of the side section: ``<u32 count> count * <i32 raw value>``.
"""

from __future__ import annotations

import struct
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def escape_symbol(max_abs: int) -> int:
    """Index of the escape symbol for a [-max_abs, max_abs] alphabet."""
    return 2 * max_abs + 1


def alphabet_size(max_abs: int) -> int:
    """Symbols 0..2*max_abs (centered values) plus the escape bucket."""
    return 2 * max_abs + 2


def to_symbols(vals: jnp.ndarray, max_abs: int) -> jnp.ndarray:
    """Centered integer values -> symbol indices with escapes (device op).

    vals in [-max_abs, max_abs] map to vals + max_abs; anything outside
    maps to the escape symbol.  Runs as a cheap elementwise device op so
    the hot encode path never leaves the chip.
    """
    v = vals.astype(jnp.int32)
    sym = jnp.clip(v, -max_abs, max_abs) + max_abs
    return jnp.where(jnp.abs(v) > max_abs, escape_symbol(max_abs), sym)


def pack_raw(vals: np.ndarray, max_abs: int) -> bytes:
    """Out-of-range values (scan order) -> side-section bytes."""
    v = np.asarray(vals, np.int64).ravel()
    raw = v[np.abs(v) > max_abs].astype("<i4")
    return struct.pack("<I", raw.size) + raw.tobytes()


def unpack_raw(data: bytes) -> Tuple[np.ndarray, int]:
    """Side-section bytes -> (raw values, bytes consumed)."""
    (count,) = struct.unpack_from("<I", data)
    raw = np.frombuffer(data, "<i4", count=count, offset=4).astype(np.int64)
    return raw, 4 + 4 * count


def from_symbols(syms: np.ndarray, raw: np.ndarray,
                 max_abs: int) -> np.ndarray:
    """Decoded symbols + raw side values -> centered integer values.

    ``raw`` must hold exactly the escape count, in scan order.
    """
    s = np.asarray(syms, np.int64).ravel()
    out = s - max_abs
    esc = s == escape_symbol(max_abs)
    n_esc = int(esc.sum())
    if n_esc != raw.size:
        raise ValueError(
            f"escape count mismatch: {n_esc} escapes, {raw.size} raw values")
    if n_esc:
        out[esc] = raw
    return out
