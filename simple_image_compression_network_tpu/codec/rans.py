"""rANS entropy coder: ctypes bindings to the native C++ backend + NumPy golden.

The native coder (``native/rans.cpp``) is the production path; the Python
implementation here is the bit-identical golden model (tests assert equal
bytestreams), mirroring the reference's golden-vs-hardware strategy
(``conv3_nonsquare_tb.cpp``) for the subsystem the reference lacks.

Symbols are table indices into per-context CDF rows (int32 [rows, L+1],
``entropy.quantize_cdf``); the last index of each row is an escape bucket
followed by a 32-bit zig-zag bypass value.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_RANS_L = 1 << 23
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librans.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "rans.cpp")

_lib: Optional[ctypes.CDLL] = None


def _build_native() -> None:
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC_PATH,
         "-o", _SO_PATH],
        check=True, capture_output=True)


def load_native(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native coder; None if unavailable."""
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    try:
        if rebuild or not os.path.exists(_SO_PATH) or (
                os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
            _build_native()
        lib = ctypes.CDLL(_SO_PATH)
    except (OSError, subprocess.CalledProcessError):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rans_encode.restype = ctypes.c_int64
    lib.rans_encode.argtypes = [i32p, i32p, ctypes.c_int64, i32p,
                                ctypes.c_int32, ctypes.c_int32, i32p,
                                u8p, ctypes.c_int64]
    lib.rans_decode.restype = ctypes.c_int64
    lib.rans_decode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i32p,
                                i32p, ctypes.c_int32, ctypes.c_int32,
                                i32p, i32p]
    _lib = lib
    return lib


def _asi32(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.int32)


def encode(syms: np.ndarray, ctx: np.ndarray, cdf: np.ndarray,
           prec: int = 16, raw: np.ndarray | None = None, *,
           use_native: bool = True) -> bytes:
    """Encode symbols (table indices) against per-context CDF rows."""
    syms, ctx = _asi32(syms).ravel(), _asi32(ctx).ravel()
    cdf = _asi32(cdf)
    n = syms.size
    L = cdf.shape[1] - 1
    raw = _asi32(raw).ravel() if raw is not None else np.zeros(n, np.int32)
    assert ctx.size == n and raw.size == n
    lib = load_native() if use_native else None
    if lib is not None:
        cap = 16 + 8 * n + 4
        out = np.empty(cap, np.uint8)
        ln = lib.rans_encode(
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            L, prec, raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if ln < 0:
            raise RuntimeError(f"rans_encode failed ({ln})")
        return out[:ln].tobytes()
    return _encode_py(syms, ctx, cdf, prec, raw)


def decode(data: bytes, n: int, ctx: np.ndarray, cdf: np.ndarray,
           prec: int = 16, *, use_native: bool = True
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode n symbols; returns (table indices, bypass raw values)."""
    ctx = _asi32(ctx).ravel()
    cdf = _asi32(cdf)
    L = cdf.shape[1] - 1
    lib = load_native() if use_native else None
    if lib is not None:
        buf = np.frombuffer(data, np.uint8)
        out = np.empty(n, np.int32)
        raw = np.empty(n, np.int32)
        consumed = lib.rans_decode(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size, n,
            ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            L, prec,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if consumed < 0:
            raise RuntimeError("rans_decode failed")
        return out, raw
    return _decode_py(data, n, ctx, cdf, prec)


# ---------------------------------------------------------------------------
# Pure-Python golden (bit-identical bytestream)
# ---------------------------------------------------------------------------

def _enc_put(x: int, sink: list, start: int, freq: int, prec: int) -> int:
    x_max = ((_RANS_L >> prec) << 8) * freq
    while x >= x_max:
        sink.append(x & 0xFF)
        x >>= 8
    return (x // freq << prec) + x % freq + start


def _encode_py(syms, ctx, cdf, prec, raw) -> bytes:
    x = _RANS_L
    sink: list = []
    L = cdf.shape[1] - 1
    escape = L - 1
    for i in range(len(syms) - 1, -1, -1):
        s = int(syms[i])
        row = cdf[int(ctx[i])]
        if s == escape:
            zz = (int(raw[i]) << 1) ^ (int(raw[i]) >> 31) & 0xFFFFFFFF
            zz &= 0xFFFFFFFF
            for shift in (24, 16, 8, 0):
                byte = (zz >> shift) & 0xFF
                x = _enc_put(x, sink, byte << 8, 1 << 8, 16)
        start, end = int(row[s]), int(row[s + 1])
        x = _enc_put(x, sink, start, end - start, prec)
    for _ in range(4):
        sink.append(x & 0xFF)
        x >>= 8
    return bytes(reversed(sink))


def _decode_py(data: bytes, n: int, ctx, cdf, prec):
    pos = 0
    x = 0
    for _ in range(4):
        x = (x << 8) | data[pos]
        pos += 1
    mask = (1 << prec) - 1
    L = cdf.shape[1] - 1
    escape = L - 1
    out = np.empty(n, np.int32)
    raw = np.zeros(n, np.int32)
    for i in range(n):
        row = cdf[int(ctx[i])]
        slot = x & mask
        s = int(np.searchsorted(row, slot, side="right")) - 1
        start, freq = int(row[s]), int(row[s + 1]) - int(row[s])
        x = freq * (x >> prec) + slot - start
        while x < _RANS_L:
            x = (x << 8) | data[pos]
            pos += 1
        out[i] = s
        if s == escape:
            zz = 0
            for k in range(4):
                bslot = x & 0xFFFF
                byte = bslot >> 8
                x = (x >> 16 << 8) + bslot - (byte << 8)
                while x < _RANS_L:
                    x = (x << 8) | data[pos]
                    pos += 1
                zz |= byte << (8 * k)
            raw[i] = np.int32(np.uint32((zz >> 1) ^ (-(zz & 1) & 0xFFFFFFFF)))
    return out, raw
