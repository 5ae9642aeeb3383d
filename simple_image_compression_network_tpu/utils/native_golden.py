"""ctypes bindings for the native C++ golden model (native/golden.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_NATIVE_DIR, "libgolden.so")
_SRC = os.path.join(_NATIVE_DIR, "golden.cpp")

_lib: Optional[ctypes.CDLL] = None


def load(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    try:
        if rebuild or not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                            _SRC, "-o", _SO], check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.CalledProcessError):
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    for fn in (lib.golden_conv2d, lib.golden_deconv2d):
        fn.restype = None
        fn.argtypes = [u8p, i8p, i8p, i8p] + [ctypes.c_int64] * 5
    _lib = lib
    return lib


def _call(fn, x: np.ndarray, w: np.ndarray, bias: np.ndarray,
          out_shape) -> np.ndarray:
    x = np.ascontiguousarray(x, np.uint8)
    w = np.ascontiguousarray(w, np.int8)
    bias = np.ascontiguousarray(bias, np.int8)
    out = np.empty(out_shape, np.int8)
    n, ix, iy, ci = x.shape
    co = w.shape[0]
    fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       w.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
       bias.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
       n, ix, iy, ci, co)
    return out


def conv2d(x: np.ndarray, w: np.ndarray, bias: np.ndarray) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native golden unavailable")
    n, ix, iy, _ = x.shape
    return _call(lib.golden_conv2d, x, w, bias,
                 (n, ix // 2, iy // 2, w.shape[0]))


def deconv2d(x: np.ndarray, w: np.ndarray, bias: np.ndarray) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native golden unavailable")
    n, ix, iy, _ = x.shape
    return _call(lib.golden_deconv2d, x, w, bias,
                 (n, 2 * ix, 2 * iy, w.shape[0]))
