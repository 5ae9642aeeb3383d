"""Tensor-dump hooks — the ``logStringStream`` analog (utils.hpp:89-106).

The reference can dump any FIFO to a hex file and restore it; here any
intermediate activation can be dumped to ``.npy`` for cross-checking against
the golden model, and a dump directory can be replayed as layer inputs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

_active_dir: Optional[str] = None
_counter: Dict[str, int] = {}


def enable(directory: str) -> None:
    global _active_dir
    os.makedirs(directory, exist_ok=True)
    _active_dir = directory
    _counter.clear()


def disable() -> None:
    global _active_dir
    _active_dir = None


def dump(name: str, value: jax.Array) -> jax.Array:
    """Dump `value` to <dir>/<name>_<n>.npy when enabled; identity otherwise.

    Safe inside jit via io_callback (ordered, keeps determinism).
    """
    if _active_dir is None:
        return value

    def _save(v):
        n = _counter.get(name, 0)
        _counter[name] = n + 1
        np.save(os.path.join(_active_dir, f"{name}_{n}.npy"), np.asarray(v))
        return np.int32(0)

    jax.experimental.io_callback(_save, jax.ShapeDtypeStruct((), np.int32),
                                 value, ordered=True)
    return value


def load(directory: str, name: str, n: int = 0) -> np.ndarray:
    return np.load(os.path.join(directory, f"{name}_{n}.npy"))
