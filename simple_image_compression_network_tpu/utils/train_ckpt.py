"""Training checkpoint / resume (SURVEY.md §5: the reference has none —
weights are compile-time constants; the float path needs real state).

msgpack via flax.serialization: (step, params, opt_state) with atomic
write-then-rename so an interrupted save never corrupts the latest
checkpoint.  Resume restores into templates from a fresh init, so pytree
structure changes fail loudly instead of silently.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Optional, Tuple

from flax import serialization


def save(path: str, step: int, params: Any, opt_state: Any) -> None:
    payload = {"step": step, "params": params, "opt_state": opt_state}
    data = serialization.to_bytes(payload)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def restore(path: str, params_template: Any, opt_state_template: Any
            ) -> Tuple[int, Any, Any]:
    with open(path, "rb") as f:
        data = f.read()
    payload = serialization.from_bytes(
        {"step": 0, "params": params_template,
         "opt_state": opt_state_template}, data)
    return payload["step"], payload["params"], payload["opt_state"]


def save_params(path: str, params: Any) -> None:
    """Params-only inference checkpoint (~1/3 the size of a training one;
    what ships with a model release)."""
    data = serialization.to_bytes({"params": params})
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def restore_params(path: str, params_template: Any) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes({"params": params_template},
                                    data)["params"]


def latest(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    cands = [f for f in os.listdir(directory)
             if f.startswith(prefix) and f.endswith(".msgpack")]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len(prefix):-len(".msgpack")]))
    return os.path.join(directory, cands[-1])
