"""Device mesh helpers."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Tuple[int, ...], axis_names: Sequence[str],
              devices=None) -> Mesh:
    """Mesh over the first prod(shape) devices, reshaped to `shape`."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(shape), tuple(axis_names))


def spatial_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the image X axis (spatial tiling)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return make_mesh((n,), ("x",), devices)
