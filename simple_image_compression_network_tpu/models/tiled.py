"""Overlap-tiled codec execution for images exceeding HBM.

The reference streams unbounded-height images through line buffers holding
O(width*K) pixels (``slidingwindow.h:180,1262``) — memory does not scale with
image size.  The TPU analog: process the image in X-tiles with a
receptive-field margin and crop, so peak activation memory is
O(tile_x * Y * C) regardless of image height.  Bit-exact by construction:

* analysis (4x conv k5/s2/p2): latent segment [a,b) depends on input
  [16a-30, 16b+30) -> input margin 30.
* synthesis (4x deconv as 3x3/s1 + d2s): each stage loses 1 border pixel at
  its resolution; a latent margin of 2 leaves the full output tile exact
  (loss 16*2-30 = 2 >= 0... margin arithmetic below uses latent margin 2,
  input margin 16*2+30 = 62, rounded to 64).

At true image borders no margin is needed — the conv zero-padding is the
correct boundary condition there.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, reference_net_for_input
from . import codec_int

MARGIN = 64          # input-pixel margin guaranteeing bit-exact interiors
LATENT_MARGIN = MARGIN // 16


def eight_layers_net_tiled(params: Dict[str, jax.Array], x: jax.Array,
                           tile_x: int, impl=None) -> jax.Array:
    """Full codec on X-tiles of `tile_x` (multiple of 16) with margins.

    Peak memory O(tile_x + 2*MARGIN) instead of O(X).  Output bit-identical
    to ``codec_int.eight_layers_net`` (tested).
    """
    n, xd, yd, c = x.shape
    assert tile_x % 16 == 0 and xd % 16 == 0
    outs = []
    for t0 in range(0, xd, tile_x):
        t1 = min(t0 + tile_x, xd)
        e0 = max(t0 - MARGIN, 0)
        e1 = min(t1 + MARGIN, xd)
        cfg = reference_net_for_input(e1 - e0, yd)
        seg = codec_int.eight_layers_net(params, x[:, e0:e1], cfg, impl=impl)
        outs.append(seg[:, (t0 - e0):(t0 - e0) + (t1 - t0)])
    return jnp.concatenate(outs, axis=1)


def analysis_tiled(params: Dict[str, jax.Array], x: jax.Array,
                   tile_x: int, impl=None) -> jax.Array:
    """Analysis-only tiling (for encode of huge images)."""
    n, xd, yd, c = x.shape
    assert tile_x % 16 == 0 and xd % 16 == 0
    outs = []
    for t0 in range(0, xd, tile_x):
        t1 = min(t0 + tile_x, xd)
        e0 = max(t0 - MARGIN, 0)
        e1 = min(t1 + MARGIN, xd)
        cfg = reference_net_for_input(e1 - e0, yd)
        z = codec_int.analysis_int8(params, x[:, e0:e1], cfg, impl=impl)
        z0 = (t0 - e0) // 16
        outs.append(z[:, z0:z0 + (t1 - t0) // 16])
    return jnp.concatenate(outs, axis=1)
