"""The 8-layer integer autoencoder — bit-exact port target of eight_layers_net.

Reference: ``conv_nonsquare_top.cpp:295-357`` — four strided 5x5/s2/p2 convs
(analysis, 768x512x3 u8 -> 48x32x192 i8 latent) followed by four transposed
convs (synthesis, back to 768x512x3).  All arithmetic follows the reference's
integer contract (see ``ops/integer.py``).

Params pytree: {"w0".."w7": int8 [O,kx,ky,I], "b0".."b7": int8 [O]}
(produced by ``utils.weights_io.load_reference_params`` or random init).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, REFERENCE_NET
from ..ops import conv_int


def analysis_int8(params: Dict[str, jax.Array], x: jax.Array,
                  cfg: ModelConfig = REFERENCE_NET,
                  ) -> jax.Array:
    """Analysis transform: conv2d layers 0..3.  x: int8/uint8 (N, X, Y, 3).

    Returns the int8 latent (N, X/16, Y/16, 192), values 0..127.
    """
    h = conv_int.to_wire_int8(x)
    for i, layer in enumerate(cfg.analysis):
        h = conv_int.conv2d_int8(h, params[f"w{i}"], params[f"b{i}"],
                                 stride=layer.stride, padding=layer.padding)
    return h


def synthesis_int8(params: Dict[str, jax.Array], z: jax.Array,
                   cfg: ModelConfig = REFERENCE_NET, *,
                   phased: bool = True) -> jax.Array:
    """Synthesis transform: deconv522 layers 4..7.  z: int8 latent.

    `phased=True` uses the sub-pixel-decomposed transposed conv (4x fewer
    MXU FLOPs than lhs-dilation; bit-identical — tested).
    """
    deconv = (conv_int.deconv2d_int8_phased if phased
              else conv_int.deconv2d_int8)
    h = z.astype(jnp.int8)
    n_analysis = len(cfg.analysis)
    for j, layer in enumerate(cfg.synthesis):
        i = n_analysis + j
        h = deconv(h, params[f"w{i}"], params[f"b{i}"],
                   stride=layer.stride, padding=layer.padding)
    return h


def eight_layers_net(params: Dict[str, jax.Array], x: jax.Array,
                     cfg: ModelConfig = REFERENCE_NET, *,
                     phased: bool = True) -> jax.Array:
    """Full codec forward: analysis then synthesis (eight_layers_net)."""
    return synthesis_int8(params, analysis_int8(params, x, cfg), cfg,
                          phased=phased)


def random_params(cfg: ModelConfig = REFERENCE_NET, seed: int = 0
                  ) -> Dict[str, np.ndarray]:
    """Random int4 weights / int8 biases with the reference's shapes.

    For tests and benchmarks when the trained reference header isn't loaded.
    """
    rng = np.random.default_rng(seed)
    params: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(cfg.layers):
        params[f"w{i}"] = rng.integers(-8, 8, size=layer.weight_shape,
                                       dtype=np.int8)
        params[f"b{i}"] = rng.integers(-128, 128, size=(layer.out_ch,),
                                       dtype=np.int8)
    return params
