"""Spatial tiling of the integer codec across chips with ICI halo exchange.

The reference's on-chip FIFO fabric (SURVEY.md §2.5) has no multi-chip story;
this is the TPU-native extension: the image's X axis is sharded over a 1-D
mesh, and before each conv stage neighboring chips exchange the
receptive-field border rows via ``lax.ppermute`` (the ICI halo-exchange
pattern).  Tiling is semantics-invariant: every layer's local computation is
the global conv restricted to the tile, so multi-chip output is bit-identical
to single-chip (tested on a virtual 8-device CPU mesh).

Key facts used:
* conv k5/s2/p2 needs a 2-pixel halo on each side; the stride phase stays
  aligned because tile sizes are even.
* deconv (as the d2s/phased 3x3 stride-1 form) needs a 1-pixel halo.
* ``ppermute`` delivers zeros where no neighbor exists — exactly the
  reference's zero padding at global image borders (FMPadding semantics).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, REFERENCE_NET
from ..ops import conv_int
from ..ops.conv_int import DIMNUMS, bias_relu_epilogue


def halo_exchange_x(h: jax.Array, halo: int, axis_name: str = "x"
                    ) -> jax.Array:
    """Concatenate `halo` boundary rows from both X neighbors (zeros at ends)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        pad = [(0, 0)] * h.ndim
        pad[1] = (halo, halo)
        return jnp.pad(h, pad)
    # right edge -> right neighbor's left halo
    left = lax.ppermute(h[:, -halo:], axis_name,
                        perm=[(i, i + 1) for i in range(n - 1)])
    # left edge -> left neighbor's right halo
    right = lax.ppermute(h[:, :halo], axis_name,
                         perm=[(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([left, h, right], axis=1)


def _conv_local(h: jax.Array, w: jax.Array, b: jax.Array,
                axis_name: str) -> jax.Array:
    """One strided conv layer on a local tile: halo 2 + VALID-X conv."""
    hx = halo_exchange_x(h, 2, axis_name)
    acc = lax.conv_general_dilated(
        hx.astype(jnp.int8), jnp.transpose(w.astype(jnp.int8), (1, 2, 3, 0)),
        window_strides=(2, 2), padding=[(0, 0), (2, 2)],
        dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
    return bias_relu_epilogue(acc, b)


def _deconv_local(h: jax.Array, w: jax.Array, b: jax.Array,
                  axis_name: str) -> jax.Array:
    """One transposed-conv layer on a local tile: halo 1 + d2s 3x3 conv."""
    from ..ops import conv_fast
    hx = halo_exchange_x(h, 1, axis_name)
    w3 = conv_fast.deconv_weights_d2s(w)
    y = lax.conv_general_dilated(
        hx.astype(jnp.int8), w3, window_strides=(1, 1),
        padding=[(0, 0), (1, 1)],
        dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
    return bias_relu_epilogue(conv_fast.depth_to_space(y), b)


def _net_local(params: Dict[str, jax.Array], x: jax.Array,
               cfg: ModelConfig, axis_name: str) -> jax.Array:
    h = x.astype(jnp.int8)
    for i, layer in enumerate(cfg.layers):
        fn = _deconv_local if layer.transposed else _conv_local
        h = fn(h, params[f"w{i}"], params[f"b{i}"], axis_name)
    return h


def eight_layers_net_sharded(params: Dict[str, jax.Array], x: jax.Array,
                             mesh: Mesh, cfg: ModelConfig = REFERENCE_NET,
                             axis_name: str = "x") -> jax.Array:
    """Full codec forward, image X axis sharded over `mesh`'s `axis_name`.

    Bit-identical to ``codec_int.eight_layers_net`` (single chip).
    """
    n = mesh.shape[axis_name]
    assert x.shape[1] % (16 * n) == 0, (
        f"X={x.shape[1]} must divide into {n} even tiles at the latent "
        f"(need X % {16 * n} == 0)")
    fn = jax.shard_map(
        functools.partial(_net_local, cfg=cfg, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None))
    return fn(params, x)


def shard_image(x: jax.Array, mesh: Mesh, axis_name: str = "x") -> jax.Array:
    """Place an image array sharded over its X axis."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, axis_name, None, None)))
