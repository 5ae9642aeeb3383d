"""Spatial tiling of the integer codec across chips with ICI halo exchange.

The reference's on-chip FIFO fabric (SURVEY.md §2.5) has no multi-chip story;
this is the TPU-native extension: the image's X (and optionally Y) axis is
sharded over a mesh, and before each conv stage neighboring chips exchange
the receptive-field border rows via ``lax.ppermute`` (the ICI halo-exchange
pattern).  Tiling is semantics-invariant: every layer's local computation is
the global conv restricted to the tile, so multi-chip output is bit-identical
to single-chip (tested on a virtual 8-device CPU mesh).

Per-layer kernels route through the same implementation plan as the
single-chip net (``codec_int.DEFAULT_PLAN``): on TPU the fused Pallas
3x3 kernel runs in VALID mode on sharded axes (the exchanged halo replaces
its internal padding); off-TPU the bit-identical XLA forms run.

Key facts used:
* conv k5/s2/p2 needs a 2-pixel halo on each side; the stride phase stays
  aligned because tile sizes are even.  In the s2d (space-to-depth) form
  that 2-pixel halo is exactly 1 s2d row.
* deconv (as the d2s 3x3 stride-1 form) needs a 1-pixel halo.
* ``ppermute`` delivers zeros where no neighbor exists — exactly the
  reference's zero padding at global image borders (FMPadding semantics).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, REFERENCE_NET
from ..ops import conv_fast, pallas_conv
from ..ops.conv_int import bias_relu_epilogue


def halo_exchange(h: jax.Array, halo: int, axis_name: str, dim: int
                  ) -> jax.Array:
    """Concatenate `halo` boundary slices from both mesh neighbors along
    array dim `dim` (zeros past the global ends — FMPadding semantics)."""
    n = lax.axis_size(axis_name)
    pad = [(0, 0)] * h.ndim
    if n == 1:
        pad[dim] = (halo, halo)
        return jnp.pad(h, pad)
    lo = [slice(None)] * h.ndim
    hi = [slice(None)] * h.ndim
    lo[dim] = slice(-halo, None)
    hi[dim] = slice(None, halo)
    left = lax.ppermute(h[tuple(lo)], axis_name,
                        perm=[(i, i + 1) for i in range(n - 1)])
    right = lax.ppermute(h[tuple(hi)], axis_name,
                         perm=[(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([left, h, right], axis=dim)


def halo_exchange_x(h: jax.Array, halo: int, axis_name: str = "x"
                    ) -> jax.Array:
    return halo_exchange(h, halo, axis_name, 1)


def _halo_or_pad(h: jax.Array, halo: int, axis_name: Optional[str],
                 dim: int) -> jax.Array:
    """Halo-exchange a sharded dim, zero-pad an unsharded one (identical
    semantics: the global border is zeros either way)."""
    if axis_name is None:
        pad = [(0, 0)] * h.ndim
        pad[dim] = (halo, halo)
        return jnp.pad(h, pad)
    return halo_exchange(h, halo, axis_name, dim)


def _conv_local(h: jax.Array, w: jax.Array, b: jax.Array, impl: str,
                ax: Optional[str], ay: Optional[str]) -> jax.Array:
    """One strided k5/s2 conv layer on a local tile: halo 2 + VALID conv.

    All impls are bit-identical; "pallas"/"s2d"/"gemm" run the s2d rewrite
    (halo 2 px == 1 s2d row), "lax" the direct k5 conv.  Spatial plans
    accept only these names — a profile of a sharded plan must measure the
    implementation it names ("laxf32" etc. are single-chip-only)."""
    assert impl in ("pallas", "pallas2", "pallas3", "s2d", "gemm", "lax"), (
        f"unsupported sharded conv impl {impl!r}")
    if impl == "pallas3":
        hx = _halo_or_pad(_halo_or_pad(h, 2, ax, 1), 2, ay, 2)
        return pallas_conv.conv2d_int8_pallas3(hx, w, b, x_valid=True,
                                               y_valid=True)
    if impl in ("pallas", "pallas2", "s2d", "gemm"):
        hx = _halo_or_pad(_halo_or_pad(h, 2, ax, 1), 2, ay, 2)
        xs = conv_fast.space_to_depth(hx.astype(jnp.int8))
        w3 = conv_fast.conv_weights_s2d(w)
        return pallas_conv.conv3x3_s1_int8_any(
            xs, w3, b, x_valid=True, y_valid=True)
    hx = _halo_or_pad(_halo_or_pad(h, 2, ax, 1), 2, ay, 2)
    from ..ops.conv_int import DIMNUMS
    acc = lax.conv_general_dilated(
        hx.astype(jnp.int8), jnp.transpose(w.astype(jnp.int8), (1, 2, 3, 0)),
        window_strides=(2, 2), padding=[(0, 0), (0, 0)],
        dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
    return bias_relu_epilogue(acc, b)


def _deconv_local(h: jax.Array, w: jax.Array, b: jax.Array, impl: str,
                  ax: Optional[str], ay: Optional[str]) -> jax.Array:
    """One transposed-conv layer on a local tile: halo 1 + d2s 3x3 conv."""
    hx = _halo_or_pad(_halo_or_pad(h, 1, ax, 1), 1, ay, 2)
    if impl == "pd2s3":
        return pallas_conv.deconv2d_int8_pallas3(hx, w, b, x_valid=True,
                                                 y_valid=True)
    w3 = conv_fast.deconv_weights_d2s(w)
    if impl.startswith("pd2s"):
        o = w.shape[0]
        bias4 = jnp.tile(b.reshape(1, o), (4, 1)).reshape(4 * o)
        y = pallas_conv.conv3x3_s1_int8_any(
            hx.astype(jnp.int8), w3, bias4, x_valid=True, y_valid=True)
        return conv_fast.depth_to_space(y)
    from ..ops.conv_int import DIMNUMS
    y = lax.conv_general_dilated(
        hx.astype(jnp.int8), w3, window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=DIMNUMS, preferred_element_type=jnp.int32)
    # epilogue on the lane-dense phase form, then d2s moves int8 (the
    # single-chip L7 fix, conv_fast.deconv2d_int8_d2s: a post-d2s
    # epilogue on the 3-lane RGB layout wastes 125/128 vector lanes)
    return conv_fast.depth_to_space(
        bias_relu_epilogue(y, jnp.tile(jnp.asarray(b), 4)))


def _plan(impl, cfg: ModelConfig):
    from ..models.codec_int import DEFAULT_PLAN
    plan = DEFAULT_PLAN if impl is None else tuple(impl)
    assert len(plan) == len(cfg.layers)
    # The fused deconv pair ("tailfused") is a single-chip schedule: the
    # sharded net applies layers one at a time with per-layer halo
    # exchanges, so the pair runs in its unfused d2s form (bit-identical).
    return tuple("d2s" if p == "tailfused" else p for p in plan)


def analysis_local(params: Dict[str, jax.Array], x: jax.Array,
                   cfg: ModelConfig, ax: Optional[str], ay: Optional[str],
                   impl=None) -> jax.Array:
    plan = _plan(impl, cfg)
    h = x.astype(jnp.int8)
    for i, _ in enumerate(cfg.analysis):
        h = _conv_local(h, params[f"w{i}"], params[f"b{i}"], plan[i], ax, ay)
    return h


def synthesis_local(params: Dict[str, jax.Array], z: jax.Array,
                    cfg: ModelConfig, ax: Optional[str], ay: Optional[str],
                    impl=None) -> jax.Array:
    plan = _plan(impl, cfg)
    h = z.astype(jnp.int8)
    na = len(cfg.analysis)
    for j, _ in enumerate(cfg.synthesis):
        i = na + j
        h = _deconv_local(h, params[f"w{i}"], params[f"b{i}"], plan[i],
                          ax, ay)
    return h


def _net_local(params: Dict[str, jax.Array], x: jax.Array,
               cfg: ModelConfig, ax: Optional[str], ay: Optional[str],
               impl=None) -> jax.Array:
    return synthesis_local(params, analysis_local(params, x, cfg, ax, ay,
                                                  impl),
                           cfg, ax, ay, impl)


def _axes_of(mesh: Mesh, axis_names: Sequence[str]
             ) -> Tuple[Optional[str], Optional[str]]:
    ax = axis_names[0]
    ay = axis_names[1] if len(axis_names) > 1 else None
    return ax, ay


def eight_layers_net_sharded(params: Dict[str, jax.Array], x: jax.Array,
                             mesh: Mesh, cfg: ModelConfig = REFERENCE_NET,
                             axis_names: Sequence[str] = ("x",),
                             impl=None) -> jax.Array:
    """Full codec forward, image X (and optionally Y) sharded over `mesh`.

    ``axis_names``: 1 or 2 mesh axis names tiling the image's X / Y dims.
    Bit-identical to ``codec_int.eight_layers_net`` (single chip).
    """
    if isinstance(axis_names, str):
        axis_names = (axis_names,)
    ax, ay = _axes_of(mesh, axis_names)
    nx = mesh.shape[ax]
    assert x.shape[1] % (16 * nx) == 0, (
        f"X={x.shape[1]} must divide into {nx} even tiles at the latent "
        f"(need X % {16 * nx} == 0)")
    if ay is not None:
        ny = mesh.shape[ay]
        assert x.shape[2] % (16 * ny) == 0, (
            f"Y={x.shape[2]} must divide into {ny} even tiles at the latent")
    spec = P(None, ax, ay, None)
    # check_vma=False: the local net runs Pallas kernels on TPU, whose
    # pallas_call out_shapes carry no varying-mesh-axes annotation; the
    # per-tile computation is trivially varying over the spatial axes.
    fn = jax.shard_map(
        functools.partial(_net_local, cfg=cfg, ax=ax, ay=ay, impl=impl),
        mesh=mesh, in_specs=(P(), spec), out_specs=spec, check_vma=False)
    return fn(params, x)


def shard_image(x: jax.Array, mesh: Mesh,
                axis_names: Sequence[str] = ("x",)) -> jax.Array:
    """Place an image array sharded over its X (and optionally Y) axis."""
    if isinstance(axis_names, str):
        axis_names = (axis_names,)
    ax, ay = _axes_of(mesh, axis_names)
    return jax.device_put(x, NamedSharding(mesh, P(None, ax, ay, None)))
