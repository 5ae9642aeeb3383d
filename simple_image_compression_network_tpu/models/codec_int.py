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
from ..ops import conv_int, conv_fast

# Per-layer kernel implementations (the reference's resource-tag analog,
# utils.hpp:71-77 — here selecting XLA/Pallas lowering strategy, all
# bit-identical; see ops/conv_fast.py):
#   conv:   "lax"    direct 5x5/s2 lax.conv
#           "s2d"    space-to-depth + 3x3/s1 conv
#           "gemm"   space-to-depth + explicit im2col matmul
#   deconv: "dilated" lhs-dilated lax.conv (4x wasted FLOPs)
#           "phased"  4 per-phase convs + interleave
#           "d2s"     one 3x3/s1 conv with 4*Cout outputs + depth-to-space
def _pallas_conv(x, w, b):
    from ..ops import pallas_conv
    return pallas_conv.conv2d_int8_pallas(x, w, b)


def _pallas_deconv(x, w, b):
    from ..ops import pallas_conv
    return pallas_conv.deconv2d_int8_pallas(x, w, b)


def _pallas_conv2(x, w, b):
    from ..ops import pallas_conv
    return pallas_conv.conv2d_int8_pallas2(x, w, b)


def _pallas_deconv2(x, w, b):
    from ..ops import pallas_conv
    return pallas_conv.deconv2d_int8_pallas2(x, w, b)


def _pallas_conv3(x, w, b):
    from ..ops import pallas_conv
    return pallas_conv.conv2d_int8_pallas3(x, w, b)


def _pallas_deconv3(x, w, b):
    from ..ops import pallas_conv
    return pallas_conv.deconv2d_int8_pallas3(x, w, b)


_CONV_IMPL = {
    "lax": conv_int.conv2d_int8,
    "laxf32": conv_int.conv2d_int8_f32,
    "s2d": conv_fast.conv2d_int8_s2d,
    "s4d": conv_fast.conv2d_int8_s4d,
    "gemm": conv_fast.conv2d_int8_gemm,
    "pallas": _pallas_conv,
    "pallas2": _pallas_conv2,
    "pallas3": _pallas_conv3,
}
_DECONV_IMPL = {
    "dilated": conv_int.deconv2d_int8,
    "phased": conv_int.deconv2d_int8_phased,
    "d2s": conv_fast.deconv2d_int8_d2s,
    "tapn": conv_fast.deconv2d_int8_tapn,
    "pd2s": _pallas_deconv,
    "pd2s2": _pallas_deconv2,
    "pd2s3": _pallas_deconv3,
}

# Default schedule: fastest measured configuration on TPU v5e
# (scripts/profile_slope.py + scripts/tune_plan.py; re-tuned round 5 at
# batch 96: 1941 MP/s synthesis vs 1196 for the round-3 plan).  XLA's
# conv path wins the whole analysis stack (layers 1-3 run near the int8
# MXU roofline once dispatch overhead is factored out — the k-slope
# profile) and, at serving batches, the synthesis head; layers 6+7 run
# as ONE phase-domain pair ("tailfused", ops/conv_fast.py:
# deconv2d_int8_tail_fused) — L7's in-chain marginal cost was 3x its
# standalone cost because L6's 1.2 GB depth-to-space output had to be
# materialized and relaid out just to be re-gathered by L7; consuming
# the phase form directly removes that traffic entirely.  Off-TPU every
# impl lowers to bit-identical XLA forms.
DEFAULT_PLAN = ("lax", "lax", "lax", "lax",
                "d2s", "d2s", "tailfused", "tailfused")


def _plan(impl, cfg: ModelConfig):
    plan = DEFAULT_PLAN if impl is None else tuple(impl)
    assert len(plan) == len(cfg.layers)
    return plan


def analysis_int8(params: Dict[str, jax.Array], x: jax.Array,
                  cfg: ModelConfig = REFERENCE_NET, *,
                  impl=None) -> jax.Array:
    """Analysis transform: conv2d layers 0..3.  x: int8/uint8 (N, X, Y, 3).

    Returns the int8 latent (N, X/16, Y/16, 192), values 0..127.
    """
    plan = _plan(impl, cfg)
    h = conv_int.to_wire_int8(x)
    for i, _ in enumerate(cfg.analysis):
        h = _CONV_IMPL[plan[i]](h, params[f"w{i}"], params[f"b{i}"])
    return h


def synthesis_int8(params: Dict[str, jax.Array], z: jax.Array,
                   cfg: ModelConfig = REFERENCE_NET, *,
                   impl=None) -> jax.Array:
    """Synthesis transform: deconv522 layers 4..7.  z: int8 latent."""
    plan = _plan(impl, cfg)
    h = z.astype(jnp.int8)
    n_analysis = len(cfg.analysis)
    j = 0
    while j < len(cfg.synthesis):
        i = n_analysis + j
        if plan[i] == "tailfused":
            # Consumes an adjacent deconv PAIR in the phase domain (the
            # inter-layer depth-to-space never materializes).
            assert (j + 1 < len(cfg.synthesis)
                    and plan[i + 1] == "tailfused"), \
                "tailfused must mark an adjacent deconv pair"
            h = conv_fast.deconv2d_int8_tail_fused(
                h, params[f"w{i}"], params[f"b{i}"],
                params[f"w{i + 1}"], params[f"b{i + 1}"])
            j += 2
        else:
            h = _DECONV_IMPL[plan[i]](h, params[f"w{i}"], params[f"b{i}"])
            j += 1
    return h


def eight_layers_net(params: Dict[str, jax.Array], x: jax.Array,
                     cfg: ModelConfig = REFERENCE_NET, *,
                     phased: bool = True, impl=None) -> jax.Array:
    """Full codec forward: analysis then synthesis (eight_layers_net).

    `impl`: None (tuned default), or an 8-tuple of per-layer implementation
    names, see _CONV_IMPL/_DECONV_IMPL.  `phased` kept for back-compat:
    phased=False forces the lhs-dilated deconv path.
    """
    if impl is None and not phased:
        impl = ("lax",) * 4 + ("dilated",) * 4
    z = analysis_int8(params, x, cfg, impl=impl)
    return synthesis_int8(params, z, cfg, impl=impl)


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
