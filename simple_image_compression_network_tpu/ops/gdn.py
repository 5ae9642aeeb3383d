"""GDN / IGDN activation (generalized divisive normalization).

The float training path's nonlinearity (BASELINE.json config 2: "strided convs
+ GDN-style activations").  The reference's integer net uses plain ReLU; GDN is
part of the added codec capability (Balle et al., "Density modelling of images
using a generalized normalization transformation", and the end-to-end
compression line of work).

y_c = x_c / sqrt(beta_c + sum_d gamma_cd * x_d^2)        (GDN)
y_c = x_c * sqrt(beta_c + sum_d gamma_cd * x_d^2)        (IGDN)

beta/gamma are kept positive with a square-root reparametrization and a
straight-through lower bound, so the sqrt argument stays well conditioned
under Adam updates.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_PEDESTAL = 2.0 ** -18


@jax.custom_vjp
def lower_bound(x: jax.Array, bound: float) -> jax.Array:
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    # pass gradients that push x up even when clipped (straight-through
    # toward feasibility), block those pushing further down
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


def _reparam(v: jax.Array, minimum: float = 0.0) -> jax.Array:
    bound = (minimum + _PEDESTAL) ** 0.5
    return jnp.square(lower_bound(v, bound)) - _PEDESTAL


def _reparam_init(value: float) -> float:
    return (value + _PEDESTAL) ** 0.5


class GDN(nn.Module):
    """Channelwise GDN over NHWC; `inverse=True` gives IGDN.

    ``dtype`` (e.g. jnp.bfloat16) sets the computation dtype of the
    channel-mixing einsum — the op's MXU matmul — for the serving fast
    path; params stay f32 and the normalizer sqrt runs in f32."""

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        beta_raw = self.param(
            "beta", lambda key, shape: jnp.full(shape, _reparam_init(1.0)),
            (c,))
        gamma_raw = self.param(
            "gamma",
            lambda key, shape: _reparam_init(self.gamma_init) * jnp.eye(c),
            (c, c))
        beta = _reparam(beta_raw, self.beta_min)
        gamma = _reparam(gamma_raw)
        xs = jnp.square(x)
        if self.dtype is not None:
            mix = jnp.einsum("...d,dc->...c", xs.astype(self.dtype),
                             gamma.astype(self.dtype),
                             preferred_element_type=jnp.float32)
        else:
            mix = jnp.einsum("...d,dc->...c", xs, gamma)
        norm = jnp.sqrt(beta + mix.astype(jnp.float32))
        y = x.astype(jnp.float32)
        out = y * norm if self.inverse else y / norm
        return out.astype(x.dtype) if self.dtype is None else out.astype(
            self.dtype)
