"""Rate-distortion training for the float codec models.

loss = bpp + lambda * 255^2 * MSE  (the standard RD Lagrangian; distortion in
8-bit-scaled MSE so published lambda values transfer).

The train step is a pure jittable function over (params, opt_state, batch,
key); multi-chip execution shards it over a Mesh in ``parallel/`` (data
parallel over batch + optional spatial sharding), see ``__graft_entry__.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .models.hyperprior import (ScaleHyperprior, FactorizedPrior,
                                MeanScaleHyperprior)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: str = "hyperprior"        # "hyperprior" | "factorized"
    n: int = 128
    m: int = 192
    rd_lambda: float = 0.01
    lr: float = 1e-4
    crop: int = 256
    batch: int = 8


def build_model(cfg: TrainConfig):
    if cfg.model == "hyperprior":
        return ScaleHyperprior(cfg.n, cfg.m)
    if cfg.model == "meanscale":
        return MeanScaleHyperprior(cfg.n, cfg.m)
    if cfg.model == "factorized":
        return FactorizedPrior(cfg.n, cfg.m)
    raise ValueError(cfg.model)


def build_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(cfg.lr)


def init_state(cfg: TrainConfig, key: jax.Array,
               input_shape: Tuple[int, int, int, int] | None = None):
    model = build_model(cfg)
    shape = input_shape or (1, cfg.crop, cfg.crop, 3)
    params = model.init(key, jnp.zeros(shape, jnp.float32),
                        key=jax.random.fold_in(key, 1))
    opt_state = build_optimizer(cfg).init(params)
    return model, params, opt_state


def rd_loss(model, params, batch: jax.Array, key: jax.Array,
            rd_lambda: float) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    out = model.apply(params, batch, key=key)
    mse = jnp.mean(jnp.square(out["x_hat"] - batch))
    bpp = out["bpp"]
    loss = bpp + rd_lambda * (255.0 ** 2) * mse
    return loss, {"loss": loss, "bpp": bpp, "mse": mse,
                  "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))}


def make_train_step(cfg: TrainConfig):
    """Returns train_step(params, opt_state, batch, key) -> (params, opt_state, metrics)."""
    model = build_model(cfg)
    tx = build_optimizer(cfg)

    def train_step(params, opt_state, batch, key):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: rd_loss(model, p, batch, key, cfg.rd_lambda),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step
