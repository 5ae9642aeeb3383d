"""Entropy models: factorized bottleneck + Gaussian conditional.

The capability the reference lacks (SURVEY.md §0: "no quantizer module, no
entropy model, no bitstream coder") — added per BASELINE.json configs 3-5.

* ``quantize_noise``: additive U(-1/2, 1/2) for differentiable training.
* ``quantize_ste``: hard round with straight-through gradients.
* ``FactorizedEntropy``: per-channel non-parametric CDF (the "entropy
  bottleneck" construction: a stack of monotone 1-d transforms squashed with a
  sigmoid), used for the hyper-latent z.
* ``GaussianConditional``: discretized N(mu, sigma^2) likelihoods for the
  latent y given hyperprior-decoded scales.
* CDF quantization utilities producing the integer tables the range coder
  consumes (``codec/rans.py`` / ``native/rans.cpp``).

All log-likelihoods are in bits.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gdn import lower_bound

SCALE_MIN = 0.11
LOG2 = 0.6931471805599453


def quantize_noise(y: jax.Array, key: jax.Array) -> jax.Array:
    """Additive uniform noise proxy for rounding (training)."""
    return y + jax.random.uniform(key, y.shape, y.dtype, -0.5, 0.5)


@jax.custom_vjp
def quantize_ste(y: jax.Array) -> jax.Array:
    return jnp.round(y)


def _ste_fwd(y):
    return jnp.round(y), None


def _ste_bwd(_, g):
    return (g,)


quantize_ste.defvjp(_ste_fwd, _ste_bwd)


def _std_cdf(x: jax.Array) -> jax.Array:
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


class GaussianConditional:
    """Discretized conditional N(mu, sigma^2) over integer symbols."""

    @staticmethod
    def likelihood(y_hat: jax.Array, scale: jax.Array,
                   mean: jax.Array | None = None) -> jax.Array:
        """P(y_hat) = Phi((v+.5)/s) - Phi((v-.5)/s), v = y_hat - mean."""
        scale = lower_bound(scale, SCALE_MIN)
        v = y_hat if mean is None else y_hat - mean
        upper = _std_cdf((v + 0.5) / scale)
        lower = _std_cdf((v - 0.5) / scale)
        return jnp.maximum(upper - lower, 1e-9)

    @staticmethod
    def bits(y_hat: jax.Array, scale: jax.Array,
             mean: jax.Array | None = None) -> jax.Array:
        """Total rate in bits."""
        p = GaussianConditional.likelihood(y_hat, scale, mean)
        return -jnp.sum(jnp.log(p)) / LOG2


class FactorizedEntropy(nn.Module):
    """Per-channel learned univariate CDF (entropy bottleneck).

    c(x) = sigmoid(f_K(...f_1(x))), f_k(x) = softplus(H_k) x + b_k + a_k
    tanh(softplus(H_k) x + b_k); monotone by construction.  Channels share
    nothing; each has its own tiny chain.
    """

    channels: int
    filters: Sequence[int] = (3, 3, 3)
    init_scale: float = 10.0

    @nn.compact
    def _logits_cdf(self, x: jax.Array) -> jax.Array:
        """x: (C, 1, N) samples per channel -> logits of CDF, same shape."""
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        for k in range(len(dims) - 1):
            h_init = np.log(np.expm1(1.0 / scale / dims[k + 1]))
            H = self.param(f"H{k}",
                           lambda key, s, v=h_init: jnp.full(s, v),
                           (self.channels, dims[k + 1], dims[k]))
            b = self.param(f"b{k}",
                           lambda key, s: jax.random.uniform(key, s, minval=-0.5,
                                                             maxval=0.5),
                           (self.channels, dims[k + 1], 1))
            x = jnp.einsum("cij,cjn->cin", jax.nn.softplus(H), x) + b
            if k < len(dims) - 2:
                a = self.param(f"a{k}", nn.initializers.zeros,
                               (self.channels, dims[k + 1], 1))
                x = x + jnp.tanh(a) * jnp.tanh(x)
        return x

    def likelihood(self, y_hat: jax.Array) -> jax.Array:
        """y_hat: (..., C) quantized (or noisy) values -> P in same shape."""
        c = y_hat.shape[-1]
        flat = jnp.moveaxis(y_hat.reshape(-1, c), 0, 1)[:, None, :]  # (C,1,N)
        lo = self._logits_cdf(flat - 0.5)
        hi = self._logits_cdf(flat + 0.5)
        # numerically stable sigmoid difference
        sign = -jnp.sign(lo + hi)
        p = jnp.abs(jax.nn.sigmoid(sign * hi) - jax.nn.sigmoid(sign * lo))
        p = jnp.moveaxis(p[:, 0, :], 0, 1).reshape(y_hat.shape)
        return jnp.maximum(p, 1e-9)

    def __call__(self, y_hat: jax.Array) -> jax.Array:
        """Rate in bits of the quantized tensor."""
        return -jnp.sum(jnp.log(self.likelihood(y_hat))) / LOG2


# ---------------------------------------------------------------------------
# Integer CDF tables for range coding
# ---------------------------------------------------------------------------

CDF_PRECISION = 16  # probabilities quantized to 1/2^16


def quantize_cdf(pmf: np.ndarray, precision: int = CDF_PRECISION) -> np.ndarray:
    """PMF (float, sums<=1 over symbols+overflow) -> integer CDF table.

    Returns int32 array of len(pmf)+1 with cdf[0]=0, cdf[-1]=2^precision,
    every symbol given frequency >= 1 (decodability).  Steals mass from the
    largest bins to repair rounding.
    """
    total = 1 << precision
    pmf = np.clip(np.asarray(pmf, np.float64), 0, 1)
    freq = np.maximum(np.round(pmf * total).astype(np.int64), 1)
    # repair to sum == total
    excess = int(freq.sum()) - total
    while excess != 0:
        if excess > 0:
            i = int(np.argmax(freq))
            take = min(excess, int(freq[i]) - 1)
            if take == 0:
                raise ValueError("cannot normalize CDF")
            freq[i] -= take
            excess -= take
        else:
            i = int(np.argmax(pmf - freq / total))
            freq[i] += -excess
            excess = 0
    cdf = np.zeros(len(freq) + 1, np.int64)
    cdf[1:] = np.cumsum(freq)
    assert cdf[-1] == total
    return cdf.astype(np.int32)


def gaussian_cdf_table(scale: float, max_abs: int,
                       precision: int = CDF_PRECISION) -> np.ndarray:
    """Integer CDF for a zero-mean discretized Gaussian, symbols
    [-max_abs..max_abs] plus a final overflow bucket."""
    import math
    s = max(float(scale), SCALE_MIN)
    v = np.arange(-max_abs, max_abs + 1, dtype=np.float64)
    upper = 0.5 * (1 + np.vectorize(math.erf)((v + 0.5) / (s * math.sqrt(2))))
    lower = 0.5 * (1 + np.vectorize(math.erf)((v - 0.5) / (s * math.sqrt(2))))
    pmf = upper - lower
    overflow = max(1.0 - pmf.sum(), 0.0)
    return quantize_cdf(np.concatenate([pmf, [overflow]]), precision)


SCALE_TABLE_SIZE = 64


def default_scale_table(smin: float = SCALE_MIN, smax: float = 256.0,
                        n: int = SCALE_TABLE_SIZE) -> np.ndarray:
    """Log-spaced scale bins shared by encoder and decoder."""
    return np.exp(np.linspace(np.log(smin), np.log(smax), n))


def scale_to_index(scale: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Each scale -> smallest table index with table[i] >= scale."""
    idx = np.searchsorted(table, np.asarray(scale), side="left")
    return np.clip(idx, 0, len(table) - 1).astype(np.int32)
