"""Float codec models: factorized-prior and scale-hyperprior autoencoders.

The trainable counterpart of the reference's integer transforms
(BASELINE.json configs 2-4): analysis/synthesis stacks with the reference's
exact geometry (4x 5x5/s2 conv, N=128 internal, M=192 latent channels —
``config_nonsquare.h``) but float weights and GDN activations, plus the
hyperprior entropy stage (hyper-encoder/decoder producing per-latent Gaussian
scales) the reference lacks.

Input images are expected in [0, 1] float, NHWC (N, X, Y, 3).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..codec import entropy
from ..ops.gdn import GDN


def _conv(ch: int, k: int = 5, s: int = 2, dtype=None) -> nn.Conv:
    return nn.Conv(ch, (k, k), strides=(s, s),
                   padding=[(k // 2, k // 2)] * 2, dtype=dtype)


def _deconv(ch: int, k: int = 5, s: int = 2, dtype=None) -> nn.ConvTranspose:
    # 'SAME' padding on a stride-2 transpose conv gives exact 2x upsample,
    # matching the reference's deconv522 output algebra (out = 2*in).
    return nn.ConvTranspose(ch, (k, k), strides=(s, s), padding="SAME",
                            dtype=dtype)


class AnalysisTransform(nn.Module):
    """g_a: image -> latent y.  Geometry of eight_layers_net layers 0-3.

    ``dtype=jnp.bfloat16`` runs the convs/GDN in bf16 (params stay f32;
    XLA accumulates the MXU dots in f32) — the serving fast path.  The
    final latent is returned in f32 so quantization thresholds are
    well-defined."""

    n: int = 128
    m: int = 192
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for ch in (self.n, self.n, self.n):
            x = GDN(dtype=self.dtype)(_conv(ch, dtype=self.dtype)(x))
        return _conv(self.m, dtype=self.dtype)(x).astype(jnp.float32)


class SynthesisTransform(nn.Module):
    """g_s: latent y -> image.  Geometry of eight_layers_net layers 4-7."""

    n: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        for ch in (self.n, self.n, self.n):
            y = GDN(inverse=True, dtype=self.dtype)(
                _deconv(ch, dtype=self.dtype)(y))
        return _deconv(3, dtype=self.dtype)(y).astype(jnp.float32)


class HyperAnalysis(nn.Module):
    """h_a: |y| -> hyper-latent z (2x 5x5/s2 after a 3x3/s1)."""

    n: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        h = nn.relu(nn.Conv(self.n, (3, 3), padding="SAME",
                            dtype=self.dtype)(jnp.abs(y)))
        h = nn.relu(_conv(self.n, dtype=self.dtype)(h))
        return _conv(self.n, dtype=self.dtype)(h).astype(jnp.float32)


class HyperSynthesis(nn.Module):
    """h_s: z_hat -> per-latent Gaussian scales sigma (positive)."""

    n: int = 128
    m: int = 192
    dtype: Any = None

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        h = nn.relu(_deconv(self.n, dtype=self.dtype)(z))
        h = nn.relu(_deconv(self.n, dtype=self.dtype)(h))
        h = nn.Conv(self.m, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return jnp.exp(jnp.clip(h.astype(jnp.float32), -10.0, 10.0))


class HyperSynthesisMeanScale(nn.Module):
    """h_s variant emitting (mu, sigma) per latent (mean-scale hyperprior)."""

    n: int = 128
    m: int = 192
    dtype: Any = None

    @nn.compact
    def __call__(self, z: jax.Array) -> tuple[jax.Array, jax.Array]:
        h = nn.relu(_deconv(self.n, dtype=self.dtype)(z))
        h = nn.relu(_deconv(self.n, dtype=self.dtype)(h))
        h = nn.Conv(2 * self.m, (3, 3), padding="SAME", dtype=self.dtype)(h)
        mu, log_sigma = jnp.split(h.astype(jnp.float32), 2, axis=-1)
        return mu, jnp.exp(jnp.clip(log_sigma, -10.0, 10.0))


class FactorizedPrior(nn.Module):
    """g_a/g_s + factorized entropy bottleneck on y (Balle 2017 style)."""

    n: int = 128
    m: int = 192

    def setup(self):
        self.g_a = AnalysisTransform(self.n, self.m)
        self.g_s = SynthesisTransform(self.n)
        self.bottleneck = entropy.FactorizedEntropy(self.m)

    def __call__(self, x: jax.Array, *, key: jax.Array | None = None
                 ) -> Dict[str, jax.Array]:
        y = self.g_a(x)
        y_hat = (entropy.quantize_noise(y, key) if key is not None
                 else entropy.quantize_ste(y))
        bits_y = self.bottleneck(y_hat)
        x_hat = self.g_s(y_hat)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        return {"x_hat": x_hat, "y_hat": y_hat,
                "bits": bits_y, "bpp": bits_y / num_pixels}


class ScaleHyperprior(nn.Module):
    """g_a/g_s + hyperprior entropy stage (Balle 2018 style).

    __call__ returns the training quantities; encode/decode-side helpers
    (deterministic latents + scales) live in codec/codec.py.
    ``dtype=jnp.bfloat16`` switches every transform to the bf16 serving
    fast path (params stay f32; checkpoints are dtype-agnostic).
    """

    n: int = 128
    m: int = 192
    dtype: Any = None

    def setup(self):
        self.g_a = AnalysisTransform(self.n, self.m, self.dtype)
        self.g_s = SynthesisTransform(self.n, self.dtype)
        self.h_a = HyperAnalysis(self.n, self.dtype)
        self.h_s = HyperSynthesis(self.n, self.m, self.dtype)
        self.bottleneck = entropy.FactorizedEntropy(self.n)

    def __call__(self, x: jax.Array, *, key: jax.Array | None = None
                 ) -> Dict[str, jax.Array]:
        y = self.g_a(x)
        z = self.h_a(y)
        if key is not None:
            ky, kz = jax.random.split(key)
            y_hat = entropy.quantize_noise(y, ky)
            z_hat = entropy.quantize_noise(z, kz)
        else:
            y_hat = entropy.quantize_ste(y)
            z_hat = entropy.quantize_ste(z)
        sigma = self.h_s(z_hat)
        bits_y = entropy.GaussianConditional.bits(y_hat, sigma)
        bits_z = self.bottleneck(z_hat)
        x_hat = self.g_s(y_hat)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        bits = bits_y + bits_z
        return {"x_hat": x_hat, "y_hat": y_hat, "z_hat": z_hat,
                "sigma": sigma, "bits_y": bits_y, "bits_z": bits_z,
                "bits": bits, "bpp": bits / num_pixels}

    def encode_arrays(self, x: jax.Array
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Deterministic encode: (y_rounded, z_rounded, sigma)."""
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat = jnp.round(z)
        sigma = self.h_s(z_hat)
        return jnp.round(y), z_hat, sigma

    def analysis_arrays(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Transforms only: (unrounded y, rounded z_hat).  The codec
        derives mu/sigma from z_hat with the SAME jitted program the
        decoder runs (``scales_from_z``/``params_from_z``), so encoder
        and decoder scale-bin contexts agree bitwise (ADVICE r3: two
        distinct XLA programs for h_s are not ulp-identical, and an ulp
        on a searchsorted bin edge desyncs the y stream)."""
        y = self.g_a(x)
        return y, jnp.round(self.h_a(y))

    def decode_arrays(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)

    def scales_from_z(self, z_hat: jax.Array) -> jax.Array:
        return self.h_s(z_hat)


class MeanScaleHyperprior(nn.Module):
    """Mean-scale hyperprior (Minnen 2018 style, without the autoregressive
    context model): h_s predicts (mu, sigma); y is coded as round(y - mu) + mu
    so the coded symbols are zero-mean."""

    n: int = 128
    m: int = 192
    dtype: Any = None

    def setup(self):
        self.g_a = AnalysisTransform(self.n, self.m, self.dtype)
        self.g_s = SynthesisTransform(self.n, self.dtype)
        self.h_a = HyperAnalysis(self.n, self.dtype)
        self.h_s = HyperSynthesisMeanScale(self.n, self.m, self.dtype)
        self.bottleneck = entropy.FactorizedEntropy(self.n)

    def __call__(self, x: jax.Array, *, key: jax.Array | None = None
                 ) -> Dict[str, jax.Array]:
        y = self.g_a(x)
        z = self.h_a(y)
        if key is not None:
            ky, kz = jax.random.split(key)
            z_hat = entropy.quantize_noise(z, kz)
        else:
            z_hat = entropy.quantize_ste(z)
        mu, sigma = self.h_s(z_hat)
        if key is not None:
            y_hat = entropy.quantize_noise(y, ky)
        else:
            y_hat = entropy.quantize_ste(y - mu) + mu
        bits_y = entropy.GaussianConditional.bits(y_hat, sigma, mu)
        bits_z = self.bottleneck(z_hat)
        x_hat = self.g_s(y_hat)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        bits = bits_y + bits_z
        return {"x_hat": x_hat, "y_hat": y_hat, "z_hat": z_hat,
                "mu": mu, "sigma": sigma, "bits_y": bits_y, "bits_z": bits_z,
                "bits": bits, "bpp": bits / num_pixels}

    def encode_arrays(self, x: jax.Array):
        """(symbols round(y-mu), z_hat, mu, sigma)."""
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat = jnp.round(z)
        mu, sigma = self.h_s(z_hat)
        return jnp.round(y - mu), z_hat, mu, sigma

    def analysis_arrays(self, x: jax.Array):
        """Transforms only: (unrounded y, rounded z_hat) — see
        ``ScaleHyperprior.analysis_arrays``."""
        y = self.g_a(x)
        return y, jnp.round(self.h_a(y))

    def decode_arrays(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)

    def params_from_z(self, z_hat: jax.Array):
        return self.h_s(z_hat)
