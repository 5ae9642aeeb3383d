"""End-to-end bitstream codec for the (mean-)scale-hyperprior float models.

encode: x -> g_a -> y; h_a -> z; round(z) coded with the learned factorized
        CDFs; h_s(z_hat) -> (mu,) sigma; round(y - mu) coded with
        scale-binned Gaussian CDF tables (context = scale bin).
decode: z from bitstream -> (mu,) sigma -> y from bitstream -> g_s(y_hat).

The decoded y_hat/z_hat are exactly the encoder's rounded integers (rANS is
lossless), so encoder/decoder reconstructions match bit-for-bit given
deterministic synthesis.

Both codecs share one coding core (``_code``/``_decode``): the only model
differences are whether the prior predicts a mean and how the latent
symbols are centered.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hyperprior import ScaleHyperprior
from . import container, entropy, rans

_Z_MAX = 63    # hyper-latent support [-63, 63] + escape
_Y_MAX = 255   # latent support [-255, 255] + escape


def build_factorized_cdfs(model: ScaleHyperprior, params,
                          max_abs: int = _Z_MAX) -> np.ndarray:
    """Evaluate the learned per-channel density on the integer grid."""
    grid = jnp.arange(-max_abs, max_abs + 1, dtype=jnp.float32)
    grid = jnp.tile(grid[:, None], (1, model.n))
    pmf = np.asarray(model.apply(
        params, grid, method=lambda m, g: m.bottleneck.likelihood(g)))
    rows = []
    for ch in range(model.n):
        p = pmf[:, ch]
        overflow = max(1.0 - p.sum(), 0.0)
        rows.append(entropy.quantize_cdf(np.append(p, overflow)))
    return np.stack(rows)


def build_gaussian_cdfs(scale_table: np.ndarray,
                        max_abs: int = _Y_MAX) -> np.ndarray:
    return np.stack([entropy.gaussian_cdf_table(s, max_abs)
                     for s in scale_table])


def _code(vals: np.ndarray, ctx: np.ndarray, cdfs: np.ndarray,
          max_abs: int) -> bytes:
    """Center/clip integers to symbols with escape + raw side-channel."""
    syms = np.clip(vals, -max_abs, max_abs) + max_abs
    esc = cdfs.shape[1] - 2
    syms = np.where(np.abs(vals) > max_abs, esc, syms)
    return rans.encode(syms.ravel(), ctx.ravel(), cdfs, raw=vals.ravel())


def _decode(data: bytes, n: int, ctx: np.ndarray, cdfs: np.ndarray,
            max_abs: int) -> np.ndarray:
    syms, raw = rans.decode(data, n, ctx, cdfs)
    esc = cdfs.shape[1] - 2
    return np.where(syms == esc, raw, syms - max_abs)


class HyperCodec:
    """Encoder/decoder pair sharing precomputed tables (scale prior)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.scale_table = entropy.default_scale_table()
        self.z_cdfs = build_factorized_cdfs(model, params)
        self.y_cdfs = build_gaussian_cdfs(self.scale_table)
        self._encode_arrays = jax.jit(
            lambda x: model.apply(params, x, method=model.encode_arrays))
        self._decode_arrays = jax.jit(
            lambda y: model.apply(params, y, method=model.decode_arrays))
        if hasattr(model, "scales_from_z"):  # MeanScale uses params_from_z
            self._scales_from_z = jax.jit(
                lambda z: model.apply(params, z, method=model.scales_from_z))

    # --- model-specific hooks -------------------------------------------
    def _encode_parts(self, x) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (centered integer latent symbols, integer z, sigma)."""
        y, z, sigma = self._encode_arrays(x)
        return (np.asarray(y, np.int32), np.asarray(z, np.int32),
                np.asarray(sigma))

    def _prior_from_z(self, z_hat) -> Tuple[Optional[jax.Array], np.ndarray]:
        """-> (mu or None, sigma) predicted from the decoded hyper-latent."""
        return None, np.asarray(self._scales_from_z(z_hat))

    # --- shared coding core ---------------------------------------------
    def compress(self, x: jax.Array) -> bytes:
        y, z, sigma = self._encode_parts(x)
        n, zx, zy, zc = z.shape
        assert n == 1
        z_ctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                z.reshape(-1, zc).shape)
        z_bytes = _code(z.reshape(-1, zc), z_ctx, self.z_cdfs, _Z_MAX)
        idx = entropy.scale_to_index(sigma.ravel(), self.scale_table)
        y_bytes = _code(y.ravel(), idx, self.y_cdfs, _Y_MAX)
        header = struct.pack("<HHHHHH", x.shape[1], x.shape[2], zx, zy, zc,
                             y.shape[3])
        return container.pack(container.CODEC_HYPERPRIOR,
                              [header, z_bytes, y_bytes])

    def decompress(self, data: bytes) -> Tuple[jax.Array, jax.Array]:
        codec_id, (header, z_bytes, y_bytes) = container.unpack(data)
        assert codec_id == container.CODEC_HYPERPRIOR
        ix, iy, zx, zy, zc, yc = struct.unpack("<HHHHHH", header)
        z_ctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                (zx * zy, zc)).ravel()
        z = _decode(z_bytes, zx * zy * zc, z_ctx, self.z_cdfs, _Z_MAX)
        z_hat = jnp.asarray(z.reshape(1, zx, zy, zc), jnp.float32)
        mu, sigma = self._prior_from_z(z_hat)
        idx = entropy.scale_to_index(sigma.ravel(), self.scale_table)
        y = _decode(y_bytes, sigma.size, idx, self.y_cdfs, _Y_MAX)
        y_hat = jnp.asarray(y.reshape(sigma.shape), jnp.float32)
        if mu is not None:
            y_hat = y_hat + mu
        x_hat = self._decode_arrays(y_hat)
        return x_hat, y_hat

    def stats(self, x_shape, data: bytes) -> Dict[str, float]:
        n_pixels = x_shape[1] * x_shape[2]
        return {"bytes": len(data), "bpp": 8.0 * len(data) / n_pixels}


class MeanScaleCodec(HyperCodec):
    """Codec for MeanScaleHyperprior: symbols are round(y - mu) (zero-mean),
    reconstruction adds mu back before synthesis."""

    def __init__(self, model, params):
        super().__init__(model, params)
        self._params_from_z = jax.jit(
            lambda z: model.apply(params, z, method=model.params_from_z))

    def _encode_parts(self, x):
        syms_f, z, mu, sigma = self._encode_arrays(x)
        return (np.asarray(syms_f, np.int32), np.asarray(z, np.int32),
                np.asarray(sigma))

    def _prior_from_z(self, z_hat):
        mu, sigma = self._params_from_z(z_hat)
        return mu, np.asarray(sigma)
