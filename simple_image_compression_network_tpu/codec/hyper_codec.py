"""End-to-end bitstream codec for the scale-hyperprior float model.

encode: x -> g_a -> y; h_a -> z; round(z) coded with the learned factorized
        CDFs; h_s(z_hat) -> sigma; round(y) coded with scale-binned Gaussian
        CDF tables (context = scale bin).
decode: z from bitstream -> sigma -> y from bitstream -> g_s(y_hat).

The decoded y_hat/z_hat are exactly the encoder's rounded integers (rANS is
lossless), so encoder/decoder reconstructions match bit-for-bit given
deterministic synthesis.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Tuple

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


class HyperCodec:
    """Encoder/decoder pair sharing precomputed tables."""

    def __init__(self, model: ScaleHyperprior, params):
        self.model = model
        self.params = params
        self.scale_table = entropy.default_scale_table()
        self.z_cdfs = build_factorized_cdfs(model, params)
        self.y_cdfs = build_gaussian_cdfs(self.scale_table)
        self._encode_arrays = jax.jit(
            lambda x: model.apply(params, x, method=model.encode_arrays))
        self._decode_arrays = jax.jit(
            lambda y: model.apply(params, y, method=model.decode_arrays))
        self._scales_from_z = jax.jit(
            lambda z: model.apply(params, z, method=model.scales_from_z))

    def compress(self, x: jax.Array) -> bytes:
        y, z, sigma = self._encode_arrays(x)
        y = np.asarray(y, np.int32)
        z = np.asarray(z, np.int32)
        sigma = np.asarray(sigma)
        n, zx, zy, zc = z.shape
        assert n == 1
        # hyper-latent: channel context
        z_syms = np.clip(z, -_Z_MAX, _Z_MAX) + _Z_MAX
        esc_z = self.z_cdfs.shape[1] - 2
        over = (np.abs(z) > _Z_MAX)
        z_syms = np.where(over, esc_z, z_syms)
        z_ctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                z.reshape(-1, zc).shape)
        z_bytes = rans.encode(z_syms.reshape(-1, zc).ravel(), z_ctx.ravel(),
                              self.z_cdfs, raw=z.reshape(-1, zc).ravel())
        # latent: scale-bin context
        idx = entropy.scale_to_index(sigma.ravel(), self.scale_table)
        y_syms = np.clip(y, -_Y_MAX, _Y_MAX) + _Y_MAX
        esc_y = self.y_cdfs.shape[1] - 2
        over_y = (np.abs(y) > _Y_MAX)
        y_syms = np.where(over_y, esc_y, y_syms)
        y_bytes = rans.encode(y_syms.ravel(), idx, self.y_cdfs,
                              raw=y.ravel())
        header = struct.pack("<HHHHHH", x.shape[1], x.shape[2], zx, zy, zc,
                             y.shape[3])
        return container.pack(container.CODEC_HYPERPRIOR,
                              [header, z_bytes, y_bytes])

    def decompress(self, data: bytes) -> Tuple[jax.Array, jax.Array]:
        codec_id, (header, z_bytes, y_bytes) = container.unpack(data)
        assert codec_id == container.CODEC_HYPERPRIOR
        ix, iy, zx, zy, zc, yc = struct.unpack("<HHHHHH", header)
        nz = zx * zy * zc
        z_ctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                (zx * zy, zc)).ravel()
        z_syms, z_raw = rans.decode(z_bytes, nz, z_ctx, self.z_cdfs)
        esc_z = self.z_cdfs.shape[1] - 2
        z = np.where(z_syms == esc_z, z_raw, z_syms - _Z_MAX)
        z_hat = jnp.asarray(z.reshape(1, zx, zy, zc), jnp.float32)
        sigma = np.asarray(self._scales_from_z(z_hat))
        idx = entropy.scale_to_index(sigma.ravel(), self.scale_table)
        ny = sigma.size
        y_syms, y_raw = rans.decode(y_bytes, ny, idx, self.y_cdfs)
        esc_y = self.y_cdfs.shape[1] - 2
        y = np.where(y_syms == esc_y, y_raw, y_syms - _Y_MAX)
        y_hat = jnp.asarray(y.reshape(sigma.shape), jnp.float32)
        x_hat = self._decode_arrays(y_hat)
        return x_hat, y_hat

    def stats(self, x_shape, data: bytes) -> Dict[str, float]:
        n_pixels = x_shape[1] * x_shape[2]
        return {"bytes": len(data), "bpp": 8.0 * len(data) / n_pixels}


class MeanScaleCodec(HyperCodec):
    """Codec for MeanScaleHyperprior: symbols are round(y - mu) (zero-mean),
    reconstruction adds mu back before synthesis."""

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
        self._params_from_z = jax.jit(
            lambda z: model.apply(params, z, method=model.params_from_z))

    def compress(self, x: jax.Array) -> bytes:
        syms_f, z, mu, sigma = self._encode_arrays(x)
        y = np.asarray(syms_f, np.int32)   # already centered
        z = np.asarray(z, np.int32)
        sigma = np.asarray(sigma)
        n, zx, zy, zc = z.shape
        assert n == 1
        z_syms = np.clip(z, -_Z_MAX, _Z_MAX) + _Z_MAX
        esc_z = self.z_cdfs.shape[1] - 2
        z_syms = np.where(np.abs(z) > _Z_MAX, esc_z, z_syms)
        z_ctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                z.reshape(-1, zc).shape)
        z_bytes = rans.encode(z_syms.reshape(-1, zc).ravel(), z_ctx.ravel(),
                              self.z_cdfs, raw=z.reshape(-1, zc).ravel())
        idx = entropy.scale_to_index(sigma.ravel(), self.scale_table)
        y_syms = np.clip(y, -_Y_MAX, _Y_MAX) + _Y_MAX
        esc_y = self.y_cdfs.shape[1] - 2
        y_syms = np.where(np.abs(y) > _Y_MAX, esc_y, y_syms)
        y_bytes = rans.encode(y_syms.ravel(), idx, self.y_cdfs, raw=y.ravel())
        header = struct.pack("<HHHHHH", x.shape[1], x.shape[2], zx, zy, zc,
                             y.shape[3])
        return container.pack(container.CODEC_HYPERPRIOR,
                              [header, z_bytes, y_bytes])

    def decompress(self, data: bytes) -> Tuple[jax.Array, jax.Array]:
        codec_id, (header, z_bytes, y_bytes) = container.unpack(data)
        assert codec_id == container.CODEC_HYPERPRIOR
        ix, iy, zx, zy, zc, yc = struct.unpack("<HHHHHH", header)
        nz = zx * zy * zc
        z_ctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                (zx * zy, zc)).ravel()
        z_syms, z_raw = rans.decode(z_bytes, nz, z_ctx, self.z_cdfs)
        esc_z = self.z_cdfs.shape[1] - 2
        z = np.where(z_syms == esc_z, z_raw, z_syms - _Z_MAX)
        z_hat = jnp.asarray(z.reshape(1, zx, zy, zc), jnp.float32)
        mu, sigma = self._params_from_z(z_hat)
        sigma = np.asarray(sigma)
        idx = entropy.scale_to_index(sigma.ravel(), self.scale_table)
        ny = sigma.size
        y_syms, y_raw = rans.decode(y_bytes, ny, idx, self.y_cdfs)
        esc_y = self.y_cdfs.shape[1] - 2
        y = np.where(y_syms == esc_y, y_raw, y_syms - _Y_MAX)
        y_hat = jnp.asarray(y.reshape(sigma.shape), jnp.float32) + mu
        x_hat = self._decode_arrays(y_hat)
        return x_hat, y_hat
