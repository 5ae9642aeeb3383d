"""End-to-end bitstream codec for the flagship bit-exact integer model.

encode: image -> integer analysis transform (bit-exact, TPU) -> int8 latent
        (values 0..127) -> lossless rANS coding with per-channel adaptive
        histograms -> container bytes.
decode: container bytes -> rANS decode (exact latent) -> integer synthesis
        transform -> reconstruction, bit-exact with running the autoencoder
        directly (the reference's correctness bar, conv3_nonsquare_tb.cpp
        :1068-1123, extended through a real bitstream).

The reference's 4:1 fixed bottleneck becomes ~4/(8/H) : 1 where H is the
latent entropy in bits (typically < 2 bits/symbol on natural images).
"""

from __future__ import annotations

import functools
import struct
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, REFERENCE_NET, reference_net_for_input
from ..models import codec_int
from . import container, entropy, rans

_MAX_SYM = 128  # latent values are post-ReLU int8: 0..127
_L = _MAX_SYM + 1  # + escape bucket (never used for in-range data)


@functools.lru_cache(maxsize=None)
def _jit_analysis(cfg: ModelConfig):
    """Compiled analysis transform, cached per topology.

    Eager (op-by-op) execution of the 8-layer stack dispatches hundreds of
    ops individually — over a tunneled TPU that is seconds-to-minutes; the
    compiled step is milliseconds."""
    return jax.jit(lambda p, x: codec_int.analysis_int8(p, x, cfg))


@functools.lru_cache(maxsize=None)
def _jit_synthesis(cfg: ModelConfig):
    return jax.jit(lambda p, z: codec_int.synthesis_int8(p, z, cfg))


def _histogram_cdfs(z: np.ndarray) -> np.ndarray:
    """Per-channel histogram -> quantized CDF rows (C, L+1)."""
    c = z.shape[-1]
    flat = z.reshape(-1, c)
    rows = []
    for ch in range(c):
        counts = np.bincount(flat[:, ch].astype(np.int64),
                             minlength=_MAX_SYM).astype(np.float64)
        pmf = counts / max(counts.sum(), 1.0)
        rows.append(entropy.quantize_cdf(np.append(pmf, 0.0)))
    return np.stack(rows)


def _serialize_cdfs(cdfs: np.ndarray) -> bytes:
    # store the pmf frequencies as u16 (last row entry 2^16 is implicit)
    freqs = np.diff(cdfs, axis=1).astype(np.int64)
    # frequencies sum to 2^16 per row; u16 with 65536 stored as 0 is
    # unambiguous only if no other freq is 0 — quantize_cdf guarantees >=1.
    return freqs.astype("<u2").tobytes()


def _deserialize_cdfs(data: bytes, channels: int) -> np.ndarray:
    freqs = np.frombuffer(data, "<u2").astype(np.int64).reshape(channels, _L)
    freqs[freqs == 0] = 1 << 16
    cdfs = np.zeros((channels, _L + 1), np.int64)
    cdfs[:, 1:] = np.cumsum(freqs, axis=1)
    return cdfs.astype(np.int32)


def build_static_cdfs(params: Dict[str, jax.Array], images,
                      cfg: ModelConfig = REFERENCE_NET) -> np.ndarray:
    """Fit per-channel latent CDFs on sample images (shipped with the model,
    so bitstreams carry no tables)."""
    fa = _jit_analysis(cfg)
    zs = [np.asarray(fa(params, x)) for x in images]
    z = np.concatenate([a.reshape(-1, a.shape[-1]) for a in zs], axis=0)
    return _histogram_cdfs(z[None])


def compress(params: Dict[str, jax.Array], x: jax.Array,
             cfg: ModelConfig = REFERENCE_NET,
             static_cdfs: np.ndarray | None = None) -> bytes:
    """x: (1, X, Y, 3) int8/uint8 wire image -> container bytes.

    With `static_cdfs` (from ``build_static_cdfs``) the tables are not
    embedded; otherwise per-image histograms are built and serialized
    (2*C*(L) bytes of overhead — fine for large images).
    """
    z = np.asarray(_jit_analysis(cfg)(params, x))
    n, zx, zy, c = z.shape
    assert n == 1, "one image per bitstream"
    cdfs = _histogram_cdfs(z) if static_cdfs is None else static_cdfs
    syms = z.reshape(-1, c).astype(np.int32)
    ctx = np.broadcast_to(np.arange(c, dtype=np.int32), syms.shape)
    payload = rans.encode(syms.ravel(), ctx.ravel(), cdfs)
    header = struct.pack("<HHHHH", x.shape[1], x.shape[2], zx, zy, c)
    cdf_section = b"" if static_cdfs is not None else _serialize_cdfs(cdfs)
    return container.pack(container.CODEC_INT8,
                          [header, cdf_section, payload])


def decompress(params: Dict[str, jax.Array], data: bytes,
               static_cdfs: np.ndarray | None = None,
               ) -> Tuple[jax.Array, jax.Array]:
    """container bytes -> (reconstruction int8 (1,X,Y,3), latent int8)."""
    codec_id, (header, cdf_bytes, payload) = container.unpack(data)
    assert codec_id == container.CODEC_INT8
    ix, iy, zx, zy, c = struct.unpack("<HHHHH", header)
    if cdf_bytes:
        cdfs = _deserialize_cdfs(cdf_bytes, c)
    else:
        assert static_cdfs is not None, "bitstream needs the model's tables"
        cdfs = static_cdfs
    nsym = zx * zy * c
    ctx = np.broadcast_to(np.arange(c, dtype=np.int32),
                          (zx * zy, c)).ravel()
    syms, _ = rans.decode(payload, nsym, ctx, cdfs)
    z = syms.reshape(1, zx, zy, c).astype(np.int8)
    cfg = (REFERENCE_NET if (ix, iy) == (768, 512)
           else reference_net_for_input(ix, iy))
    x_hat = _jit_synthesis(cfg)(params, jnp.asarray(z))
    return x_hat, jnp.asarray(z)


def compression_stats(x_shape, data: bytes) -> Dict[str, float]:
    n_pixels = x_shape[1] * x_shape[2]
    raw_bytes = n_pixels * x_shape[3]
    return {
        "bytes": len(data),
        "bpp": 8.0 * len(data) / n_pixels,
        "ratio": raw_bytes / len(data),
    }
