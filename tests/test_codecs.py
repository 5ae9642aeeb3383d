"""End-to-end bitstream codecs: roundtrip exactness + rate sanity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.codec import (container, int_codec,
                                                        hyper_codec)
from simple_image_compression_network_tpu.config import reference_net_for_input
from simple_image_compression_network_tpu.models import codec_int
from simple_image_compression_network_tpu.models.hyperprior import (
    ScaleHyperprior)
from simple_image_compression_network_tpu.utils import weights_io

CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints", "reference_weights.npz")


def test_container_roundtrip():
    secs = [b"abc", b"", b"\x00" * 100]
    data = container.pack(container.CODEC_INT8, secs)
    cid, out = container.unpack(data)
    assert cid == container.CODEC_INT8
    assert out == secs


def test_int_codec_bit_exact_roundtrip(rng):
    params = weights_io.load_checkpoint(CKPT)
    cfg = reference_net_for_input(96, 64)
    x = jnp.asarray(rng.integers(0, 256, size=(1, 96, 64, 3),
                                 dtype=np.uint8).view(np.int8))
    # ground truth: run the autoencoder directly
    z_direct = codec_int.analysis_int8(params, x, cfg)
    x_direct = codec_int.synthesis_int8(params, z_direct, cfg)

    # embedded-table mode: self-contained bitstream
    data = int_codec.compress(params, x, cfg)
    x_hat, z_hat = int_codec.decompress(params, data)
    np.testing.assert_array_equal(np.asarray(z_hat), np.asarray(z_direct))
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_direct))

    # static-table mode: tables shipped with the model, not the stream
    cdfs = int_codec.build_static_cdfs(params, [x], cfg)
    data_s = int_codec.compress(params, x, cfg, static_cdfs=cdfs)
    x_hat2, z_hat2 = int_codec.decompress(params, data_s, static_cdfs=cdfs)
    np.testing.assert_array_equal(np.asarray(z_hat2), np.asarray(z_direct))
    np.testing.assert_array_equal(np.asarray(x_hat2), np.asarray(x_direct))

    stats = int_codec.compression_stats(x.shape, data_s)
    # latent is 4x smaller than input; entropy coding must beat raw latent
    assert stats["bpp"] < 6.0
    assert stats["ratio"] > 4.0


def test_hyper_codec_roundtrip(rng):
    model = ScaleHyperprior(n=32, m=48)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x, key=jax.random.key(1))
    codec = hyper_codec.HyperCodec(model, params)
    data = codec.compress(x)
    x_hat, y_hat = codec.decompress(data)
    assert x_hat.shape == x.shape
    # decoder must reproduce the encoder's quantized latents exactly
    y_enc, z_enc, _ = codec._encode_arrays(x)
    np.testing.assert_array_equal(np.asarray(y_hat),
                                  np.asarray(y_enc, np.float32))
    # and therefore the exact same reconstruction
    x_ref = codec._decode_arrays(jnp.asarray(np.asarray(y_enc, np.float32)))
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_ref))
    assert codec.stats(x.shape, data)["bpp"] > 0


def test_meanscale_codec_roundtrip(rng):
    from simple_image_compression_network_tpu.models.hyperprior import (
        MeanScaleHyperprior)
    model = MeanScaleHyperprior(n=32, m=48)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x, key=jax.random.key(1))
    codec = hyper_codec.MeanScaleCodec(model, params)
    data = codec.compress(x)
    x_hat, y_hat = codec.decompress(data)
    assert x_hat.shape == x.shape
    syms, z_enc, mu, _ = codec._encode_arrays(x)
    y_ref = jnp.asarray(np.asarray(syms, np.float32)) + mu
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y_ref),
                               rtol=0, atol=1e-5)
    x_ref = codec._decode_arrays(y_ref)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(x_ref),
                               rtol=0, atol=1e-5)
