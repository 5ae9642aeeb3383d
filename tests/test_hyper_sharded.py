"""Sharded hyperprior entropy stage: byte-identity with the single-chip
device format and exact roundtrip (VERDICT r3 item 6).

Runs on the virtual CPU mesh (conftest: 8 devices).  A 4-chip mesh is
used so the z tensor's stream plan (S_z = 4 at this geometry) tiles
evenly over chips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.codec import hyper_codec
from simple_image_compression_network_tpu.models.hyperprior import (
    MeanScaleHyperprior, ScaleHyperprior)
from simple_image_compression_network_tpu.parallel import (
    hyper_sharded, mesh as meshlib)

# 1024x1024 image, tiny model: z is 16x16 (S_z=4), y is 64x64 (S_y=8)
IMG = 1024
N_CHIPS = 4


def _build(model_cls):
    model = model_cls(n=16, m=24)
    key = jax.random.key(7)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 256, 256, 3), jnp.float32),
        key=jax.random.fold_in(key, 1))
    if model_cls is MeanScaleHyperprior:
        codec = hyper_codec.MeanScaleCodec(model, params)
    else:
        codec = hyper_codec.HyperCodec(model, params)
    return codec


def _images(b=2):
    rng = np.random.default_rng(5)
    base = rng.uniform(0.2, 0.8, size=(b, IMG // 16, IMG // 16, 3))
    img = np.repeat(np.repeat(base, 16, axis=1), 16, axis=2)
    img += rng.normal(0, 0.02, img.shape)
    return jnp.asarray(np.clip(img, 0, 1).astype(np.float32))


@pytest.mark.parametrize("model_cls", [ScaleHyperprior,
                                       MeanScaleHyperprior])
def test_sharded_hyper_byte_identical_and_exact(model_cls):
    codec = _build(model_cls)
    mesh = meshlib.make_mesh((N_CHIPS,), ("x",))
    sharded = hyper_sharded.ShardedHyperCodec(codec, mesh)
    x = _images()

    blobs_s = sharded.compress_batch(x)
    blobs_1 = codec.compress_batch(x)
    assert [len(b) for b in blobs_s] == [len(b) for b in blobs_1]
    assert all(a == b for a, b in zip(blobs_s, blobs_1)), (
        "sharded containers differ from single-chip bytes")

    x_hat_s, y_hat_s = sharded.decompress_batch(blobs_s)
    x_hat_1, y_hat_1 = codec.decompress_batch(blobs_1)
    np.testing.assert_array_equal(np.asarray(y_hat_s),
                                  np.asarray(y_hat_1))
    np.testing.assert_allclose(np.asarray(x_hat_s), np.asarray(x_hat_1),
                               atol=1e-5)


def test_sharded_hyper_escape_batch_falls_back(monkeypatch):
    """An escape-bearing batch transparently routes to the single-chip
    codec on BOTH sides of the sharded API (VERDICT r4 item 6): the
    containers carry real escapes, roundtrip byte-correctly, and the
    decoded latents match the single-chip encoder's exactly."""
    from simple_image_compression_network_tpu.codec import (
        container, escape)
    # shrink the device alphabets so out-of-gamut input forces escapes
    monkeypatch.setattr(hyper_codec, "_Y_MAX_DEV", 1)
    monkeypatch.setattr(hyper_codec, "_Z_MAX", 1)
    monkeypatch.setattr(hyper_sharded, "_Y_MAX_DEV", 1)
    monkeypatch.setattr(hyper_sharded, "_Z_MAX", 1)
    codec = _build(ScaleHyperprior)
    codec.z_cdfs = hyper_codec.build_factorized_cdfs(
        codec.model, codec.params, max_abs=1)
    codec.y_cdfs_dev = hyper_codec.build_gaussian_cdfs(
        codec.scale_table, 1)
    mesh = meshlib.make_mesh((N_CHIPS,), ("x",))
    sharded = hyper_sharded.ShardedHyperCodec(codec, mesh)
    x = _images(1) * 9.0 - 4.0  # out-of-gamut -> latents beyond +-1

    blobs = sharded.compress_batch(x)
    n_raw = 0
    for blob in blobs:
        _, (_, _, _, z_raw, y_raw) = container.unpack(blob)
        n_raw += escape.unpack_raw(z_raw)[0].size
        n_raw += escape.unpack_raw(y_raw)[0].size
    assert n_raw > 0, "test should force at least one escape"
    assert blobs == codec.compress_batch(x), (
        "fallback containers must be the single-chip bytes")

    x_hat, y_hat = sharded.decompress_batch(blobs)
    ysym, _, _, _ = codec._encode_dev_arrays(x)
    np.testing.assert_array_equal(
        np.asarray(y_hat), np.asarray(jnp.asarray(ysym, jnp.float32)))


def test_sharded_hyper_corrupt_stream_raises():
    codec = _build(ScaleHyperprior)
    mesh = meshlib.make_mesh((N_CHIPS,), ("x",))
    sharded = hyper_sharded.ShardedHyperCodec(codec, mesh)
    blobs = sharded.compress_batch(_images(1))
    bad = bytearray(blobs[0])
    bad[-3] ^= 0xFF  # flip payload bytes near the end (y stream)
    with pytest.raises(ValueError):
        sharded.decompress_batch([bytes(bad)])
