"""bf16 serving fast path: dtype-agnostic checkpoints, exact roundtrip.

The bf16 codec is its own self-consistent coder (its y/z/sigma come from
the bf16 programs on both sides), so the lossless contract — decoded
latents == encoder symbols (+ mu) — must hold exactly, while params and
containers stay interchangeable with the f32 model's format.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.codec import hyper_codec
from simple_image_compression_network_tpu.models.hyperprior import (
    MeanScaleHyperprior, ScaleHyperprior)
from simple_image_compression_network_tpu.utils import data as datalib


@pytest.mark.parametrize("model_cls,codec_cls", [
    (ScaleHyperprior, hyper_codec.HyperCodec),
    (MeanScaleHyperprior, hyper_codec.MeanScaleCodec)])
def test_bf16_codec_roundtrip_exact(model_cls, codec_cls):
    model = model_cls(n=16, m=24)
    key = jax.random.key(3)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 64, 64, 3), jnp.float32),
        key=jax.random.fold_in(key, 1))
    # same f32 params drive the bf16 clone (checkpoints are dtype-agnostic)
    fast = model.clone(dtype=jnp.bfloat16)
    codec = codec_cls(fast, params)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0.1, 0.9, size=(2, 128, 128, 3)).astype(np.float32))
    blobs = codec.compress_batch(x)
    x_hat, y_hat = codec.decompress_batch(blobs)
    ysym, _, mu, _ = codec._encode_dev_arrays(x)
    expect = (ysym if mu is None else ysym + mu).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(expect))
    assert x_hat.dtype == jnp.float32


def test_training_bank_mixed_content():
    bank = datalib.training_bank(10, 128, 128, seed=2)
    assert bank.shape == (10, 128, 128, 3) and bank.dtype == np.uint8
    # every entry has real signal (no constant/black fills)
    stds = bank.reshape(10, -1).std(axis=1)
    assert (stds > 5).all()
    # deterministic by seed
    np.testing.assert_array_equal(
        bank, datalib.training_bank(10, 128, 128, seed=2))
