"""Overlap-tiled execution: bit-exact vs whole-image."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.config import reference_net_for_input
from simple_image_compression_network_tpu.models import codec_int, tiled
from simple_image_compression_network_tpu.utils import weights_io

CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints", "reference_weights.npz")


@pytest.fixture(scope="module")
def params():
    return {k: jnp.asarray(v) for k, v in
            weights_io.load_checkpoint(CKPT).items()}


def test_tiled_net_bit_exact(params, rng):
    xd, yd = 192, 32
    cfg = reference_net_for_input(xd, yd)
    x = jnp.asarray(rng.integers(0, 256, size=(1, xd, yd, 3),
                                 dtype=np.uint8).view(np.int8))
    impl = ("lax",) * 4 + ("d2s",) * 4
    ref = codec_int.eight_layers_net(params, x, cfg, impl=impl)
    out = tiled.eight_layers_net_tiled(params, x, tile_x=64, impl=impl)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_tiled_analysis_bit_exact(params, rng):
    xd, yd = 160, 32
    cfg = reference_net_for_input(xd, yd)
    x = jnp.asarray(rng.integers(0, 256, size=(1, xd, yd, 3),
                                 dtype=np.uint8).view(np.int8))
    impl = ("lax",) * 4 + ("d2s",) * 4
    ref = codec_int.analysis_int8(params, x, cfg, impl=impl)
    out = tiled.analysis_tiled(params, x, tile_x=32, impl=impl)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
