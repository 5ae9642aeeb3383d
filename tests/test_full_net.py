"""Full 8-layer net vs the scalar golden chain — the reference's integration test.

Reproduces ``test_eight_layers_net`` (conv3_nonsquare_tb.cpp:781-1125): run the
whole analysis+synthesis pipeline with the *trained reference weights* and
compare every output element exactly against the layer-by-layer golden model.
The fast variant runs the same topology on a 96x64 input (the net is fully
convolutional); the full 768x512 all-ones testbench shape is env-gated
(RUN_SLOW=1) because the NumPy golden chain is ~72 GMAC.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from simple_image_compression_network_tpu.config import (
    REFERENCE_NET, reference_net_for_input)
from simple_image_compression_network_tpu.models import codec_int
from simple_image_compression_network_tpu.ops import integer
from simple_image_compression_network_tpu.utils import weights_io

CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints", "reference_weights.npz")


@pytest.fixture(scope="module")
def params():
    return weights_io.load_checkpoint(CKPT)


def golden_chain(params, x, cfg):
    """Layer-by-layer NumPy golden forward (verify_conv2d / verify_deconv2d)."""
    h = x
    acts = []
    for i, layer in enumerate(cfg.layers):
        fn = integer.deconv2d_golden if layer.transposed else integer.conv2d_golden
        h = fn(h, params[f"w{i}"], params[f"b{i}"],
               stride=layer.stride, padding=layer.padding)
        assert h.shape[1:] == (layer.out_x, layer.out_y, layer.out_ch), \
            (i, h.shape, (layer.out_x, layer.out_y, layer.out_ch))
        acts.append(h)
    return h, acts


def test_full_net_small_random(params, rng):
    cfg = reference_net_for_input(96, 64)
    x = rng.integers(0, 256, size=(1, 96, 64, 3), dtype=np.uint8)
    golden, acts = golden_chain(params, x, cfg)

    out = codec_int.eight_layers_net(params, jnp.asarray(x.view(np.int8)),
                                     cfg, phased=True)
    np.testing.assert_array_equal(np.asarray(out), golden)

    # latent check too (analysis only)
    z = codec_int.analysis_int8(params, jnp.asarray(x.view(np.int8)), cfg)
    np.testing.assert_array_equal(np.asarray(z), acts[3])


def test_full_net_small_nonphased(params, rng):
    cfg = reference_net_for_input(48, 32)
    x = rng.integers(0, 256, size=(1, 48, 32, 3), dtype=np.uint8)
    golden, _ = golden_chain(params, x, cfg)
    out = codec_int.eight_layers_net(params, jnp.asarray(x.view(np.int8)),
                                     cfg, phased=False)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_latent_shape_and_ratio():
    cfg = REFERENCE_NET
    assert cfg.input_shape == (768, 512, 3)
    assert cfg.latent_shape == (48, 32, 192)
    in_bytes = 768 * 512 * 3
    latent_bytes = 48 * 32 * 192
    assert in_bytes / latent_bytes == 4.0  # fixed 4:1 bottleneck
    assert abs(cfg.total_macs / 1e9 - 72.35) < 0.1  # BASELINE.md total compute


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="full-size golden chain is ~72 GMAC in NumPy; "
                           "set RUN_SLOW=1")
def test_full_net_reference_testbench_all_ones(params):
    """The literal reference testbench: 768x512 all-ones image, MAX_IMAGES=1."""
    x = np.ones((1, 768, 512, 3), np.uint8)
    golden, _ = golden_chain(params, x, REFERENCE_NET)
    out = codec_int.eight_layers_net(params, jnp.asarray(x.view(np.int8)),
                                     REFERENCE_NET, phased=True)
    mismatches = int((np.asarray(out) != golden).sum())
    assert mismatches == 0, f"{mismatches} element mismatches"
