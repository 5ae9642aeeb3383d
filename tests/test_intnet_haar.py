"""The constructive Haar-wavelet weights (intnet_haar.py).

Bars: (1) the deployed bit-exact integer net with these weights equals the
golden wavelet model on random + structured content (which proves no wrap
event ever fires: a single wrap would break the equality); (2) weights are
int4-range {-1,0,1}; (3) the wrap-STE training forward agrees with the
deployed net on the same params; (4) reconstruction quality on a smooth
ramp beats 30 dB (sanity floor, the real RD numbers live in bench/RESULTS).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_image_compression_network_tpu import intnet, intnet_haar
from simple_image_compression_network_tpu.config import (
    reference_net_for_input)
from simple_image_compression_network_tpu.models import codec_int


def _net_params(cfg):
    p = intnet_haar.haar_params(cfg)
    return {k: jnp.asarray(v) for k, v in p.items()
            if not k.startswith("disp")}


@pytest.mark.parametrize("shape", [(64, 64), (96, 128)])
@pytest.mark.parametrize("interp", [False, True])
def test_haar_equals_golden(shape, interp):
    cfg = reference_net_for_input(*shape)
    p = intnet_haar.haar_params(cfg, interp=interp)
    params = {k: jnp.asarray(v) for k, v in p.items()
              if not k.startswith("disp")}
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(2, *shape, 3), dtype=np.uint8)
    wire = jnp.asarray(intnet_haar.to_wire(x))
    out = np.asarray(codec_int.eight_layers_net(params, wire, cfg))
    np.testing.assert_array_equal(
        out, intnet_haar.golden_wavelet(x, interp=interp))


def test_weights_are_int4_sparse():
    p = intnet_haar.haar_params()
    for i in range(8):
        w = p[f"w{i}"]
        # {-1, 0, 1} everywhere; the bilinear output layer also uses 2
        assert set(np.unique(w)).issubset({-1, 0, 1, 2})
        assert -128 <= p[f"b{i}"].min() and p[f"b{i}"].max() <= 127


def test_training_forward_matches_deployed():
    cfg = reference_net_for_input(64, 64)
    ip = intnet_haar.haar_params(cfg)
    shadows = {k: jnp.asarray(v, jnp.float32) for k, v in ip.items()
               if not k.startswith("disp")}
    x = np.random.default_rng(1).integers(
        0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    xh = jnp.asarray((x >> intnet_haar.INPUT_SHIFT).astype(np.float32))
    y, _, _ = intnet.forward(shadows, xh, cfg, mode="wrap")
    deployed = codec_int.eight_layers_net(
        {k: jnp.asarray(v) for k, v in ip.items()
         if not k.startswith("disp")},
        jnp.asarray(intnet_haar.to_wire(x)), cfg)
    np.testing.assert_array_equal(np.asarray(y).astype(np.int8),
                                  np.asarray(deployed))


def test_quality_on_smooth_content():
    """Smooth ramp: replication error is tiny, PSNR must clear 30 dB."""
    cfg = reference_net_for_input(64, 64)
    params = _net_params(cfg)
    xx, yy = np.meshgrid(np.linspace(0, 255, 64), np.linspace(0, 200, 64),
                         indexing="ij")
    x = np.stack([xx, yy, (xx + yy) / 2], axis=-1).astype(np.uint8)[None]
    out = np.asarray(codec_int.eight_layers_net(
        params, jnp.asarray(intnet_haar.to_wire(x)), cfg))
    p = intnet_haar.haar_params(cfg)
    rec = intnet_haar.display(out, p["disp_a"], p["disp_b"]).astype(
        np.float64)
    mse = np.mean((rec - x.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 30.0, psnr
