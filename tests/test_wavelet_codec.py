"""WaveletCodec serving wrapper: uint8 roundtrip through real containers."""

import numpy as np
import pytest

from simple_image_compression_network_tpu import intnet_haar
from simple_image_compression_network_tpu.codec import wavelet_codec


def _smooth_batch(n=2, x=64, y=96, seed=0):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.linspace(0, 1, x), np.linspace(0, 1, y),
                         indexing="ij")
    out = np.empty((n, x, y, 3), np.uint8)
    for i in range(n):
        a, b, c = rng.uniform(0, 255, 3)
        for ch, base in enumerate((a, b, c)):
            img = base * (0.4 + 0.6 * (xx * rng.uniform(0.5, 1)
                                       + yy * rng.uniform(0.5, 1)) / 2)
            out[i, ..., ch] = np.clip(img + rng.normal(0, 6, (x, y)),
                                      0, 255)
    return out


@pytest.mark.parametrize("profile", ["haar-rgb", "haar", "haar422",
                                     "haar420"])
def test_roundtrip_bit_exact_and_quality(profile):
    codec = wavelet_codec.WaveletCodec(profile)
    imgs = _smooth_batch()
    m = codec.roundtrip_metrics(imgs)
    assert m["decode_bit_exact"], m
    assert m["psnr_db"] > 26.0, m
    assert m["bpp"] < 6.0, m


def test_ycocg_wire_roundtrip_floor():
    """The YCoCg dequantization floor: identity content reconstructs to
    within the step sizes (no net loss beyond quantization)."""
    imgs = _smooth_batch(1, 64, 64, seed=3)
    wire = intnet_haar.to_wire_ycocg(imgs)
    assert wire.min() >= 0 and wire.max() <= 63
    # even-even anchors: display of the exact wire equals the YCoCg
    # dequantization of the source to within the quant steps
    rec = intnet_haar.display_ycocg(2.0 * wire.astype(np.float64),
                                    edge_compensate=False)
    err = rec.astype(np.float64) - imgs.astype(np.float64)
    assert np.abs(err).max() <= 14.0  # |dY|<=4 + |dCo|/2 + |dCg| <= 14


def test_profiles_share_container_format():
    codec = wavelet_codec.WaveletCodec("haar422")
    blobs = codec.compress_batch(_smooth_batch(1))
    from simple_image_compression_network_tpu.codec import container
    codec_id, _ = container.unpack(blobs[0])
    assert codec_id == container.CODEC_INT8


def test_sharded_serving_byte_identical():
    """The wavelet profiles serve through the sharded int8 container
    wrapper unchanged: per-tile ICI entropy streams must produce
    containers byte-identical to the single-chip codec and roundtrip to
    the same display output (8 virtual devices, conftest)."""
    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.codec import int_codec
    from simple_image_compression_network_tpu.config import (
        reference_net_for_input)
    from simple_image_compression_network_tpu.parallel import (
        entropy_sharded, mesh as meshlib)

    n_dev = len(jax.devices())
    codec = wavelet_codec.WaveletCodec("haar422")
    imgs = _smooth_batch(2, 16 * n_dev, 64, seed=5)
    cfg = reference_net_for_input(16 * n_dev, 64)
    wire = jnp.asarray(codec.to_wire(imgs))

    blobs_1 = int_codec.compress_batch(codec.params, wire, cfg,
                                       static_cdfs=codec.cdfs,
                                       coder="device")
    smesh = meshlib.spatial_mesh(n_dev)
    sharded = entropy_sharded.ShardedIntCodec(
        codec.params, np.asarray(codec.cdfs), smesh, cfg)
    blobs_n = sharded.compress_batch(wire)
    assert blobs_n == blobs_1

    x_hat, _ = sharded.decompress_batch(blobs_n)
    rec = codec.display(np.asarray(x_hat))
    rec_1, _ = codec.decompress_batch(blobs_1)
    np.testing.assert_array_equal(rec, rec_1)


@pytest.mark.parametrize("profile", ["haar-rgb", "haar422"])
def test_device_wire_and_display_match_host(profile):
    """The jitted device wire/display mirrors must be bit-identical to
    the numpy reference transforms (the serving path uses the device
    versions)."""
    import jax.numpy as jnp
    codec = wavelet_codec.WaveletCodec(profile)
    imgs = _smooth_batch(2, 64, 96, seed=9)
    np.testing.assert_array_equal(np.asarray(codec._wire_dev(imgs)),
                                  codec.to_wire(imgs))
    y = np.random.default_rng(4).integers(
        0, 127, size=(2, 64, 96, 3)).astype(np.int8)
    np.testing.assert_array_equal(
        np.asarray(codec._display_dev(jnp.asarray(y))), codec.display(y))
