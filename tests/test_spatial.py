"""Multi-chip spatial tiling: bit-exact vs single-chip on a virtual CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.config import reference_net_for_input
from simple_image_compression_network_tpu.models import codec_int
from simple_image_compression_network_tpu.parallel import mesh as meshlib
from simple_image_compression_network_tpu.parallel import spatial
from simple_image_compression_network_tpu.utils import weights_io

CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints", "reference_weights.npz")


@pytest.fixture(scope="module")
def params():
    return {k: jnp.asarray(v) for k, v in
            weights_io.load_checkpoint(CKPT).items()}


def test_halo_exchange_zeros_at_borders():
    m = meshlib.spatial_mesh(4)
    x = jnp.arange(4 * 8 * 2 * 1, dtype=jnp.int8).reshape(1, 32, 2, 1)
    from jax.sharding import PartitionSpec as P

    def f(h):
        return spatial.halo_exchange_x(h, 2)

    out = jax.shard_map(f, mesh=m, in_specs=P(None, "x", None, None),
                        out_specs=P(None, "x", None, None))(x)
    out = np.asarray(out)
    xn = np.asarray(x)
    # tile size 8 -> extended 12 each; device 0's left halo is zeros
    assert out.shape == (1, 48, 2, 1)
    np.testing.assert_array_equal(out[0, :2], 0)
    np.testing.assert_array_equal(out[0, 2:10], xn[0, 0:8])
    # device 1 sees device 0's last two rows as left halo
    np.testing.assert_array_equal(out[0, 12:14], xn[0, 6:8])
    np.testing.assert_array_equal(out[0, 14:22], xn[0, 8:16])
    # last device's right halo is zeros
    np.testing.assert_array_equal(out[0, -2:], 0)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_net_bit_exact(params, rng, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    cfg = reference_net_for_input(16 * n_dev, 32)
    x = jnp.asarray(rng.integers(0, 256, size=(1, 16 * n_dev, 32, 3),
                                 dtype=np.uint8).view(np.int8))
    ref = codec_int.eight_layers_net(params, x, cfg, impl=("lax",) * 4 +
                                     ("d2s",) * 4)
    m = meshlib.spatial_mesh(n_dev)
    xs = spatial.shard_image(x, m)
    out = spatial.eight_layers_net_sharded(params, xs, m, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_net_larger_tile(params, rng):
    # multiple latent rows per device
    cfg = reference_net_for_input(128, 64)
    x = jnp.asarray(rng.integers(0, 256, size=(1, 128, 64, 3),
                                 dtype=np.uint8).view(np.int8))
    ref = codec_int.eight_layers_net(params, x, cfg)
    m = meshlib.spatial_mesh(4)
    out = spatial.eight_layers_net_sharded(params, spatial.shard_image(x, m),
                                           m, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_net_2d_mesh_bit_exact(params, rng):
    """(X, Y) 2-D tiling: halo exchange on both image axes."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 virtual devices")
    cfg = reference_net_for_input(64, 64)
    x = jnp.asarray(rng.integers(0, 256, size=(1, 64, 64, 3),
                                 dtype=np.uint8).view(np.int8))
    ref = codec_int.eight_layers_net(params, x, cfg)
    m = meshlib.make_mesh((2, 4), ("x", "y"))
    xs = spatial.shard_image(x, m, ("x", "y"))
    out = spatial.eight_layers_net_sharded(params, xs, m, cfg, ("x", "y"))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
