"""Multi-chip entropy stage: per-tile streams + psum rate stats, bit-exact.

Extends the reference's golden-vs-hardware bar (conv3_nonsquare_tb.cpp:
1068-1123) across chips: the sharded encoder's streams must be
byte-identical to the host golden coder on the same chunks, and
compress->decompress sharded must reproduce the single-chip reconstruction
bit-for-bit.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.codec import (device_rans, ilrans,
                                                        int_codec)
from simple_image_compression_network_tpu.config import reference_net_for_input
from simple_image_compression_network_tpu.models import codec_int
from simple_image_compression_network_tpu.parallel import (entropy_sharded,
                                                           mesh as meshlib)
from simple_image_compression_network_tpu.utils import weights_io

CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints", "reference_weights.npz")
N_DEV = 4
S_LOCAL = 2
LANE_MULT = 1


@pytest.fixture(scope="module")
def params():
    return {k: jnp.asarray(v) for k, v in
            weights_io.load_checkpoint(CKPT).items()}


@pytest.fixture(scope="module")
def setup(params):
    if len(jax.devices()) < N_DEV:
        pytest.skip("need virtual devices")
    rng = np.random.default_rng(11)
    cfg = reference_net_for_input(128, 64)  # latent 8 x 4 x 192
    x = jnp.asarray(rng.integers(0, 256, size=(2, 128, 64, 3),
                                 dtype=np.uint8).view(np.int8))
    mesh = meshlib.spatial_mesh(N_DEV)
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "x", None, None)))
    z = np.asarray(codec_int.analysis_int8(params, x, cfg))
    cdfs = int_codec._histogram_cdfs(z)
    return cfg, x, xs, mesh, z, cdfs


def test_psum_rate_stats_match_host(params, setup):
    cfg, x, xs, mesh, z, cdfs = setup
    cdfs_sh = entropy_sharded.build_static_cdfs_sharded(params, xs, mesh, cfg)
    np.testing.assert_array_equal(cdfs_sh, cdfs)


def test_sharded_streams_match_host_golden(params, setup):
    cfg, x, xs, mesh, z, cdfs = setup
    c = z.shape[-1]
    n_lanes = LANE_MULT * c
    lane_cdf = jnp.asarray(int_codec._lane_cdf(cdfs, n_lanes))
    words, counts = entropy_sharded.compress_sharded(
        params, xs, mesh, lane_cdf, cfg, s_local=S_LOCAL,
        lane_mult=LANE_MULT)
    words_np = np.asarray(words)
    counts_np = np.asarray(counts)
    b = z.shape[0]
    s = N_DEV * S_LOCAL
    n_syms = z[0].size // s
    ctx = np.tile(np.arange(c, dtype=np.int32), n_syms // c)
    for i in range(b):
        chunks = z[i].reshape(s, -1).astype(np.int32)
        for j in range(s):
            golden = ilrans.encode(chunks[j], ctx, cdfs, n_lanes=n_lanes)
            got = device_rans.bytes_from_words(
                words_np[i, j], int(counts_np[i, j]), n_syms, n_lanes)
            assert got == golden, f"stream (img {i}, chunk {j}) differs"


def test_sharded_compress_decompress_bit_exact(params, setup):
    cfg, x, xs, mesh, z, cdfs = setup
    c = z.shape[-1]
    n_lanes = LANE_MULT * c
    lane_cdf = jnp.asarray(int_codec._lane_cdf(cdfs, n_lanes))
    words, counts = entropy_sharded.compress_sharded(
        params, xs, mesh, lane_cdf, cfg, s_local=S_LOCAL,
        lane_mult=LANE_MULT)
    t_steps = (z.shape[1] * z.shape[2]) // LANE_MULT // (N_DEV * S_LOCAL)
    x_hat, z_dec, ok = entropy_sharded.decompress_sharded(
        params, words, counts, mesh, lane_cdf,
        (x.shape[1], x.shape[2]), cfg, t_steps=t_steps)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(z_dec), z)
    ref = codec_int.eight_layers_net(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(ref))
