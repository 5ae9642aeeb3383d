"""Device-resident codec chain: in-loop bit-exactness on the CPU scan
engines (the TPU Pallas engines are bit-identical by the pallas_rans
contract tests; bench.py asserts the chain on hardware)."""

import os

import jax.numpy as jnp
import numpy as np

from simple_image_compression_network_tpu.codec import (
    device_chain, int_codec)
from simple_image_compression_network_tpu.config import (
    reference_net_for_input)
from simple_image_compression_network_tpu.utils import weights_io

CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints", "reference_weights.npz")


def test_device_chain_roundtrip_exact():
    params = {k: jnp.asarray(v) for k, v in
              weights_io.load_checkpoint(CKPT).items()}
    cfg = reference_net_for_input(128, 64)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, 256, size=(2, 128, 64, 3),
                                 dtype=np.uint8).view(np.int8))
    cdfs = int_codec.build_static_cdfs(params, [x[:1]], cfg)
    chain = device_chain.DeviceChain(params, cdfs, x, cfg)

    exact_loop, exact_direct = chain.check(x)
    assert exact_loop, "in-loop z_hat != z"
    assert exact_direct, "chain x_hat != direct autoencoder"

    # the separate encode/decode programs agree with the fused roundtrip
    w, cnt, csum = chain.encode(params, x)
    assert w.shape[1] >= chain.mxb
    x_hat, dsum = chain.decode(params, w, cnt)
    rsum, exact = chain.roundtrip(params, x)
    assert bool(np.asarray(exact))
    assert int(np.asarray(rsum)) == int(
        np.asarray(x_hat.astype(jnp.int32).sum()))
