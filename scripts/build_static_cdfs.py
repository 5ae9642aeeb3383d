#!/usr/bin/env python
"""Fit and ship the integer codec's static per-channel latent CDF tables.

Run once (any backend); writes checkpoints/latent_cdfs.npz.  Bitstreams
produced with static tables carry no table payload (codec/int_codec.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax.numpy as jnp
import numpy as np

from simple_image_compression_network_tpu.codec import int_codec
from simple_image_compression_network_tpu.config import (
    reference_net_for_input)
from simple_image_compression_network_tpu.utils import data as datalib
from simple_image_compression_network_tpu.utils import weights_io
from simple_image_compression_network_tpu.utils.cache import (
    enable_compile_cache)


def main():
    enable_compile_cache()
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    params = weights_io.load_checkpoint(
        os.path.join(root, "checkpoints", "reference_weights.npz"))
    imgs = datalib.synthetic_images(8, 256, 256, seed=11)
    cfg = reference_net_for_input(256, 256)
    batches = [jnp.asarray(imgs[i:i + 1].view(np.int8)) for i in range(8)]
    cdfs = int_codec.build_static_cdfs(params, batches, cfg)
    out = os.path.join(root, "checkpoints", "latent_cdfs.npz")
    np.savez_compressed(out, cdfs=cdfs)
    print("wrote", out, cdfs.shape)


if __name__ == "__main__":
    main()
