#!/usr/bin/env python
"""Ship the wavelet integer codec release artifacts.

Writes, per profile (codec/wavelet_codec.PROFILES):
  checkpoints/intnet_<profile>.npz  — int8 weights in the
      reference_weights.npz layout + disp_a/disp_b header constants
  checkpoints/<profile cdfs>.npz    — static per-channel latent CDFs fit
      on the training bank in the profile's wire domain

The weights are deterministic (constructed by intnet_haar.haar_params),
but shipping them as artifacts keeps the release shaped like the
reference-weight path: (weights npz, CDF table) pairs a serving node
loads without running any constructor.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import jax.numpy as jnp
    from simple_image_compression_network_tpu import intnet_haar
    from simple_image_compression_network_tpu.codec import int_codec
    from simple_image_compression_network_tpu.codec.wavelet_codec import (
        PROFILES)
    from simple_image_compression_network_tpu.config import (
        reference_net_for_input)
    from simple_image_compression_network_tpu.utils import data as datalib
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)

    enable_compile_cache()
    bank = datalib.training_bank(8, 256, 256, seed=7)
    cfg256 = reference_net_for_input(256, 256)
    ckdir = os.path.join(ROOT, "checkpoints")
    for name, spec in PROFILES.items():
        if spec.get("weights"):
            continue  # fine-tuned profiles ship their own npz + CDFs
        p = intnet_haar.haar_params(det2_keep=spec["det2_keep"])
        np.savez_compressed(
            os.path.join(ckdir, f"intnet_{name.replace('-', '_')}.npz"),
            **p)
        params = {k: jnp.asarray(v) for k, v in p.items()
                  if not k.startswith("disp")}
        wire = (intnet_haar.to_wire_ycocg if spec["wire"] == "ycocg"
                else intnet_haar.to_wire)
        batches = [jnp.asarray(wire(bank[i:i + 1])) for i in range(8)]
        cdfs = int_codec.build_static_cdfs(params, batches, cfg256)
        np.savez_compressed(os.path.join(ckdir, spec["cdfs"]), cdfs=cdfs)
        print(f"{name}: weights + CDFs written")


if __name__ == "__main__":
    main()
