#!/usr/bin/env python
"""Demo: spatially-tiled codec on a 4K image over a device mesh.

BASELINE config 5 capability: the image's X axis is sharded over all
available chips (or virtual CPU devices), conv halos ride the ICI via
ppermute, and the result is bit-identical to single-chip execution.

Run on real hardware, or simulate N chips on CPU:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/demo_4k_sharded.py --x 4096 --y 2176
(4K UHD is 3840x2160; dims are padded up to multiples of 16*n_devices.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--x", type=int, default=4096)
    ap.add_argument("--y", type=int, default=2176)
    ap.add_argument("--check", action="store_true",
                    help="also run single-chip and compare bit-exactly")
    args = ap.parse_args()

    from simple_image_compression_network_tpu.config import (
        reference_net_for_input)
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.parallel import (mesh as meshlib,
                                                               spatial)
    from simple_image_compression_network_tpu.utils import weights_io
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)

    enable_compile_cache()
    n = len(jax.devices())
    x_dim = -(-args.x // (16 * n)) * 16 * n
    y_dim = -(-args.y // 16) * 16
    cfg = reference_net_for_input(x_dim, y_dim)
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    params = {k: jnp.asarray(v) for k, v in weights_io.load_checkpoint(
        os.path.join(root, "checkpoints", "reference_weights.npz")).items()}
    img = np.random.default_rng(0).integers(
        0, 256, size=(1, x_dim, y_dim, 3), dtype=np.uint8).view(np.int8)

    m = meshlib.spatial_mesh(n)
    xs = spatial.shard_image(jnp.asarray(img), m)
    fwd = jax.jit(lambda p, x: spatial.eight_layers_net_sharded(p, x, m, cfg))
    out = fwd(params, xs)
    np.asarray(out)  # force
    t0 = time.perf_counter()
    out = fwd(params, xs)
    np.asarray(out)
    dt = time.perf_counter() - t0
    mp = x_dim * y_dim / 1e6
    print(f"{n} devices, {x_dim}x{y_dim} ({mp:.1f} MP): {dt*1e3:.1f} ms "
          f"= {mp/dt:.1f} MP/s encode+decode")

    if args.check:
        ref = codec_int.eight_layers_net(
            params, jnp.asarray(img), cfg,
            impl=("lax",) * 4 + ("d2s",) * 4)
        match = bool((np.asarray(out) == np.asarray(ref)).all())
        print("bit-exact vs single-chip:", match)
        if not match:
            sys.exit(1)


if __name__ == "__main__":
    main()
