#!/usr/bin/env python
"""Sweep the Pallas conv kernel's X-tile size per layer on the real chip.

The kernel DMAs a (tx+8)-row slab for tx useful rows; small tx over-reads
input bandwidth (tx=8 -> 2x), large tx costs VMEM. This sweeps tx for each
layer of the reference net under its production rewrite (s2d conv / d2s
deconv) and prints ms per call at batch 8.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--layers", type=str, default="0,4,5,6,7",
                    help="layers with a pallas path (0-3 conv, 4-7 deconv)")
    ap.add_argument("--tx", type=str, default="8,16,24,48")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    from simple_image_compression_network_tpu.config import REFERENCE_NET
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.ops import pallas_conv

    params = codec_int.random_params()
    layers = [int(s) for s in args.layers.split(",")]
    txs = [int(s) for s in args.tx.split(",")]
    rng = np.random.default_rng(0)

    for li in layers:
        layer = REFERENCE_NET.layers[li]
        in_x, in_y = layer.in_x, layer.in_y
        x = jnp.asarray(rng.integers(0, 128, size=(
            args.batch, in_x, in_y, layer.in_ch), dtype=np.int8))
        w = jnp.asarray(params[f"w{li}"])
        bias = jnp.asarray(params[f"b{li}"])
        fn_base = (pallas_conv.conv2d_int8_pallas if li < 4
                   else pallas_conv.deconv2d_int8_pallas)
        for tx in txs:
            try:
                f = jax.jit(lambda x, w, b, tx=tx, fn=fn_base: fn(
                    x, w, b, tx=tx).astype(jnp.int32).sum())
                s = f(x, w, bias)
                np.asarray(s)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    s = f(x, w, bias)
                np.asarray(s)
                dt = (time.perf_counter() - t0) / args.iters
                print(f"layer {li} tx={tx:3d}: {dt*1e3:8.3f} ms")
            except Exception as e:
                print(f"layer {li} tx={tx:3d}: FAIL {repr(e)[:90]}")


if __name__ == "__main__":
    main()
