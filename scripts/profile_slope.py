#!/usr/bin/env python
"""Per-layer device time via the k-slope method (launch-overhead-free).

Standalone layer timings over a tunneled chip carry a multi-ms fixed
dispatch cost that swamps small layers.  This times ONE jitted program
that applies the layer to k independent inputs (k=1 and k=4, checksum
chained so the k applications cannot be collapsed or overlapped), and
reports the slope (t4 - t1) / 3 — the true marginal device time of one
layer application.
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--layers", default=None)
    ap.add_argument("--impls", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    from simple_image_compression_network_tpu.config import REFERENCE_NET
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.utils import weights_io

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "checkpoints", "reference_weights.npz")
    params = {k: jnp.asarray(v) for k, v in
              weights_io.load_checkpoint(ckpt).items()}
    b = args.batch
    rng = np.random.default_rng(0)
    layer_ids = ([int(i) for i in args.layers.split(",")] if args.layers
                 else range(8))

    def timeit(fn, w, bias, xs):
        f = jax.jit(lambda w, xs, s: sum(
            fn(x + s * 0, w, bias).astype(jnp.int32).sum() + s * 0
            for x in xs))
        s = jnp.int32(0)
        for _ in range(3):
            s = f(w, xs, s)
        np.asarray(s)
        s = jnp.int32(1)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = f(w, xs, s)
        np.asarray(s)
        return (time.perf_counter() - t0) / args.iters

    for i in layer_ids:
        cfg = REFERENCE_NET.layers[i]
        xs4 = [jnp.asarray(rng.integers(
            0, 64, size=(b, cfg.in_x, cfg.in_y, cfg.in_ch), dtype=np.int8))
            for _ in range(4)]
        w, bias = params[f"w{i}"], params[f"b{i}"]
        impls = (args.impls.split(",") if args.impls else
                 (["lax", "pallas", "pallas2", "pallas3"]
                  if not cfg.transposed else ["d2s", "pd2s", "pd2s3"]))
        table = codec_int._DECONV_IMPL if cfg.transposed \
            else codec_int._CONV_IMPL
        for impl in impls:
            fn = table.get(impl)
            if fn is None:
                continue
            try:
                t1 = timeit(fn, w, bias, xs4[:1])
                t4 = timeit(fn, w, bias, xs4)
                slope = (t4 - t1) / 3
                tops = 2 * b * cfg.macs / slope / 1e12
                print(f"L{i} {impl:8s} slope {slope*1e3:7.3f} ms "
                      f"({tops:6.1f} TOPS)  [t1 {t1*1e3:7.3f}]", flush=True)
            except Exception as e:
                print(f"L{i} {impl:8s} FAILED {repr(e)[:70]}", flush=True)


if __name__ == "__main__":
    main()
