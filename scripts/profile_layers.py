#!/usr/bin/env python
"""Per-layer transform profile on the real chip.

Times every layer of the 8-layer net standalone under each candidate
implementation (batch configurable), printing ms / effective int8 TOPS /
% of the layer's MAC share — the signal for kernel work that full-net
plan sweeps (scripts/tune_plan.py) blur together.
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--layers", default=None,
                    help="comma list of layer indices (default all)")
    ap.add_argument("--impls", default=None,
                    help="comma list of impls to try (default per-layer set)")
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

    total_macs = REFERENCE_NET.total_macs
    for i in layer_ids:
        cfg = REFERENCE_NET.layers[i]
        x = jnp.asarray(rng.integers(
            0, 64, size=(b, cfg.in_x, cfg.in_y, cfg.in_ch), dtype=np.int8))
        w, bias = params[f"w{i}"], params[f"b{i}"]
        impls = (args.impls.split(",") if args.impls else
                 (["lax", "s2d", "gemm", "pallas"] if not cfg.transposed
                  else ["d2s", "pd2s", "phased"]))
        table = codec_int._DECONV_IMPL if cfg.transposed \
            else codec_int._CONV_IMPL
        share = cfg.macs / total_macs
        for impl in impls:
            fn = table.get(impl)
            if fn is None:
                continue
            # checksum-chain steps so they cannot overlap (tunneled chip)
            f = jax.jit(lambda ww, xx, s, fn=fn: fn(
                xx + s, ww, bias).astype(jnp.int32).sum())
            try:
                s = jnp.int32(0)
                for _ in range(3):
                    s = f(w, x, s.astype(jnp.int8))
                np.asarray(s)
                s = jnp.int32(1)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    s = f(w, x, s.astype(jnp.int8))
                np.asarray(s)
                dt = (time.perf_counter() - t0) / args.iters
            except Exception as e:
                print(f"L{i} {impl:7s} FAILED {repr(e)[:70]}", flush=True)
                continue
            tops = 2 * b * cfg.macs / dt / 1e12
            print(f"L{i} {impl:7s} {dt*1e3:8.3f} ms  {tops:6.1f} TOPS "
                  f"(mac share {share*100:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
