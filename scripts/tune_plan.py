#!/usr/bin/env python
"""Sweep per-layer kernel plans for the 8-layer net on the real chip.

Times the full transform (analysis+synthesis checksum-chained, as
bench.py measures) under candidate per-layer implementation plans and
prints MP/s for each; use the winner as codec_int.DEFAULT_PLAN.
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--plans", default=None,
                    help="semicolon-separated comma-plans; default = sweep")
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
    x_np = np.random.default_rng(0).integers(
        0, 256, size=(args.batch, 768, 512, 3), dtype=np.uint8).view(np.int8)
    x = jnp.asarray(x_np)

    if args.plans:
        plans = [tuple(p.split(",")) for p in args.plans.split(";")]
    else:
        base = list(codec_int.DEFAULT_PLAN)
        plans = [tuple(base)]
        # vary one layer at a time around the default
        options = {0: ["pallas", "lax", "s2d", "gemm"],
                   1: ["lax", "s2d", "pallas"],
                   2: ["lax", "s2d", "pallas"],
                   3: ["lax", "s2d", "pallas"],
                   4: ["d2s", "pd2s"],
                   5: ["d2s", "pd2s"],
                   6: ["pd2s", "d2s"],
                   7: ["d2s", "pd2s"]}
        for li, opts in options.items():
            for o in opts[1:]:
                p = list(base)
                p[li] = o
                # "tailfused" marks an adjacent PAIR (codec_int._plan
                # asserts it); varying one slot must unfuse the partner
                partner = {6: 7, 7: 6}.get(li)
                if partner is not None and "tailfused" in (p[6], p[7]):
                    p[partner] = "d2s" if p[partner] == "tailfused" \
                        else p[partner]
                plans.append(tuple(p))

    def measure(plan):
        fwd = jax.jit(lambda p, xx, s: codec_int.eight_layers_net(
            p, xx + s, REFERENCE_NET, impl=plan).astype(jnp.int32).sum())
        s = jnp.int32(0)
        for _ in range(3):
            s = fwd(params, x, s.astype(jnp.int8))
        np.asarray(s)
        s = jnp.int32(1)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = fwd(params, x, s.astype(jnp.int8))
        np.asarray(s)
        dt = (time.perf_counter() - t0) / args.iters
        return args.batch * 768 * 512 / dt / 1e6

    results = []
    for plan in plans:
        try:
            mps = measure(plan)
        except Exception as e:
            print(f"{','.join(plan)}  FAILED {repr(e)[:80]}", flush=True)
            continue
        results.append((mps, plan))
        print(f"{','.join(plan)}  {mps:.1f} MP/s", flush=True)

    results.sort(reverse=True)
    print("\n# best:")
    for mps, plan in results[:5]:
        print(f"#   {','.join(plan)}  {mps:.1f} MP/s")


if __name__ == "__main__":
    main()
