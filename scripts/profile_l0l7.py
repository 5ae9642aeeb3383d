#!/usr/bin/env python
"""Break down the L0/L7 lane-structure wall (VERDICT r4 item 3).

k-slope timings (launch-overhead-free, scripts/profile_slope.py method)
of the boundary layers and their SUB-STAGES, to locate where the
~2.7 ms (L0) and ~4.0 ms (L7) of the 20 ms batch-32 step actually go:

  L0: lax conv | s2d conv | patches-GEMM | s2d-only | epilogue-only
  L7: d2s full | conv-only (no d2s)      | d2s-reshuffle-only | dilated
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    from simple_image_compression_network_tpu.ops import (
        conv_fast, conv_int)
    from simple_image_compression_network_tpu.utils import weights_io

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "checkpoints", "reference_weights.npz")
    params = {k: jnp.asarray(v) for k, v in
              weights_io.load_checkpoint(ckpt).items()}
    b = args.batch
    rng = np.random.default_rng(0)

    def slope(label, fn, xs_np):
        """Marginal time of one fn application via (t4 - t1) / 3."""
        def prog(k):
            xs = [jnp.asarray(a) for a in xs_np[:k]]
            f = jax.jit(lambda xs, s: sum(
                fn(x + s * 0).astype(jnp.int32).sum() + s * 0 for x in xs))
            s = jnp.int32(0)
            for _ in range(3):
                s = f(xs, s)
            np.asarray(s)
            s = jnp.int32(1)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s = f(xs, s)
            np.asarray(s)
            return (time.perf_counter() - t0) / args.iters
        t1, t4 = prog(1), prog(4)
        ms = (t4 - t1) / 3 * 1e3
        print(f"{label:26s} {ms:8.3f} ms")
        return ms

    # ---- L0: (B, 768, 512, 3) -> (B, 384, 256, 128) ----------------------
    w0, b0 = params["w0"], params["b0"]
    x0 = [rng.integers(0, 256, (b, 768, 512, 3), np.uint8).view(np.int8)
          for _ in range(4)]
    print(f"# L0 batch={b}")
    slope("L0 lax", lambda x: conv_int.conv2d_int8(x, w0, b0), x0)
    slope("L0 s2d", lambda x: conv_fast.conv2d_int8_s2d(x, w0, b0), x0)
    slope("L0 gemm", lambda x: conv_fast.conv2d_int8_gemm(x, w0, b0), x0)
    slope("L0 s2d-only",
          lambda x: conv_fast.space_to_depth(x.astype(jnp.int8)), x0)

    # ---- L7: (B, 384, 256, 128) -> (B, 768, 512, 3) ----------------------
    w7, b7 = params["w7"], params["b7"]
    x7 = [rng.integers(0, 128, (b, 384, 256, 128), np.uint8).view(np.int8)
          for _ in range(4)]
    print(f"# L7 batch={b}")
    slope("L7 d2s (prod)",
          lambda x: conv_fast.deconv2d_int8_d2s(x, w7, b7), x7)
    w3_d2s = conv_fast.deconv_weights_d2s(w7)
    slope("L7 conv-only (12ch out)",
          lambda x: jax.lax.conv_general_dilated(
              x.astype(jnp.int8), w3_d2s, (1, 1), [(1, 1), (1, 1)],
              dimension_numbers=conv_int.DIMNUMS,
              preferred_element_type=jnp.int32), x7)
    x7s = [rng.integers(0, 99, (b, 384, 256, 12), np.int8).astype(np.int32)
           for _ in range(4)]
    slope("L7 d2s-reshuffle (i32)",
          lambda y: conv_fast.depth_to_space(y), x7s)
    x7s8 = [a.astype(np.int8) for a in x7s]
    slope("L7 d2s-reshuffle (i8)",
          lambda y: conv_fast.depth_to_space(y), x7s8)
    slope("L7 dilated",
          lambda x: conv_int.deconv2d_int8(x, w7, b7), x7)
    slope("L7 phased",
          lambda x: conv_int.deconv2d_int8_phased(x, w7, b7), x7)


if __name__ == "__main__":
    main()
