#!/usr/bin/env python
"""Benchmark: Kodak-size (768x512) encode+decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference FPGA dataflow pipeline's implied throughput is
~0.25 megapixel/s encode+decode (BASELINE.md — conv_6 at II=1, 200 MHz on
xczu7ev); vs_baseline is the speedup over that floor.

The benchmarked model is the flagship bit-exact integer codec
(eight_layers_net with the converted reference weights): full analysis +
synthesis, 72.3 GMAC per image, int8 x int4 arithmetic.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="batch size (0 = autotune over {1,2,4,8})")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    from simple_image_compression_network_tpu.config import REFERENCE_NET
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.utils import weights_io

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "checkpoints", "reference_weights.npz")
    params = {k: jnp.asarray(v) for k, v in
              weights_io.load_checkpoint(ckpt).items()}

    x_np = np.random.default_rng(0).integers(
        0, 256, size=(1, 768, 512, 3), dtype=np.uint8).view(np.int8)

    # Return a scalar checksum: forces the full device computation while
    # keeping the host fetch tiny (the TPU here is tunneled, and
    # block_until_ready alone does not reliably await completion).
    fwd = jax.jit(lambda p, x, s: codec_int.eight_layers_net(
        p, x + s, REFERENCE_NET, phased=True).astype(jnp.int32).sum())

    def measure(batch):
        x = jnp.asarray(np.broadcast_to(x_np, (batch, 768, 512, 3)).copy())
        s = jnp.int32(0)
        for _ in range(args.warmup):
            s = fwd(params, x, s.astype(jnp.int8))
        np.asarray(s)
        # Chain each step's checksum into the next step's input: a data
        # dependency that makes the steps irreducibly serial, then fetch once.
        s = jnp.int32(1)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = fwd(params, x, s.astype(jnp.int8))
        np.asarray(s)
        dt = (time.perf_counter() - t0) / args.iters
        mps = batch * 768 * 512 / dt / 1e6
        return mps, dt

    batches = [args.batch] if args.batch else [1, 8, 16, 32]
    best_mps, best_b, best_dt = 0.0, 0, 0.0
    for b in batches:
        mps, dt = measure(b)
        if args.verbose:
            print(f"# batch={b}: {dt*1e3:.2f} ms/step, {mps:.1f} MP/s")
        if mps > best_mps:
            best_mps, best_b, best_dt = mps, b, dt

    # secondary metrics: end-to-end bitstream codec on one synthetic image
    extra = {}
    try:
        from simple_image_compression_network_tpu.codec import int_codec
        from simple_image_compression_network_tpu.utils import data as datalib
        img = datalib.synthetic_images(1, 768, 512, seed=3)[0]
        xi = jnp.asarray(img[None].view(np.int8))
        cdfs_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "checkpoints", "latent_cdfs.npz")
        static_cdfs = (np.load(cdfs_path)["cdfs"]
                       if os.path.exists(cdfs_path) else None)
        t0 = time.perf_counter()
        stream = int_codec.compress(params, xi, static_cdfs=static_cdfs)
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        x_hat, z_hat = int_codec.decompress(params, stream,
                                            static_cdfs=static_cdfs)
        t_dec = time.perf_counter() - t0
        from simple_image_compression_network_tpu.models import codec_int
        direct = jax.jit(codec_int.eight_layers_net)(params, xi)
        bit_exact = bool((np.asarray(x_hat) == np.asarray(direct)).all())
        extra = {
            "bitstream_bpp": round(8.0 * len(stream) / (768 * 512), 3),
            "bitstream_ratio": round(768 * 512 * 3 / len(stream), 2),
            "decode_bit_exact": bit_exact,
            "host_encode_s": round(t_enc, 3),
            "host_decode_s": round(t_dec, 3),
        }
    except Exception as e:  # secondary metrics must never break the bench
        extra = {"bitstream_error": repr(e)[:120]}

    baseline_mps = 0.25  # FPGA floor, BASELINE.md
    print(json.dumps({
        "metric": "kodak_768x512_encode_decode_throughput_per_chip",
        "value": round(best_mps, 2),
        "unit": "megapixels/s",
        "vs_baseline": round(best_mps / baseline_mps, 1),
        "detail": {"batch": best_b, "ms_per_step": round(best_dt * 1e3, 3),
                   "device": str(jax.devices()[0]).strip(), **extra},
    }))


if __name__ == "__main__":
    main()
