#!/usr/bin/env python
"""Train wrap-semantics int4 weights for the bit-exact integer codec.

Two phases (simple_image_compression_network_tpu/intnet.py):
  1. ``clip`` pretraining — continuous epilogue (clip to [0,127]) with a
     strong out-of-window penalty: finds weights whose accumulators live in
     the 8-bit window, where clip and wrap agree.
  2. ``wrap`` fine-tuning — the reference's exact mod-256 + MSB-ReLU
     semantics with identity-STE through the wrap.

Ships: checkpoints/intnet_trained.npz  (int8 layout of reference_weights.npz)
       checkpoints/intnet_trained.msgpack (float shadows, for resuming)
       checkpoints/intnet_cdfs.npz     (static latent CDFs for the codec)

Usage: python scripts/train_intnet.py [--pretrain 2000] [--steps 20000]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def run_phase(cfg, net, params, bank, key, steps, log_every, tag,
              ent_only=False, grad_mask=None):
    import jax
    from simple_image_compression_network_tpu import intnet

    tx = intnet.build_optimizer(cfg, ent_only=ent_only, grad_mask=grad_mask)
    opt_state = jax.jit(tx.init)(params)
    block = jax.jit(intnet.make_train_block(cfg, net, log_every,
                                            ent_only=ent_only,
                                            grad_mask=grad_mask))
    step, t0 = 0, time.perf_counter()
    while step < steps:
        params, opt_state, m = block(params, opt_state, bank,
                                     jax.random.fold_in(key, step))
        m = {k: float(v) for k, v in m.items()}
        step += log_every
        rate = log_every / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        print(f"[{tag}] step {step:6d}  loss {m['loss']:.4f}  "
              f"bpp {m['bpp']:.4f}  psnr {m['psnr']:.2f}  "
              f"oob {m['oob']:.5f}  ({rate:.2f} steps/s)", flush=True)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--float-steps", type=int, default=4000,
                    dest="float_steps")
    ap.add_argument("--pretrain", type=int, default=3000)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--rd-lambda", type=float, default=0.03,
                    dest="rd_lambda")
    ap.add_argument("--oob-pre", type=float, default=3.0)
    ap.add_argument("--oob", type=float, default=0.3)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=250)
    ap.add_argument("--resume", default=None,
                    help="msgpack shadow checkpoint to resume from "
                         "(skips the clip phase)")
    ap.add_argument("--init-haar", default=None, dest="init_haar",
                    help="initialize shadows from a constructive wavelet "
                         "profile (codec/wavelet_codec.py PROFILES name); "
                         "skips the float/clip phases and fine-tunes in "
                         "wrap mode on the profile's wire domain")
    ap.add_argument("--wire", default=None, choices=["half", "ycocg"],
                    help="wire domain (default: half, or ycocg when "
                         "--init-haar)")
    ap.add_argument("--main-mode", default="wrap", dest="main_mode",
                    choices=["wrap", "clip"],
                    help="accumulator mode for the main phase: 'clip' has "
                         "exact saturation-masked gradients (identity-STE "
                         "through wrap is a surrogate that runs away once "
                         "wraps fire); with the oob penalty driving "
                         "saturation to zero, clip == wrap at export")
    ap.add_argument("--freeze-structure", action="store_true",
                    dest="freeze_structure",
                    help="with --init-haar: train only the construction's "
                         "ZERO entries (unused pathways); structural taps "
                         "and biases stay fixed")
    ap.add_argument("--ent-warmup", type=int, default=0, dest="ent_warmup",
                    help="steps of entropy-model-only training before the "
                         "main phases (adapts the rate proxy to a "
                         "constructed init)")
    ap.add_argument("--out", default="intnet_trained")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu import intnet
    from simple_image_compression_network_tpu.config import (
        reference_net_for_input)
    from simple_image_compression_network_tpu.utils import (
        data as datalib, train_ckpt)
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)

    enable_compile_cache()
    net = reference_net_for_input(args.crop, args.crop)
    key = jax.random.key(args.seed)
    wire = args.wire or ("ycocg" if args.init_haar else "half")
    base = dict(rd_lambda=args.rd_lambda, lr=args.lr, crop=args.crop,
                batch=args.batch, wire=wire)
    cfg_float = intnet.IntNetTrainConfig(mode="float",
                                         oob_weight=args.oob_pre, **base)
    cfg_pre = intnet.IntNetTrainConfig(mode="clip", oob_weight=args.oob_pre,
                                       **base)
    cfg_wrap = intnet.IntNetTrainConfig(mode=args.main_mode,
                                        oob_weight=args.oob, **base)
    params = intnet.init_params(cfg_wrap, key, net)
    grad_mask = None
    if args.resume:
        params = train_ckpt.restore_params(args.resume, params)
        print(f"resumed shadows from {args.resume}")
    elif args.init_haar:
        from simple_image_compression_network_tpu import intnet_haar
        from simple_image_compression_network_tpu.codec.wavelet_codec import (
            PROFILES)
        spec = PROFILES[args.init_haar]
        hp = intnet_haar.haar_params(net, det2_keep=spec["det2_keep"])
        for k, v in hp.items():
            if not k.startswith("disp"):
                params[k] = jnp.asarray(v, jnp.float32)
        print(f"initialized shadows from wavelet profile {args.init_haar}")
        if args.freeze_structure:
            grad_mask = intnet.grad_mask_from_structure(hp, params)
            n_free = sum(float(v.sum()) for k, v in grad_mask.items()
                         if k.startswith("w"))
            print(f"structure frozen: {n_free:.0f} free weight elements")

    bank = jnp.asarray(datalib.training_bank(48, 512, 512, seed=args.seed))

    if args.ent_warmup:
        params = run_phase(cfg_wrap, net, params, bank, jax.random.fold_in(
            key, 4), args.ent_warmup, args.log_every, "ent-warmup",
            ent_only=True)
    skip_pre = bool(args.resume or args.init_haar)
    if args.float_steps and not skip_pre:
        params = run_phase(cfg_float, net, params, bank, jax.random.fold_in(
            key, 3), args.float_steps, args.log_every, "float")
    if args.pretrain and not skip_pre:
        params = run_phase(cfg_pre, net, params, bank, jax.random.fold_in(
            key, 1), args.pretrain, args.log_every, "clip")
    params = run_phase(cfg_wrap, net, params, bank, jax.random.fold_in(
        key, 2), args.steps, args.log_every, "wrap", grad_mask=grad_mask)

    ckdir = os.path.join(ROOT, "checkpoints")
    train_ckpt.save_params(os.path.join(ckdir, args.out + ".msgpack"),
                           params)
    ints = intnet.export_int_params(params, net)
    np.savez_compressed(os.path.join(ckdir, args.out + ".npz"), **ints)
    print("wrote", os.path.join(ckdir, args.out + ".npz"))

    # static CDFs for the shipped codec (same tooling as the reference-
    # weight path, scripts/build_static_cdfs.py) — fit on the >>1 wire
    # domain the trained net sees.
    from simple_image_compression_network_tpu.codec import int_codec
    imgs = datalib.training_bank(8, 256, 256, seed=args.seed + 7)
    if wire == "ycocg":
        from simple_image_compression_network_tpu import intnet_haar
        batches = [jnp.asarray(intnet_haar.to_wire_ycocg(imgs[i:i + 1]))
                   for i in range(8)]
    else:
        batches = [jnp.asarray((imgs[i:i + 1] // 2).view(np.int8))
                   for i in range(8)]
    iparams = {k: jnp.asarray(v) for k, v in ints.items()}
    cdfs = int_codec.build_static_cdfs(
        iparams, batches, reference_net_for_input(256, 256))
    np.savez_compressed(os.path.join(ckdir, args.out.replace(
        "_trained", "") + "_cdfs.npz"), cdfs=cdfs)
    print("wrote", os.path.join(ckdir, args.out.replace(
        "_trained", "") + "_cdfs.npz"))


if __name__ == "__main__":
    main()
