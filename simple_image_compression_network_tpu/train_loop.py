"""Training driver: RD training of the float codec with checkpoint/resume.

Usage:
    python -m simple_image_compression_network_tpu.train_loop \
        --steps 1000 --crop 256 --batch 8 --lambda 0.01 \
        [--data /path/to/images] [--ckpt-dir runs/hp01] [--mesh dp,sp]

Without --data, trains on synthetic 1/f images (no dataset required).
Multi-chip: batch is sharded over 'data' and the crop's X axis over 'x'
(GSPMD inserts halo exchanges for the convs).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from . import train
from .parallel import distributed, mesh as meshlib
from .utils import data as datalib
from .utils import train_ckpt
from .utils.cache import enable_compile_cache


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hyperprior",
                    choices=["hyperprior", "meanscale", "factorized"])
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--rd-lambda", type=float, default=0.01, dest="rd_lambda")
    ap.add_argument("--data", default=None, help="image folder (else synthetic)")
    ap.add_argument("--bank", default="mixed", choices=["mixed", "1f"],
                    help="synthetic bank when --data is unset: 'mixed' = "
                    "photos+noise+edges+textures (utils.data.training_bank),"
                    " '1f' = round-3's plain 1/f noise")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel mesh dim (0 = all devices)")
    ap.add_argument("--sp", type=int, default=1,
                    help="spatial mesh dim over crop X")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    enable_compile_cache()
    distributed.initialize_multihost()

    cfg = train.TrainConfig(model=args.model, rd_lambda=args.rd_lambda,
                            lr=args.lr, crop=args.crop, batch=args.batch)
    key = jax.random.key(args.seed)
    model, params, opt_state = train.init_state(
        cfg, key, input_shape=(args.batch, args.crop, args.crop, 3))
    step_fn = train.make_train_step(cfg)

    n_dev = len(jax.devices())
    dp = args.dp or max(1, n_dev // args.sp)
    if dp * args.sp > 1:
        mesh = meshlib.make_mesh((dp, args.sp), ("data", "x"))
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("data", "x", None, None))
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        step_fn = jax.jit(step_fn,
                          in_shardings=(repl, repl, batch_sh, None),
                          out_shardings=(repl, repl, repl))
    else:
        batch_sh = None
        step_fn = jax.jit(step_fn)

    start_step = 0
    if args.ckpt_dir:
        last = train_ckpt.latest(args.ckpt_dir)
        if last:
            start_step, params, opt_state = train_ckpt.restore(
                last, params, opt_state)
            print(f"resumed from {last} at step {start_step}")

    if args.data:
        images = np.stack([datalib.load_image(p)
                           for p in datalib.list_images(args.data)])
    elif args.bank == "mixed":
        images = datalib.training_bank(48, 512, 512, seed=args.seed)
    else:
        images = datalib.synthetic_images(16, 512, 512, seed=args.seed)

    # Single-device fast path: K steps fused into one jitted call with
    # DEVICE-SIDE crop sampling (one dispatch per K steps — per-step host
    # dispatch costs a full RPC round trip on a tunneled TPU).
    if dp * args.sp == 1:
        block_n = args.log_every
        block = jax.jit(train.make_train_block(cfg, block_n))
        bank = jnp.asarray(images)
        t0 = time.perf_counter()
        step = start_step
        while step < args.steps:
            params, opt_state, m = block(params, opt_state, bank,
                                         jax.random.fold_in(key, step))
            m = {k: float(v) for k, v in m.items()}
            step += block_n
            rate = block_n / (time.perf_counter() - t0)
            t0 = time.perf_counter()
            print(f"step {step:6d}  loss {m['loss']:.4f}  "
                  f"bpp {m['bpp']:.4f}  psnr {m['psnr']:.2f}  "
                  f"({rate:.2f} steps/s)", flush=True)
            if args.ckpt_dir and (step % args.ckpt_every < block_n):
                train_ckpt.save(os.path.join(args.ckpt_dir,
                                             f"ckpt_{step}.msgpack"),
                                step, params, opt_state)
        if args.ckpt_dir:
            train_ckpt.save(os.path.join(args.ckpt_dir,
                                         f"ckpt_{args.steps}.msgpack"),
                            args.steps, params, opt_state)
        return params

    # Multi-host input pipeline (DCN side, SURVEY §5): each host generates
    # only ITS slice of the global batch and contributes it via
    # make_array_from_process_local_data — no host ever materializes or
    # ships the full batch.  Single-host keeps the simple device_put.
    # (Sharding layout note: across hosts shard the data axis; keep any
    # spatial 'x' sharding within a host's local devices.)
    multihost = jax.process_count() > 1
    local_batch = args.batch
    if multihost:
        assert args.batch % jax.process_count() == 0, (
            "global batch must divide across hosts")
        local_batch = args.batch // jax.process_count()
    rng = np.random.default_rng(
        args.seed + start_step + jax.process_index() * 1_000_003)
    t0 = time.perf_counter()
    for step in range(start_step, args.steps):
        crops = datalib.random_crops(images, args.crop, local_batch, rng)
        if multihost and batch_sh is not None:
            batch = jax.make_array_from_process_local_data(batch_sh, crops)
        else:
            batch = jnp.asarray(crops)
            if batch_sh is not None:
                batch = jax.device_put(batch, batch_sh)
        params, opt_state, metrics = step_fn(params, opt_state, batch,
                                             jax.random.fold_in(key, step))
        if (step + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            rate = args.log_every / (time.perf_counter() - t0)
            t0 = time.perf_counter()
            print(f"step {step+1:6d}  loss {m['loss']:.4f}  "
                  f"bpp {m['bpp']:.4f}  psnr {m['psnr']:.2f}  "
                  f"({rate:.2f} steps/s)", flush=True)
        if args.ckpt_dir and (step + 1) % args.ckpt_every == 0:
            if distributed.is_primary():
                train_ckpt.save(os.path.join(args.ckpt_dir,
                                             f"ckpt_{step+1}.msgpack"),
                                step + 1, params, opt_state)
    if args.ckpt_dir and distributed.is_primary():
        train_ckpt.save(os.path.join(args.ckpt_dir,
                                     f"ckpt_{args.steps}.msgpack"),
                        args.steps, params, opt_state)
    return params


if __name__ == "__main__":
    main()
