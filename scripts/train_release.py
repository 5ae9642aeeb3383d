#!/usr/bin/env python
"""Train the release hyperprior checkpoints (both models x all lambdas).

Round 3 trained on fixed-alpha 1/f noise only; the mean-scale model's mu
head overfit it and lost to the plain scale model on photographs
(VERDICT r3 weak #4).  This retrains every release checkpoint on the
mixed-content bank (``utils.data.training_bank``: real-photo crops +
sloped 1/f + edges + textures) for longer, then writes params-only
release files to ``checkpoints/``.

Usage: python scripts/train_release.py [--steps 50000] [--only NAME]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

LAMBDAS = (0.003, 0.01, 0.03, 0.1)
MODELS = (("hyperprior", "scale"), ("meanscale", "meanscale"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50000)
    ap.add_argument("--only", default=None,
                    help="substring filter on the release name")
    ap.add_argument("--ckpt-root", default="/tmp/runs_r4")
    args = ap.parse_args()

    from simple_image_compression_network_tpu import train_loop
    from simple_image_compression_network_tpu.utils import train_ckpt

    for model, name in MODELS:
        for lam in LAMBDAS:
            rel = f"hp_{name}_l{lam}"
            if args.only and args.only not in rel:
                continue
            out = os.path.join(ROOT, "checkpoints", rel + ".params.msgpack")
            ckpt_dir = os.path.join(args.ckpt_root, rel)
            t0 = time.time()
            print(f"=== {rel}: {args.steps} steps ===", flush=True)
            params = train_loop.main([
                "--model", model, "--steps", str(args.steps),
                "--rd-lambda", str(lam), "--bank", "mixed",
                "--ckpt-dir", ckpt_dir, "--ckpt-every", "10000",
                "--log-every", "250"])
            train_ckpt.save_params(out, params)
            print(f"=== {rel} done in {time.time()-t0:.0f}s -> {out}",
                  flush=True)


if __name__ == "__main__":
    main()
