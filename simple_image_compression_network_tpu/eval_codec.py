"""Rate-distortion evaluation harness.

Evaluates either codec on a folder of images (Kodak layout) or on synthetic
1/f images, reporting per-image and mean bpp / PSNR — the reference has no
such tooling (its only metric is exact-match vs golden).

Usage:
    python -m simple_image_compression_network_tpu.eval_codec \
        [--data /path/to/kodak] [--codec int8|hyperprior] \
        [--ckpt runs/hp01/ckpt_1000.msgpack]
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .config import REFERENCE_NET, reference_net_for_input
from .codec import int_codec
from .utils import data as datalib
from .utils import weights_io
from .utils.cache import enable_compile_cache


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def _pad_to_16(img: np.ndarray, mult: int = 16) -> np.ndarray:
    x, y, _ = img.shape
    px, py = (-x) % mult, (-y) % mult
    return np.pad(img, ((0, px), (0, py), (0, 0)), mode="edge")


def eval_int_codec(images: List[np.ndarray], params,
                   static_cdfs=None) -> Dict[str, float]:
    """The bit-exact integer codec: reconstruction quality is set by the
    autoencoder; the bitstream is the lossless-coded latent.

    With ``static_cdfs`` (the production serving mode) the model-shipped
    tables are used and bitstreams carry none; otherwise per-image
    histogram tables are fit and embedded (2*C*L bytes each — dominant
    for small images)."""
    rows = []
    for img in images:
        padded = _pad_to_16(img)
        x = jnp.asarray(padded[None].view(np.int8))
        cfg = (REFERENCE_NET if padded.shape[:2] == (768, 512)
               else reference_net_for_input(*padded.shape[:2]))
        data = int_codec.compress(params, x, cfg, static_cdfs=static_cdfs)
        x_hat, _ = int_codec.decompress(params, data,
                                        static_cdfs=static_cdfs)
        recon = np.asarray(x_hat)[0, :img.shape[0], :img.shape[1]]
        # wire: int8 output is the low 8 bits; compare as uint8 magnitudes
        rows.append({
            "bpp": 8.0 * len(data) / (img.shape[0] * img.shape[1]),
            "psnr": psnr(img, recon.view(np.uint8)),
        })
    return {
        "bpp": float(np.mean([r["bpp"] for r in rows])),
        "psnr": float(np.mean([r["psnr"] for r in rows])),
        "per_image": rows,
    }


def eval_wavelet_codec(images: List[np.ndarray], profile: str
                       ) -> Dict[str, float]:
    """The wavelet integer codec (intnet_haar profiles): bit-exact under
    the reference's wrap semantics, uint8 in / uint8 out."""
    from .codec.wavelet_codec import WaveletCodec
    codec = WaveletCodec(profile)
    rows = []
    for img in images:
        padded = _pad_to_16(img)
        blobs = codec.compress_batch(padded[None])
        rec, _ = codec.decompress_batch(blobs)
        recon = rec[0, :img.shape[0], :img.shape[1]]
        rows.append({
            "bpp": 8.0 * len(blobs[0]) / (img.shape[0] * img.shape[1]),
            "psnr": psnr(img, recon),
        })
    return {
        "bpp": float(np.mean([r["bpp"] for r in rows])),
        "psnr": float(np.mean([r["psnr"] for r in rows])),
        "per_image": rows,
    }


def eval_hyper_codec(images: List[np.ndarray], codec) -> Dict[str, float]:
    rows = []
    for img in images:
        # hyper codecs need /64 dims: g_a downsamples 16x and h_a another
        # 4x, and h_s's 4x upsample must reproduce y's grid exactly
        padded = _pad_to_16(img, mult=64)
        x = jnp.asarray(padded[None].astype(np.float32) / 255.0)
        data = codec.compress(x)
        x_hat, _ = codec.decompress(data)
        recon = np.clip(np.asarray(x_hat)[0, :img.shape[0], :img.shape[1]],
                        0, 1)
        rows.append({
            "bpp": 8.0 * len(data) / (img.shape[0] * img.shape[1]),
            "psnr": psnr(img / 255.0, recon, peak=1.0),
        })
    return {
        "bpp": float(np.mean([r["bpp"] for r in rows])),
        "psnr": float(np.mean([r["psnr"] for r in rows])),
        "per_image": rows,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--codec", default="int8",
                    choices=["int8", "hyperprior", "meanscale", "wavelet"])
    ap.add_argument("--ckpt", default=None,
                    help="training checkpoint for the hyperprior codec")
    ap.add_argument("--profile", default="haar422",
                    help="wavelet codec profile (codec/wavelet_codec.py)")
    ap.add_argument("--n-synthetic", type=int, default=4)
    args = ap.parse_args(argv)

    enable_compile_cache()
    if args.data:
        images = [datalib.load_image(p)
                  for p in datalib.list_images(args.data)]
    else:
        images = list(datalib.synthetic_images(args.n_synthetic, 768, 512))

    if args.codec == "int8":
        import os
        ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "checkpoints", "reference_weights.npz")
        params = weights_io.load_checkpoint(ckpt)
        cdfs_path = os.path.join(os.path.dirname(ckpt), "latent_cdfs.npz")
        static_cdfs = (np.load(cdfs_path)["cdfs"]
                       if os.path.exists(cdfs_path) else None)
        res = eval_int_codec(images, params, static_cdfs=static_cdfs)
    elif args.codec == "wavelet":
        res = eval_wavelet_codec(images, args.profile)
    else:
        from . import train
        from .codec.hyper_codec import HyperCodec, MeanScaleCodec
        from .utils import train_ckpt
        cfg = train.TrainConfig(model=args.codec)
        key = jax.random.key(0)
        model, params, opt_state = train.init_state(cfg, key)
        if args.ckpt:
            if args.ckpt.endswith(".params.msgpack"):
                params = train_ckpt.restore_params(args.ckpt, params)
            else:
                _, params, _ = train_ckpt.restore(args.ckpt, params,
                                                  opt_state)
        codec_cls = (MeanScaleCodec if args.codec == "meanscale"
                     else HyperCodec)
        res = eval_hyper_codec(images, codec_cls(model, params))

    out = {k: v for k, v in res.items() if k != "per_image"}
    out["n_images"] = len(images)
    out["codec"] = args.codec
    print(json.dumps(out))
    return res


if __name__ == "__main__":
    main()
