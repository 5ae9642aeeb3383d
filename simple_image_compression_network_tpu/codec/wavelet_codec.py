"""Serving wrapper for the wavelet integer codec (intnet_haar profiles).

Composes the shipped pieces into a uint8-image <-> container API:

  encode:  uint8 RGB -> wire transform (RGB>>2 or YCoCg quantization,
           host-side like any codec's color pipeline) -> bit-exact integer
           analysis + device rANS (codec/int_codec.py, static CDFs)
  decode:  container -> integer synthesis (bit-exact, the reference's
           wrap semantics) -> display map (dequantize + inverse color
           transform + border compensation) -> uint8 RGB

The underlying containers are plain CODEC_INT8 bitstreams — a profile is
(weights npz, CDF table, wire id), shipped together, exactly like a codec
distribution's (model, quant tables) pair.  ``decode_bit_exact`` means the
integer part of the roundtrip equals running the autoencoder directly —
the reference's own acceptance bar (conv3_nonsquare_tb.cpp:1068-1123).

Profiles (built by scripts/build_wavelet_release.py, measured on the
4-frame .evalset in docs/RESULTS.md):

  name          wire    det2        eval bpp / PSNR
  haar-rgb      rgb     all 9       2.97 / 28.7 dB
  haar          ycocg   all 9       2.06 / 28.7 dB
  haar422       ycocg   7 (no diag  1.84 / 28.2 dB   <- default
                        chroma)
  haar420       ycocg   3 (luma)    1.44 / 27.6 dB
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import intnet_haar
from ..config import ModelConfig, reference_net_for_input
from . import int_codec

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PROFILES = {
    "haar-rgb": dict(wire="rgb", det2_keep=None,
                     cdfs="haar_cdfs.npz"),
    "haar": dict(wire="ycocg", det2_keep=None,
                 cdfs="haar_ycocg_cdfs.npz"),
    "haar422": dict(wire="ycocg", det2_keep=(0, 1, 2, 3, 4, 6, 7),
                    cdfs="haar_ycocg422_cdfs.npz"),
    "haar420": dict(wire="ycocg", det2_keep=(0, 1, 2),
                    cdfs="haar_ycocg420_cdfs.npz"),
    # profiles may also carry "weights": "<npz>" to load shipped weights
    # instead of the constructor (no such profile ships: gradient
    # fine-tuning from the construction measurably fails — docs/WAVELET.md
    # "a measured negative result")
}
DEFAULT_PROFILE = "haar422"


class WaveletCodec:
    """uint8-image codec over one intnet_haar profile."""

    def __init__(self, profile: str = DEFAULT_PROFILE,
                 params: Dict[str, np.ndarray] | None = None,
                 static_cdfs: np.ndarray | None = None):
        spec = PROFILES[profile]
        self.profile = profile
        self.wire = spec["wire"]
        if params is not None:
            p = params
        elif spec.get("weights"):
            with np.load(os.path.join(_ROOT, "checkpoints",
                                      spec["weights"])) as z:
                p = {k: z[k] for k in z.files}
        else:
            p = intnet_haar.haar_params(det2_keep=spec["det2_keep"])
        self.disp_a = np.asarray(p.get("disp_a", intnet_haar.DISP_A / 2.0))
        self.disp_b = np.asarray(p.get("disp_b", intnet_haar.DISP_B))
        self.params = {k: jnp.asarray(v) for k, v in p.items()
                       if not k.startswith("disp")}
        if static_cdfs is None:
            path = os.path.join(_ROOT, "checkpoints", spec["cdfs"])
            static_cdfs = np.load(path)["cdfs"]
        self.cdfs = static_cdfs

    # -- wire transform (host reference; the serving path runs the jitted
    #    device mirrors below so the color pipeline never bottlenecks) ----
    def to_wire(self, images_u8: np.ndarray) -> np.ndarray:
        if self.wire == "ycocg":
            return intnet_haar.to_wire_ycocg(images_u8)
        return intnet_haar.to_wire(images_u8)

    def display(self, y_out: np.ndarray) -> np.ndarray:
        if self.wire == "ycocg":
            return intnet_haar.display_ycocg(y_out)
        return intnet_haar.display(y_out, self.disp_a, self.disp_b)

    def _wire_dev(self, images_u8) -> jax.Array:
        """Device-side wire transform (bit-identical to to_wire; asserted
        in tests/test_wavelet_codec.py).  The jitted callable is cached on
        the instance — a fresh function object per call would retrace and
        recompile every invocation (measured: a 100x serving slowdown)."""
        f = getattr(self, "_wire_fn", None)
        if f is None:
            from .. import intnet
            wire = self.wire

            @jax.jit
            def f(x_u8):
                xf = x_u8.astype(jnp.float32)
                if wire == "ycocg":
                    return intnet._jnp_wire_ycocg(xf).astype(jnp.int8)
                return jnp.floor(xf / 4.0).astype(jnp.int8)

            self._wire_fn = f
        return f(jnp.asarray(images_u8))

    def _display_dev(self, y_int8: jax.Array) -> jax.Array:
        """Device-side display map -> uint8 (bit-identical to display);
        jitted callable cached on the instance like _wire_dev."""
        f = getattr(self, "_display_fn", None)
        if f is None:
            from .. import intnet
            a = jnp.asarray(self.disp_a, jnp.float32)
            b = jnp.asarray(self.disp_b, jnp.float32)
            wire = self.wire

            @jax.jit
            def f(y):
                yv = y.astype(jnp.float32)
                # border compensation: the bilinear output layer's last
                # row/col hold one-tap (half-value) sums
                yv = yv.at[:, -1, :, :].multiply(2.0)
                yv = yv.at[:, :, -1, :].multiply(2.0)
                yv = yv.at[:, -1, -1, :].divide(2.0)
                if wire == "ycocg":
                    rgb = intnet._jnp_display_ycocg(yv)
                else:
                    rgb = a * yv + b
                return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)

            self._display_fn = f
        return f(y_int8)

    # -- container API ----------------------------------------------------
    def compress_batch(self, images_u8: np.ndarray) -> List[bytes]:
        """(B, X, Y, 3) uint8 -> B CODEC_INT8 containers."""
        x = self._wire_dev(images_u8)
        cfg = reference_net_for_input(x.shape[1], x.shape[2])
        return int_codec.compress_batch(self.params, x, cfg,
                                        static_cdfs=self.cdfs)

    def decompress_batch(self, blobs: Sequence[bytes]
                         ) -> Tuple[np.ndarray, jax.Array]:
        """containers -> ((B, X, Y, 3) uint8 reconstruction, int8 net out)."""
        rec, x_hat = self.decompress_batch_device(blobs)
        return np.asarray(rec), x_hat

    def decompress_batch_device(self, blobs: Sequence[bytes]
                                ) -> Tuple[jax.Array, jax.Array]:
        """Like decompress_batch but leaves the uint8 reconstruction on
        device (serving nodes that post-process or re-encode on-device
        skip the 3-bytes/pixel host fetch)."""
        x_hat, _ = int_codec.decompress_batch(self.params, blobs,
                                              static_cdfs=self.cdfs)
        return self._display_dev(x_hat), x_hat

    def roundtrip_metrics(self, images_u8: np.ndarray) -> Dict[str, float]:
        """bpp / PSNR / bit-exactness for a uint8 batch."""
        blobs = self.compress_batch(images_u8)
        rec, x_hat = self.decompress_batch(blobs)
        cfg = reference_net_for_input(images_u8.shape[1],
                                      images_u8.shape[2])
        from ..models import codec_int
        direct = codec_int.eight_layers_net(
            self.params, jnp.asarray(self.to_wire(images_u8)), cfg)
        exact = bool((np.asarray(x_hat) == np.asarray(direct)).all())
        mse = float(np.mean((rec.astype(np.float64)
                             - images_u8.astype(np.float64)) ** 2))
        n_bytes = sum(len(s) for s in blobs)
        n_px = images_u8.shape[0] * images_u8.shape[1] * images_u8.shape[2]
        return {
            "bpp": round(8.0 * n_bytes / n_px, 3),
            "psnr_db": round(10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12)),
                             2),
            "decode_bit_exact": exact,
        }
