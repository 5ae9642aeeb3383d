#!/usr/bin/env python
"""Stage breakdown of the device hyper codec e2e path (VERDICT r4 #5).

Times, each awaited separately: transforms (f32 vs bf16), prior+ctx,
entropy kernels, metadata+words fetches, host packing, then sync and
pipelined e2e for both precisions.
"""

import glob
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu import train
    from simple_image_compression_network_tpu.codec import (
        hyper_codec, pipeline)
    from simple_image_compression_network_tpu.utils import (
        data as datalib, train_ckpt)
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()

    b = int(os.environ.get("B", "8"))
    iters = int(os.environ.get("ITERS", "3"))
    model_name = os.environ.get("MODEL", "hyperprior")
    pat = ("hp_scale_l*" if model_name == "hyperprior"
           else "hp_meanscale_l*")
    cks = sorted(glob.glob(os.path.join(ROOT, "checkpoints",
                                        pat + ".params.msgpack")))
    cfg = train.TrainConfig(model=model_name)
    model, params0, _ = train.init_state(cfg, jax.random.key(0))
    params = train_ckpt.restore_params(cks[-1], params0)
    cls = (hyper_codec.HyperCodec if model_name == "hyperprior"
           else hyper_codec.MeanScaleCodec)

    imgs = datalib.synthetic_images(b, 768, 512, seed=3)
    x = jnp.asarray(imgs.astype(np.float32) / 255.0)
    mp = b * 768 * 512 / 1e6

    def timed(label, f, reps=iters):
        f()
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:24s} {dt*1e3:9.1f} ms   {mp/dt:8.1f} MP/s")
        return r

    for tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        m = model.clone(dtype=dtype) if dtype is not None else model
        codec = cls(m, params)
        print(f"=== {model_name} [{tag}] batch={b} ===")

        def tx():
            y, z = codec._analysis_arrays(x)
            np.asarray(z[0, 0, 0, 0])
            return y, z
        y_f, z_f = timed("analysis (g_a+h_a)", tx)

        def pr():
            out = codec._prior_from_z_dev(z_f)
            np.asarray(out[1][0, 0, 0, 0])
            return out
        mu, sigma = timed("prior (h_s)", pr)

        def syn():
            xh = codec._decode_arrays(y_f)
            np.asarray(xh[0, 0, 0, 0])
            return xh
        timed("synthesis (g_s)", syn)

        def sched():
            st = codec._compress_schedule(x)
            np.asarray(st[6][0])  # meta fetch only
            return st
        st = timed("schedule+meta", sched)
        timed("drain(host+fetch)", lambda: codec._compress_drain(st))
        blobs = timed("sync enc e2e",
                      lambda: codec.compress_batch(x))

        def dec():
            xh, yh = codec.decompress_batch(blobs)
            np.asarray(xh[0, 0, 0])
            return xh, yh
        timed("sync dec e2e", dec)

        n_pipe = max(4, iters)
        enc_p = pipeline.HyperPipelinedEncoder(codec, depth=2)
        enc_p.submit(x)
        enc_p.drain()
        t0 = time.perf_counter()
        for _ in range(n_pipe):
            enc_p.submit(x)
        piped = enc_p.drain()
        dt = (time.perf_counter() - t0) / n_pipe
        print(f"{'pipelined enc':24s} {dt*1e3:9.1f} ms   "
              f"{mp/dt:8.1f} MP/s")
        dec_p = pipeline.HyperPipelinedDecoder(codec, depth=2)
        dec_p.submit(piped[-1])
        dec_p.drain()
        t0 = time.perf_counter()
        for _ in range(n_pipe):
            dec_p.submit(piped[-1])
        outs = dec_p.drain()
        np.asarray(outs[-1][0][0, 0, 0])
        dt = (time.perf_counter() - t0) / n_pipe
        print(f"{'pipelined dec':24s} {dt*1e3:9.1f} ms   "
              f"{mp/dt:8.1f} MP/s")
        nb = sum(len(s) for s in blobs)
        print(f"# bpp {8.0*nb/(b*768*512):.3f}")


if __name__ == "__main__":
    main()
