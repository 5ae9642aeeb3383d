#!/usr/bin/env python
"""Break the sync e2e encode into stages on hardware (VERDICT r3 #1).

Stages timed separately (each awaited):
  analysis     device transform dispatch + completion
  enc_kernel   device entropy encode + counts fetch
  words_fetch  bucketed slice + device->host words transfer
  host_pack    bytes_from_words loop + container packing
Then the sync and pipelined paths end-to-end for reference.
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.codec import (
        container, device_rans, int_codec, pipeline)
    from simple_image_compression_network_tpu.utils import (
        data as datalib, weights_io)
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()

    b = int(os.environ.get("B", "32"))
    iters = int(os.environ.get("ITERS", "3"))
    params = {k: jnp.asarray(v) for k, v in weights_io.load_checkpoint(
        os.path.join(ROOT, "checkpoints", "reference_weights.npz")).items()}
    static_cdfs = np.load(os.path.join(
        ROOT, "checkpoints", "latent_cdfs.npz"))["cdfs"]
    imgs = datalib.synthetic_images(b, 768, 512, seed=3)
    x = jnp.asarray(imgs.view(np.int8))
    mp = b * 768 * 512 / 1e6

    def timed(label, f, reps=iters):
        f()
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:14s} {dt*1e3:9.1f} ms   {mp/dt:8.1f} MP/s")
        return r, dt

    fa = int_codec._jit_analysis(int_codec.REFERENCE_NET)
    z, _ = timed("analysis", lambda: jax.block_until_ready(fa(params, x)))
    zx, zy, c = z.shape[1:]
    s, lm = int_codec.plan_streams(zx * zy)
    n_lanes, t_steps = lm * c, (zx * zy) // lm // s
    lane_cdf = jnp.asarray(int_codec._lane_cdf(static_cdfs, n_lanes))
    print(f"# s={s} lanes={n_lanes} t={t_steps} "
          f"cap={int_codec._encode_capacity(t_steps, n_lanes)}")

    def ek():
        w, cnt = int_codec._device_encode_batch(
            z, lane_cdf, t_steps=t_steps, n_lanes=n_lanes, n_streams=s)
        return w, np.asarray(cnt)
    (w, cnt_np), _ = timed("enc_kernel", ek)
    print(f"# words buffer {w.shape} {w.dtype} = "
          f"{w.size * w.dtype.itemsize / 1e6:.1f} MB; "
          f"count max={cnt_np.max()} mean={cnt_np.mean():.0f}")

    mxb = min(device_rans.bucket_words(int(cnt_np.max())), w.shape[1])

    def wf():
        return np.asarray(w[:, :mxb])
    words_np, _ = timed("words_fetch", wf)
    print(f"# fetched {words_np.nbytes / 1e6:.1f} MB (mxb={mxb})")

    def wf_full():
        return np.asarray(w)
    timed("words_fetch_full", wf_full)

    cnt2 = cnt_np.reshape(b, s)
    wres = words_np.reshape(b, s, -1)
    n_syms = t_steps * n_lanes
    hdr = b"\x00" * 10

    def hp():
        out = []
        for i in range(b):
            chunks = [device_rans.bytes_from_words(
                wres[i, j], int(cnt2[i, j]), n_syms, n_lanes)
                for j in range(s)]
            out.append(container.pack(
                container.CODEC_INT8, [hdr, b"", int_codec._pack_streams(chunks)]))
        return out
    timed("host_pack", hp)

    def sync():
        return int_codec.compress_batch(params, x, static_cdfs=static_cdfs)
    timed("sync_e2e", sync)

    n_pipe = max(4, iters)
    enc = pipeline.PipelinedEncoder(params, static_cdfs, depth=2)
    enc.submit(x)
    enc.drain()
    t0 = time.perf_counter()
    for _ in range(n_pipe):
        enc.submit(x)
    enc.drain()
    dt = (time.perf_counter() - t0) / n_pipe
    print(f"{'pipelined_e2e':14s} {dt*1e3:9.1f} ms   {mp/dt:8.1f} MP/s")


if __name__ == "__main__":
    main()
