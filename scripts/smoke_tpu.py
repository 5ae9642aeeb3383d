#!/usr/bin/env python
"""On-TPU smoke test (< 2 min): run before every snapshot.

Exercises the HARDWARE lowering of everything bench.py times — the round-2
failure mode (a kernel that passes interpret-mode tests but fails Mosaic
compile at bench shapes) cannot survive this script:

  1. fused Pallas conv kernels at all 8 reference layer shapes (vs the
     bit-identical XLA lowering),
  2. the Pallas rANS decode kernel at the bench's bucketed word width
     (vs the lax.scan decoder),
  3. full compress -> decompress bit-exactness through real container
     bytes (the reference's bar, conv3_nonsquare_tb.cpp:1068-1123),
  4. the over-wide word buffer is rejected with a clear error and the
     production picker falls back to scan.

Exit code 0 iff every check passes.  Usage: python scripts/smoke_tpu.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    from simple_image_compression_network_tpu.codec import (
        device_rans, int_codec, pallas_rans)
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.utils import (
        data as datalib, weights_io)

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"smoke test needs a TPU, got {dev}"
    print(f"# device: {dev}")
    failures = []

    def check(name, ok):
        print(f"# {'PASS' if ok else 'FAIL'}: {name} [{time.time()-t_start:.0f}s]")
        if not ok:
            failures.append(name)

    params = {k: jnp.asarray(v) for k, v in weights_io.load_checkpoint(
        os.path.join(ROOT, "checkpoints", "reference_weights.npz")).items()}
    imgs_u8 = datalib.synthetic_images(2, 768, 512, seed=3)
    x = jnp.asarray(imgs_u8.view(np.int8))

    # 1. full net, tuned plan (Pallas kernels) vs pure-XLA plan, on chip
    tuned = jax.jit(codec_int.eight_layers_net)(params, x)
    xla = jax.jit(lambda p, v: codec_int.eight_layers_net(
        p, v, impl=("lax",) * 4 + ("d2s",) * 4))(params, x)
    check("pallas conv kernels == XLA (all 8 layers, hardware)",
          bool((np.asarray(tuned) == np.asarray(xla)).all()))

    # 2. codec roundtrip through real container bytes, bit-exact
    cdfs = np.load(os.path.join(ROOT, "checkpoints", "latent_cdfs.npz"))[
        "cdfs"]
    streams = int_codec.compress_batch(params, x, static_cdfs=cdfs)
    x_hat, _ = int_codec.decompress_batch(params, streams,
                                          static_cdfs=cdfs)
    check("compress->decompress bit-exact (device coder, container bytes)",
          bool((np.asarray(x_hat) == np.asarray(tuned)).all()))

    # 3. Pallas rANS decode at the bench's bucketed width vs scan decoder
    z = int_codec._jit_analysis(int_codec.REFERENCE_NET)(params, x)
    zx, zy, c = z.shape[1:]
    s, lm = int_codec.plan_streams(zx * zy)
    n_lanes, t_steps = lm * c, (zx * zy) // lm // s
    lane_cdf = jnp.asarray(int_codec._lane_cdf(cdfs, n_lanes))
    w, cnt = int_codec._device_encode_batch(
        z, lane_cdf, t_steps=t_steps, n_lanes=n_lanes, n_streams=s)
    cnt_np = np.asarray(cnt)
    mxb = min(device_rans.bucket_words(int(cnt_np.max())), w.shape[1])
    wb = jnp.asarray(np.asarray(w[:, :mxb], np.uint16))
    tc = jnp.asarray(cnt_np)
    sy_p, ok_p = int_codec._device_decode_batch(
        wb, tc, lane_cdf, t_steps=t_steps, impl="pallas")
    sy_s, ok_s = int_codec._device_decode_batch(
        wb, tc, lane_cdf, t_steps=t_steps, impl="scan")
    check("pallas rANS decode kernel (hardware, bucketed width)",
          bool(np.asarray(ok_p).all()))
    check("pallas rANS decode == scan decode",
          bool((np.asarray(sy_p) == np.asarray(sy_s)).all())
          and bool(np.asarray(ok_s).all()))

    # 2b. spatially-sharded net on a 1-device mesh, on hardware: the
    # sharded path's kernels compile under shard_map with their own
    # lowering (VALID halo modes) that CPU tests only cover via the XLA
    # fallback
    from jax.sharding import Mesh
    from simple_image_compression_network_tpu.parallel import spatial
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    xs1 = spatial.shard_image(x, mesh1)
    sh = jax.jit(lambda p, v: spatial.eight_layers_net_sharded(
        p, v, mesh1))(params, xs1)
    check("sharded net (1-dev mesh, shard_map kernels) == plain net",
          bool((np.asarray(sh) == np.asarray(tuned)).all()))

    # 3b. per-symbol-context coder pair (hyperprior y path) on hardware:
    # catches silent bf16 matmul rounding in the one-hot CDF-row
    # expansion (default MXU precision loses table bits; round-3 bug)
    from simple_image_compression_network_tpu.codec import entropy as ent
    rngc = np.random.default_rng(7)
    scale_table = ent.default_scale_table()
    ctx_cdfs = np.stack([ent.gaussian_cdf_table(sc, 127)
                         for sc in scale_table])
    nl_c, t_c, s_c = 384, 24, 8
    ctx_v = rngc.integers(20, 36, size=(s_c, t_c, nl_c)).astype(np.int32)
    sig = scale_table[ctx_v]
    syms_c = np.clip(np.round(rngc.normal(0, 1, ctx_v.shape) * sig) + 127,
                     0, 255).astype(np.int32)
    encc = jax.jit(jax.vmap(lambda sy, cc: device_rans.encode(
        sy, jnp.asarray(ctx_cdfs), cc)))
    wds, cts = encc(jnp.asarray(syms_c), jnp.asarray(ctx_v))
    capc = device_rans.bucket_words(int(np.asarray(cts).max()))
    wd16 = jnp.asarray(np.asarray(wds)[:, :capc].astype(np.uint16))
    x0c = pallas_rans.split_init(wd16, nl_c)
    sy_c, cons_c, xf_c = pallas_rans.decode_ctx(
        wd16, x0c, jnp.asarray(ctx_cdfs), jnp.asarray(ctx_v), t_steps=t_c)
    check("ctx-coder roundtrip (encode scan + Pallas ctx decode, hardware)",
          bool((np.asarray(sy_c) == syms_c).all())
          and bool((np.asarray(cons_c) == np.asarray(cts)).all()))

    # 3c. pipelined encode must emit byte-identical containers to the
    # sync path ON HARDWARE (round-3 tested this on CPU only; the
    # pipelined path has its own predictive-slice fetch logic)
    from simple_image_compression_network_tpu.codec import pipeline
    enc_p = pipeline.PipelinedEncoder(params, cdfs, depth=2)
    enc_p.submit(x)
    enc_p.submit(x)
    piped = enc_p.drain()
    check("pipelined encode bytes == sync encode bytes (hardware)",
          all(a == b for batch in piped for a, b in zip(batch, streams)))

    # 3d. hyperprior device codec: sync vs pipelined byte equality and a
    # mean-scale roundtrip, on hardware
    import glob
    from simple_image_compression_network_tpu import train
    from simple_image_compression_network_tpu.codec import hyper_codec
    from simple_image_compression_network_tpu.utils import train_ckpt
    xs_f = jnp.asarray(imgs_u8.astype(np.float32) / 255.0)
    for model_name, codec_cls, pat in (
            ("hyperprior", hyper_codec.HyperCodec, "hp_scale_l*"),
            ("meanscale", hyper_codec.MeanScaleCodec, "hp_meanscale_l*")):
        cks = sorted(glob.glob(os.path.join(
            ROOT, "checkpoints", pat + ".params.msgpack")))
        if not cks:
            continue
        hcfg = train.TrainConfig(model=model_name)
        model, params0, _ = train.init_state(hcfg, jax.random.key(0))
        hparams = train_ckpt.restore_params(cks[-1], params0)
        codec = codec_cls(model, hparams)
        blobs = codec.compress_batch(xs_f)
        hp = pipeline.HyperPipelinedEncoder(codec, depth=2)
        hp.submit(xs_f)
        hp.submit(xs_f)
        hdrained = hp.drain()
        check(f"{model_name} pipelined bytes == sync bytes (hardware)",
              all(a == b for batch in hdrained
                  for a, b in zip(batch, blobs)))
        x_hat_h, y_hat_h = codec.decompress_batch(blobs)
        ysym, _, mu, _ = codec._encode_dev_arrays(xs_f)
        expect = ysym if mu is None else ysym + mu
        check(f"{model_name} decoded latents exact (hardware)",
              bool((np.asarray(y_hat_h)
                    == np.asarray(expect.astype(jnp.float32))).all()))

    # 3e. large-image VMEM-guard fallback: 1536x1024 overflows the
    # compact encode kernel's scratch budget AND the decode kernel's
    # word window; both pickers must route to the scan engines and the
    # roundtrip must stay bit-exact (ADVICE r3: compress used to hit an
    # opaque Mosaic INTERNAL here)
    from simple_image_compression_network_tpu.config import (
        reference_net_for_input)
    bigcfg = reference_net_for_input(1536, 1024)
    sL, lmL = int_codec.plan_streams((1536 // 16) * (1024 // 16))
    tL = (1536 // 16) * (1024 // 16) // lmL // sL
    check("large-image encode picker falls back to scan",
          int_codec._encode_impl(lmL * 192, tL) == "scan")
    big = jnp.asarray(datalib.synthetic_images(1, 1536, 1024,
                                               seed=11).view(np.int8))
    big_blobs = int_codec.compress_batch(params, big, bigcfg,
                                         static_cdfs=cdfs)
    big_hat, _ = int_codec.decompress_batch(params, big_blobs,
                                            static_cdfs=cdfs)
    big_direct = jax.jit(lambda p, v: codec_int.eight_layers_net(
        p, v, bigcfg))(params, big)
    check("1536x1024 scan-fallback roundtrip bit-exact (hardware)",
          bool((np.asarray(big_hat) == np.asarray(big_direct)).all()))

    # 3f. large-image HYPER roundtrip: exercises the ctx-decode VMEM
    # guard AND the odd-stream-count grid blocks (the z tensor at this
    # size plans 6 streams/image — the pick_g Mosaic block-shape case)
    try:
        cks_s = sorted(glob.glob(os.path.join(
            ROOT, "checkpoints", "hp_scale_l*.params.msgpack")))
        if cks_s:
            hcfg2 = train.TrainConfig(model="hyperprior")
            hmodel2, hp0, _ = train.init_state(hcfg2, jax.random.key(0))
            hpar = train_ckpt.restore_params(cks_s[-1], hp0)
            hc = hyper_codec.HyperCodec(hmodel2, hpar)
            hbig = jnp.asarray(datalib.synthetic_images(
                1, 1536, 1024, seed=12).astype(np.float32) / 255.0)
            hblobs = hc.compress_batch(hbig)
            _, yh = hc.decompress_batch(hblobs)
            ys, _, mu, _ = hc._encode_dev_arrays(hbig)
            exp = (ys if mu is None else ys + mu).astype(jnp.float32)
            check("1536x1024 hyper roundtrip latents exact (hardware)",
                  bool((np.asarray(yh) == np.asarray(exp)).all()))
    except Exception as e:
        check(f"1536x1024 hyper roundtrip ({repr(e)[:80]})", False)

    # 4. over-wide buffer: kernel rejects clearly, picker falls back
    too_wide = pallas_rans.max_supported_cap(n_lanes) + 1
    try:
        pallas_rans.decode(jnp.zeros((8, too_wide), jnp.uint16),
                           jnp.zeros((8, n_lanes), jnp.uint32),
                           lane_cdf, t_steps=4)
        rejected = False
    except ValueError:
        rejected = True
    check("over-wide word buffer rejected with ValueError", rejected)
    check("impl picker falls back to scan on over-wide buffers",
          int_codec._decode_impl(n_lanes, too_wide) == "scan")

    dt = time.time() - t_start
    if failures:
        print(f"# SMOKE FAILED ({len(failures)}): {failures} [{dt:.0f}s]")
        return 1
    print(f"# SMOKE OK [{dt:.0f}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
