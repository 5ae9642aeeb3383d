"""Device-format hyperprior codec: on-device entropy stage + escapes.

Mirrors the csim-vs-golden strategy: the device coder's streams must be
byte-identical to the NumPy golden ilrans coder under the same tables and
contexts, and the full container roundtrip must restore the encoder's
quantized latents exactly (rANS is lossless), including out-of-alphabet
values carried by the escape side channel (codec/escape.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.codec import (
    container, escape, hyper_codec, ilrans)
from simple_image_compression_network_tpu.models.hyperprior import (
    MeanScaleHyperprior, ScaleHyperprior)


def _mk(model_cls, rng, n=8, m=12, size=128):
    model = model_cls(n=n, m=m)
    x = jnp.asarray(rng.random((2, size, size, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), x[:1])
    return model, params, x


def test_escape_roundtrip(rng):
    vals = rng.integers(-200, 200, size=400)
    vals[rng.integers(0, 400, 12)] = 5000  # force far out-of-range
    syms = np.asarray(escape.to_symbols(jnp.asarray(vals), 127))
    assert syms.max() <= escape.escape_symbol(127)
    raw_b = escape.pack_raw(vals, 127)
    raw, used = escape.unpack_raw(raw_b)
    assert used == len(raw_b)
    back = escape.from_symbols(syms, raw, 127)
    np.testing.assert_array_equal(back, vals)


def test_escape_count_mismatch_raises(rng):
    vals = np.asarray([0, 500, -1])
    syms = np.asarray(escape.to_symbols(jnp.asarray(vals), 127))
    with pytest.raises(ValueError):
        escape.from_symbols(syms, np.zeros(0, np.int64), 127)


@pytest.mark.parametrize("cls,codec_cls", [
    (ScaleHyperprior, hyper_codec.HyperCodec),
    (MeanScaleHyperprior, hyper_codec.MeanScaleCodec)])
def test_device_roundtrip_batched(rng, cls, codec_cls):
    model, params, x = _mk(cls, rng)
    codec = codec_cls(model, params)
    blobs = codec.compress_batch(x)
    assert len(blobs) == 2
    cid, _ = container.unpack(blobs[0])
    assert cid == container.CODEC_HYPERPRIOR_DEV
    x_hat, y_hat = codec.decompress_batch(blobs)

    # the decoded y_hat must equal the encoder-side quantities exactly
    parts = codec._encode_dev_arrays(x)
    ysym, mu = parts[0], (parts[2] if len(parts) == 4 else None)
    expect = jnp.asarray(ysym, jnp.float32)
    if mu is not None:
        expect = expect + mu
    np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(expect))
    # and the reconstruction must equal direct synthesis of those latents
    direct = codec._decode_arrays(expect)
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(direct))


def test_device_streams_match_golden(rng):
    """Device y-stream bytes == NumPy golden ilrans with the same ctx."""
    model, params, x = _mk(ScaleHyperprior, rng)
    codec = hyper_codec.HyperCodec(model, params)
    blob = codec.compress_batch(x[:1])[0]
    _, (hdr, z_pay, y_pay, _, _) = container.unpack(blob)

    y, z, _, sigma = codec._encode_dev_arrays(x[:1])
    b, yx, yy, yc = y.shape
    s_y, nl_y, t_y = hyper_codec._plan_lanes(yx * yy, yc)
    syms = np.asarray(escape.to_symbols(y.astype(jnp.int32),
                                        hyper_codec._Y_MAX_DEV))
    ctx = np.asarray(codec._scale_ctx(sigma))
    sy = syms.reshape(s_y, -1)
    cy = ctx.reshape(s_y, -1)
    chunks = hyper_codec._unpack_streams(y_pay)
    assert len(chunks) == s_y
    for j in range(s_y):
        golden = ilrans.encode(sy[j], cy[j], codec.y_cdfs_dev,
                               n_lanes=nl_y)
        assert chunks[j] == golden, f"stream {j} differs from golden"

    # z stream vs golden (fixed per-lane context == channel index)
    _, zx, zy, zc = z.shape
    s_z, nl_z, t_z = hyper_codec._plan_lanes(zx * zy, zc)
    zsyms = np.asarray(escape.to_symbols(z.astype(jnp.int32),
                                         hyper_codec._Z_MAX))
    zctx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                           (zx * zy, zc)).ravel()
    zch = hyper_codec._unpack_streams(z_pay)
    for j in range(s_z):
        golden = ilrans.encode(zsyms.reshape(s_z, -1)[j],
                               np.tile(zctx, 1).reshape(s_z, -1)[j],
                               codec.z_cdfs, n_lanes=nl_z)
        assert zch[j] == golden


def test_device_escape_side_channel(rng):
    """Out-of-alphabet latents survive the container roundtrip exactly."""
    vals = rng.integers(-60, 60, size=(1, 8, 8, 16)).astype(np.int32)
    vals[0, 3, 4, 5] = 900   # far outside [-127, 127]
    vals[0, 0, 0, 0] = -412
    ctx = rng.integers(0, 64, size=vals.shape).astype(np.int32)
    cdfs = jnp.asarray(np.stack([
        np.linspace(0, 1 << 16, escape.alphabet_size(127) + 1)
          .astype(np.int32) for _ in range(64)]))
    # uniform-ish tables are fine: losslessness is table-independent
    from simple_image_compression_network_tpu.codec.entropy import (
        quantize_cdf)
    pmf = np.full(escape.alphabet_size(127), 1.0 / 256)
    cdfs = jnp.asarray(np.stack([quantize_cdf(pmf) for _ in range(64)]))
    s, nl, t = hyper_codec._plan_lanes(64, 16)
    words, counts, n_esc = hyper_codec._dev_encode(
        jnp.asarray(vals.reshape(1, 64, 16)),
        jnp.asarray(ctx.reshape(1, 64, 16)), cdfs,
        t_steps=t, n_lanes=nl, n_streams=s, max_abs=127)
    assert int(np.asarray(n_esc)[0]) == 2
    syms, ok = hyper_codec._dev_decode_ctx(
        words, counts, cdfs,
        jnp.asarray(ctx.reshape(s, t, nl)), t_steps=t)
    assert bool(np.asarray(ok).all())
    raw_b = escape.pack_raw(vals, 127)
    raw, _ = escape.unpack_raw(raw_b)
    back = escape.from_symbols(np.asarray(syms).reshape(-1), raw, 127)
    np.testing.assert_array_equal(back, vals.ravel())


def test_pallas_ctx_decode_matches_scan(rng):
    """The per-step-context Pallas decode kernel == the scan decoder."""
    from simple_image_compression_network_tpu.codec import (
        device_rans, pallas_rans)
    from simple_image_compression_network_tpu.codec.entropy import (
        quantize_cdf)
    n_rows, L = 16, 40
    n_lanes, t_steps, s = 32, 12, 4
    cdfs = np.stack([quantize_cdf(rng.dirichlet(np.ones(L) * 0.4))
                     for _ in range(n_rows)])
    ctx = rng.integers(0, n_rows, size=(s, t_steps, n_lanes)).astype(
        np.int32)
    syms = rng.integers(0, L, size=(s, t_steps, n_lanes)).astype(np.int32)
    enc = jax.vmap(lambda sy, c: device_rans.encode(
        sy, jnp.asarray(cdfs), c))
    words, counts = enc(jnp.asarray(syms), jnp.asarray(ctx))
    cap = int(np.asarray(counts).max())
    w16 = jnp.asarray(np.asarray(words)[:, :cap].astype(np.uint16))
    x0 = pallas_rans.split_init(w16, n_lanes)
    p_syms, p_cons, p_xfin = pallas_rans.decode_ctx(
        w16, x0, jnp.asarray(cdfs), jnp.asarray(ctx), t_steps=t_steps,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(p_syms), syms)
    np.testing.assert_array_equal(np.asarray(p_cons), np.asarray(counts))
    assert (np.asarray(p_xfin) == 1 << 16).all()


def test_device_roundtrip_with_forced_escapes(rng, monkeypatch):
    """Shrinking the device alphabet forces real escapes through the
    container path: symbols overflow to the side channel and the decoded
    latents must still match the encoder's exactly."""
    monkeypatch.setattr(hyper_codec, "_Y_MAX_DEV", 1)
    monkeypatch.setattr(hyper_codec, "_Z_MAX", 1)
    model, params, x = _mk(ScaleHyperprior, rng)
    x = x * 9.0 - 4.0  # out-of-gamut input -> latents beyond +-1
    codec = hyper_codec.HyperCodec(model, params)
    # rebuild tables for the tiny alphabets
    codec.z_cdfs = hyper_codec.build_factorized_cdfs(model, params,
                                                     max_abs=1)
    codec.y_cdfs_dev = hyper_codec.build_gaussian_cdfs(codec.scale_table,
                                                       1)
    blobs = codec.compress_batch(x)
    # the containers must actually carry escapes
    n_raw = 0
    for blob in blobs:
        _, (_, _, _, z_raw, y_raw) = container.unpack(blob)
        n_raw += escape.unpack_raw(z_raw)[0].size
        n_raw += escape.unpack_raw(y_raw)[0].size
    assert n_raw > 0, "test should force at least one escape"
    x_hat, y_hat = codec.decompress_batch(blobs)
    ysym, _, mu, _ = codec._encode_dev_arrays(x)
    expect = jnp.asarray(ysym, jnp.float32)
    np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(expect))


def test_hyper_pipelined_matches_batch(rng):
    """Pipelined hyper serving == compress_batch/decompress_batch bytes."""
    from simple_image_compression_network_tpu.codec import pipeline
    model, params, x = _mk(ScaleHyperprior, rng)
    codec = hyper_codec.HyperCodec(model, params)
    direct = codec.compress_batch(x)

    enc = pipeline.HyperPipelinedEncoder(codec, depth=2)
    for _ in range(3):
        enc.submit(x)
    outs = enc.drain()
    assert len(outs) == 3
    for blobs in outs:
        assert blobs == direct

    dec = pipeline.HyperPipelinedDecoder(codec, depth=2)
    for _ in range(3):
        dec.submit(direct)
    recons = dec.drain()
    x_hat, y_hat = codec.decompress_batch(direct)
    for xr, yr in recons:
        np.testing.assert_array_equal(np.asarray(xr), np.asarray(x_hat))
        np.testing.assert_array_equal(np.asarray(yr), np.asarray(y_hat))
