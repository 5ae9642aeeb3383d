"""Pallas rANS decode kernel vs golden/scan decoders (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_image_compression_network_tpu.codec import (device_rans, entropy,
                                                        ilrans, pallas_rans)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(21)
    c, lm = 24, 2
    n_lanes = c * lm
    t_steps = 16
    s = 4  # streams
    cdf = np.stack([entropy.quantize_cdf(rng.dirichlet(np.ones(129) * 0.25))
                    for _ in range(c)])
    lane_cdf = cdf[np.arange(n_lanes) % c]
    ctx = np.tile(np.arange(c, dtype=np.int32), t_steps * lm)
    streams, syms = [], []
    for j in range(s):
        sy = np.minimum(rng.geometric(0.3, t_steps * n_lanes) - 1,
                        127).astype(np.int32)
        syms.append(sy)
        streams.append(ilrans.encode(sy, ctx, cdf, n_lanes=n_lanes))
    return n_lanes, t_steps, lane_cdf, streams, syms


def _word_matrix(streams, n_lanes):
    off = ilrans.unpack_header(streams[0])[3]
    counts = np.asarray([(len(b) - off) // 2 for b in streams], np.int32)
    cap = int(counts.max())
    words = np.stack([
        np.pad(np.frombuffer(b, "<u2", offset=off), (0, cap - c))
        for b, c in zip(streams, counts)])
    return jnp.asarray(words), counts


@pytest.mark.parametrize("g_streams", [1, 2, 4])
def test_pallas_decode_matches_golden(case, g_streams):
    n_lanes, t_steps, lane_cdf, streams, syms = case
    words, counts = _word_matrix(streams, n_lanes)
    x0 = pallas_rans.split_init(words, n_lanes)
    out, cons, xfin = pallas_rans.decode(
        words, x0, jnp.asarray(lane_cdf), t_steps=t_steps,
        g_streams=g_streams, interpret=True)
    for j, sy in enumerate(syms):
        np.testing.assert_array_equal(
            np.asarray(out[j]).ravel(), sy,
            err_msg=f"stream {j} (g={g_streams})")
    np.testing.assert_array_equal(np.asarray(cons), counts)
    assert (np.asarray(xfin) == ilrans.STATE_LB).all()


def test_pallas_decode_matches_scan(case):
    n_lanes, t_steps, lane_cdf, streams, syms = case
    words, counts = _word_matrix(streams, n_lanes)
    x0 = pallas_rans.split_init(words, n_lanes)
    p_out, p_cons, p_xfin = pallas_rans.decode(
        words, x0, jnp.asarray(lane_cdf), t_steps=t_steps, interpret=True)
    for j in range(len(streams)):
        s_out, s_cons, s_xfin = device_rans.decode(
            words[j], jnp.asarray(lane_cdf), None, t_steps=t_steps)
        np.testing.assert_array_equal(np.asarray(p_out[j]),
                                      np.asarray(s_out))
        assert int(p_cons[j]) == int(s_cons)
        np.testing.assert_array_equal(np.asarray(p_xfin[j]),
                                      np.asarray(s_xfin))


def test_int_codec_roundtrip_with_pallas_impl(monkeypatch):
    """Full bitstream roundtrip forced through the Pallas decode kernel
    (interpret mode) — integration of kernel + container + synthesis."""
    import os
    import jax.numpy as jnp2
    from simple_image_compression_network_tpu.codec import int_codec
    from simple_image_compression_network_tpu.config import (
        reference_net_for_input)
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.utils import weights_io
    monkeypatch.setenv("SICN_RANS_IMPL", "pallas_interpret")
    ckpt = os.path.join(os.path.dirname(__file__), "..",
                        "checkpoints", "reference_weights.npz")
    params = weights_io.load_checkpoint(ckpt)
    rng = np.random.default_rng(9)
    cfg = reference_net_for_input(96, 64)
    x = jnp2.asarray(rng.integers(0, 256, size=(1, 96, 64, 3),
                                  dtype=np.uint8).view(np.int8))
    cdfs = int_codec.build_static_cdfs(params, [x], cfg)
    data = int_codec.compress(params, x, cfg, static_cdfs=cdfs,
                              coder="device")
    x_hat, z_hat = int_codec.decompress(params, data, static_cdfs=cdfs,
                                        coder="device")
    direct = codec_int.eight_layers_net(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(direct))


@pytest.mark.parametrize("g_streams", [1, 2, 4])
def test_pallas_encode_matches_golden(case, g_streams):
    """Pallas encode kernel streams == golden ilrans bytes, per stream."""
    n_lanes, t_steps, lane_cdf, streams, syms = case
    sy = jnp.asarray(np.stack(syms)).reshape(len(syms), t_steps, n_lanes)
    words, counts = pallas_rans.encode_batch(
        sy, jnp.asarray(lane_cdf), g_streams=g_streams, interpret=True)
    counts_np = np.asarray(counts)
    words_np = np.asarray(words)
    off = ilrans.unpack_header(streams[0])[3]
    for j, blob in enumerate(streams):
        got = words_np[j, : counts_np[j]].astype("<u2").tobytes()
        assert got == blob[off:], f"stream {j} (g={g_streams})"


def test_pallas_encode_matches_scan(case):
    """Pallas encode == vmapped scan encode, word-for-word."""
    n_lanes, t_steps, lane_cdf, streams, syms = case
    sy = jnp.asarray(np.stack(syms)).reshape(len(syms), t_steps, n_lanes)
    p_words, p_counts = pallas_rans.encode_batch(
        sy, jnp.asarray(lane_cdf), interpret=True)
    import jax
    s_words, s_counts = jax.vmap(
        lambda s: device_rans.encode(s, jnp.asarray(lane_cdf), None))(sy)
    np.testing.assert_array_equal(np.asarray(p_counts),
                                  np.asarray(s_counts))
    np.testing.assert_array_equal(np.asarray(p_words),
                                  np.asarray(s_words))


@pytest.mark.parametrize("g_streams", [1, 4])
def test_pallas_encode_compact_matches_golden(case, g_streams):
    """In-kernel compaction: stream bytes == golden ilrans, per stream."""
    n_lanes, t_steps, lane_cdf, streams, syms = case
    sy = jnp.asarray(np.stack(syms)).reshape(len(syms), t_steps, n_lanes)
    words, counts = pallas_rans.encode_batch_compact(
        sy, jnp.asarray(lane_cdf), cap_words=2048, g_streams=g_streams,
        interpret=True)
    counts_np = np.asarray(counts)
    words_np = np.asarray(words)
    off = ilrans.unpack_header(streams[0])[3]
    for j, blob in enumerate(streams):
        assert counts_np[j] <= 2 * n_lanes + 2048, "unexpected overflow"
        got = words_np[j, : counts_np[j]].astype("<u2").tobytes()
        assert got == blob[off:], f"stream {j} (g={g_streams})"


def test_pallas_encode_compact_overflow_detected(case):
    """A too-small staging cap yields counts > cap (caller falls back)."""
    n_lanes, t_steps, lane_cdf, streams, syms = case
    sy = jnp.asarray(np.stack(syms)).reshape(len(syms), t_steps, n_lanes)
    tiny = 48
    words, counts = pallas_rans.encode_batch_compact(
        sy, jnp.asarray(lane_cdf), cap_words=tiny, interpret=True)
    # true counts unchanged (still correct), exceeding the tiny cap
    _, s_counts = pallas_rans.encode_batch(
        sy, jnp.asarray(lane_cdf), interpret=True)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(s_counts))
    assert (np.asarray(counts) > 2 * n_lanes + tiny).any()


def test_compress_batch_encode_overflow_fallback(monkeypatch):
    """When the compact encode kernel's staging cap is too small for the
    content, compress_batch must transparently re-encode on the scan
    engine and still produce decodable, bit-exact containers."""
    import os
    import jax.numpy as jnp2
    from simple_image_compression_network_tpu.codec import (int_codec,
                                                            pallas_rans)
    from simple_image_compression_network_tpu.config import (
        reference_net_for_input)
    from simple_image_compression_network_tpu.models import codec_int
    from simple_image_compression_network_tpu.utils import weights_io
    monkeypatch.setenv("SICN_RANS_IMPL", "pallas_interpret")
    # force a staging cap far below any real payload
    monkeypatch.setattr(pallas_rans, "default_encode_cap",
                        lambda t, n, vmem_limit=0: 64)
    ckpt = os.path.join(os.path.dirname(__file__), "..",
                        "checkpoints", "reference_weights.npz")
    params = weights_io.load_checkpoint(ckpt)
    rng = np.random.default_rng(5)
    cfg = reference_net_for_input(96, 64)
    x = jnp2.asarray(rng.integers(0, 256, size=(1, 96, 64, 3),
                                  dtype=np.uint8).view(np.int8))
    cdfs = int_codec.build_static_cdfs(params, [x], cfg)
    data = int_codec.compress(params, x, cfg, static_cdfs=cdfs,
                              coder="device")
    x_hat, _ = int_codec.decompress(params, data, static_cdfs=cdfs,
                                    coder="device")
    direct = codec_int.eight_layers_net(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(direct))


def test_pallas_encode_compact_ctx_matches_golden(rng):
    """Compact encode kernel with per-symbol contexts == golden ilrans."""
    from simple_image_compression_network_tpu.codec import entropy
    n_rows, L = 16, 40
    n_lanes, t_steps, s = 32, 12, 4
    cdfs = np.stack([entropy.quantize_cdf(rng.dirichlet(np.ones(L) * 0.4))
                     for _ in range(n_rows)])
    ctx = rng.integers(0, n_rows, size=(s, t_steps, n_lanes)).astype(
        np.int32)
    syms = rng.integers(0, L, size=(s, t_steps, n_lanes)).astype(np.int32)
    words, counts = pallas_rans.encode_batch_compact(
        jnp.asarray(syms), jnp.asarray(cdfs), jnp.asarray(ctx),
        cap_words=1024, interpret=True)
    counts_np = np.asarray(counts)
    words_np = np.asarray(words)
    for j in range(s):
        golden = ilrans.encode(syms[j].ravel(), ctx[j].ravel(), cdfs,
                               n_lanes=n_lanes)
        off = ilrans.unpack_header(golden)[3]
        got = words_np[j, : counts_np[j]].astype("<u2").tobytes()
        assert got == golden[off:], f"stream {j}"


def test_butterfly_expand_matches_gather():
    """The renorm butterfly (pallas_rans._expand_words) must equal the
    gather w[g, l] = chunk[g, rank[g, l]] for every monotone rank
    pattern (rank = exclusive prefix sum of a 0/1 mask)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from simple_image_compression_network_tpu.codec import pallas_rans

    g_streams, n_lanes = 4, 256
    rng = np.random.default_rng(42)

    def kernel(chunk_ref, rank_ref, out_ref):
        k = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 1)
        eye = (k == j).astype(jnp.float32)
        out_ref[:, :] = pallas_rans._expand_words(
            chunk_ref[:, :], rank_ref[:, :], eye, g_streams, n_lanes)

    for density in (0.0, 0.1, 0.5, 0.9, 1.0):
        need = (rng.uniform(size=(g_streams, n_lanes)) < density)
        rank = np.cumsum(need, axis=1) - need  # exclusive prefix
        chunk = rng.integers(0, 1 << 16,
                             size=(g_streams, n_lanes)).astype(np.int32)
        chunk_cols = np.ascontiguousarray(chunk.T)  # (N, G)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((g_streams, n_lanes),
                                           jnp.int32),
            interpret=True,
        )(jnp.asarray(chunk_cols), jnp.asarray(rank.astype(np.int32)))
        expect = np.take_along_axis(chunk, rank.astype(np.int64), axis=1)
        got = np.asarray(out)
        sel = need  # only lanes that actually renorm read their word
        np.testing.assert_array_equal(got[sel], expect[sel])


def test_vmem_guards_group_aware():
    """max_supported_cap / decode_ctx_vmem_ok shrink with the stream-group
    width: a whole-array group (g > 128, stream counts not divisible by
    8) halves the admissible words cap vs the single-vreg assumption."""
    from simple_image_compression_network_tpu.codec import pallas_rans as pr
    n_lanes = 384
    assert pr.pick_g(129) == 129
    cap_128 = pr.max_supported_cap(n_lanes)
    cap_129 = pr.max_supported_cap(n_lanes, 129)
    assert cap_129 < cap_128
    # a cap admissible under the 128-lane assumption but not under the
    # padded 256-lane group must be rejected by the ctx guard too
    mid = (cap_129 + cap_128) // 2
    assert pr.decode_ctx_vmem_ok(4, n_lanes, mid, g=8)
    assert not pr.decode_ctx_vmem_ok(4, n_lanes, mid, g=129)
