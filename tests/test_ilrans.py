"""Interleaved N-lane rANS: golden / native / on-device bit-identity.

Mirrors the reference's golden-vs-hardware strategy
(conv3_nonsquare_tb.cpp:1068-1123) for the entropy stage: the NumPy golden
(codec/ilrans.py) is the contract; the C++ native coder and the JAX on-device
scan coder must produce and consume byte-identical streams.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_image_compression_network_tpu.codec import (
    device_rans, entropy, ilrans, rans)


@pytest.fixture(scope="module")
def cdf8():
    rng = np.random.default_rng(7)
    return np.stack([entropy.quantize_cdf(rng.dirichlet(np.ones(129) * 0.3))
                     for _ in range(8)])


def _sample(rng, n, n_rows, L):
    ctx = rng.integers(0, n_rows, n).astype(np.int32)
    syms = np.minimum(rng.geometric(0.3, n) - 1, L - 1).astype(np.int32)
    return syms, ctx


@pytest.mark.parametrize("n,lanes", [(1, 4), (5, 4), (64, 8), (1000, 16),
                                     (4096, 192)])
def test_golden_roundtrip(rng, cdf8, n, lanes):
    syms, ctx = _sample(rng, n, 8, 129)
    blob = ilrans.encode(syms, ctx, cdf8, n_lanes=lanes)
    assert np.array_equal(ilrans.decode(blob, ctx, cdf8), syms)


@pytest.mark.parametrize("n,lanes", [(5, 4), (1000, 16), (4096, 64)])
def test_native_matches_golden(rng, cdf8, n, lanes):
    syms, ctx = _sample(rng, n, 8, 129)
    b_native = rans.encode_interleaved(syms, ctx, cdf8, n_lanes=lanes)
    b_golden = ilrans.encode(syms, ctx, cdf8, n_lanes=lanes)
    assert b_native == b_golden
    assert np.array_equal(rans.decode_interleaved(b_native, ctx, cdf8), syms)


def test_device_matches_golden_ctx_path(rng, cdf8):
    n, lanes = 2048, 32
    syms, ctx = _sample(rng, n, 8, 129)
    blob = ilrans.encode(syms, ctx, cdf8, n_lanes=lanes)
    assert np.array_equal(device_rans.decode_bytes(blob, cdf8, ctx), syms)
    s2, c2 = ilrans.pad_to_lanes(syms, ctx, lanes)
    t = s2.size // lanes
    words, count = device_rans.encode(
        jnp.asarray(s2.reshape(t, lanes)), jnp.asarray(cdf8),
        jnp.asarray(c2.reshape(t, lanes)))
    assert device_rans.bytes_from_words(
        np.asarray(words), int(count), n, lanes) == blob


def test_device_fixed_lane_path(rng):
    """The int8-codec layout: lane k's context fixed at channel k % C."""
    C, reps = 24, 64
    n = C * reps
    cdf = np.stack([entropy.quantize_cdf(rng.dirichlet(np.ones(129) * 0.2))
                    for _ in range(C)])
    ctx = (np.arange(n) % C).astype(np.int32)
    syms = np.minimum(rng.geometric(0.25, n) - 1, 128).astype(np.int32)
    blob = rans.encode_interleaved(syms, ctx, cdf, n_lanes=C)
    _, _, prec, off = ilrans.unpack_header(blob)
    words = jnp.asarray(device_rans.words_from_bytes(
        blob[off:], device_rans.bucket_words((len(blob) - off) // 2)))
    dsyms, consumed, xf = device_rans.decode(
        words, jnp.asarray(cdf), None, t_steps=reps)
    assert np.array_equal(np.asarray(dsyms).ravel(), syms)
    assert int(consumed) == (len(blob) - off) // 2
    assert (np.asarray(xf) == ilrans.STATE_LB).all()
    w2, cnt = device_rans.encode(jnp.asarray(syms.reshape(reps, C)),
                                 jnp.asarray(cdf), None)
    assert device_rans.bytes_from_words(np.asarray(w2), int(cnt), n, C) == blob


def test_empty_and_degenerate(cdf8):
    blob = ilrans.encode(np.zeros(0, np.int32), np.zeros(0, np.int32), cdf8)
    assert ilrans.decode(blob, np.zeros(0, np.int32), cdf8).size == 0
    # single-symbol alphabet row (freq 2^16) exercises the freq<<16 overflow
    cdf1 = np.array([[0, 1 << 16]], np.int32)
    syms = np.zeros(100, np.int32)
    ctx = np.zeros(100, np.int32)
    blob = ilrans.encode(syms, ctx, cdf1, n_lanes=4)
    assert np.array_equal(ilrans.decode(blob, ctx, cdf1), syms)
    b2 = rans.encode_interleaved(syms, ctx, cdf1, n_lanes=4)
    assert b2 == blob


def test_compression_near_entropy(rng):
    pmf = np.zeros(129)
    pmf[:8] = [0.5, 0.2, 0.1, 0.08, 0.05, 0.04, 0.02, 0.01]
    cdf = entropy.quantize_cdf(pmf)[None]
    syms = rng.choice(8, 50000, p=pmf[:8]).astype(np.int32)
    ctx = np.zeros(50000, np.int32)
    blob = rans.encode_interleaved(syms, ctx, cdf, n_lanes=192)
    ent = -sum(p * np.log2(p) for p in pmf[:8] if p > 0)
    bps = len(blob) * 8 / 50000
    assert bps < ent + 0.25, (bps, ent)


def test_native_fallback_is_loud(monkeypatch, tmp_path):
    """A failed native build must raise (not silently fall back)."""
    monkeypatch.setattr(rans, "_SRC_PATH", str(tmp_path / "missing.cpp"))
    monkeypatch.setattr(rans, "_SO_PATH", str(tmp_path / "missing.so"))
    monkeypatch.setattr(rans, "_lib", None)
    monkeypatch.delenv("SICN_ALLOW_PY_RANS", raising=False)
    with pytest.raises(RuntimeError, match="native rANS"):
        rans.load_native()
    monkeypatch.setenv("SICN_ALLOW_PY_RANS", "1")
    with pytest.warns(RuntimeWarning):
        assert rans.load_native() is None
