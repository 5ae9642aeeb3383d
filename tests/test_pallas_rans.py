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
