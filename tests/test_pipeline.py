"""Pipelined codec: byte-identical to the synchronous batch codec."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.codec import int_codec, pipeline
from simple_image_compression_network_tpu.config import reference_net_for_input
from simple_image_compression_network_tpu.utils import weights_io

CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints", "reference_weights.npz")


@pytest.fixture(scope="module")
def setup():
    params = {k: jnp.asarray(v) for k, v in
              weights_io.load_checkpoint(CKPT).items()}
    rng = np.random.default_rng(5)
    cfg = reference_net_for_input(128, 64)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 128, 64, 3),
                                        dtype=np.uint8).view(np.int8))
               for _ in range(3)]
    cdfs = int_codec.build_static_cdfs(params, [b[:1] for b in batches], cfg)
    return params, cfg, batches, cdfs


def test_pipelined_encode_matches_sync(setup):
    params, cfg, batches, cdfs = setup
    enc = pipeline.PipelinedEncoder(params, cdfs, cfg, depth=2)
    for b in batches:
        enc.submit(b)
    got = enc.drain()
    assert len(got) == 3
    for b, streams in zip(batches, got):
        ref = int_codec.compress_batch(params, b, cfg, static_cdfs=cdfs,
                                       coder="device")
        assert streams == ref


def test_pipelined_decode_matches_sync(setup):
    params, cfg, batches, cdfs = setup
    streams = [int_codec.compress_batch(params, b, cfg, static_cdfs=cdfs,
                                        coder="device") for b in batches]
    dec = pipeline.PipelinedDecoder(params, cdfs, depth=2)
    for s in streams:
        dec.submit(s)
    outs = dec.drain()
    assert len(outs) == 3
    for s, x_hat in zip(streams, outs):
        ref, _ = int_codec.decompress_batch(params, s, static_cdfs=cdfs,
                                            coder="device")
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(ref))


def test_collect_interleaved(setup):
    params, cfg, batches, cdfs = setup
    enc = pipeline.PipelinedEncoder(params, cdfs, cfg, depth=1)
    assert enc.collect() is None
    enc.submit(batches[0])
    enc.submit(batches[1])  # depth 1 -> forces drain of batch 0
    first = enc.collect()
    ref = int_codec.compress_batch(params, batches[0], cfg,
                                   static_cdfs=cdfs, coder="device")
    assert first == ref
    assert len(enc.drain()) == 1


def test_sync_fetch_prediction_fallback(setup):
    """The sync path's single-fetch bucket prediction must re-fetch
    transparently when seeded too small (bytes unchanged)."""
    params, cfg, batches, cdfs = setup
    x = batches[0]
    ref = int_codec.compress_batch(params, x, cfg, static_cdfs=cdfs,
                                   coder="device")
    # poison every geometry's prediction with a too-narrow bucket
    saved = dict(int_codec._SYNC_MXB)
    try:
        for k in list(int_codec._SYNC_MXB) or []:
            int_codec._SYNC_MXB[k] = 1
        # also pre-seed the exact key with a tiny width
        for k in list(saved) or list(int_codec._SYNC_MXB):
            int_codec._SYNC_MXB[k] = 1
        got = int_codec.compress_batch(params, x, cfg, static_cdfs=cdfs,
                                       coder="device")
    finally:
        int_codec._SYNC_MXB.clear()
        int_codec._SYNC_MXB.update(saved)
    assert got == ref


def test_pipelined_encoder_prediction_fallback(setup):
    """PipelinedEncoder with a poisoned width prediction still emits
    sync-identical bytes (blocking re-fetch path)."""
    params, cfg, batches, cdfs = setup
    enc = pipeline.PipelinedEncoder(params, cdfs, cfg, depth=2)
    enc._mxb = 4096  # one bucket: too small for these payloads? use min
    enc.submit(batches[0])
    got = enc.drain()[0]
    ref = int_codec.compress_batch(params, batches[0], cfg,
                                   static_cdfs=cdfs, coder="device")
    assert got == ref
