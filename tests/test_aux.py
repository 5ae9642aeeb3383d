"""Auxiliary subsystems: dump hooks, profiling, data, checkpoints, train loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from simple_image_compression_network_tpu import train
from simple_image_compression_network_tpu.utils import (data as datalib, dump,
                                                        profiling, train_ckpt)


def test_dump_hooks(tmp_path):
    dump.enable(str(tmp_path))
    try:
        x = jnp.arange(6.0).reshape(2, 3)

        @jax.jit
        def f(v):
            return dump.dump("act", v * 2) + 1

        out = f(x)
        out.block_until_ready()
    finally:
        dump.disable()
    saved = dump.load(str(tmp_path), "act", 0)
    np.testing.assert_array_equal(saved, np.arange(6.0).reshape(2, 3) * 2)
    np.testing.assert_array_equal(np.asarray(out), saved + 1)


def test_stage_timer():
    t = profiling.StageTimer()
    with t.stage("a"):
        jnp.ones((8, 8)).sum().block_until_ready()
    with t.stage("a"):
        pass
    rep = t.report()
    assert "a" in rep and "2x" in rep
    assert profiling.throughput_mps(1_000_000, 1.0) == 1.0


def test_synthetic_images_and_crops(rng):
    imgs = datalib.synthetic_images(2, 64, 48, seed=1)
    assert imgs.shape == (2, 64, 48, 3) and imgs.dtype == np.uint8
    assert imgs.std() > 10  # non-degenerate
    crops = datalib.random_crops(imgs, 32, 4, rng)
    assert crops.shape == (4, 32, 32, 3)
    assert 0.0 <= crops.min() and crops.max() <= 1.0


def test_train_ckpt_roundtrip(tmp_path):
    cfg = train.TrainConfig(model="factorized", n=8, m=12, crop=32, batch=1)
    key = jax.random.key(0)
    _, params, opt_state = train.init_state(cfg, key)
    path = os.path.join(str(tmp_path), "ckpt_7.msgpack")
    train_ckpt.save(path, 7, params, opt_state)
    assert train_ckpt.latest(str(tmp_path)) == path
    step, p2, o2 = train_ckpt.restore(path, params, opt_state)
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_loop_smoke(tmp_path):
    from simple_image_compression_network_tpu import train_loop
    train_loop.main(["--model", "factorized", "--steps", "2", "--crop", "64",
                     "--batch", "1", "--log-every", "1",
                     "--ckpt-dir", str(tmp_path), "--ckpt-every", "2",
                     "--dp", "1", "--sp", "1"])
    assert train_ckpt.latest(str(tmp_path)) is not None
