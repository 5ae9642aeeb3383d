"""Training-bank / eval-set disjointness (VERDICT r4 #3).

The RD tables stand on ``.evalset/`` (scripts/make_evalset.py); its source
images must never feed the training bank.  ``bundled_photos`` is the only
real-content inlet of ``training_bank``, so the contract is checked there:
only china.jpg (the one sklearn photo NOT in the eval set) may appear.
"""

import glob
import os
import sys

import numpy as np
import pytest

from simple_image_compression_network_tpu.utils import data as datalib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every eval-set source file (mirrors scripts/make_evalset.py SRC)
EVAL_SOURCES = [
    "matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    "sklearn/datasets/images/flower.jpg",
    "pygame/docs/generated/_images/camera_rgb.jpg",
    "pygame/docs/generated/_images/intro_blade.jpg",
    "pygame/docs/generated/_images/intro_freedom.jpg",
    "pygame/docs/generated/_images/introduction-Battleship1.png",
    "pygame/docs/generated/_images/introduction-TPS.png",
    "pygame/docs/generated/_images/Bagic-INPUT-resultscreen.png",
    "pygame/docs/generated/_images/introduction-PuyoPuyo.png",
]


def _find(rel):
    for base in sys.path:
        hits = glob.glob(os.path.join(base, rel))
        if hits:
            return hits[0]
    return None


def test_bundled_photos_disjoint_from_eval_sources():
    photos = datalib.bundled_photos()
    if not photos:
        pytest.skip("no bundled photos in this environment")
    eval_imgs = []
    for rel in EVAL_SOURCES:
        p = _find(rel)
        if p:
            eval_imgs.append(np.asarray(datalib.load_image(p)))
    assert eval_imgs, "eval sources missing from environment"
    for photo in photos:
        for ev in eval_imgs:
            assert photo.shape != ev.shape or not np.array_equal(photo, ev)


def test_bundled_photos_is_china_only():
    photos = datalib.bundled_photos()
    if not photos:
        pytest.skip("sklearn images unavailable")
    from sklearn.datasets import load_sample_image
    china = np.asarray(load_sample_image("china.jpg"), np.uint8)
    assert len(photos) == 1
    assert np.array_equal(photos[0], china)


def test_training_bank_shapes_and_content_mix():
    bank = datalib.training_bank(12, 128, 128, seed=0)
    assert bank.shape == (12, 128, 128, 3)
    assert bank.dtype == np.uint8
    # the bank must not be constant or degenerate
    assert float(bank.std()) > 10.0


def test_evalset_frames_when_built():
    """If .evalset exists it must satisfy the round-5 bars: >= 4 frames,
    each >= 0.35 MP, dims multiples of 16."""
    frames = sorted(glob.glob(os.path.join(ROOT, ".evalset", "*.png")))
    if not frames:
        pytest.skip(".evalset not built")
    assert len(frames) >= 4
    for f in frames:
        img = datalib.load_image(f)
        h, w = img.shape[:2]
        assert h % 16 == 0 and w % 16 == 0, f
        assert h * w >= 350_000, f
