#!/usr/bin/env python
"""Generate synthetic evaluation fixtures.

The reference ships small photo sets under exp/ (8 CelebA-HQ faces, 8
ImageNet JPEGs, masks — SURVEY.md §2 #31-32). Those are third-party photos
we do not vendor; this tool generates deterministic synthetic stand-ins with
the same directory layout so the eval harness and smoke tests run
out-of-the-box. Point --exp at a directory with real testsets for paper-
comparable numbers.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _texture(rng, size):
    """Smooth random texture (sum of random low-frequency sinusoids)."""
    import numpy as np

    yy, xx = np.mgrid[0:size, 0:size] / size
    img = np.zeros((size, size, 3), np.float32)
    for _ in range(6):
        fx, fy = rng.uniform(1, 6, 2)
        ph = rng.uniform(0, 6.283, 3)
        amp = rng.uniform(0.1, 0.5, 3)
        for c in range(3):
            img[..., c] += amp[c] * np.sin(6.283 * (fx * xx + fy * yy) + ph[c])
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return img


def main(argv=None):
    p = argparse.ArgumentParser(description="generate synthetic fixtures")
    p.add_argument("--exp", type=str, default="exp")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--count", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    ns = p.parse_args(argv)

    import numpy as np
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(ns.seed)
    exp = Path(ns.exp)
    for name in ("celeba_hq", "imagenet"):
        d = exp / "datasets" / name
        d.mkdir(parents=True, exist_ok=True)
        for i in range(ns.count):
            save_image(_texture(rng, ns.size), d / f"{i:05d}.png")

    # center-square inpainting mask (mask.npy: 1 = keep)
    masks = exp / "inp_masks"
    masks.mkdir(parents=True, exist_ok=True)
    m = np.ones((ns.size, ns.size), np.int64)
    q = ns.size // 4
    m[q : 3 * q, q : 3 * q] = 0
    np.save(masks / "mask.npy", m)
    save_image(m.astype(np.float32), masks / "mask.png")

    # hq face256 sweep pairs (reference layout: data/datasets/gts/face +
    # data/datasets/gt_keep_masks/face, filename-paired)
    face_gts = exp / "datasets" / "face" / "gts"
    face_masks = exp / "datasets" / "face" / "gt_keep_masks"
    face_gts.mkdir(parents=True, exist_ok=True)
    face_masks.mkdir(parents=True, exist_ok=True)
    for i in range(ns.count):
        name = f"face_{i:05d}.png"
        save_image(_texture(rng, ns.size), face_gts / name)
        km = np.ones((ns.size, ns.size), np.float32)
        # varied rectangular holes (0 = restore), deterministic per index
        h0 = int(rng.uniform(0.2, 0.5) * ns.size)
        w0 = int(rng.uniform(0.2, 0.5) * ns.size)
        km[h0 : h0 + ns.size // 4, w0 : w0 + ns.size // 3] = 0.0
        save_image(km, face_masks / name)
    print(f"fixtures under {exp}: 2x{ns.count} images + inp_masks/mask.npy "
          f"+ {ns.count} face gt/mask pairs")


if __name__ == "__main__":
    main()
