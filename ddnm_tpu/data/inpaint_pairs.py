"""Paired gt/mask inpainting loader for the hq pipeline.

Counterpart of the reference's load_data_inpa / ImageDatasetInpa
(hq_demo/guided_diffusion/image_datasets.py:29-218): pairs sorted image
trees `gt_path` and `mask_path` by filename and yields dict batches
{"GT": [-1,1] NHWC, "GT_name": str, "gt_keep_mask": [0,1] NHWC}.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np

from ddnm_tpu.data.io import load_image

__all__ = ["InpaintPairs"]

_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


def _tree(root: str | Path) -> list[Path]:
    return sorted(p for p in Path(root).rglob("*") if p.suffix.lower() in _EXTS)


def _center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Repeated-downsample center crop (image_datasets.py:201-218; same
    algorithm as datasets.center_crop_arr, shared)."""
    from PIL import Image

    from ddnm_tpu.data.datasets import center_crop_arr

    pil = center_crop_arr(Image.fromarray((img * 255).astype(np.uint8)), size)
    return np.asarray(pil, dtype=np.float32) / 255.0


class InpaintPairs:
    """Filename-paired (ground truth, keep-mask) dataset."""

    def __init__(self, gt_path: str | Path, mask_path: str | Path,
                 image_size: int = 256, max_len: int | None = None):
        gts = _tree(gt_path)
        masks = {p.name: p for p in _tree(mask_path)}
        named = [(g, masks[g.name]) for g in gts if g.name in masks]
        if len(named) == len(gts):
            # every gt has a same-named mask: pair by name
            self.pairs = named
        else:
            # otherwise pair the two sorted trees positionally like the
            # reference (image_datasets.py:60-76) — a PARTIAL name overlap
            # must not silently drop the unmatched gts
            import logging

            if named:
                logging.getLogger("ddnm_tpu").warning(
                    "gt/mask name overlap is partial (%d/%d) — pairing "
                    "positionally like the reference", len(named), len(gts))
            self.pairs = list(zip(gts, _tree(mask_path)))
        if max_len:
            self.pairs = self.pairs[:max_len]
        if not self.pairs:
            raise FileNotFoundError(f"no gt/mask pairs under {gt_path} / {mask_path}")
        self.image_size = image_size

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int) -> dict:
        gt_p, mask_p = self.pairs[i]
        gt = _center_crop(load_image(gt_p), self.image_size)
        mask = _center_crop(load_image(mask_p), self.image_size)
        return {
            "GT": gt * 2.0 - 1.0,  # [-1,1] (image_datasets.py:176)
            "GT_name": gt_p.name,
            "gt_keep_mask": (mask > 0.5).astype(np.float32),  # [0,1] (:177)
        }

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]
