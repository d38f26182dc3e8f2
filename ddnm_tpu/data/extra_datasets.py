"""CelebA (aligned) and LSUN dataset adapters.

Counterparts of the reference's datasets/celeba.py (Google-Drive download +
split/attr parsing) and datasets/lsun.py (lmdb-backed classes). Both are
optional-dependency gated: LSUN needs `lmdb` (absent in this image -> clear
error), CelebA's metadata parsing uses pandas when present. Downloading is
NOT automatic — point `root` at an existing extraction.

Layout expectations:
  CelebA:  root/img_align_celeba/*.jpg (+ optional list_eval_partition.txt)
  LSUN:    root/<category>_<split>_lmdb/ (standard LSUN export)
"""

from __future__ import annotations

import io
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ddnm_tpu.data.io import load_image

logger = logging.getLogger("ddnm_tpu")

__all__ = ["CelebADataset", "LSUNDataset", "celeba_crop"]

# reference aligned-crop constants (datasets/__init__.py:64-70): a 128x128
# window centred at (cx=89, cy=121) on the 178x218 aligned images
_CX, _CY = 89, 121


def celeba_crop(img: np.ndarray) -> np.ndarray:
    """Crop the 128x128 aligned-face window (x1=cy-64 ... , reference
    datasets/__init__.py:64-70 with Crop transform semantics)."""
    x1, x2 = _CY - 64, _CY + 64
    y1, y2 = _CX - 64, _CX + 64
    return img[x1:x2, y1:y2]


class CelebADataset:
    """Aligned CelebA faces with the reference crop + resize pipeline.

    `split` uses list_eval_partition.txt when present (0 train/1 valid/2
    test, reference datasets/celeba.py:85-106); otherwise all images.
    """

    def __init__(self, root: str | Path, image_size: int = 64,
                 split: Optional[str] = None):
        root = Path(root)
        img_dir = root / "img_align_celeba"
        if not img_dir.exists():
            img_dir = root
        self.paths = sorted(img_dir.glob("*.jpg")) + sorted(img_dir.glob("*.png"))
        if not self.paths:
            raise FileNotFoundError(
                f"no CelebA images under {img_dir}; download img_align_celeba "
                "manually (automatic Google-Drive download is not supported)"
            )
        part_file = root / "list_eval_partition.txt"
        if split is not None and part_file.exists():
            split_idx = {"train": 0, "valid": 1, "test": 2}[split]
            keep = set()
            for line in part_file.read_text().splitlines():
                parts = line.split()
                if len(parts) == 2 and int(parts[1]) == split_idx:
                    keep.add(parts[0])
            self.paths = [p for p in self.paths if p.name in keep]
        self.image_size = image_size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int):
        from PIL import Image

        img = load_image(self.paths[i])
        img = celeba_crop(img)
        if img.shape[0] != self.image_size:
            pil = Image.fromarray((img * 255).astype(np.uint8))
            pil = pil.resize((self.image_size, self.image_size), Image.BICUBIC)
            img = np.asarray(pil, dtype=np.float32) / 255.0
        return img, 0


class LSUNDataset:
    """LSUN lmdb category dataset (reference datasets/lsun.py:11-176).

    Requires the `lmdb` package; raises a clear ImportError otherwise
    (the TPU image does not bundle it — use FolderDataset over an exported
    image tree instead, the reference's `ood_*` path)."""

    def __init__(self, root: str | Path, category: str, split: str = "val",
                 image_size: int = 256):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                "LSUN lmdb datasets need the 'lmdb' package (not bundled in "
                "this image). Export the lmdb to a folder of images and use "
                "the FolderDataset/ood path instead."
            ) from e
        path = Path(root) / f"{category}_{split}_lmdb"
        self.env = lmdb.open(
            str(path), max_readers=1, readonly=True, lock=False,
            readahead=False, meminit=False,
        )
        with self.env.begin(write=False) as txn:
            self.length = txn.stat()["entries"]
            self.keys = [k for k, _ in txn.cursor()]
        self.image_size = image_size

    def __len__(self):
        return self.length

    def __getitem__(self, i: int):
        from PIL import Image

        with self.env.begin(write=False) as txn:
            buf = txn.get(self.keys[i])
        img = Image.open(io.BytesIO(buf)).convert("RGB")
        # center-crop short edge then resize (reference lsun transforms)
        s = min(img.size)
        left = (img.size[0] - s) // 2
        top = (img.size[1] - s) // 2
        img = img.crop((left, top, left + s, top + s))
        img = img.resize((self.image_size, self.image_size), Image.BICUBIC)
        return np.asarray(img, dtype=np.float32) / 255.0, 0
