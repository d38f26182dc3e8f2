"""Image IO: PNG/JPEG read and write as float32 NHWC in [0,1].

PNG writes replicate torchvision.utils.save_image quantisation
(mul 255, add 0.5, clamp, truncate) so outputs are byte-identical to the
reference's for the same float image."""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["load_image", "save_image", "load_mask"]


def load_image(path: str | Path, size: int | None = None) -> np.ndarray:
    """Read an image file -> float32 (H, W, 3) in [0,1]. Optionally resize
    (bicubic, like torchvision Resize defaults... the reference datasets use
    various transforms; resize only when asked)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None and img.size != (size, size):
        img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img, dtype=np.float32) / 255.0


def save_image(img: np.ndarray, path: str | Path) -> None:
    """Write a float (H, W, C) or (H, W) image in [0,1] as PNG.

    Quantisation matches torchvision save_image: (img*255 + 0.5) truncated."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    q = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(q).save(path)


def load_mask(path: str | Path) -> np.ndarray:
    """Load an inpainting mask: .npy (0/1 ints, reference exp/inp_masks) or an
    image file thresholded at 0.5 (reference get_mask.py semantics)."""
    path = Path(path)
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32)
    img = load_image(path)
    return (img.mean(axis=-1) > 0.5).astype(np.float32)
