"""Dataset registry (reference datasets/__init__.py:47-193).

The evaluation datasets are plain image folders (CelebA-HQ / FFHQ / ImageNet
subsets); the registry reproduces the reference's selection semantics:

  - CelebA_HQ / FFHQ: ImageFolder over `<exp>/datasets/<path_y>`, shuffled
    with fixed seed 2019, 100% used as the test split
    (datasets/__init__.py:136-164).
  - ImageNet: 1k-subset via the txt manifest (exp/imagenet_val_1k.txt,
    datasets/__init__.py:169-175) or an out-of-distribution folder.

Everything yields float32 NHWC arrays in [0,1]; batching is a simple
generator (the heavy lifting is on-device)."""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np

from ddnm_tpu.data.io import load_image

__all__ = ["FolderDataset", "ImageNetManifestDataset", "get_dataset", "CenterCropLongEdge"]

IMG_EXTENSIONS = {".png", ".jpg", ".jpeg", ".ppm", ".bmp", ".webp", ".tif", ".tiff"}


def _list_images(root: Path) -> list[Path]:
    return sorted(p for p in root.rglob("*") if p.suffix.lower() in IMG_EXTENSIONS)


def CenterCropLongEdge(img: np.ndarray) -> np.ndarray:
    """Center-crop to the short edge (reference imagenet_subset.py:5-23)."""
    h, w = img.shape[:2]
    s = min(h, w)
    top = (h - s) // 2
    left = (w - s) // 2
    return img[top : top + s, left : left + s]


def center_crop_arr(pil, size: int):
    """The reference's center_crop_arr (datasets/__init__.py:29-44): BOX
    halving while the short edge >= 2*size, BICUBIC to the target scale,
    then center crop. Used for every non-manifest ImageNet / ood path."""
    from PIL import Image

    while min(pil.size) >= 2 * size:
        pil = pil.resize((pil.size[0] // 2, pil.size[1] // 2), Image.BOX)
    scale = size / min(pil.size)
    pil = pil.resize(
        (round(pil.size[0] * scale), round(pil.size[1] * scale)), Image.BICUBIC
    )
    arr = np.asarray(pil)
    h, w = arr.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return Image.fromarray(arr[top : top + size, left : left + size])


class FolderDataset:
    """ImageFolder-equivalent with the reference's fixed shuffle.

    `crop` selects the reference preprocessing per dataset family:
      - "squash" (CelebA_HQ/FFHQ): squash-resize to (s, s) with BILINEAR,
        no crop (torchvision Resize([s, s]), datasets/__init__.py:146-148);
      - "long_edge" (ImageNet 1k manifest): CenterCropLongEdge then
        BILINEAR resize (imagenet_subset.py:5-23 + Resize(s));
      - "center_arr" (non-manifest ImageNet / ood folders): the reference's
        center_crop_arr (BOX halving + BICUBIC + crop,
        datasets/__init__.py:29-44, used at :115,116,179,186).
    """

    def __init__(self, root: str | Path, image_size: int = 256,
                 shuffle_seed: int | None = 2019, crop: str = "squash"):
        if crop not in ("squash", "long_edge", "center_arr"):
            raise ValueError(f"unknown crop mode {crop!r}")
        self.paths = _list_images(Path(root))
        self.crop = crop
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        if shuffle_seed is not None:
            # the reference shuffles with numpy's legacy global RNG seeded
            # 2019 (datasets/__init__.py:150-155); RandomState reproduces the
            # exact order so per-index outputs/subset ranges line up
            idx = np.arange(len(self.paths))
            np.random.RandomState(shuffle_seed).shuffle(idx)
            self.paths = [self.paths[i] for i in idx]
        self.image_size = image_size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> tuple[np.ndarray, int]:
        from PIL import Image

        pil = Image.open(self.paths[i]).convert("RGB")
        if self.crop == "center_arr":
            pil = center_crop_arr(pil, self.image_size)
        elif self.crop == "long_edge":
            s = min(pil.size)
            left = (pil.size[0] - s) // 2
            top = (pil.size[1] - s) // 2
            pil = pil.crop((left, top, left + s, top + s))
        if pil.size != (self.image_size, self.image_size):
            pil = pil.resize((self.image_size, self.image_size), Image.BILINEAR)
        return np.asarray(pil, dtype=np.float32) / 255.0, 0


class ImageNetManifestDataset(FolderDataset):
    """Images + class labels from a `(filename class)` manifest txt."""

    def __init__(self, root: str | Path, manifest: str | Path, image_size: int = 256):
        self.crop = "long_edge"  # CenterCropLongEdge (imagenet_subset.py:5-23)
        root = Path(root)
        entries = []
        with open(manifest) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                name, cls = parts[0], int(parts[1]) if len(parts) > 1 else 0
                p = root / name
                if p.exists():
                    entries.append((p, cls))
        if not entries:
            raise FileNotFoundError(f"no manifest images found under {root}")
        self.paths = [p for p, _ in entries]
        self.labels = [c for _, c in entries]
        self.image_size = image_size

    def __getitem__(self, i: int):
        img, _ = super().__getitem__(i)
        return img, self.labels[i]


def get_dataset(
    name: str,
    *,
    root: str | Path,
    image_size: int = 256,
    manifest: str | Path | None = None,
    subset: tuple[int, int] | None = None,
    out_of_dist: bool = False,
):
    """Build a dataset by reference config name (CelebA_HQ, FFHQ, ImageNet...).

    `out_of_dist` mirrors the config flag: ood ImageFolder datasets are
    NOT shuffled (the seed-2019 shuffle applies only to the reference's
    non-ood path_y branch, datasets/__init__.py:137-165)."""
    if name.lower() in ("celeba_hq", "ffhq", "solvay", "oldphoto", "folder"):
        ds = FolderDataset(root, image_size,
                           shuffle_seed=None if out_of_dist else 2019)
    elif name.upper() == "CELEBA":
        from ddnm_tpu.data.extra_datasets import CelebADataset

        ds = CelebADataset(root, image_size, split="test")
    elif name.upper() == "LSUN" and out_of_dist:
        # ood_<category> ImageFolder with center_crop_arr
        # (datasets/__init__.py:113-118)
        ds = FolderDataset(root, image_size, shuffle_seed=None,
                           crop="center_arr")
    elif name.upper() == "LSUN":
        from ddnm_tpu.data.extra_datasets import LSUNDataset

        # root is <exp>/datasets/<path_y>; category from the final component
        ds = LSUNDataset(Path(root).parent, Path(root).name, "val", image_size)
    elif name.lower() == "imagenet" and manifest is not None:
        ds = ImageNetManifestDataset(root, manifest, image_size)
    elif name.lower() == "imagenet":
        # ood folder or torchvision-val layout: center_crop_arr either way
        # (datasets/__init__.py:176-189)
        ds = FolderDataset(root, image_size, shuffle_seed=None,
                           crop="center_arr")
    else:
        raise ValueError(f"unknown dataset {name}")
    if subset is not None:
        start, end = subset
        ds.paths = ds.paths[start:end]
        if hasattr(ds, "labels"):
            ds.labels = ds.labels[start:end]
    return ds


def _load_batch(dataset, idx: list[int]):
    items = [dataset[i] for i in idx]
    imgs = np.stack([im for im, _ in items])
    labels = np.asarray([lb for _, lb in items])
    return imgs, labels


def iterate_batches(
    dataset, batch_size: int, *, drop_remainder: bool = False,
    prefetch: int = 2, num_workers: int = 4,
) -> Iterator[tuple[np.ndarray, np.ndarray, int]]:
    """Yield (images, labels, valid_count) NHWC batches, padding the tail
    batch by repetition so jitted shapes stay static.

    Batches are decoded on a background thread pool with `prefetch` batches
    in flight, overlapping PNG/JPEG decode with device compute (the
    reference uses torch DataLoader workers, diffusion.py:234-241;
    threads suffice here since PIL decode releases the GIL).
    Set prefetch=0 for synchronous iteration.
    """
    n = len(dataset)
    batches = []
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        valid = len(idx)
        if valid < batch_size:
            if drop_remainder:
                break
            idx = idx + [idx[-1]] * (batch_size - valid)
        batches.append((idx, valid))

    if prefetch <= 0 or len(batches) <= 1:
        for idx, valid in batches:
            imgs, labels = _load_batch(dataset, idx)
            yield imgs, labels, valid
        return

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        futures = []
        b_iter = iter(batches)
        for idx, valid in batches[: prefetch + 1]:
            futures.append((pool.submit(_load_batch, dataset, idx), valid))
            next(b_iter)
        for idx, valid in b_iter:
            fut, v = futures.pop(0)
            imgs, labels = fut.result()
            futures.append((pool.submit(_load_batch, dataset, idx), valid))
            yield imgs, labels, v
        for fut, v in futures:
            imgs, labels = fut.result()
            yield imgs, labels, v
