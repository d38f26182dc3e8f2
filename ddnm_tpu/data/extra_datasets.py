"""CelebA (aligned) and LSUN dataset adapters.

Counterparts of the reference's datasets/celeba.py (split/attr/identity/
bbox/landmark parsing; Google-Drive download intentionally unsupported in
this air-gapped build) and datasets/lsun.py (lmdb-backed per-category
datasets with a pickled key cache + multi-category concat). LSUN is
optional-dependency gated: it needs `lmdb` (absent in this image -> clear
error); tests exercise the logic through a fake in-memory lmdb module.

Layout expectations:
  CelebA:  root/img_align_celeba/*.jpg (+ optional list_eval_partition.txt,
           list_attr_celeba.txt, identity_CelebA.txt, list_bbox_celeba.txt,
           list_landmarks_align_celeba.txt — reference celeba.py:37-48)
  LSUN:    root/<category>_<split>_lmdb/ (standard LSUN export)
"""

from __future__ import annotations

import io
import logging
import pickle
from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np

from ddnm_tpu.data.io import load_image

logger = logging.getLogger("ddnm_tpu")

__all__ = ["CelebADataset", "LSUNDataset", "LSUNMulti", "celeba_crop",
           "LSUN_CATEGORIES"]

# reference aligned-crop constants (datasets/__init__.py:64-70): a 128x128
# window centred at (cx=89, cy=121) on the 178x218 aligned images
_CX, _CY = 89, 121


def celeba_crop(img: np.ndarray) -> np.ndarray:
    """Crop the 128x128 aligned-face window (x1=cy-64 ... , reference
    datasets/__init__.py:64-70 with Crop transform semantics)."""
    x1, x2 = _CY - 64, _CY + 64
    y1, y2 = _CX - 64, _CX + 64
    return img[x1:x2, y1:y2]


# --------------------------------------------------------------- CelebA
def _read_celeba_table(path: Path, skip_count_line: bool):
    """Parse one whitespace-delimited CelebA metadata file.

    Mirrors the reference's pandas.read_csv(delim_whitespace=True,
    header=1/None, index_col=0) calls (celeba.py:85-100) with stdlib
    parsing: returns (column_names_or_None, filenames, int_value_rows).
    `skip_count_line` replicates header=1 (attr/bbox/landmark files start
    with an image-count line, then a column-name line)."""
    lines = [ln.split() for ln in path.read_text().splitlines() if ln.strip()]
    names = None
    if skip_count_line:
        names = lines[1]
        rows = lines[2:]
        # bbox/landmark headers include the image_id column; attr's doesn't
        if rows and len(names) == len(rows[0]):
            names = names[1:]
    else:
        rows = lines
    filenames = [r[0] for r in rows]
    values = np.asarray([[int(v) for v in r[1:]] for r in rows], np.int64)
    return names, filenames, values


_SPLIT_IDX = {"train": 0, "valid": 1, "test": 2}

_CELEBA_META = {
    # target_type -> (filename, has header+count lines)
    "attr": ("list_attr_celeba.txt", True),
    "identity": ("identity_CelebA.txt", False),
    "bbox": ("list_bbox_celeba.txt", True),
    "landmarks": ("list_landmarks_align_celeba.txt", True),
}


class CelebADataset:
    """Aligned CelebA faces with the reference crop + resize pipeline.

    `split` uses list_eval_partition.txt when present (0 train/1 valid/2
    test, reference celeba.py:76-88); otherwise all on-disk images.
    `target_type` — str or list of {"attr", "identity", "bbox",
    "landmarks"} — loads the corresponding metadata files and returns the
    targets alongside the image, exactly as the reference does
    (celeba.py:85-106,130-156): attr is mapped {-1,1} -> {0,1}, and the
    row order follows the partition file (the reference masks every table
    with the same split mask). Empty target_type returns target 0.
    """

    def __init__(self, root: str | Path, image_size: int = 64,
                 split: Optional[str] = None,
                 target_type: Union[str, Sequence[str]] = ()):
        root = Path(root)
        self.root = root
        img_dir = root / "img_align_celeba"
        if not img_dir.exists():
            img_dir = root
        self.target_type = ([target_type] if isinstance(target_type, str)
                            else list(target_type))
        for t in self.target_type:
            if t not in _CELEBA_META:
                raise ValueError(
                    f"unknown CelebA target_type {t!r} "
                    f"(choose from {sorted(_CELEBA_META)})")
        if split is not None and split not in _SPLIT_IDX:
            raise ValueError(
                'Wrong split entered! Please use split="train" or '
                'split="valid" or split="test"')  # celeba.py:82-84

        part_file = root / "list_eval_partition.txt"
        self.attr_names: Optional[list[str]] = None
        self._meta: dict[str, np.ndarray] = {}
        if part_file.exists():
            # the partition file's filename order is canonical (the
            # reference indexes every metadata table with the same mask)
            _, filenames, parts = _read_celeba_table(part_file, False)
            parts = parts[:, 0]
            if split is not None:
                keep = parts == _SPLIT_IDX[split]
            else:
                keep = np.ones(len(filenames), bool)
            ordered = [f for f, k in zip(filenames, keep) if k]
            on_disk = {p.name: p for p in
                       list(img_dir.glob("*.jpg")) + list(img_dir.glob("*.png"))}
            self.paths = [on_disk[f] for f in ordered if f in on_disk]
            present = [f in on_disk for f in ordered]
            for t in self.target_type:
                fname, has_header = _CELEBA_META[t]
                meta_path = root / fname
                if not meta_path.exists():
                    raise FileNotFoundError(
                        f"target_type={t!r} needs {meta_path} "
                        "(reference celeba.py:85-100)")
                names, meta_files, values = _read_celeba_table(
                    meta_path, has_header)
                by_name = dict(zip(meta_files, values))
                rows = np.stack([by_name[f]
                                 for f, p in zip(ordered, present) if p])
                if t == "attr":
                    rows = (rows + 1) // 2  # {-1,1} -> {0,1}, celeba.py:110
                    self.attr_names = names
                self._meta[t] = rows
        else:
            if self.target_type:
                raise FileNotFoundError(
                    f"target_type={self.target_type} needs "
                    f"{part_file} to fix the row order")
            self.paths = (sorted(img_dir.glob("*.jpg"))
                          + sorted(img_dir.glob("*.png")))
        if not self.paths:
            raise FileNotFoundError(
                f"no CelebA images under {img_dir}; download img_align_celeba "
                "manually (automatic Google-Drive download is not supported)"
            )
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
        if not self.target_type:
            return img, 0
        targets = [self._meta[t][i] for t in self.target_type]
        return img, (targets[0] if len(targets) == 1 else tuple(targets))


# ----------------------------------------------------------------- LSUN
def _require_lmdb():
    try:
        import lmdb
    except ImportError as e:
        raise ImportError(
            "LSUN lmdb datasets need the 'lmdb' package (not bundled in "
            "this image). Export the lmdb to a folder of images and use "
            "the FolderDataset/ood path instead."
        ) from e
    return lmdb


# reference lsun.py:98-110
LSUN_CATEGORIES = (
    "bedroom", "bridge", "church_outdoor", "classroom", "conference_room",
    "dining_room", "kitchen", "living_room", "restaurant", "tower", "cat",
)
_LSUN_SPLITS = ("train", "val", "test")


class LSUNDataset:
    """One LSUN lmdb category (reference datasets/lsun.py:11-57).

    Replicates the reference's pickled key cache: keys are enumerated once
    and persisted to `_cache_<lmdb dirname>` NEXT TO the lmdb directory
    (lsun.py:29-36) — enumeration over millions of entries is expensive,
    the cache makes reopening O(1). Pass use_key_cache=False to skip both
    reading and writing it."""

    def __init__(self, root: str | Path, category: str, split: str = "val",
                 image_size: int = 256, use_key_cache: bool = True):
        self._init_lmdb(Path(root) / f"{category}_{split}_lmdb",
                        image_size, use_key_cache)

    @classmethod
    def from_lmdb_dir(cls, path: str | Path, image_size: int = 256,
                      use_key_cache: bool = True) -> "LSUNDataset":
        """Open an explicit `<...>_lmdb` directory (the reference's
        LSUNClass takes the full path — lsun.py:12-16)."""
        self = cls.__new__(cls)
        self._init_lmdb(Path(path), image_size, use_key_cache)
        return self

    def _init_lmdb(self, path: Path, image_size: int, use_key_cache: bool):
        lmdb = _require_lmdb()
        self.env = lmdb.open(
            str(path), max_readers=1, readonly=True, lock=False,
            readahead=False, meminit=False,
        )
        with self.env.begin(write=False) as txn:
            self.length = txn.stat()["entries"]
        cache_file = path.parent / f"_cache_{path.name}"  # lsun.py:29-30
        if use_key_cache and cache_file.is_file():
            self.keys = pickle.loads(cache_file.read_bytes())
        else:
            with self.env.begin(write=False) as txn:
                self.keys = [k for k, _ in txn.cursor()]
            if use_key_cache:
                try:
                    cache_file.write_bytes(pickle.dumps(self.keys))
                except OSError:  # read-only dataset mount: cache is best-effort
                    logger.debug("LSUN key cache not writable: %s", cache_file)
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


def _verify_lsun_classes(classes: Union[str, Sequence[str]]) -> list[str]:
    """Validate/expand the `classes` argument (reference lsun.py:96-146):
    "train"/"val" expand to every category; "test" is the single shared
    test db; a list must be `<category>_<split>` entries."""
    if isinstance(classes, str):
        if classes not in _LSUN_SPLITS:
            raise ValueError(
                f"Unknown value '{classes}' for classes. Valid string "
                f"values are {_LSUN_SPLITS} (or pass a list of "
                "'<category>_<split>' entries).")
        if classes == "test":
            return [classes]  # one shared test_lmdb (lsun.py:112-115)
        return [c + "_" + classes for c in LSUN_CATEGORIES]
    out = []
    for c in classes:
        if not isinstance(c, str):
            raise ValueError(
                "Expected type str for elements in argument classes, "
                f"but got type {type(c)}.")
        parts = c.split("_")
        category, split = "_".join(parts[:-1]), parts[-1]
        if category not in LSUN_CATEGORIES:
            raise ValueError(
                f"Unknown value '{category}' for LSUN class. Valid values "
                f"are {{{', '.join(LSUN_CATEGORIES)}}}.")
        if split not in _LSUN_SPLITS:
            raise ValueError(
                f"Unknown value '{split}' for postfix. Valid values are "
                f"{{{', '.join(_LSUN_SPLITS)}}}.")
        out.append(c)
    return out


class LSUNMulti:
    """Multi-category LSUN concat (reference datasets/lsun.py:60-176).

    `classes` is "train"/"val"/"test" or a list like
    ["bedroom_train", "church_outdoor_train"]. Item index is routed to the
    owning per-category db with the reference's cumulative-count
    arithmetic (lsun.py:89-93,147-170); the returned target is the
    category index within `self.classes`."""

    def __init__(self, root: str | Path, classes: Union[str, Sequence[str]]
                 = "train", image_size: int = 256,
                 use_key_cache: bool = True):
        self.classes = _verify_lsun_classes(classes)
        root = Path(root)
        self.dbs = [
            LSUNDataset.from_lmdb_dir(root / f"{c}_lmdb", image_size,
                                      use_key_cache)
            for c in self.classes
        ]
        self.indices = []
        count = 0
        for db in self.dbs:
            count += len(db)
            self.indices.append(count)
        self.length = count

    def __len__(self):
        return self.length

    def __getitem__(self, index: int):
        target = 0
        sub = 0
        for ind in self.indices:
            if index < ind:
                break
            target += 1
            sub = ind
        img, _ = self.dbs[target][index - sub]
        return img, target
