"""Shared machinery for driving the PyTorch reference in-process.

Used by tools/measure_reference_baseline.py (throughput anchor) and
tools/validate_real_ckpts.py (PSNR parity on real weights). The reference
is run UNMODIFIED except for what this environment forces:

  - a functional torchvision stub (torchvision is not installed here):
    ImageFolder / Resize / ToTensor / save_image via PIL+numpy,
  - `.to('cuda')` mapped to CPU when CUDA is absent — the reference's
    sampling loops hard-code 'cuda' (guided_diffusion/diffusion.py:356,392)
    so they cannot otherwise run on a CUDA-less host at all.
"""

from __future__ import annotations

import os
import shutil
import sys
import types
from pathlib import Path

REFERENCE_ROOT = "/root/reference"
REPO_ROOT = str(Path(__file__).resolve().parents[1])


def install_torchvision_stub():
    """Functional minimum of torchvision for the reference's eval path."""
    import numpy as np
    import torch
    from PIL import Image

    if "torchvision" in sys.modules and hasattr(
        sys.modules["torchvision"], "_ddnm_stub"
    ):
        return

    tv = types.ModuleType("torchvision")
    tv._ddnm_stub = True
    tv_datasets = types.ModuleType("torchvision.datasets")
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_tf = types.ModuleType("torchvision.transforms.functional")
    tv_utils = types.ModuleType("torchvision.utils")

    class Compose:
        def __init__(self, ops):
            self.ops = ops

        def __call__(self, x):
            for op in self.ops:
                x = op(x)
            return x

    class Resize:
        """torchvision semantics: an int means shorter-edge resize keeping
        aspect ratio; a (h, w) pair is exact. Default interpolation is
        bilinear, like transforms.Resize."""

        def __init__(self, size, interpolation=None):
            self.size = size

        def __call__(self, img):
            if isinstance(self.size, (list, tuple)):
                h, w = self.size
            else:
                w0, h0 = img.size
                if w0 <= h0:
                    w, h = self.size, max(1, round(self.size * h0 / w0))
                else:
                    h, w = self.size, max(1, round(self.size * w0 / h0))
            return img.resize((w, h), Image.BILINEAR)

    class CenterCrop:
        def __init__(self, size):
            self.size = ((size, size) if not isinstance(size, (list, tuple))
                         else tuple(size))

        def __call__(self, img):
            w0, h0 = img.size
            th, tw = self.size
            left = int(round((w0 - tw) / 2.0))
            top = int(round((h0 - th) / 2.0))
            return img.crop((left, top, left + tw, top + th))

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr.transpose(2, 0, 1))

    class RandomHorizontalFlip:
        # train-split transform only; the eval path never flips
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, img):
            return img

    class ImageFolder(torch.utils.data.Dataset):
        def __init__(self, root, transform=None):
            exts = {".png", ".jpg", ".jpeg", ".bmp"}
            self.paths = sorted(
                p for p in Path(root).rglob("*") if p.suffix.lower() in exts
            )
            if not self.paths:
                raise FileNotFoundError(f"no images under {root}")
            self.transform = transform

        def __len__(self):
            return len(self.paths)

        def __getitem__(self, i):
            img = Image.open(self.paths[i]).convert("RGB")
            if self.transform is not None:
                img = self.transform(img)
            return img, 0

    def save_image(tensor, path):
        arr = tensor.detach().cpu().clamp(0, 1).numpy()
        if arr.ndim == 4:
            arr = arr[0]
        arr = (arr.transpose(1, 2, 0) * 255.0 + 0.5).astype("uint8")
        Image.fromarray(arr).save(path)

    tv_ds_utils = types.ModuleType("torchvision.datasets.utils")
    tv_ds_utils.verify_str_arg = lambda value, *a, **k: value
    tv_ds_utils.iterable_to_str = (
        lambda it: "'" + "', '".join(str(x) for x in it) + "'"
    )
    tv_ds_utils.download_file_from_google_drive = None
    tv_ds_utils.check_integrity = lambda *a, **k: False

    tv_transforms.Compose = Compose
    tv_transforms.Resize = Resize
    tv_transforms.ToTensor = ToTensor
    tv_transforms.RandomHorizontalFlip = RandomHorizontalFlip
    tv_transforms.CenterCrop = CenterCrop
    tv_transforms.Lambda = lambda f: f
    tv_tf.crop = lambda img, top, left, h, w: img.crop((left, top, left + w, top + h))
    tv_transforms.functional = tv_tf
    tv_datasets.ImageFolder = ImageFolder
    tv_datasets.VisionDataset = object
    tv_datasets.utils = tv_ds_utils
    tv_utils.save_image = save_image
    tv.datasets = tv_datasets
    tv.transforms = tv_transforms
    tv.utils = tv_utils

    for name, mod in {
        "torchvision": tv,
        "torchvision.datasets": tv_datasets,
        "torchvision.datasets.utils": tv_ds_utils,
        "torchvision.transforms": tv_transforms,
        "torchvision.transforms.functional": tv_tf,
        "torchvision.utils": tv_utils,
    }.items():
        sys.modules[name] = mod
    for name in ("cv2", "lmdb", "blobfile"):
        sys.modules.setdefault(name, types.ModuleType(name))


def patch_cuda_to_cpu():
    """Map .to('cuda'*) onto CPU when no CUDA device exists."""
    import torch

    if torch.cuda.is_available() or getattr(torch.Tensor.to, "_ddnm_patched", False):
        return
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        args = tuple(
            "cpu" if isinstance(a, str) and a.startswith("cuda") else a for a in args
        )
        if isinstance(kwargs.get("device"), str) and kwargs["device"].startswith("cuda"):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    to._ddnm_patched = True
    torch.Tensor.to = to


def write_config(exp: Path, config_name: str, overrides: dict | None = None) -> Path:
    """Copy a reference config with dotted-path overrides applied
    (e.g. {"time_travel.T_sampling": 10, "data.num_workers": 0})."""
    import yaml

    with open(f"{REFERENCE_ROOT}/configs/{config_name}") as fh:
        cfg = yaml.safe_load(fh)
    for dotted, value in (overrides or {}).items():
        node = cfg
        *parents, leaf = dotted.split(".")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = value
    exp.mkdir(parents=True, exist_ok=True)
    cfg_path = exp / config_name.replace("/", "_")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    return cfg_path


def seed_images(exp: Path, dataset_name: str, image_dir: Path | str) -> None:
    """Copy an image tree into the exp/datasets/<name>/class0 layout the
    reference's ImageFolder (via our stub) expects."""
    dst = exp / "datasets" / dataset_name / "class0"
    dst.mkdir(parents=True, exist_ok=True)
    exts = {".png", ".jpg", ".jpeg"}
    srcs = sorted(p for p in Path(image_dir).rglob("*") if p.suffix.lower() in exts)
    if not srcs:
        raise FileNotFoundError(f"no images under {image_dir}")
    for p in srcs:
        if not (dst / p.name).exists():
            shutil.copy(p, dst / p.name)


def seed_checkpoint(exp: Path, rel_path: str, src: Path | None,
                    random_family: str | None = None,
                    config_name: str = "celeba_hq.yml") -> None:
    """Place a checkpoint where the reference's loader looks for it
    (diffusion.py:128-180). `src`: link/copy a real file; otherwise
    `random_family` in {"simple", "openai"} writes a random-init state dict
    (throughput measurement does not depend on weight values)."""
    import torch

    dst = exp / rel_path
    dst.parent.mkdir(parents=True, exist_ok=True)
    if dst.exists():
        return
    if src is not None:
        try:
            os.symlink(Path(src).resolve(), dst)
        except OSError:
            shutil.copy(src, dst)
        return
    if random_family is None:
        raise ValueError("need src or random_family")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import yaml

    with open(f"{REFERENCE_ROOT}/configs/{config_name}") as fh:
        cfg = yaml.safe_load(fh)

    class _NS:
        def __init__(self, d):
            for k, v in d.items():
                setattr(self, k, _NS(v) if isinstance(v, dict) else v)

    torch.manual_seed(0)
    if random_family == "simple":
        from guided_diffusion.models import Model

        m = Model(_NS(cfg))
    else:
        from guided_diffusion.script_util import create_model

        m = create_model(**cfg["model"])
    torch.save(m.state_dict(), dst)


def load_reference_main():
    """Load /root/reference/main.py by file path. Plain __import__("main")
    would return whichever module already owns the name "main" in
    sys.modules (e.g. the repo's own CLI, cached by evaluation.main)."""
    import importlib.util

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)  # its own absolute imports
    spec = importlib.util.spec_from_file_location(
        "_ddnm_reference_main", os.path.join(REFERENCE_ROOT, "main.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_reference_main(exp: Path, cfg_path: Path, *, deg: str,
                       deg_scale: float = 4.0, sigma_y: float = 0.0,
                       image_folder: str = "run", path_y: str = "celeba_hq",
                       simplified: bool = False, add_noise: bool = False,
                       subset: tuple[int, int] | None = None,
                       seed: int = 1234) -> Path:
    """Drive /root/reference/main.py in-process; returns the output dir.

    Caller must have installed the stubs/patches and seeded exp first."""
    import torch

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    old_cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)  # diffusion.py reads exp-relative asset paths
    try:
        ref_main = load_reference_main()
        argv_ref = [
            "main.py", "--config", str(cfg_path), "--deg", deg,
            "--deg_scale", str(deg_scale), "--sigma_y", str(sigma_y),
            "--exp", str(exp), "--path_y", path_y, "-i", image_folder,
            "--ni", "--seed", str(seed),
        ]
        if simplified:
            argv_ref.append("--simplified")
        if add_noise:
            argv_ref.append("--add_noise")
        if subset is not None:
            argv_ref += ["--subset_start", str(subset[0]),
                         "--subset_end", str(subset[1])]
        old_argv = sys.argv
        sys.argv = argv_ref
        try:
            args, config = ref_main.parse_args_and_config()
        finally:
            sys.argv = old_argv

        from guided_diffusion.diffusion import Diffusion

        device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
        runner = Diffusion(args, config, device=device)
        runner.sample(args.simplified)
    finally:
        os.chdir(old_cwd)
    return exp / "image_samples" / image_folder
