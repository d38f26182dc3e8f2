"""Checkpoint registry: download-on-miss with md5 verification + conversion.

TPU-native counterpart of the reference's checkpoint plumbing
(functions/ckpt_util.py:5-72 plus the runner-side URLs at
guided_diffusion/diffusion.py:128-180). The registry maps the model families
the framework supports to their published torch checkpoints; `fetch` streams
with an md5 check, and `load_params` converts the torch state dict into our
NHWC flax parameter pytree (models/convert.py) and caches the converted
pytree on disk (.npz) so conversion is one-time.

Network access is optional: in air-gapped environments (like the TPU pods
this targets), `fetch` raises a clear error telling the user where to place
the file instead of failing mid-download.
"""

from __future__ import annotations

import hashlib
import logging
import os
from pathlib import Path

logger = logging.getLogger("ddnm_tpu")

__all__ = ["CHECKPOINTS", "fetch", "md5sum", "load_params", "save_orbax", "load_orbax"]


# name -> (url, md5 or None, target filename)
# URLs/md5s follow the reference maps (ckpt_util.py:5-34, diffusion.py:134,
# 151-158, 170-173).
CHECKPOINTS = {
    "celeba_hq": (
        "https://image-editing-test-12345.s3-us-west-2.amazonaws.com/checkpoints/celeba_hq.ckpt",
        None,
        "celeba_hq.ckpt",
    ),
    "imagenet_256_uncond": (
        "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/256x256_diffusion_uncond.pt",
        None,
        "256x256_diffusion_uncond.pt",
    ),
    "imagenet_256_cond": (
        "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/256x256_diffusion.pt",
        None,
        "256x256_diffusion.pt",
    ),
    "imagenet_256_classifier": (
        "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/256x256_classifier.pt",
        None,
        "256x256_classifier.pt",
    ),
    # heibox DDPM family (ckpt_util.py URL/MD5 maps)
    "ema_lsun_bedroom": (
        "https://heibox.uni-heidelberg.de/f/b95206528f384185889b/?dl=1",
        "1921fa46b66a3665e450e42f36c2720f",
        "ema_lsun_bedroom.ckpt",
    ),
    "ema_lsun_cat": (
        "https://heibox.uni-heidelberg.de/f/0701aac3aa69457bbe34/?dl=1",
        "646f23f4821f2459b8bafc57fd824558",
        "ema_lsun_cat.ckpt",
    ),
    "ema_lsun_church": (
        "https://heibox.uni-heidelberg.de/f/44ccb50ef3c6436db52e/?dl=1",
        "fdc68a23938c2397caba4a260bc2445f",
        "ema_lsun_church.ckpt",
    ),
}


def md5sum(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def fetch(name: str, root: str | Path = "exp/logs", *, allow_download: bool = True) -> Path:
    """Return the local path for a registered checkpoint, downloading on miss.

    md5-verified when the registry has a checksum (ckpt_util.py:55-71)."""
    if name not in CHECKPOINTS:
        raise KeyError(f"unknown checkpoint {name!r}; known: {sorted(CHECKPOINTS)}")
    url, md5, fname = CHECKPOINTS[name]
    path = Path(root) / fname
    if path.exists():
        if md5 and md5sum(path) != md5:
            raise IOError(f"{path} exists but fails md5 check ({md5})")
        return path
    if not allow_download:
        raise FileNotFoundError(f"checkpoint {name} missing; place it at {path}")
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise FileNotFoundError(
            f"checkpoint {name} missing and requests unavailable; "
            f"download {url} to {path} manually"
        ) from e
    path.parent.mkdir(parents=True, exist_ok=True)
    logger.info("downloading %s -> %s", url, path)
    try:
        with requests.get(url, stream=True, timeout=60) as r:
            r.raise_for_status()
            tmp = path.with_suffix(path.suffix + ".part")
            with open(tmp, "wb") as f:
                for chunk_bytes in r.iter_content(chunk_size=1 << 20):
                    f.write(chunk_bytes)
            os.replace(tmp, path)
    except Exception as e:
        raise FileNotFoundError(
            f"could not download {name} (air-gapped environment?); "
            f"place {url} at {path} manually"
        ) from e
    if md5 and md5sum(path) != md5:
        raise IOError(f"downloaded {path} fails md5 check ({md5})")
    return path


def load_params(ckpt_path: str | Path, *, cache: bool = True,
                expected=None) -> dict:
    """Torch state dict -> flax params pytree, with on-disk .npz cache.

    Conversion (NCHW->NHWC kernel transposes + key mapping) happens once;
    subsequent loads read the cached arrays directly, no torch needed.

    `expected`: optional parameter-structure oracle for STRICT loading —
    the model's own tree, e.g. `jax.eval_shape(model.init, key, *dummy)`
    (free: no FLOPs run). When given, the converted tree must match it
    leaf-for-leaf (models/convert.py:validate_converted_params) so an
    unexpected checkpoint key set fails loudly instead of silently building
    a wrong tree."""
    import numpy as np

    from ddnm_tpu.models.convert import validate_converted_params

    def _check(tree):
        if expected is not None:
            want = expected["params"] if "params" in expected else expected
            validate_converted_params(tree, want)

    ckpt_path = Path(ckpt_path)
    cache_path = ckpt_path.with_suffix(ckpt_path.suffix + ".flax.npz")
    if cache and cache_path.exists() and cache_path.stat().st_mtime >= ckpt_path.stat().st_mtime:
        data = np.load(cache_path)
        params: dict = {}
        for flat_key in data.files:
            node = params
            parts = flat_key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[flat_key]
        _check(params)
        return {"params": params}

    from ddnm_tpu.models.convert import (
        adm_key_map,
        load_torch_checkpoint,
        torch_state_dict_to_flax,
    )

    sd = load_torch_checkpoint(ckpt_path)
    params = torch_state_dict_to_flax(sd, adm_key_map)
    _check(params)
    if cache:
        flat: dict = {}

        def _walk(node, prefix):
            for k, v in node.items():
                key = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    _walk(v, key)
                else:
                    flat[key] = np.asarray(v)

        _walk(params, "")
        np.savez(cache_path, **flat)
        logger.info("cached converted params at %s", cache_path)
    return {"params": params}


def save_orbax(params: dict, path: str | Path) -> None:
    """Save a params pytree as an Orbax checkpoint (the TPU-native format:
    async-capable, shardable on restore across a device mesh — the
    production counterpart of the reference's pickled torch state dicts)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_orbax(path: str | Path, *, target=None) -> dict:
    """Restore an Orbax checkpoint saved by `save_orbax`.

    `target`: optional pytree of jax.ShapeDtypeStruct (with `.sharding` set
    for multi-chip placement) matching the params structure — arrays restore
    directly into the requested placement without a host round-trip."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        return ckptr.restore(path, target)
