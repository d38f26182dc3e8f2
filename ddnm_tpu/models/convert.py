"""PyTorch checkpoint -> flax params conversion.

The reference ships three pickled torch state-dict families (SDEdit DDPM
`celeba_hq.ckpt`, ADM `256x256_diffusion(_uncond).pt`, ADM
`256x256_classifier.pt` — see reference functions/ckpt_util.py and
guided_diffusion/diffusion.py:128-180). This module maps any of them onto our
NHWC flax modules:

  - conv weights   (O, I, kH, kW) -> kernel (kH, kW, I, O)
  - linear weights (O, I)         -> kernel (I, O)
  - norm weight/bias              -> scale/bias under the GroupNormF32 "gn"
  - 1x1-conv-as-qkv stays a conv kernel (we implement them as convs too)

Each model family supplies a `key_map(segments) -> flax path` rule; the
mechanics here are family-agnostic.
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping, Sequence

import numpy as np

__all__ = [
    "torch_state_dict_to_flax",
    "flax_to_torch_state_dict",
    "ddpm_key_map",
    "collapse_numeric",
    "load_torch_checkpoint",
    "validate_converted_params",
]


def collapse_numeric(segments: Sequence[str]) -> list[str]:
    """Merge purely-numeric path segments into their predecessor:
    ["down", "0", "block", "1"] -> ["down_0", "block_1"]."""
    out: list[str] = []
    for seg in segments:
        if seg.isdigit() and out:
            out[-1] = f"{out[-1]}_{seg}"
        else:
            out.append(seg)
    return out


_INNER = {
    # DDPM family (unet_ddpm.py submodule names)
    "norm1", "conv1", "temb_proj", "norm2", "conv2", "nin_shortcut",
    "conv_shortcut", "norm", "q", "k", "v", "proj_out", "conv",
    # ADM family (unet_adm.py submodule names)
    "in_layers_0", "in_layers_2", "emb_layers_1", "out_layers_0",
    "out_layers_3", "skip_connection", "qkv", "op", "qkv_proj", "c_proj",
}


def ddpm_key_map(segments: Sequence[str]) -> tuple[str, ...]:
    """Torch module path -> flax path for both model families: collapse
    numeric Sequential/ModuleList indices into their parent name, keep a
    known block-inner module name as the nested level."""
    segs = collapse_numeric(segments)
    if len(segs) >= 2 and segs[-1] in _INNER:
        return ("_".join(segs[:-1]), segs[-1])
    return ("_".join(segs),)


adm_key_map = ddpm_key_map  # one mechanical rule covers both families


def _leaf(path: tuple[str, ...], leaf_name: str, tensor: np.ndarray, weight_ndim: int):
    """Map a torch (weight|bias) leaf to a flax (path, name, value)."""
    if leaf_name == "weight":
        if path and path[-1] == "label_emb":  # nn.Embedding -> nn.Embed
            return path, "embedding", tensor
        if tensor.ndim == 4:  # conv OIHW -> HWIO
            return path, "kernel", np.transpose(tensor, (2, 3, 1, 0))
        if tensor.ndim == 3:  # 1-d conv (O, I, 1) -> dense (I, O)
            return path, "kernel", tensor[:, :, 0].T
        if tensor.ndim == 2:  # linear OI -> IO
            return path, "kernel", tensor.T
        if tensor.ndim == 1:  # norm scale
            return path + ("gn",), "scale", tensor
        raise ValueError(f"unhandled weight ndim {tensor.ndim} at {path}")
    if leaf_name == "bias":
        if weight_ndim == 1:  # sibling weight is a norm scale
            return path + ("gn",), "bias", tensor
        return path, "bias", tensor
    if leaf_name == "positional_embedding":  # AttentionPool2d raw parameter
        return path, "positional_embedding", tensor
    raise ValueError(f"unhandled leaf {leaf_name} at {path}")


def torch_state_dict_to_flax(
    state_dict: Mapping[str, "np.ndarray"],
    key_map: Callable[[Sequence[str]], tuple[str, ...]] = ddpm_key_map,
    skip: Iterable[str] = (),
) -> dict:
    """Assemble a flax params pytree (nested dict of numpy arrays).

    `state_dict` values may be torch tensors or numpy arrays. Keys in `skip`
    (prefix match) are ignored (e.g. torch buffers we recompute)."""
    numpied: dict[str, np.ndarray] = {}
    for k, val in state_dict.items():
        if any(k.startswith(s) for s in skip):
            continue
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        numpied[k] = np.asarray(val)

    # sibling weight ndim per prefix, to disambiguate norm vs conv biases
    weight_ndim = {
        k.rsplit(".", 1)[0]: v.ndim for k, v in numpied.items() if k.endswith(".weight")
    }

    params: dict = {}
    for k, v in numpied.items():
        *mods, leaf = k.split(".")
        prefix = ".".join(mods)
        path = key_map(mods)
        path, name, value = _leaf(path, leaf, v, weight_ndim.get(prefix, 0))
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[name] = value.astype(np.float32)
    return params


def flax_to_torch_state_dict(
    params: Mapping,
    template_sd: Mapping[str, "np.ndarray"],
    key_map: Callable[[Sequence[str]], tuple[str, ...]] = ddpm_key_map,
) -> dict:
    """Inverse of `torch_state_dict_to_flax`: rebuild a torch state dict
    from a flax params tree, using a torch model's own state dict as the
    name/shape template (e.g. `Model(config).state_dict()`).

    Lets a model TRAINED in this framework run through the reference
    verbatim — the basis of the trained-weights golden parity suite
    (tools/golden_suite.py)."""
    weight_ndim = {
        k.rsplit(".", 1)[0]: np.asarray(
            v.detach().cpu() if hasattr(v, "detach") else v
        ).ndim
        for k, v in template_sd.items()
        if k.endswith(".weight")
    }
    out: dict = {}
    for k, tmpl in template_sd.items():
        tmpl = np.asarray(tmpl.detach().cpu() if hasattr(tmpl, "detach") else tmpl)
        *mods, leaf = k.split(".")
        prefix = ".".join(mods)
        path, name, _ = _leaf(key_map(mods), leaf, tmpl, weight_ndim.get(prefix, 0))
        node = params
        for p in path:
            if p not in node:
                raise KeyError(f"flax params missing {'/'.join(path)} for torch key {k}")
            node = node[p]
        v = np.asarray(node[name], dtype=np.float32)
        if leaf == "weight":
            if path and path[-1] == "label_emb":
                pass  # embedding table: same layout
            elif tmpl.ndim == 4:  # HWIO -> OIHW
                v = np.transpose(v, (3, 2, 0, 1))
            elif tmpl.ndim == 3:  # dense (I, O) -> 1-d conv (O, I, 1)
                v = v.T[:, :, None]
            elif tmpl.ndim == 2:  # dense IO -> linear OI
                v = v.T
        if v.shape != tmpl.shape:
            raise ValueError(f"{k}: rebuilt shape {v.shape} != template {tmpl.shape}")
        out[k] = v
    return out


def _flatten_shapes(tree: Mapping, prefix: tuple = ()) -> dict[tuple, tuple]:
    out: dict[tuple, tuple] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten_shapes(v, prefix + (k,)))
        else:
            # arrays AND shape-only leaves (jax.eval_shape ShapeDtypeStructs)
            out[prefix + (k,)] = tuple(getattr(v, "shape", None) or np.shape(v))
    return out


def validate_converted_params(converted: Mapping, expected: Mapping) -> None:
    """Strict-load check: the converted tree must match the model's own
    parameter structure (`model.init(...)["params"]`) exactly — every leaf
    present, nothing extra, every shape equal.

    Without this, an unexpected state-dict key set (a new checkpoint
    revision, a renamed module, an EMA-wrapped dump) silently builds a wrong
    tree that flax would partially or wrongly apply. Raises ValueError
    listing every missing / unexpected / shape-mismatched leaf.
    """
    got = _flatten_shapes(converted)
    want = _flatten_shapes(expected)
    fmt = lambda p: "/".join(p)
    missing = sorted(set(want) - set(got))
    unexpected = sorted(set(got) - set(want))
    mismatched = sorted(p for p in set(got) & set(want) if got[p] != want[p])
    if not (missing or unexpected or mismatched):
        return
    lines = []
    if missing:
        lines.append("missing from checkpoint (%d):" % len(missing))
        lines += [f"  {fmt(p)} {want[p]}" for p in missing[:20]]
    if unexpected:
        lines.append("unexpected in checkpoint (%d):" % len(unexpected))
        lines += [f"  {fmt(p)} {got[p]}" for p in unexpected[:20]]
    if mismatched:
        lines.append("shape mismatches (%d):" % len(mismatched))
        lines += [f"  {fmt(p)}: ckpt {got[p]} != model {want[p]}"
                  for p in mismatched[:20]]
    raise ValueError("converted checkpoint does not match the model:\n"
                     + "\n".join(lines))


def load_torch_checkpoint(path: str) -> dict:
    """Load a pickled torch checkpoint into numpy without needing a GPU.

    Uses torch (CPU build is available in this image) purely as an unpickler.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    # some DDPM checkpoints are [state_dict, ...] lists
    if isinstance(obj, (list, tuple)):
        obj = obj[0]
    return {k: v for k, v in obj.items()}
