"""Configuration layer.

Covers both of the reference's config schemata with one typed dataclass tree:

  - the main pipeline's nested YAML -> namespace
    (/root/reference/main.py:92-95,150-158; /root/reference/configs/*.yml with
    data/model/diffusion/sampling/time_travel[/classifier] sections), and
  - the hq pipeline's flat YAML merged into a missing-key->None dict
    (/root/reference/hq_demo/conf_mgt/conf_base.py:44-128).

YAML files load into `Config` via `load_config`; unknown keys are preserved in
`extra` so task-specific settings survive round trips.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml

__all__ = [
    "DataConfig",
    "ModelConfig",
    "DiffusionConfig",
    "SamplingConfig",
    "TimeTravelConfig",
    "ClassifierConfig",
    "Config",
    "load_config",
    "HQConfig",
    "load_hq_config",
]


def _build(cls, d: dict[str, Any]):
    """Construct dataclass `cls` from dict, stashing unknown keys in .extra."""
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in d.items() if k in names and k != "extra"}
    extra = {k: v for k, v in d.items() if k not in names}
    obj = cls(**known)
    if extra and hasattr(obj, "extra"):
        obj.extra.update(extra)
    return obj


@dataclass
class DataConfig:
    dataset: str = "CelebA_HQ"
    category: str = ""
    image_size: int = 256
    channels: int = 3
    logit_transform: bool = False
    uniform_dequantization: bool = False
    gaussian_dequantization: bool = False
    random_flip: bool = False
    rescaled: bool = True
    num_workers: int = 0
    out_of_dist: bool = True
    extra: dict[str, Any] = field(default_factory=dict)


@dataclass
class ModelConfig:
    type: str = "simple"  # "simple" (DDPM UNet) | "openai" (ADM UNet)
    # --- "simple" model fields (configs/celeba_hq.yml:14-26) ---
    ch: int = 128
    out_ch: int = 3
    ch_mult: tuple = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple = (16,)
    dropout: float = 0.0
    in_channels: int = 3
    var_type: str = "fixedsmall"
    ema_rate: float = 0.999
    ema: bool = True
    resamp_with_conv: bool = True
    # --- "openai"/ADM model fields (configs/imagenet_256.yml:14-33) ---
    image_size: int = 256
    num_channels: int = 256
    num_heads: int = 4
    num_heads_upsample: int = -1
    num_head_channels: int = 64
    attention_resolutions: str = "32,16,8"
    channel_mult: str = ""
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    learn_sigma: bool = True
    class_cond: bool = False
    use_checkpoint: bool = False
    use_fp16: bool = True
    use_new_attention_order: bool = False
    extra: dict[str, Any] = field(default_factory=dict)


@dataclass
class DiffusionConfig:
    beta_schedule: str = "linear"
    beta_start: float = 0.0001
    beta_end: float = 0.02
    num_diffusion_timesteps: int = 1000
    extra: dict[str, Any] = field(default_factory=dict)


@dataclass
class SamplingConfig:
    batch_size: int = 1
    last_only: bool = True
    extra: dict[str, Any] = field(default_factory=dict)


@dataclass
class TimeTravelConfig:
    T_sampling: int = 100
    travel_length: int = 1
    travel_repeat: int = 1
    extra: dict[str, Any] = field(default_factory=dict)


@dataclass
class ClassifierConfig:
    image_size: int = 256
    classifier_use_fp16: bool = True
    classifier_width: int = 128
    classifier_depth: int = 2
    classifier_attention_resolutions: str = "32,16,8"
    classifier_use_scale_shift_norm: bool = True
    classifier_resblock_updown: bool = True
    classifier_pool: str = "attention"
    classifier_scale: float = 1.0
    extra: dict[str, Any] = field(default_factory=dict)


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    time_travel: TimeTravelConfig = field(default_factory=TimeTravelConfig)
    classifier: Optional[ClassifierConfig] = None
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        sections = {
            "data": DataConfig,
            "model": ModelConfig,
            "diffusion": DiffusionConfig,
            "sampling": SamplingConfig,
            "time_travel": TimeTravelConfig,
            "classifier": ClassifierConfig,
        }
        kwargs: dict[str, Any] = {}
        extra: dict[str, Any] = {}
        for k, v in d.items():
            if k in sections and isinstance(v, dict):
                kwargs[k] = _build(sections[k], v)
            else:
                extra[k] = v
        cfg = cls(**kwargs)
        cfg.extra.update(extra)
        return cfg

    def to_dict(self) -> dict[str, Any]:
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v is None:
                continue
            if dataclasses.is_dataclass(v):
                d = dataclasses.asdict(v)
                d.update(d.pop("extra", {}))
                out[f.name] = d
            elif f.name == "extra":
                out.update(v)
            else:
                out[f.name] = v
        return out


def load_config(path: str | Path) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f)
    for key in ("ch_mult", "attn_resolutions"):
        if "model" in raw and key in raw["model"] and raw["model"][key] is not None:
            raw["model"][key] = tuple(raw["model"][key])
    return Config.from_dict(raw)


class HQConfig(dict):
    """Flat hq-pipeline config: attribute access, missing keys -> None
    (the reference's NoneDict/Default_Conf behaviour,
    hq_demo/conf_mgt/conf_base.py:44-128)."""

    def __getattr__(self, name: str):
        return self.get(name)

    def pget(self, dotted: str, default=None):
        """Dotted-path lookup, e.g. pget('schedule_jump_params.t_T')."""
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def load_hq_config(path: str | Path) -> HQConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    return HQConfig(raw or {})
