"""Shared NN primitives for the model zoo (NHWC, TPU-native).

Parity notes vs the reference:
  - Two distinct sinusoidal time-embedding orderings exist in the reference
    and both matter for checkpoint compatibility: the DDPM family is
    sin-first (models.py:6-24), the ADM family is cos-first with max period
    1e4 (nn.py:103-121). Keep both.
  - GroupNorm epsilon differs per family: 1e-6 DDPM (models.py:33) vs 1e-5
    ADM (torch GroupNorm default, nn.py:93-100).
  - ADM computes GroupNorm in fp32 even under an fp16 torso (GroupNorm32,
    nn.py:17-19) — we do the same under a bf16 torso.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "update_ema",
    "cast_torso",
    "swish",
    "timestep_embedding_ddpm",
    "timestep_embedding_adm",
    "GroupNormF32",
    "nearest_upsample",
    "attention",
]


def swish(x):
    return x * jax.nn.sigmoid(x)


def timestep_embedding_ddpm(timesteps, embedding_dim: int):
    """Sin-first sinusoidal embedding (reference models.py:6-24)."""
    half_dim = embedding_dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def timestep_embedding_adm(timesteps, dim: int, max_period: int = 10000):
    """Cos-first sinusoidal embedding (reference nn.py:103-121)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def gn_impl() -> str:
    """GroupNorm implementation knob (env DDNM_TPU_GN, read at trace time):

      - "xla"    (default): ops.group_norm's NHWC-preserving fast-variance
        formulation. Keeping the channel axis in lanes stops XLA flipping
        the decoder skip-concat operands into a W-minor layout — the flax
        path paid six full-tensor transpose copies per flagship step
        (~8% of the step; docs/PERFORMANCE.md round-4 roofline). Also the
        batch-1 winner (round-2 shoot-out).
      - "flax"   : flax nn.GroupNorm in fp32 — XLA's own layout choice.
        The pre-round-4 default; kept selectable for A/B measurement.
      - "pallas" : the fused two-pass Pallas kernel (ops/groupnorm.py).
    """
    import os

    v = os.environ.get("DDNM_TPU_GN", "xla").lower()
    if v not in ("flax", "xla", "pallas"):
        raise ValueError(f"DDNM_TPU_GN must be flax|xla|pallas, got {v!r}")
    return v


class _GNParams(nn.Module):
    """Bare scale/bias holder named like nn.GroupNorm ('gn/scale', 'gn/bias')
    so every GroupNorm implementation shares one checkpoint layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class GroupNormF32(nn.Module):
    """GroupNorm computed in fp32 regardless of input dtype, cast back.

    Matches ADM's GroupNorm32 (reference nn.py:17-19) under mixed precision
    and plain GroupNorm in fp32. The computation path is selectable via
    DDNM_TPU_GN (see gn_impl) — parameter layout is identical across paths.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        impl = gn_impl()
        if impl != "flax" and x.ndim == 4:
            from ddnm_tpu.ops import group_norm

            scale, bias = _GNParams(x.shape[-1], name="gn")()
            return group_norm(
                x, scale, bias, num_groups=self.num_groups, eps=self.epsilon,
                force=impl,
            ).astype(dtype)
        out = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="gn",
        )(x.astype(jnp.float32))
        return out.astype(dtype)


def nearest_upsample(x, factor: int = 2):
    """Nearest-neighbour 2x upsample on NHWC (== F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """Scaled dot-product attention over flat token grids.

    q, k, v: (B*, T, C) with any number of leading batch/head dims folded
    into B*. Softmax in fp32, scores in the torso dtype (the reference does
    fp32 softmax over half-precision scores under fp16 torsos,
    unet.py:348,352,387). Dispatches through ddnm_tpu.ops.fused_attention
    (XLA einsum default; fused Pallas kernel via force flag).
    """
    from ddnm_tpu.ops import fused_attention

    return fused_attention(q, k, v, scale)


def update_ema(ema_params, params, rate: float = 0.9999):
    """EMA pytree update: ema <- ema*rate + params*(1-rate)
    (reference nn.py:55-65, functional over pytrees instead of in-place)."""
    return jax.tree.map(
        lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate),
        ema_params, params,
    )


def cast_torso(params, dtype):
    """Cast floating-point parameters to `dtype`, EXCEPT GroupNorm affines
    (any subtree named "gn" stays fp32) — the TPU-native analogue of the
    reference's convert_module_to_f16 (fp16_util.py:15-32), which converts
    conv weights while GroupNorm32 keeps normalization in fp32. On TPU the
    torso already computes bf16 via the model's `dtype` attr; this helper
    additionally lets callers store params bf16-resident to halve the
    weight HBM stream without rounding the affine inputs of the fp32
    GroupNorm compute."""
    import jax.numpy as _jnp

    def cast(path, x):
        if any(getattr(k, "key", None) == "gn" for k in path):
            return x
        if hasattr(x, "dtype") and _jnp.issubdtype(x.dtype, _jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, params)
