"""Value-range transforms (reference datasets/__init__.py:201-227).

Images flow as float32 NHWC in [0,1] from IO; the diffusion models operate
in [-1,1] when `rescaled` (all shipped configs do)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["data_transform", "inverse_data_transform"]


def data_transform(x, *, rescaled: bool = True, logit_transform: bool = False,
                   uniform_dequantization: bool = False,
                   gaussian_dequantization: bool = False,
                   rng: np.random.Generator | None = None):
    """[0,1] -> model domain (reference datasets/__init__.py:201-215,
    including the optional dequantizations the configs can enable)."""
    if uniform_dequantization:
        rng = rng or np.random.default_rng(0)
        x = (np.asarray(x) * 255.0 + rng.uniform(size=np.shape(x))) / 256.0
        x = jnp.asarray(x, jnp.float32)
    if gaussian_dequantization:
        rng = rng or np.random.default_rng(0)
        x = jnp.asarray(
            np.asarray(x) + rng.standard_normal(np.shape(x)) * 0.01, jnp.float32
        )
    # rescaled takes precedence over logit (reference :207-210 if/elif)
    if rescaled:
        return 2.0 * x - 1.0
    if logit_transform:
        lam = 1e-6
        x = lam + (1 - 2 * lam) * x
        return jnp.log(x) - jnp.log1p(-x)
    return x


def inverse_data_transform(x, *, rescaled: bool = True, logit_transform: bool = False):
    """model domain -> [0,1], clamped."""
    if logit_transform:
        x = 1.0 / (1.0 + jnp.exp(-x))
    elif rescaled:
        x = (x + 1.0) / 2.0
    return jnp.clip(x, 0.0, 1.0)
