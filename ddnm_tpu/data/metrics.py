"""Quality metrics."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["psnr"]


def psnr(a, b, max_val: float = 1.0):
    """Peak signal-to-noise ratio over full images, per batch element.

    Matches the reference's computation (diffusion.py:405-406): MSE over all
    pixels/channels of [0,1] images, 10*log10(1/mse)."""
    mse = jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(max_val**2 / mse)
