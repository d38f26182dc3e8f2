"""Measurement-noise models.

The reference CLI accepts -n/--noise_type in {gaussian, 3d_gaussian,
poisson, speckle} (main.py:76-82) but implements only gaussian
(get_gaussian_noisy_img, guided_diffusion/diffusion.py:24-25). Here all four
are real. All operate on measurements in the [-1, 1] domain with sigma
already scaled (the runner doubles the CLI sigma_y, diffusion.py:294).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["add_noise", "NOISE_TYPES"]

NOISE_TYPES = ("gaussian", "3d_gaussian", "poisson", "speckle")


def add_noise(key: jax.Array, y: jnp.ndarray, sigma: float, noise_type: str = "gaussian"):
    """Return y corrupted by the given noise model.

    gaussian / 3d_gaussian: iid additive N(0, sigma^2) (the reference's
      torch.randn_like path; "3d" kept as an alias for CLI parity).
    poisson: shot noise — y is mapped to [0,1], Poisson-sampled at a rate
      set by sigma (smaller sigma -> higher rate -> less noise), mapped back.
    speckle: multiplicative noise y * (1 + sigma * N(0,1)).
    """
    if sigma <= 0.0:
        return y
    if noise_type in ("gaussian", "3d_gaussian"):
        return y + sigma * jax.random.normal(key, y.shape, y.dtype)
    if noise_type == "poisson":
        # rate lambda = 1/sigma^2 per unit intensity: var of the rescaled
        # sample approaches sigma^2 * intensity
        lam = 1.0 / (sigma**2)
        y01 = (y + 1.0) / 2.0
        counts = jax.random.poisson(key, jnp.maximum(y01, 0.0) * lam, y.shape)
        return (counts.astype(y.dtype) / lam) * 2.0 - 1.0
    if noise_type == "speckle":
        return y * (1.0 + sigma * jax.random.normal(key, y.shape, y.dtype))
    raise ValueError(f"unknown noise type {noise_type!r}; known: {NOISE_TYPES}")
