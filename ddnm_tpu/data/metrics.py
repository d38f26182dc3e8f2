"""Quality metrics."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["psnr", "ssim"]


def psnr(a, b, max_val: float = 1.0):
    """Peak signal-to-noise ratio over full images, per batch element.

    Matches the reference's computation (diffusion.py:405-406): MSE over all
    pixels/channels of [0,1] images, 10*log10(1/mse)."""
    mse = jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(max_val**2 / mse)


def ssim(a, b, max_val: float = 1.0, kernel_size: int = 11, sigma: float = 1.5):
    """Structural similarity (mean SSIM) per batch element, NHWC in [0,1].

    Standard Wang et al. formulation with a gaussian window, the metric the
    DDNM paper reports alongside PSNR (the reference repo computes only
    PSNR at runtime — this is a beyond-reference addition)."""
    import numpy as np

    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    half = kernel_size // 2
    coords = np.arange(kernel_size) - half
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    win = jnp.asarray(np.outer(g, g), jnp.float32)
    c = a.shape[-1]
    kernel = jnp.zeros((kernel_size, kernel_size, c, c), jnp.float32)
    for ch in range(c):
        kernel = kernel.at[:, :, ch, ch].set(win)

    import jax

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = filt(a * a) - mu_a2
    var_b = filt(b * b) - mu_b2
    cov = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * cov + c2)) / (
        (mu_a2 + mu_b2 + c1) * (var_a + var_b + c2)
    )
    return s.mean(axis=(1, 2, 3))
