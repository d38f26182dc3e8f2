"""Procedurally generated "natural-looking" image family.

VERDICT round-2 item #7: the reference ships real photos as qualitative
fixtures (exp/datasets/solvay, oldphoto, faces — reference
guided_diffusion/diffusion.py:260-274 consumes them for the old-photo
demo), but real photos are not vendorable here (air-gapped, third-party
content). This module synthesizes images with *naturalistic statistics*
instead of the toy blobs' flat backgrounds:

  - a 1/f^alpha (fractal) chromatic texture base — natural images have
    ~1/f^2 power spectra, the single most robust natural-image statistic;
  - a directional soft illumination gradient;
  - a few soft elliptical "objects" with independent colors and
    orientations (occluder-like structure, gives edges at many scales);
  - a photographic vignette and mild sensor grain.

Everything is pure jax (jit-friendly) so the same generator drives the
mid-scale golden training loop (tools/train_mid_golden.py) and the
committed eval fixtures (exp/datasets/natural64). The family is seeded and
deterministic: fixtures regenerate bit-identically.

Run as a script to (re)write the committed fixtures:
  python tools/experiments/natural_family.py [--res 64] [--n 8]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def make_naturals(key, n, res):
    """(n, res, res, 3) float32 in [-1, 1], naturalistic statistics."""
    import jax
    import jax.numpy as jnp

    k_spec, k_alpha, k_tint, k_grad, k_obj, k_grain = jax.random.split(key, 6)

    # --- 1/f^alpha chromatic texture (alpha ~ U[1.6, 2.4] per image) ---
    fy = jnp.fft.fftfreq(res)[:, None]
    fx = jnp.fft.rfftfreq(res)[None, :]
    f = jnp.sqrt(fy**2 + fx**2)
    f = f.at[0, 0].set(1.0 / res)  # DC guard
    alpha = jax.random.uniform(k_alpha, (n, 1, 1, 1), minval=2.0, maxval=2.8)
    spec_shape = (n, res, res // 2 + 1, 3)
    re, im = jax.random.normal(k_spec, (2, *spec_shape))
    spectrum = (re + 1j * im) * (f[None, :, :, None] ** (-alpha / 2.0))
    tex = jnp.fft.irfft2(spectrum, s=(res, res), axes=(1, 2))
    tex = tex / (jnp.std(tex, axis=(1, 2, 3), keepdims=True) + 1e-6)
    # per-image chromatic tint: correlate the channels like real photos
    tint = jax.random.uniform(k_tint, (n, 1, 1, 3), minval=0.4, maxval=1.0)
    luma = tex.mean(-1, keepdims=True)
    tex = 0.65 * luma + 0.35 * tex * tint  # mostly-shared luminance

    # --- directional illumination gradient ---
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, res), jnp.linspace(-1, 1, res),
                          indexing="ij")
    theta = jax.random.uniform(k_grad, (n, 1, 1), minval=0, maxval=2 * jnp.pi)
    g_amp = jax.random.uniform(k_grad, (n, 1, 1), minval=0.1, maxval=0.5)
    grad = g_amp * (jnp.cos(theta) * yy[None] + jnp.sin(theta) * xx[None])

    # --- soft elliptical objects (4 per image, soft alpha-composited) ---
    ko = jax.random.split(k_obj, 6)
    n_obj = 4
    centers = jax.random.uniform(ko[0], (n, n_obj, 2), minval=-0.6, maxval=0.6)
    radii = jax.random.uniform(ko[1], (n, n_obj, 2), minval=0.08, maxval=0.45)
    phi = jax.random.uniform(ko[2], (n, n_obj, 1), minval=0, maxval=jnp.pi)
    colors = jax.random.uniform(ko[3], (n, n_obj, 3), minval=-0.8, maxval=0.8)
    opac = jax.random.uniform(ko[4], (n, n_obj, 1, 1), minval=0.25, maxval=0.8)
    dy = yy[None, None] - centers[:, :, 0, None, None]
    dx = xx[None, None] - centers[:, :, 1, None, None]
    c, s = jnp.cos(phi)[..., None], jnp.sin(phi)[..., None]
    u = (c * dy + s * dx) / radii[:, :, 0, None, None]
    v = (-s * dy + c * dx) / radii[:, :, 1, None, None]
    d2 = u**2 + v**2
    # soft sigmoid edge -> anti-aliased silhouettes at many scales
    mask = jax.nn.sigmoid((1.0 - d2) * 14.0) * opac  # (n, n_obj, res, res)
    img = 0.32 * tex + grad[..., None]
    for i in range(n_obj):
        m = mask[:, i, :, :, None]
        img = img * (1 - m) + m * (colors[:, i, None, None, :]
                                   + 0.18 * tex)

    # --- vignette + grain ---
    r2 = yy**2 + xx**2
    img = img * (1.0 - 0.25 * r2[None, :, :, None])
    img = img + 0.015 * jax.random.normal(k_grain, img.shape)
    return jnp.clip(img, -1.0, 1.0)


def make_oldphoto_inputs(key, n, res):
    """Degrade naturals the way the reference's old-photo demo expects its
    INPUT to look (reference configs/oldphoto.yml + diffusion.py:260-274:
    masked + grayscale + low-res): returns (gt, scratch_keep_mask) where the
    mask is an irregular scratch/tear pattern (0 = damaged), NOT the smooth
    center hole the toy suite uses."""
    import jax
    import jax.numpy as jnp

    k_img, k_scr = jax.random.split(key)
    gt = make_naturals(k_img, n, res)
    # scratches: threshold a high-frequency 1/f field into thin curvy lines
    fy = jnp.fft.fftfreq(res)[:, None]
    fx = jnp.fft.rfftfreq(res)[None, :]
    f = jnp.sqrt(fy**2 + fx**2)
    f = f.at[0, 0].set(1.0 / res)
    re, im = jax.random.normal(k_scr, (2, n, res, res // 2 + 1))
    field = jnp.fft.irfft2((re + 1j * im) * f[None] ** -1.0, s=(res, res),
                           axes=(1, 2))
    field = field / (jnp.std(field, axis=(1, 2), keepdims=True) + 1e-6)
    keep = (jnp.abs(field) > 0.18).astype(jnp.int64)  # ~14% damaged
    return gt, keep


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default=None)
    ns = ap.parse_args(argv)

    import jax

    from ddnm_tpu.utils import apply_platform_env

    apply_platform_env()
    import numpy as np

    from ddnm_tpu.data.io import save_image

    out = Path(ns.out) if ns.out else REPO / f"exp/datasets/natural{ns.res}"
    out.mkdir(parents=True, exist_ok=True)
    # held-out seed 1234, disjoint from the training stream (PRNGKey(1) fold)
    gt = np.asarray(make_naturals(jax.random.PRNGKey(1234), ns.n, ns.res))
    for i in range(ns.n):
        save_image((gt[i] + 1.0) / 2.0, out / f"{i:05d}.png")
    # one committed scratch mask for the old-photo demo row
    _, keep = make_oldphoto_inputs(jax.random.PRNGKey(77), 1, ns.res)
    np.save(out / "scratch_keep_mask.npy", np.asarray(keep[0]))
    print(f"wrote {ns.n} fixtures + scratch mask to {out}")


if __name__ == "__main__":
    main()
