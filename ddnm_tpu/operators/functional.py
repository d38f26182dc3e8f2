"""Simplified-mode degradation operators: plain A / A+ image-space maps.

The reference builds these as torch closures over NCHW tensors
(guided_diffusion/diffusion.py:244-292, helpers :27-42). Ours operate on
NHWC images (TPU-native layout) and are pure jnp, so they trace straight
into the sampling scan.

Semantics notes (parity with the reference, batch semantics generalised):
  - colorization: A averages channels with coef 1/3 and *replicates* the gray
    across 3 channels (the reference's color2gray/gray2color pair composes to
    exactly this for batch size 1, which it enforces); A+ = A's right inverse
    on that range.
  - sr_averagepooling: A = non-overlapping mean pool, A+ = nearest-neighbour
    ("MeanUpsample") replication (diffusion.py:27-31), NOT a scaled adjoint.
  - inpainting: A = A+ = pixelwise mask.
  - mask_color_sr / diy: composition pool(gray(mask(x))) with reversed A+.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax.numpy as jnp

__all__ = [
    "FunctionalOperator",
    "compose",
    "color2gray",
    "gray2color",
    "avg_pool",
    "mean_upsample",
    "as_mask",
    "build_functional_operator",
]

Array = jnp.ndarray


def as_mask(mask) -> Array:
    """Normalise a user mask to float32 (H, W, 1) (accepts (H, W) too) —
    the single place mask conventions live."""
    m = jnp.asarray(np.asarray(mask), jnp.float32)
    if m.ndim == 2:
        m = m[:, :, None]
    if m.ndim != 3 or m.shape[-1] != 1:
        raise ValueError(f"mask must be (H, W) or (H, W, 1), got {m.shape}")
    return m


def color2gray(x: Array) -> Array:
    """NHWC color -> 3-channel replicated gray (coef 1/3 per channel)."""
    gray = jnp.mean(x, axis=-1, keepdims=True)
    return jnp.broadcast_to(gray, x.shape[:-1] + (3,))


def gray2color(x: Array) -> Array:
    """Pseudo-inverse of color2gray: channel 0 is the gray, replicate it
    scaled by coef/base = (1/3)/(3*(1/3)^2) = 1 (diffusion.py:38-42)."""
    gray = x[..., 0:1]
    return jnp.broadcast_to(gray, x.shape[:-1] + (3,))


def avg_pool(x: Array, scale: int) -> Array:
    """Non-overlapping mean pooling on NHWC."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    return x.mean(axis=(2, 4))


def mean_upsample(x: Array, scale: int) -> Array:
    """Nearest-neighbour replication upsample (diffusion.py:27-31)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


@dataclasses.dataclass(frozen=True)
class FunctionalOperator:
    """A degradation A with pseudo-inverse A+ over NHWC images.

    `A_ctx`/`Ap_ctx` (optional) are context-parameterised forms
    `(z, ctx) -> out` for operators whose definition depends on a runtime
    tensor — e.g. the per-tile slice of a canvas-sized inpainting mask in
    Mask-Shift tiling. Samplers thread `op_ctx` as a traced argument, so
    ONE compiled step serves every tile (the static closures in `A`/`Ap`
    would otherwise need a recompile per distinct mask)."""

    name: str
    A: Callable[[Array], Array]
    Ap: Callable[[Array], Array]
    A_ctx: Callable[[Array, Array], Array] | None = None
    Ap_ctx: Callable[[Array, Array], Array] | None = None

    def __post_init__(self):
        if (self.A_ctx is None) != (self.Ap_ctx is None):
            raise ValueError(
                "A_ctx and Ap_ctx must be provided together "
                f"(operator {self.name!r})"
            )

    @property
    def has_ctx(self) -> bool:
        return self.A_ctx is not None

    def project(self, x: Array, y: Array) -> Array:
        """Null-space data-consistency residual A+(A(x) - y) (Eq. 17 core)."""
        return self.Ap(self.A(x) - y)

    def range_ctx(self, x: Array, ctx: Array) -> Array:
        """A+(A(x)) in the context-parameterised form."""
        return self.Ap_ctx(self.A_ctx(x, ctx), ctx)


def compose(*ops: FunctionalOperator) -> FunctionalOperator:
    """Chain degradations: A = A_n o ... o A_1, A+ = A1+ o ... o An+.

    First-class form of the reference's edit-the-source "diy" task
    (diffusion.py:275-290, which hand-writes exactly this composition for
    mask -> gray -> pool)."""
    if not ops:
        raise ValueError("compose needs at least one operator")

    def A(z):
        for op in ops:
            z = op.A(z)
        return z

    def Ap(z):
        for op in reversed(ops):
            z = op.Ap(z)
        return z

    return FunctionalOperator("o".join(op.name for op in ops), A, Ap)


def build_functional_operator(
    deg: str,
    *,
    image_size: int = 256,
    deg_scale: float = 4.0,
    mask: np.ndarray | None = None,
) -> FunctionalOperator:
    """Map a simplified-mode task string to (A, A+).

    `mask` is an (H, W) or (H, W, 1) binary array for the inpainting-style
    tasks (the reference loads exp/inp_masks/mask.npy, diffusion.py:256).
    """
    if deg == "colorization":
        return FunctionalOperator(deg, color2gray, gray2color)

    if deg == "denoising":
        ident = lambda z: z
        return FunctionalOperator(deg, ident, ident)

    if deg == "sr_averagepooling":
        scale = round(deg_scale)
        return FunctionalOperator(
            deg,
            lambda z: avg_pool(z, scale),
            lambda z: mean_upsample(z, scale),
        )

    if deg == "inpainting":
        if mask is None:
            raise ValueError("inpainting requires a mask")
        m = as_mask(mask)
        masked = lambda z: z * m
        # ctx forms let samplers take a RUNTIME (B,H,W,1) mask — per-tile
        # slices in Mask-Shift tiling, per-request masks in serving — with
        # one compiled executable (ctx == m reproduces the static forms)
        mask_ctx = lambda z, c: z * c
        return FunctionalOperator(deg, masked, masked, mask_ctx, mask_ctx)

    if deg == "sr_color":
        # hq_demo composition: gray(pool(x)) with reversed A+
        # (hq_demo/guided_diffusion/gaussian_diffusion.py:628-638)
        scale = round(deg_scale)
        return FunctionalOperator(
            deg,
            lambda z: color2gray(avg_pool(z, scale)),
            lambda z: mean_upsample(gray2color(z), scale),
        )

    if deg in ("mask_color_sr", "diy"):
        if mask is None:
            raise ValueError(f"{deg} requires a mask")
        m = as_mask(mask)
        scale = round(deg_scale)

        def A(z):
            return avg_pool(color2gray(z * m), scale)

        def Ap(z):
            return gray2color(mean_upsample(z, scale)) * m

        def A_ctx(z, c):
            return avg_pool(color2gray(z * c), scale)

        def Ap_ctx(z, c):
            return gray2color(mean_upsample(z, scale)) * c

        return FunctionalOperator(deg, A, Ap, A_ctx, Ap_ctx)

    raise NotImplementedError(f"simplified degradation {deg} not supported")
