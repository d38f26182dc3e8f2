"""Degradation operators.

Two families, mirroring the reference's two modes:

  - `ddnm_tpu.operators.svd_ops` — matrix-free SVD operators (A = U S V^T)
    over flattened image vectors, with the DDNM+ Lambda / Lambda_noise
    spectral hooks (reference: functions/svd_operators.py).
  - `ddnm_tpu.operators.functional` — simple A / A+ image-space closures for
    the "--simplified" mode (reference: guided_diffusion/diffusion.py:244-292).

`build_svd_operator` / `build_functional_operator` map the reference's task
strings ("sr_averagepooling", "deblur_gauss", ...) to configured instances.
"""

from ddnm_tpu.operators.base import SVDOperator, ddnm_plus_lambda, ddnm_plus_noise_coeffs
from ddnm_tpu.operators.svd_ops import (
    BlockCS,
    Colorization,
    Deblurring,
    Deblurring2D,
    Denoising,
    GeneralA,
    Inpainting,
    SRConv,
    SuperResolution,
    WalshHadamardCS,
    bicubic_kernel,
    build_svd_operator,
)
from ddnm_tpu.operators.functional import FunctionalOperator, build_functional_operator

__all__ = [
    "SVDOperator",
    "ddnm_plus_lambda",
    "ddnm_plus_noise_coeffs",
    "BlockCS",
    "Colorization",
    "Deblurring",
    "Deblurring2D",
    "Denoising",
    "GeneralA",
    "Inpainting",
    "SRConv",
    "SuperResolution",
    "WalshHadamardCS",
    "bicubic_kernel",
    "build_svd_operator",
    "FunctionalOperator",
    "build_functional_operator",
]
