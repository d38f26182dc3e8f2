"""Pallas TPU kernels for the hot ops.

The reference has no native/CUDA kernels (SURVEY.md §2 preamble) — all its
compute is torch ops. Here the XLA compiler is the baseline "native layer",
and these Pallas kernels fuse the spots XLA leaves on the table:

  - fused_attention: single-block attention for the UNet's <=4096-token
    grids — QK^T, fp32 softmax and AV in one VMEM-resident kernel (no HBM
    round-trip for the T x T score matrix).
  - fwht: the Walsh-Hadamard transform as a Kronecker-factored pair of MXU
    matmuls (H_a @ X @ H_b) fused in one kernel, replacing the reference's
    log2(P)-pass butterfly (svd_operators.py:212-222).
  - group_norm: fused GroupNorm(+FiLM+SiLU) — two-pass stats/apply kernel
    with fp32 statistics (GroupNorm32 semantics, reference nn.py:17-19).

Every kernel has a pure-XLA fallback used automatically on non-TPU backends
(and under tests), so numerics are verified everywhere.
"""

from ddnm_tpu.ops.attention import fused_attention
from ddnm_tpu.ops.fwht import fwht, hadamard_matrix
from ddnm_tpu.ops.groupnorm import group_norm

__all__ = ["fused_attention", "fwht", "hadamard_matrix", "group_norm"]
