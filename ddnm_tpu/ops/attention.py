"""Fused single-block attention kernel (Pallas TPU).

The DDNM UNets attend over flat token grids of at most 64x64 = 4096 tokens
(ADM attention at ds 8/16/32 => 1024/256/64 tokens at 256px, unet.py:502,583;
DDPM UNet at res 16, models.py:246-284). At these sizes the whole score
matrix fits in VMEM, so flash-style tiling is unnecessary: one kernel
instance per (batch*head) computes QK^T on the MXU, an fp32 softmax on the
VPU, and AV on the MXU, with zero HBM traffic for the T x T scores.

Numerics match the reference einsum attention with fp32 softmax
(unet.py:337-354: scale applied to both q and k as sqrt(scale) is folded
here into a single q-side scale — algebraically identical).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["fused_attention"]


def _xla_attention(q, k, v, scale):
    # HIGHEST (fp32 contraction) only for fp32 inputs: the reference computes
    # half-precision scores under fp16 torsos (unet.py:348) and some TPU
    # lowerings reject fp32-contraction-of-bf16; softmax is always fp32.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    w = jnp.einsum("btc,bsc->bts", q, k, precision=prec) * scale
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bts,bsc->btc", w, v, precision=prec)


def _attn_kernel(scale: float, q_ref, k_ref, v_ref, o_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[0]  # (T, C)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(o_ref.dtype)


def _pallas_attention(q, k, v, scale, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = q.shape
    spec = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_attn_kernel, scale),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * t * c,
            bytes_accessed=4 * b * t * c * q.dtype.itemsize,
            transcendentals=b * t * t,
        ),
        interpret=interpret,
    )(q, k, v)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    *,
    force: str | None = None,
) -> jnp.ndarray:
    """Attention over (B*, T, C) token grids; fp32 softmax.

    Default is the XLA einsum path: at the <=4096-token single-head sizes
    this framework sees, XLA's fused attention beats the single-block Pallas
    kernel (measured 2.8x on a v5e — docs/PERFORMANCE.md). The Pallas kernel
    is kept as a verified alternate for larger custom grids; `force` in
    {"pallas", "xla", "interpret"} selects explicitly."""
    mode = force or "xla"
    if mode == "xla":
        return _xla_attention(q, k, v, scale)
    return _pallas_attention(q, k, v, scale, interpret=(mode == "interpret"))
