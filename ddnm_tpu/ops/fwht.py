"""Walsh-Hadamard transform as Kronecker-factored MXU matmuls.

The reference computes the FWHT with a log2(P)-pass in-place butterfly
(svd_operators.py:212-222) — 16 sequential elementwise passes over 64k
elements for 256px images. On TPU that is pure VPU/HBM traffic. The
TPU-native formulation uses H_P = H_a (x) H_b (Hadamard matrices are
Kronecker powers of H_2), so for x reshaped row-major to (a, b):

    FWHT(x) = H_a @ X @ H_b          (H symmetric, H_a H_a = a I)

i.e. two dense matmuls on the MXU. For P = 65536 that is a pair of
256x256 matmuls per channel — a few microseconds of MXU time. The Pallas
kernel fuses both matmuls so the intermediate never touches HBM; the XLA
fallback is the same algebra as two jnp matmuls.

Normalisation matches the reference exactly: the butterfly output divided
by img_dim (= sqrt(P)), making the transform self-inverse.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fwht", "hadamard_matrix"]


def hadamard_matrix(n: int) -> np.ndarray:
    """Sylvester-construction Hadamard matrix H_n (n a power of two),
    entries +-1, natural (Hadamard) ordering — the same basis order as the
    butterfly FWHT."""
    assert n & (n - 1) == 0 and n > 0, "n must be a power of two"
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def _factor(p: int) -> tuple[int, int]:
    """p = a*b with a, b powers of two as close as possible (a >= b)."""
    m = p.bit_length() - 1
    a = 1 << ((m + 1) // 2)
    return a, p // a


def _fwht_kernel(q_ref, ha_ref, hb_ref, o_ref):
    x = q_ref[0]  # (a, b)
    t = jax.lax.dot_general(
        ha_ref[:], x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o_ref[0] = jax.lax.dot_general(
        t, hb_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pallas_fwht(x2d, ha, hb, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, a, b = x2d.shape
    xspec = pl.BlockSpec((1, a, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    hspec_a = pl.BlockSpec((a, a), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hspec_b = pl.BlockSpec((b, b), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwht_kernel,
        grid=(n,),
        in_specs=[xspec, hspec_a, hspec_b],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((n, a, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (a * a * b + a * b * b),
            bytes_accessed=4 * (2 * n * a * b + a * a + b * b),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, ha, hb)


def fwht(x: jnp.ndarray, norm: float, *, force: str | None = None) -> jnp.ndarray:
    """Walsh-Hadamard transform along the last axis, divided by `norm`.

    x: (..., P) with P a power of two. Matches the reference butterfly
    (svd_operators.py:212-222) output exactly (natural Hadamard order).
    """
    shape = x.shape
    p = shape[-1]
    a, b = _factor(p)
    ha = jnp.asarray(hadamard_matrix(a))
    hb = jnp.asarray(hadamard_matrix(b))
    x2d = x.reshape(-1, a, b).astype(jnp.float32)

    # default: XLA einsum (MXU matmuls; XLA fuses the pair well). The
    # fused Pallas kernel is a verified alternate selected via `force`.
    mode = force or "xla"
    if mode == "xla":
        out = jnp.einsum(
            "ij,njk,kl->nil", ha, x2d, hb,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        out = _pallas_fwht(x2d, ha, hb, interpret=(mode == "interpret"))
    return (out / norm).reshape(shape)
