"""Property-based (hypothesis) tests for the operator library.

The fixed-size oracle tests (test_svd_operators.py) pin exact parity with
the reference at the shipped configurations; these randomized properties
additionally fuzz sizes/scales/seeds and assert the linear-algebra
invariants every `SVDOperator` must satisfy regardless of configuration:

  - adjointness          <A x, u> == <x, At u>
  - Moore-Penrose        A A+ A == A   and   A+ A A+ == A+
  - projector            P = A+ A is idempotent
  - fused-form identity  range_correction(x, A+ y) == A+(A x - y)
  - FWHT                 self-inverse at the reference normalisation

Functional (simplified-mode) operators satisfy the weaker right-inverse
property A(A+(A x)) == A x (their A+ is not a true pseudo-inverse for
every task; e.g. MeanUpsample).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from ddnm_tpu.operators import build_functional_operator, build_svd_operator
from ddnm_tpu.operators.svd_ops import GeneralA
from ddnm_tpu.ops.fwht import fwht

# (deg, size, deg_scale) combinations valid for each operator family.
# Sizes are kept small (the invariants are size-independent); WH needs a
# power-of-two pixel count, SR needs scale | size, deblur kernels need
# size >= taps.
SVD_CASES = [
    ("denoising", 8, 4.0),
    ("denoising", 12, 4.0),
    ("colorization", 8, 4.0),
    ("colorization", 16, 4.0),
    ("sr_averagepooling", 8, 2.0),
    ("sr_averagepooling", 16, 4.0),
    ("sr_bicubic", 16, 2.0),
    ("sr_bicubic", 16, 4.0),
    ("deblur_uni", 16, 4.0),
    ("deblur_gauss", 16, 4.0),
    ("deblur_gauss", 24, 4.0),
    ("deblur_aniso", 16, 4.0),
    ("cs_walshhadamard", 8, 0.25),
    ("cs_walshhadamard", 16, 0.5),
    ("cs_blockbased", 32, 0.25),  # CS measures 32x32 blocks (size % 32 == 0)
    ("inpainting", 8, 4.0),
    ("inpainting", 16, 4.0),
]


def _build(case, seed):
    deg, size, scale = case
    mask = None
    if deg == "inpainting":
        mask = (np.random.default_rng(seed).uniform(size=(size, size)) > 0.3)
        mask = mask.astype(np.float32)
    return build_svd_operator(
        deg, channels=3, image_size=size, deg_scale=scale, mask=mask,
        seed=seed,
    ), size


def _rel_close(a, b, tol=2e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1.0, float(np.abs(a).max()), float(np.abs(b).max()))
    np.testing.assert_allclose(a, b, atol=tol * scale)


@settings(max_examples=20, deadline=None)
@given(case=st.sampled_from(SVD_CASES), seed=st.integers(0, 2**31 - 1))
def test_svd_adjointness(case, seed):
    op, size = _build(case, seed)
    rng = np.random.default_rng(seed ^ 0xA5A5)
    x = jnp.asarray(rng.standard_normal((2, 3 * size * size)), jnp.float32)
    ax = op.A(x)
    u = jnp.asarray(rng.standard_normal(ax.shape), jnp.float32)
    lhs = float(jnp.vdot(ax, u))
    rhs = float(jnp.vdot(x, op.At(u)))
    assert abs(lhs - rhs) <= 2e-3 * max(1.0, abs(lhs), abs(rhs))


@settings(max_examples=20, deadline=None)
@given(case=st.sampled_from(SVD_CASES), seed=st.integers(0, 2**31 - 1))
def test_svd_pseudo_inverse_identities(case, seed):
    op, size = _build(case, seed)
    rng = np.random.default_rng(seed ^ 0x5A5A)
    x = jnp.asarray(rng.standard_normal((2, 3 * size * size)), jnp.float32)
    ax = op.A(x)
    _rel_close(op.A(op.A_pinv(ax)), ax)          # A A+ A == A
    apy = op.A_pinv(ax)
    _rel_close(op.A_pinv(op.A(apy)), apy)        # A+ A A+ == A+


@settings(max_examples=20, deadline=None)
@given(case=st.sampled_from(SVD_CASES), seed=st.integers(0, 2**31 - 1))
def test_svd_range_projection(case, seed):
    op, size = _build(case, seed)
    rng = np.random.default_rng(seed ^ 0x33CC)
    x = jnp.asarray(rng.standard_normal((1, 3 * size * size)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((1, 3 * size * size)), jnp.float32)
    y = op.A(gt)
    # P idempotent
    px = op.range_project(x)
    _rel_close(op.range_project(px), px)
    # fused split == composed form (svd_ddnm.py:59-61)
    fused = op.range_correction(x, op.prepare_measurement(y))
    composed = op.A_pinv(op.A(x) - y)
    _rel_close(fused, composed)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    m=st.integers(3, 24),
    n=st.integers(3, 24),
)
def test_generala_identities(seed, m, n):
    """GeneralA (dense SVD fallback) holds the same invariants for ANY
    matrix, tall or wide (the reference's tall-A crash is fixed here —
    svd_ops.py GeneralA docstring)."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, n)).astype(np.float32)
    op = GeneralA(a)
    x = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    ax = op.A(x)
    u = jnp.asarray(rng.standard_normal(ax.shape), jnp.float32)
    lhs = float(jnp.vdot(ax, u))
    rhs = float(jnp.vdot(x, op.At(u)))
    assert abs(lhs - rhs) <= 2e-3 * max(1.0, abs(lhs), abs(rhs))
    _rel_close(op.A(op.A_pinv(ax)), ax, tol=1e-3)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), logp=st.integers(2, 12))
def test_fwht_self_inverse(seed, logp):
    """FWHT divided by sqrt(P) is an involution (reference fwht semantics:
    butterfly output / img_dim with img_dim = sqrt(P))."""
    p = 1 << logp
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, p)), jnp.float32)
    norm = float(np.sqrt(p))
    _rel_close(fwht(fwht(x, norm), norm), x, tol=1e-4)


FUNCTIONAL_CASES = [
    ("colorization", 8, 4.0),
    ("denoising", 8, 4.0),
    ("sr_averagepooling", 16, 4.0),
    ("sr_color", 16, 2.0),
    ("inpainting", 8, 4.0),
    ("mask_color_sr", 16, 2.0),
]


@settings(max_examples=20, deadline=None)
@given(case=st.sampled_from(FUNCTIONAL_CASES), seed=st.integers(0, 2**31 - 1))
def test_functional_right_inverse_on_range(case, seed):
    """A(A+(A x)) == A x for every simplified-mode operator (A+ is a right
    inverse on the range of A, the property Eq.17 needs)."""
    deg, size, scale = case
    mask = None
    if deg == "inpainting":
        mask = (np.random.default_rng(seed).uniform(size=(size, size)) > 0.3)
        mask = mask.astype(np.float32)
    elif deg == "mask_color_sr":
        # the composed mask∘gray∘pool operator's A+ is a right inverse only
        # when the mask is constant within each pooling block (pool and
        # mask don't commute otherwise — the reference's composition,
        # diffusion.py:260-274, has the same property), so draw the mask at
        # the pooled resolution and upsample
        s = int(scale)
        low = (np.random.default_rng(seed)
               .uniform(size=(size // s, size // s)) > 0.3).astype(np.float32)
        mask = np.kron(low, np.ones((s, s), np.float32))
    op = build_functional_operator(
        deg, image_size=size, deg_scale=scale, mask=mask
    )
    rng = np.random.default_rng(seed ^ 0x77)
    x = jnp.asarray(rng.standard_normal((2, size, size, 3)), jnp.float32)
    ax = op.A(x)
    _rel_close(op.A(op.Ap(ax)), ax, tol=1e-5)


@settings(max_examples=20, deadline=None)
@given(
    st.sampled_from(["inpainting", "mask_color_sr"]),
    st.integers(0, 2**31 - 1),
    st.sampled_from([8, 16, 32]),
)
def test_ctx_forms_reduce_to_static(deg, seed, size):
    """Context-parameterised forms with ctx == the baked static mask must
    reproduce A/Ap exactly, for any mask (the op_ctx serving/tiling paths
    rely on this reduction)."""
    rng = np.random.default_rng(seed)
    mask = (rng.random((size, size, 1)) > rng.uniform(0.1, 0.9)).astype(
        np.float32)
    scale = 2 if size == 8 else 4
    op = build_functional_operator(deg, image_size=size, mask=mask,
                                   deg_scale=scale)
    assert op.has_ctx
    z = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 3)), jnp.float32)
    ctx = jnp.asarray(mask)[None]
    np.testing.assert_array_equal(
        np.asarray(op.A(z)), np.asarray(op.A_ctx(z, ctx)))
    y = op.A(z)
    np.testing.assert_array_equal(
        np.asarray(op.Ap(y)), np.asarray(op.Ap_ctx(y, ctx)))
