"""Simplified-mode functional operator tests: identities + parity with the
reference's closures (guided_diffusion/diffusion.py:27-42,244-292).

The reference helpers are NCHW and rely on batch_size==1 quirks
(color2gray's .repeat(1,3,1,1) only shapes out correctly for B=1); parity is
checked at B=1 with layout transposes."""

import numpy as np
import pytest
import jax.numpy as jnp

from ddnm_tpu.operators import functional as F
from tests._reference import import_reference

RNG = np.random.RandomState(11)


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def test_colorization_parity():
    torch = pytest.importorskip("torch")
    ref = import_reference("guided_diffusion.diffusion")
    x = RNG.randn(1, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_gray = ref.color2gray(torch.from_numpy(x)).numpy()
        ref_back = ref.gray2color(torch.from_numpy(ref_gray)).numpy()
    ours_gray = _nchw(np.asarray(F.color2gray(jnp.asarray(_nhwc(x)))))
    np.testing.assert_allclose(ours_gray, ref_gray.reshape(ours_gray.shape), atol=1e-6)
    ours_back = _nchw(np.asarray(F.gray2color(jnp.asarray(_nhwc(ref_gray.reshape(1, 3, 8, 8))))))
    np.testing.assert_allclose(ours_back, ref_back, atol=1e-6)


def test_mean_upsample_parity():
    torch = pytest.importorskip("torch")
    ref = import_reference("guided_diffusion.diffusion")
    x = RNG.randn(2, 3, 4, 4).astype(np.float32)
    with torch.no_grad():
        theirs = ref.MeanUpsample(torch.from_numpy(x), 4).numpy()
    ours = _nchw(np.asarray(F.mean_upsample(jnp.asarray(_nhwc(x)), 4)))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_avg_pool_parity():
    torch = pytest.importorskip("torch")
    x = RNG.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        theirs = torch.nn.AdaptiveAvgPool2d((4, 4))(torch.from_numpy(x)).numpy()
    ours = _nchw(np.asarray(F.avg_pool(jnp.asarray(_nhwc(x)), 4)))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("deg", ["colorization", "denoising", "sr_averagepooling",
                                 "inpainting"])
def test_range_space_idempotence(deg):
    """A A+ must be the identity on range(A): A A+ A = A.

    mask_color_sr is excluded: its composed pseudo-inverse A1+ A2+ A3+ is the
    reference's heuristic (paper Sec. 3.3), not an exact pinv — A A+ A != A
    when the mask is not constant within pooling patches."""
    mask = (RNG.rand(16, 16) > 0.3).astype(np.float32)
    op = F.build_functional_operator(deg, image_size=16, deg_scale=4, mask=mask)
    x = jnp.asarray(RNG.randn(2, 16, 16, 3).astype(np.float32))
    Ax = op.A(x)
    np.testing.assert_allclose(op.A(op.Ap(Ax)), Ax, atol=1e-5)


def test_project_zero_on_consistent_input():
    op = F.build_functional_operator("sr_averagepooling", deg_scale=2, image_size=8)
    x = jnp.asarray(RNG.randn(1, 8, 8, 3).astype(np.float32))
    y = op.A(x)
    resid = op.project(x, y)
    np.testing.assert_allclose(resid, np.zeros_like(resid), atol=1e-6)


def test_compose_matches_diy():
    """compose(mask, gray, pool) == the built-in mask_color_sr/diy task."""
    import numpy as np
    from ddnm_tpu.operators.functional import (
        FunctionalOperator, avg_pool, build_functional_operator, color2gray,
        compose, gray2color, mean_upsample,
    )

    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(32, 32)) > 0.3).astype(np.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)

    built = build_functional_operator(
        "mask_color_sr", image_size=32, deg_scale=2, mask=mask
    )
    m = jnp.asarray(mask)[:, :, None]
    parts = [
        FunctionalOperator("mask", lambda z: z * m, lambda z: z * m),
        FunctionalOperator("gray", color2gray, gray2color),
        FunctionalOperator("pool", lambda z: avg_pool(z, 2),
                           lambda z: mean_upsample(z, 2)),
    ]
    comp = compose(*parts)
    np.testing.assert_allclose(np.asarray(comp.A(x)), np.asarray(built.A(x)), atol=1e-6)
    y = built.A(x)
    np.testing.assert_allclose(np.asarray(comp.Ap(y)), np.asarray(built.Ap(y)), atol=1e-6)


def test_sr_color_parity_with_hq_reference():
    """sr_color (hq-only composition, gaussian_diffusion.py:628-638):
    A = color2gray(avgpool(x)), A+ = upsample(gray2color(y)) — parity with
    the reference hq closures, including the A_temp full-canvas variant."""
    torch = pytest.importorskip("torch")
    from tests._reference import import_hq_reference
    from ddnm_tpu.tiling import build_hq_operators

    gd = import_hq_reference("gaussian_diffusion")
    scale, size = 4, 64
    x = RNG.randn(1, 3, size, size).astype(np.float32)

    op, a_temp = build_hq_operators(
        "sr_color", scale=scale, gt_shape=(size, size)
    )
    x_t = torch.from_numpy(x)
    pool = torch.nn.AdaptiveAvgPool2d((size // scale, size // scale))
    ref_a = gd.color2gray(pool(x_t))
    up = lambda z: z.repeat_interleave(scale, dim=2).repeat_interleave(scale, dim=3)
    ref_ap = up(gd.gray2color(ref_a))

    ours_a = op.A(jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(ours_a, _nhwc(ref_a.numpy()), atol=1e-5)
    np.testing.assert_allclose(
        op.Ap(ours_a), _nhwc(ref_ap.numpy()), atol=1e-5
    )
    # A_temp on a larger-than-tile canvas (the hq target-size measurement)
    big = RNG.randn(1, 3, 2 * size, 2 * size).astype(np.float32)
    pool_big = torch.nn.AdaptiveAvgPool2d((2 * size // scale, 2 * size // scale))
    ref_temp = gd.color2gray(pool_big(torch.from_numpy(big)))
    np.testing.assert_allclose(
        a_temp(jnp.asarray(_nhwc(big))), _nhwc(ref_temp.numpy()), atol=1e-5
    )
