"""Property-based (hypothesis) oracle-parity fuzz for the posterior tables.

The fixed-spec parity tests (test_posterior_tiling.py) pin the shipped
configurations; these fuzz the (num_timesteps, respacing spec, schedule
name, sigma_y) space against the reference's own SpacedDiffusion as the
oracle, including the lambda/gamma DDNM gating arithmetic the reference
computes inline (hq_demo/guided_diffusion/gaussian_diffusion.py:330-336,
with its sigma_t/a_t*sigma_y precedence quirk).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from ddnm_tpu import schedules as sch
from ddnm_tpu.sampling.posterior import build_posterior_tables
from tests.test_posterior_tiling import _oracle_spaced


@st.composite
def respacing_specs(draw):
    kind = draw(st.sampled_from(["ddim", "count", "sections"]))
    if kind == "ddim":
        return f"ddim{draw(st.integers(4, 200))}"
    if kind == "count":
        return str(draw(st.integers(4, 250)))
    return ",".join(
        str(draw(st.integers(2, 40)))
        for _ in range(draw(st.integers(2, 3)))
    )


@settings(max_examples=30, deadline=None)
@given(
    num_timesteps=st.integers(250, 1000),
    spec=respacing_specs(),
    name=st.sampled_from(["linear", "cosine"]),
    sigma_y=st.sampled_from([0.0, 0.05, 0.2, 0.5]),
)
def test_posterior_tables_match_reference(num_timesteps, spec, name, sigma_y):
    betas = sch.named_beta_schedule(name, num_timesteps, use_scale=True)
    try:
        use_timesteps = sch.space_timesteps(num_timesteps, spec)
    except ValueError:
        return  # invalid spec for this T (e.g. ddim stride mismatch)
    del use_timesteps
    sd = _oracle_spaced(betas, spec)
    tb = build_posterior_tables(
        betas=betas, timestep_respacing=spec, sigma_y=sigma_y
    )
    np.testing.assert_allclose(tb.betas, sd.betas, rtol=1e-6, atol=1e-12)
    np.testing.assert_array_equal(tb.timestep_map, np.asarray(sd.timestep_map))
    for ours, theirs in [
        (tb.posterior_variance, sd.posterior_variance),
        (tb.posterior_log_variance_clipped, sd.posterior_log_variance_clipped),
        (tb.posterior_mean_coef1, sd.posterior_mean_coef1),
        (tb.posterior_mean_coef2, sd.posterior_mean_coef2),
        (tb.sqrt_recip_alphas_cumprod, sd.sqrt_recip_alphas_cumprod),
        (tb.sqrt_recipm1_alphas_cumprod, sd.sqrt_recipm1_alphas_cumprod),
    ]:
        np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-10)

    # lambda/gamma: the reference's inline per-step arithmetic
    # (gaussian_diffusion.py:330-336) evaluated from ITS arrays.
    sigma_t = np.sqrt(sd.posterior_variance)
    a_t = sd.posterior_mean_coef1
    lam_ref = np.where(
        sigma_t >= a_t * sigma_y, 1.0, sigma_t / a_t * sigma_y
    )
    gamma_ref = np.where(
        sigma_t >= a_t * sigma_y,
        sd.posterior_variance - (a_t * sigma_y) ** 2,
        0.0,
    )
    np.testing.assert_allclose(tb.lambda_t, lam_ref, rtol=2e-5, atol=1e-10)
    np.testing.assert_allclose(tb.gamma_t, gamma_ref, rtol=2e-5, atol=1e-10)
