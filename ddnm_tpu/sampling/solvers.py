"""Second-order multistep DDNM solver — a beyond-reference accelerator.

The reference integrates the DDNM trajectory with first-order DDIM steps
only (guided_diffusion/diffusion.py:380-384, functions/svd_ddnm.py:63-65),
so reaching its headline quality costs ~100 model calls per image. This
module adds a deterministic DPM-Solver++(2M)-style multistep update in
data-prediction form, applied to the *null-space-projected* x̂0|t: the
DDNM projection (Eq. 17) plays the role of the data prediction, so the
range-space constraint is enforced at every step while the null-space
component integrates the probability-flow ODE at second order.

Measured regime split (trained golden fixtures — docs/PERFORMANCE.md
"Fewer steps: second-order multistep"): at ultra-low budgets (<= ~10
model calls) this solver beats the reference update by +4-10 dB PSNR —
the latency-critical few-step regime; at the reference protocol's 25-100
steps the reference's gamma-gated first-order update converges to a
contractive (mode-seeking) limit that scores HIGHER restoration PSNR
than the probability-flow solution, so "ddim" remains the quality
default there. Multistep is the ODE-consistent choice: verified second
order against an analytic Gaussian probability-flow solution, while the
reference update provably does not converge to the flow at all
(tests/test_solvers.py).

Math (log-SNR space, lambda_t = log(alpha_t / sigma_t), alpha = sqrt(abar),
sigma = sqrt(1 - abar); step t_i -> t_j, h = lambda_j - lambda_i):

    first order   x_j = (sigma_j/sigma_i) x_i + alpha_j (1 - e^{-h}) x̂0_i
    second order  D   = x̂0_i + (h / 2 h_prev) (x̂0_i - x̂0_prev)
                  x_j = (sigma_j/sigma_i) x_i + alpha_j (1 - e^{-h}) D

e^{-h} is evaluated in the exactly-stable ratio form
(alpha_i sigma_j)/(alpha_j sigma_i), so the final step (abar_j = 1,
sigma_j = 0) needs no special casing beyond dropping to first order
(the standard lower-order-final rule — extrapolating through h -> inf
would amplify the x̂0 history difference).

Scope: deterministic, so noise-free DDNM only (sigma_y == 0; the noisy
DDNM+ gamma_t/Lambda_noise injection is tied to the DDIM transition
kernel). Time-travel is supported: a re-noise step invalidates the
multistep history, so the step after a jump is first-order — the same
adjacency argument as the encoder cache's jump invalidation.

The POSTERIOR (hq / Mask-Shift) regime is covered too
(`sample_posterior_multistep`, VERDICT r3 item 5): the hq pipeline's cost
is ~380 model calls PER TILE (hq_demo/guided_diffusion/scheduler.py:70-147),
so the few-step regime this solver wins is exactly where tiling hurts
most. The posterior chain's stochastic update (mean = coef1*x0_hat +
coef2*x, variance := gamma_t — gaussian_diffusion.py:388-389,487-488) is
replaced by the same deterministic data-prediction multistep on the
projected-and-pasted x̂0|t over the RESPACED abar grid; learned-range
variance becomes irrelevant (the ODE has no noise injection), respacing
and the 3-level jump schedule compose unchanged, and the Mask-Shift paste
participates in the data prediction exactly as in the stochastic sampler.

Like sampling/ddnm.py, one step body serves two loop drivers (lax.scan /
host), and the schedule is the same host-precomputed DDNMSchedule (or
PosteriorTables for the posterior form).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu.sampling.posterior import _resolve_posterior_loop  # noqa: E501
from ddnm_tpu.sampling.ddnm import (
    DDNMSchedule,
    _Body,
    _call_model,
    _host_travel,
    _nhwc_to_vec,
    _resolve_loop,

    _scan_inputs,
    _travel_step,
    _vec_to_nhwc,
)
from ddnm_tpu.sampling.rng import default_noise as _default_noise
from ddnm_tpu.sampling.rng import draw_noise, split_key

__all__ = [
    "sample_simplified_multistep",
    "sample_svd_multistep",
    "sample_posterior_multistep",
]

Array = jnp.ndarray

_TINY = 1e-20  # clamp for 1 - abar at the abar = 1 endpoint


def _lam(abar):
    """log-SNR lambda = 0.5 (log abar - log(1 - abar)), endpoint-clamped."""
    return 0.5 * (jnp.log(abar) - jnp.log(jnp.maximum(1.0 - abar, _TINY)))


def _ms_step(x, x0_hat, x0_prev, lam_prev, valid_prev, abar_i, abar_j):
    """One multistep update x_i -> x_j given the projected prediction
    x̂0_i and the (x̂0_prev, lam_prev, valid_prev) history carry."""
    a_i = jnp.sqrt(abar_i)
    s_i = jnp.sqrt(jnp.maximum(1.0 - abar_i, _TINY))
    a_j = jnp.sqrt(abar_j)
    s_j = jnp.sqrt(jnp.maximum(1.0 - abar_j, _TINY))
    lam_i = _lam(abar_i)
    lam_j = _lam(abar_j)
    h = lam_j - lam_i
    e_mh = (a_i * s_j) / (a_j * s_i)  # exp(-h), stable ratio form
    is_last = abar_j >= 1.0 - 1e-8
    h_prev = jnp.maximum(lam_i - lam_prev, 1e-8)
    c = jnp.where(valid_prev & ~is_last, h / (2.0 * h_prev), 0.0)
    d = x0_hat + c * (x0_hat - x0_prev)
    return (s_j / s_i) * x + a_j * (1.0 - e_mh) * d


# ------------------------------------------------------------ predict bodies
# Each returns (x0_raw, x0_hat): the unprojected Eq.12 prediction (carried
# for time-travel re-noising, matching the DDIM drivers' x0_pred carry) and
# the null-space-projected prediction the ODE integrates.


def _simplified_predict(model_fn, operator, params, x, y, t_f, at,
                        op_ctx=None):
    et = _call_model(model_fn, params, x, t_f)
    et = et[..., :3] if et.shape[-1] == 6 else et
    x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
    # Eq. 17 at sigma_y = 0: lambda_t = 1, full projection
    proj = (operator.Ap_ctx(operator.A_ctx(x0_t, op_ctx) - y, op_ctx)
            if op_ctx is not None
            else operator.Ap(operator.A(x0_t) - y))
    return x0_t, x0_t - proj


def _svd_predict(model_fn, operator, guidance_fn, params, x, y_spec, t_f, at,
                 op_ctx=None):
    et = _call_model(model_fn, params, x, t_f)
    et = et[..., :3] if et.shape[-1] == 6 else et
    if guidance_fn is not None:
        g = (guidance_fn(x, t_f, at) if params is None
             else guidance_fn(params, x, t_f, at))
        et = et - jnp.sqrt(1.0 - at) * g
    x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
    x0_vec = _nhwc_to_vec(x0_t)
    x0_hat = x0_vec - operator.range_correction(x0_vec, y_spec)
    return x0_t, _vec_to_nhwc(x0_hat, x.shape)


# -------------------------------------------------------------- loop drivers


@partial(jax.jit, static_argnames=("predict", "noise_fn"))
def _run_scan_ms(predict, noise_fn, params, x_init, y, sched: DDNMSchedule,
                 key, op_ctx=None):
    alpha_bar = jnp.asarray(sched.alpha_bar)
    n = x_init.shape[0]

    def step(carry, inputs):
        x, x0_raw, x0_prev, lam_prev, valid, key = carry
        t_i, t_j, travel = inputs
        key, k_noise = split_key(key)
        at = alpha_bar[t_i + 1]
        at_next = alpha_bar[t_j + 1]

        def normal(_):
            t_f = jnp.full((n,), t_i, dtype=jnp.float32)
            x0_t, x0_hat = predict(params, x, y, t_f, at, op_ctx)
            x_next = _ms_step(x, x0_hat, x0_prev, lam_prev, valid, at,
                              at_next)
            return x_next, x0_t, x0_hat, _lam(at), jnp.asarray(True)

        def travel_back(_):
            noise = draw_noise(noise_fn, k_noise, x.shape)
            return (_travel_step(x0_raw, at_next, noise), x0_raw, x0_prev,
                    lam_prev, jnp.asarray(False))

        x_n, x0_raw_n, x0_prev_n, lam_n, valid_n = jax.lax.cond(
            travel, travel_back, normal, operand=None
        )
        return (x_n, x0_raw_n, x0_prev_n, lam_n, valid_n, key), None

    init = (
        x_init,
        jnp.zeros_like(x_init),
        jnp.zeros_like(x_init),
        jnp.float32(0.0),
        jnp.asarray(False),
        key,
    )
    (x, x0_raw, *_), _ = jax.lax.scan(step, init, _scan_inputs(sched))
    return x, x0_raw


@partial(jax.jit, static_argnames=("predict",))
def _host_step_ms(predict, params, x, y, key, t_i, at, at_next, x0_prev,
                  lam_prev, valid, op_ctx=None):
    n = x.shape[0]
    key, _ = split_key(key)  # keep the RNG carry aligned with the scan
    t_f = jnp.full((n,), t_i, dtype=jnp.float32)
    x0_t, x0_hat = predict(params, x, y, t_f, at, op_ctx)
    x_next = _ms_step(x, x0_hat, x0_prev, lam_prev, valid, at, at_next)
    return x_next, x0_t, x0_hat, _lam(at), key


def _run_host_ms(predict, noise_fn, params, x_init, y, sched: DDNMSchedule,
                 key, op_ctx=None):
    abar = np.asarray(sched.alpha_bar)
    x = x_init
    x0_raw = jnp.zeros_like(x_init)
    x0_prev = jnp.zeros_like(x_init)
    lam_prev = jnp.float32(0.0)
    valid = jnp.asarray(False)
    for t_i, t_j, travel in zip(sched.t_cur, sched.t_next, sched.is_travel):
        at = float(abar[int(t_i) + 1])
        at_next = float(abar[int(t_j) + 1])
        if bool(travel):
            x, key = _host_travel(noise_fn, x0_raw, key, at_next)
            valid = jnp.asarray(False)
        else:
            x, x0_raw, x0_prev, lam_prev, key = _host_step_ms(
                predict, params, x, y, key, float(t_i), at, at_next,
                x0_prev, lam_prev, valid, op_ctx,
            )
            valid = jnp.asarray(True)
    return x, x0_raw


def _drive_ms(loop, predict, noise_fn, params, x_init, y, sched, key,
              op_ctx=None):
    if _resolve_loop(loop, params) == "scan":
        return _run_scan_ms(predict, noise_fn, params, x_init, y, sched, key,
                            op_ctx)
    return _run_host_ms(predict, noise_fn, params, x_init, y, sched, key,
                        op_ctx)


# ----------------------------------------------------------------- public API


def sample_simplified_multistep(
    model_fn,
    x_init: Array,
    y: Array,
    operator,
    sched: DDNMSchedule,
    key: jax.Array,
    *,
    noise_fn=_default_noise,
    loop: str = "auto",
    params=None,
    op_ctx=None,
) -> tuple[Array, Array]:
    """Simplified-mode noise-free DDNM with the second-order multistep
    update. Deterministic (no eta — only time-travel steps draw noise).
    Returns (x_final, x0_pred_final) like sample_simplified."""
    if op_ctx is not None and not operator.has_ctx:
        raise ValueError(
            f"operator {operator.name!r} has no A_ctx/Ap_ctx forms; "
            "op_ctx requires a context-parameterised operator"
        )
    predict = _Body(_simplified_predict, (model_fn, operator))
    return _drive_ms(loop, predict, noise_fn, params, x_init, y, sched, key,
                     op_ctx)


def sample_svd_multistep(
    model_fn,
    x_init: Array,
    y: Array,
    operator,
    sched: DDNMSchedule,
    key: jax.Array,
    *,
    noise_fn=_default_noise,
    guidance_fn: Optional[Callable] = None,
    loop: str = "auto",
    params=None,
) -> tuple[Array, Array]:
    """SVD-mode noise-free DDNM with the second-order multistep update.
    `y` is the measurement in the operator's flattened layout (B, M);
    classifier guidance composes exactly as in sample_svd."""
    predict = _Body(_svd_predict, (model_fn, operator, guidance_fn))
    y_spec = operator.prepare_measurement(y)
    return _drive_ms(loop, predict, noise_fn, params, x_init, y_spec, sched,
                     key)


# ------------------------------------------- posterior (hq) multistep form


def _posterior_predict(model_fn, operator, guidance_fn, clip_denoised,
                       params, x, apy, paste_mask, paste_content, t_orig,
                       sqrt_recip, sqrt_recipm1, lam, op_ctx=None):
    """Data prediction for the posterior regime: the p_mean_variance DDNM
    core (gaussian_diffusion.py:246-403) up to and including the Mask-Shift
    paste, WITHOUT the stochastic posterior transition — the multistep
    update integrates this x̂0|t instead."""
    n = x.shape[0]
    t_b = jnp.full((n,), t_orig, dtype=jnp.float32)
    out = model_fn(x, t_b) if params is None else model_fn(params, x, t_b)
    c = x.shape[-1]
    eps = out[..., :c]  # learned-range var head out[..., c:] unused: no noise
    if guidance_fn is not None:
        # eps-space classifier guidance (svd_ddnm.py:49-52). INTENTIONAL
        # DIVERGENCE from the stochastic posterior sampler, which adds
        # variance*grad to the mean (condition_mean,
        # gaussian_diffusion.py:413-430) — the ODE has no posterior mean to
        # shift, so the score-correction form is the consistent one.
        # sqrt(1 - abar) = sqrt_recipm1 / sqrt_recip.
        g = (guidance_fn(x, t_b) if params is None
             else guidance_fn(params, x, t_b))
        eps = eps - (sqrt_recipm1 / sqrt_recip) * g
    x0_t = sqrt_recip * x - sqrt_recipm1 * eps
    if clip_denoised:
        x0_t = jnp.clip(x0_t, -1.0, 1.0)
    rng_proj = (operator.range_ctx(x0_t, op_ctx) if op_ctx is not None
                else operator.Ap(operator.A(x0_t)))
    x0_hat = lam * apy + x0_t - lam * rng_proj
    if paste_mask is not None:
        x0_hat = paste_mask * paste_content + (1.0 - paste_mask) * x0_hat
    return x0_hat


def _posterior_abar(tb):
    """(abar, abar_prev) over the respaced grid, from the tables' 1/sqrt
    form (abar_prev[0] = 1: the final step lands on clean data)."""
    abar = 1.0 / (tb.sqrt_recip_alphas_cumprod ** 2)
    abar_prev = jnp.concatenate(
        [jnp.ones((1,), abar.dtype), abar[:-1]])
    return abar, abar_prev


@partial(jax.jit,
         static_argnames=("predict", "noise_fn", "has_paste", "has_ctx"))
def _run_scan_pms(predict, noise_fn, has_paste, has_ctx, params, x_init, apy,
                  paste_mask, paste_content, op_ctx, tables, key):
    tb = jax.tree.map(jnp.asarray, tables)
    abar, abar_prev = _posterior_abar(tb)

    def step(carry, inputs):
        x, x0_last, x0_prev, lam_prev, valid, key = carry
        t, travel = inputs
        key, k_noise = split_key(key)

        def normal(_):
            x0_hat = predict(
                params, x, apy,
                paste_mask if has_paste else None,
                paste_content if has_paste else None,
                tb.timestep_map[t],
                tb.sqrt_recip_alphas_cumprod[t],
                tb.sqrt_recipm1_alphas_cumprod[t],
                tb.lambda_t[t],
                op_ctx if has_ctx else None,
            )
            x_next = _ms_step(x, x0_hat, x0_prev, lam_prev, valid,
                              abar[t], abar_prev[t])
            return (x_next, x0_hat, x0_hat, _lam(abar[t]),
                    jnp.asarray(True))

        def travel_back(_):
            # undo re-noising invalidates the multistep history
            # (gaussian_diffusion.py:208-217,727-734)
            noise = draw_noise(noise_fn, k_noise, x.shape)
            idx = jnp.minimum(t + tb.travel_shift, tb.betas.shape[0] - 1)
            beta = tb.betas[idx]
            x_up = jnp.sqrt(1.0 - beta) * x + jnp.sqrt(beta) * noise
            return x_up, x0_last, x0_prev, lam_prev, jnp.asarray(False)

        x_n, x0_l, x0_p, lam_n, valid_n = jax.lax.cond(
            travel, travel_back, normal, operand=None)
        return (x_n, x0_l, x0_p, lam_n, valid_n, key), None

    init = (
        x_init,
        jnp.zeros_like(x_init),
        jnp.zeros_like(x_init),
        jnp.float32(0.0),
        jnp.asarray(False),
        key,
    )
    (x, x0_hat, *_), _ = jax.lax.scan(
        step, init,
        (jnp.asarray(tables.t_cur), jnp.asarray(tables.is_travel)))
    return x, x0_hat


@partial(jax.jit,
         static_argnames=("predict", "noise_fn", "has_paste", "has_ctx"))
def _host_step_pms(predict, noise_fn, has_paste, has_ctx, params, x, apy,
                   paste_mask, paste_content, op_ctx, key, t_orig,
                   sqrt_recip, sqrt_recipm1, lam, abar_i, abar_j, x0_prev,
                   lam_prev, valid):
    key, _ = split_key(key)  # keep the RNG carry aligned with the scan
    x0_hat = predict(
        params, x, apy,
        paste_mask if has_paste else None,
        paste_content if has_paste else None,
        t_orig, sqrt_recip, sqrt_recipm1, lam,
        op_ctx if has_ctx else None,
    )
    x_next = _ms_step(x, x0_hat, x0_prev, lam_prev, valid, abar_i, abar_j)
    return x_next, x0_hat, _lam(abar_i), key


def _run_host_pms(predict, noise_fn, has_paste, has_ctx, params, x_init, apy,
                  paste_mask, paste_content, op_ctx, tables, key):
    from ddnm_tpu.sampling.posterior import (
        _host_scalars,
        _host_undo,
        _undo_beta,
    )

    tbl = tables
    abar_np = 1.0 / (np.asarray(tbl.sqrt_recip_alphas_cumprod) ** 2)
    x, x0_hat = x_init, jnp.zeros_like(x_init)
    x0_prev = jnp.zeros_like(x_init)
    lam_prev = jnp.float32(0.0)
    valid = jnp.asarray(False)
    for t, travel in zip(tbl.t_cur, tbl.is_travel):
        t = int(t)
        if bool(travel):
            x, key = _host_undo(noise_fn, x, key, _undo_beta(tbl, t))
            valid = jnp.asarray(False)
        else:
            t_orig, sqrt_recip, sqrt_recipm1, lam = _host_scalars(tbl, t)[:4]
            abar_i = float(abar_np[t])
            abar_j = float(abar_np[t - 1]) if t > 0 else 1.0
            x, x0_hat, lam_prev, key = _host_step_pms(
                predict, noise_fn, has_paste, has_ctx, params, x, apy,
                paste_mask, paste_content, op_ctx, key, t_orig, sqrt_recip,
                sqrt_recipm1, lam, abar_i, abar_j, x0_prev, lam_prev, valid,
            )
            x0_prev = x0_hat
            valid = jnp.asarray(True)
    return x, x0_hat


def sample_posterior_multistep(
    model_fn,
    x_init: Array,
    apy: Array,
    operator,
    tables,
    key: jax.Array,
    *,
    paste_mask: Optional[Array] = None,
    paste_content: Optional[Array] = None,
    guidance_fn: Optional[Callable] = None,
    clip_denoised: bool = True,
    noise_fn=_default_noise,
    loop: str = "auto",
    params=None,
    op_ctx: Optional[Array] = None,
) -> tuple[Array, Array]:
    """Posterior-regime (hq / Mask-Shift) DDNM with the second-order
    multistep update — same signature and tile plumbing as
    `sample_posterior` (paste masks, runtime op_ctx, per-image key
    batches), deterministic between time-travel jumps.

    Noise-free DDNM only: the posterior DDNM+ noise split (lambda_t <
    1 / gamma_t clamping, gaussian_diffusion.py:330-336) is tied to the
    stochastic transition kernel, so tables must be built with
    sigma_y == 0 (every lambda_t == 1). Returns (x_final, x0_hat_final)
    like sample_posterior."""
    lam_tab = np.asarray(tables.lambda_t)
    if not np.all(lam_tab == 1.0):
        raise ValueError(
            "solver='multistep' supports noise-free posterior DDNM only "
            "(sigma_y == 0); rebuild the tables with sigma_y=0 or use the "
            "ddim posterior sampler for noisy measurements")
    predict = _Body(_posterior_predict,
                    (model_fn, operator, guidance_fn, clip_denoised))
    has_paste = paste_mask is not None
    has_ctx = op_ctx is not None
    if not has_paste:
        paste_mask = jnp.zeros((), jnp.float32)
        paste_content = jnp.zeros((), jnp.float32)
    if not has_ctx:
        op_ctx = jnp.zeros((), jnp.float32)
    if _resolve_posterior_loop(loop) == "scan":
        return _run_scan_pms(
            predict, noise_fn, has_paste, has_ctx, params, x_init, apy,
            paste_mask, paste_content, op_ctx, tables, key)
    return _run_host_pms(
        predict, noise_fn, has_paste, has_ctx, params, x_init, apy,
        paste_mask, paste_content, op_ctx, tables, key)
