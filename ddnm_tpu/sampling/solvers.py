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

Like sampling/ddnm.py, one step body serves two loop drivers (lax.scan /
host), and the schedule is the same host-precomputed DDNMSchedule.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

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

__all__ = ["sample_simplified_multistep", "sample_svd_multistep"]

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
