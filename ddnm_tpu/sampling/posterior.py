"""Posterior-based DDNM sampling with learned-range variance + respacing.

TPU-native counterpart of the reference hq_demo pipeline
(hq_demo/guided_diffusion/gaussian_diffusion.py:131-530 and respace.py):
an ADM model predicting (eps, var_values) drives a DDPM *posterior* update
whose mean is recomputed from the DDNM-projected x0_hat and whose variance is
replaced by gamma_t (Eq. 19), with RePaint-style time-travel ("undo"
re-noising, gaussian_diffusion.py:208-217) and timestep respacing
(respace.py:82-147: rebuilt betas over the retained subset + model-side
timestep remap via timestep_map).

TPU-first design differences from the reference:
  - the full jump-schedule loop is ONE `lax.scan` over precomputed
    (t, is_travel) arrays; no host round-trips inside the trajectory;
  - lambda_t / gamma_t are per-timestep scalars that depend only on the
    schedule and sigma_y, so they are precomputed host-side into tables
    (the reference recomputes them per step on device);
  - the mask-shift paste (gaussian_diffusion.py:344-380) is expressed as a
    uniform masked blend `paste_mask*paste_content + (1-paste_mask)*x0_hat`
    with host-built per-tile masks, so ONE compiled sampler serves every
    tile position (the reference branches in Python per tile class).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu import schedules as sch
from ddnm_tpu.operators.functional import FunctionalOperator
from ddnm_tpu.sampling.ddnm import _resolve_loop  # noqa: F401 (re-export)


def _resolve_posterior_loop(loop: str) -> str:
    """Posterior-path loop choice — 'auto' always means scan.

    Unlike the simplified sampler (size-aware auto, ddnm._resolve_loop:
    host for large models on the remote-compile backend), the posterior/hq
    tile chain measured ~25-30x FASTER under scan on that backend at 59M
    params: 9.5-12.8 s vs 293-326 s per 45-call tile (round 5,
    docs/PERFORMANCE.md "hq loop driver regression"), and its scan
    compiles in ~60 s. The round-1 91 s hq 512px result was the
    device-resident scan; round 3's size-aware auto (tuned on the
    simplified sampler) silently regressed this path to host-driven.
    "host" remains available explicitly.
    """
    if loop == "auto":
        return "scan"
    return loop
from ddnm_tpu.sampling.rng import default_noise as _default_noise
from ddnm_tpu.sampling.rng import draw_noise, split_key

__all__ = [
    "PosteriorTables",
    "respace_betas",
    "build_posterior_tables",
    "build_jump_pairs",
    "sample_posterior",
]

Array = jnp.ndarray


def respace_betas(betas: np.ndarray, use_timesteps) -> tuple[np.ndarray, np.ndarray]:
    """Rebuild betas over a retained timestep subset (respace.py:104-111).

    Returns (new_betas, timestep_map): new_betas[i] reproduces the original
    cumulative alpha_bar at the retained steps; timestep_map maps sampler
    timestep index -> original diffusion timestep (fed to the model).
    """
    alphas_cumprod = np.cumprod(1.0 - np.asarray(betas, dtype=np.float64))
    keep = set(int(t) for t in use_timesteps)
    new_betas, tmap = [], []
    last = 1.0
    for i, ac in enumerate(alphas_cumprod):
        if i in keep:
            new_betas.append(1.0 - ac / last)
            last = ac
            tmap.append(i)
    return np.asarray(new_betas, dtype=np.float64), np.asarray(tmap, dtype=np.int32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PosteriorTables:
    """Host-precomputed per-timestep tables for the posterior DDNM sampler.

    All arrays are indexed by the *respaced* timestep t. `timestep_map[t]` is
    the original-diffusion timestep passed to the model (respace.py:158-170).
    """

    betas: np.ndarray
    timestep_map: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray  # 1/sqrt(abar)
    sqrt_recipm1_alphas_cumprod: np.ndarray  # sqrt(1/abar - 1)
    posterior_mean_coef1: np.ndarray  # coef on x0
    posterior_mean_coef2: np.ndarray  # coef on x_t
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    log_betas: np.ndarray
    lambda_t: np.ndarray  # Eq. 19 range-space scale
    gamma_t: np.ndarray  # Eq. 19 variance replacement
    # jump schedule, scan-ready
    t_cur: np.ndarray  # (S,) int32 respaced timestep
    is_travel: np.ndarray  # (S,) bool: re-noise instead of sampling
    travel_shift: np.ndarray  # () int32: undo at beta[t + shift]
    # (conf 'inpa_inj_time_shift', gaussian_diffusion.py:728; default 1)

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_jump_pairs(schedule_jump_params: dict) -> tuple[np.ndarray, np.ndarray]:
    """3-level jump schedule -> (t_cur, is_travel) scan arrays.

    Consecutive time pairs (t_last, t_cur_next): a normal DDNM step when
    descending (t_next < t_last, step at t_last), an undo re-noise at
    t_last + PosteriorTables.travel_shift when ascending
    (gaussian_diffusion.py:700-734; shift = conf inpa_inj_time_shift,
    default 1).
    """
    times = sch.get_schedule_jump_hq(**schedule_jump_params)
    t_last = np.asarray(times[:-1], dtype=np.int32)
    t_next = np.asarray(times[1:], dtype=np.int32)
    is_travel = t_next >= t_last
    return t_last, is_travel


def build_posterior_tables(
    *,
    betas: np.ndarray,
    timestep_respacing,
    sigma_y: float = 0.0,
    schedule_jump_params: Optional[dict] = None,
    time_shift: int = 1,
) -> PosteriorTables:
    """Assemble all per-timestep tables for `sample_posterior`.

    `betas` is the ORIGINAL (e.g. 1000-step) schedule; `timestep_respacing`
    is a space_timesteps() spec ("ddim100", "250", [100], ...).
    `time_shift` is the reference's `inpa_inj_time_shift` conf option: undo
    re-noising uses beta[t + time_shift] (gaussian_diffusion.py:727-734).
    """
    betas = np.asarray(betas, dtype=np.float64)
    use = sch.space_timesteps(len(betas), timestep_respacing)
    new_betas, tmap = respace_betas(betas, use)

    alphas = 1.0 - new_betas
    abar = np.cumprod(alphas)
    abar_prev = np.append(1.0, abar[:-1])

    post_var = new_betas * (1.0 - abar_prev) / (1.0 - abar)
    post_logvar_clipped = np.log(np.append(post_var[1], post_var[1:]))
    coef1 = new_betas * np.sqrt(abar_prev) / (1.0 - abar)
    coef2 = (1.0 - abar_prev) * np.sqrt(alphas) / (1.0 - abar)

    # Eq. 19 in the posterior parameterisation
    # (gaussian_diffusion.py:330-336): sigma_t = sqrt(post_var), a_t = coef1.
    sigma_t = np.sqrt(post_var)
    a_t = coef1
    noisy = sigma_t < a_t * sigma_y
    lam = np.where(noisy, np.divide(sigma_t, a_t, out=np.ones_like(sigma_t),
                                    where=a_t > 0) * sigma_y, 1.0)
    gam = np.where(noisy, 0.0, post_var - (a_t * 1.0 * sigma_y) ** 2)

    if schedule_jump_params is None:
        schedule_jump_params = dict(
            t_T=len(new_betas), n_sample=1, jump_length=10, jump_n_sample=10
        )
    t_cur, is_travel = build_jump_pairs(schedule_jump_params)

    f32 = lambda a: np.asarray(a, dtype=np.float32)
    return PosteriorTables(
        betas=f32(new_betas),
        timestep_map=np.asarray(tmap, dtype=np.float32),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / abar)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / abar - 1.0)),
        posterior_mean_coef1=f32(coef1),
        posterior_mean_coef2=f32(coef2),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(post_logvar_clipped),
        log_betas=f32(np.log(new_betas)),
        lambda_t=f32(lam),
        gamma_t=f32(gam),
        t_cur=t_cur,
        is_travel=is_travel,
        travel_shift=np.asarray(time_shift, dtype=np.int32),
    )


def _posterior_body(
    model_fn,
    operator,
    guidance_fn,
    clip_denoised,
    # traced params pytree (None -> closure-captured weights)
    params,
    # carried / per-tile state
    x,
    apy,
    paste_mask,
    paste_content,
    noise,
    # per-step scalars (gathered by the scan driver, numpy in the host driver)
    t_orig,
    sqrt_recip,
    sqrt_recipm1,
    lam,
    coef1,
    coef2,
    gamma,
    nonzero,
    op_ctx=None,
):
    """One posterior DDNM step (p_mean_variance DDNM core + p_sample,
    gaussian_diffusion.py:246-403,432-493)."""
    n = x.shape[0]
    t_b = jnp.full((n,), t_orig, dtype=jnp.float32)
    out = model_fn(x, t_b) if params is None else model_fn(params, x, t_b)
    return _posterior_update(
        operator, guidance_fn, clip_denoised, params, x, apy, paste_mask,
        paste_content, noise, out, t_b, sqrt_recip, sqrt_recipm1, lam,
        coef1, coef2, gamma, nonzero, op_ctx,
    )


def _posterior_update(
    operator, guidance_fn, clip_denoised, params, x, apy, paste_mask,
    paste_content, noise, out, t_b, sqrt_recip, sqrt_recipm1, lam, coef1,
    coef2, gamma, nonzero, op_ctx=None,
):
    """The posterior DDNM step given the model output `out` (shared by the
    standard samplers and the encoder-propagation sampler in accel.py).
    `op_ctx`: runtime operator context (e.g. a per-tile mask slice) for
    context-parameterised operators (operators/functional.py)."""
    c = x.shape[-1]
    eps = out[..., :c]  # var_values out[..., c:] unused: DDNM sets var=gamma_t

    x0_t = sqrt_recip * x - sqrt_recipm1 * eps
    if clip_denoised:
        x0_t = jnp.clip(x0_t, -1.0, 1.0)

    # Eq. 17: x0_hat = lam*Apy + x0 - lam*Ap(A(x0))
    rng_proj = (operator.range_ctx(x0_t, op_ctx) if op_ctx is not None
                else operator.Ap(operator.A(x0_t)))
    x0_hat_new = lam * apy + x0_t - lam * rng_proj

    # mask-shift paste: overlap strips come from the solved canvas
    if paste_mask is not None:
        x0_hat_new = paste_mask * paste_content + (1.0 - paste_mask) * x0_hat_new

    mean = coef1 * x0_hat_new + coef2 * x
    if guidance_fn is not None:
        g = guidance_fn(x, t_b) if params is None else guidance_fn(params, x, t_b)
        mean = mean + gamma * g
    x_next = mean + nonzero * jnp.sqrt(jnp.maximum(gamma, 0.0)) * noise
    return x_next, x0_hat_new


@dataclasses.dataclass(frozen=True)
class _PBody:
    """Hashable static context for the posterior step (jit-cache friendly)."""

    model_fn: Callable
    operator: FunctionalOperator
    guidance_fn: Optional[Callable]
    clip_denoised: bool

    def __call__(self, *a):
        return _posterior_body(
            self.model_fn, self.operator, self.guidance_fn, self.clip_denoised, *a
        )


@partial(jax.jit, static_argnames=("body", "noise_fn", "has_paste", "has_ctx"))
def _run_scan(body, noise_fn, has_paste, has_ctx, params, x_init, apy,
              paste_mask, paste_content, op_ctx, tables, key):
    tb = jax.tree.map(jnp.asarray, tables)

    def step(carry, inputs):
        x, x0_hat, key = carry
        t, travel = inputs
        key, k_noise = split_key(key)
        noise = draw_noise(noise_fn, k_noise, x.shape)

        def normal(_):
            return body(
                params, x, apy,
                paste_mask if has_paste else None,
                paste_content if has_paste else None,
                noise,
                tb.timestep_map[t],
                tb.sqrt_recip_alphas_cumprod[t],
                tb.sqrt_recipm1_alphas_cumprod[t],
                tb.lambda_t[t],
                tb.posterior_mean_coef1[t],
                tb.posterior_mean_coef2[t],
                tb.gamma_t[t],
                (t != 0).astype(x.dtype),
                op_ctx if has_ctx else None,
            )

        def travel_back(_):
            # undo: one forward-diffusion step at t + travel_shift
            # (gaussian_diffusion.py:208-217,727-734; shift defaults to 1)
            idx = jnp.minimum(t + tb.travel_shift, tb.betas.shape[0] - 1)
            beta = tb.betas[idx]
            return jnp.sqrt(1.0 - beta) * x + jnp.sqrt(beta) * noise, x0_hat

        x_next, x0_next = jax.lax.cond(travel, travel_back, normal, operand=None)
        return (x_next, x0_next, key), None

    (x, x0_hat, _), _ = jax.lax.scan(
        step,
        (x_init, jnp.zeros_like(x_init), key),
        (jnp.asarray(tables.t_cur), jnp.asarray(tables.is_travel)),
    )
    return x, x0_hat


@partial(jax.jit, static_argnames=("body", "noise_fn", "has_paste", "has_ctx"))
def _host_step(body, noise_fn, has_paste, has_ctx, params, x, apy, paste_mask,
               paste_content, op_ctx, key, t_orig, sqrt_recip, sqrt_recipm1,
               lam, coef1, coef2, gamma, nonzero):
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    x_next, x0_hat = body(
        params, x, apy,
        paste_mask if has_paste else None,
        paste_content if has_paste else None,
        noise, t_orig, sqrt_recip, sqrt_recipm1, lam, coef1, coef2, gamma,
        nonzero, op_ctx if has_ctx else None,
    )
    return x_next, x0_hat, key


@partial(jax.jit, static_argnames=("noise_fn",))
def _host_undo(noise_fn, x, key, beta):
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    return jnp.sqrt(1.0 - beta) * x + jnp.sqrt(beta) * noise, key


def _host_scalars(tbl: PosteriorTables, t: int) -> tuple:
    """Per-step scalar tuple for the host drivers, in _posterior_body's
    argument order. SHARED with sampling/accel.py — any change to the
    step's scalar inputs must happen here so the exact and encoder-prop
    samplers cannot drift."""
    return (
        float(tbl.timestep_map[t]),
        float(tbl.sqrt_recip_alphas_cumprod[t]),
        float(tbl.sqrt_recipm1_alphas_cumprod[t]),
        float(tbl.lambda_t[t]),
        float(tbl.posterior_mean_coef1[t]),
        float(tbl.posterior_mean_coef2[t]),
        float(tbl.gamma_t[t]),
        1.0 if t != 0 else 0.0,
    )


def _undo_beta(tbl: PosteriorTables, t: int) -> float:
    """beta for the travel undo at t: beta[t + travel_shift], clamped
    (gaussian_diffusion.py:208-217,727-734). SHARED with accel.py."""
    shift = int(tbl.travel_shift)
    return float(tbl.betas[min(t + shift, len(tbl.betas) - 1)])


def sample_posterior(
    model_fn: Callable[[Array, Array], Array],
    x_init: Array,
    apy: Array,
    operator: FunctionalOperator,
    tables: PosteriorTables,
    key: jax.Array,
    *,
    paste_mask: Optional[Array] = None,
    paste_content: Optional[Array] = None,
    guidance_fn: Optional[Callable] = None,
    clip_denoised: bool = True,
    noise_fn: Callable = _default_noise,
    loop: str = "auto",
    params=None,
    op_ctx: Optional[Array] = None,
    solver: str = "ddim",
) -> tuple[Array, Array]:
    """Run the full posterior DDNM jump-schedule loop on device.

    model_fn(x, t_orig[B]) -> (B,H,W,2C) with channels [eps, var_values]
    (learned-range ADM head). `apy` is the tile's A+y. Returns
    (x_final, x0_hat_final) — callers keep x0_hat (the reference writes
    out["x0_t"] into the canvas, gaussian_diffusion.py:737-746).

    Classifier guidance: `guidance_fn(x, t_orig) -> grad log p(y|x) * scale`;
    applied to the posterior mean as mean += variance * grad
    (condition_mean, gaussian_diffusion.py:413-430).

    Same dual loop drivers as ddnm.py (see its module docstring): "scan" is
    one executable, "host" dispatches a jitted step per timestep. "auto"
    always resolves to "scan" on this path (_resolve_posterior_loop: the
    tile chain is dispatch-bound host-driven through the remote-compile
    tunnel — measured 25-30x win for scan, round 5). Identical numerics
    either way.

    `params`: optional pytree given to model_fn/guidance_fn as their first
    argument, keeping weights out of the compiled HLO (required for large
    models on remote-compile backends).

    `op_ctx`: runtime tensor for context-parameterised operators (e.g. the
    per-tile mask slice in Mask-Shift tiling) — traced, so one executable
    serves every context value.

    `solver`: "ddim" (the reference's stochastic posterior transition,
    default) or "multistep" (second-order deterministic, noise-free only;
    sampling/solvers.py `sample_posterior_multistep`).
    """
    if solver == "multistep":
        from ddnm_tpu.sampling.solvers import sample_posterior_multistep

        return sample_posterior_multistep(
            model_fn, x_init, apy, operator, tables, key,
            paste_mask=paste_mask, paste_content=paste_content,
            guidance_fn=guidance_fn, clip_denoised=clip_denoised,
            noise_fn=noise_fn, loop=loop, params=params, op_ctx=op_ctx,
        )
    if solver != "ddim":
        raise ValueError(f"unknown solver {solver!r} (ddim | multistep)")
    body = _PBody(model_fn, operator, guidance_fn, clip_denoised)
    has_paste = paste_mask is not None
    has_ctx = op_ctx is not None
    if not has_paste:
        paste_mask = jnp.zeros((), jnp.float32)
        paste_content = jnp.zeros((), jnp.float32)
    if not has_ctx:
        op_ctx = jnp.zeros((), jnp.float32)

    if _resolve_posterior_loop(loop) == "scan":
        return _run_scan(
            body, noise_fn, has_paste, has_ctx, params, x_init, apy,
            paste_mask, paste_content, op_ctx, tables, key,
        )

    # host driver: static schedule -> Python branch per step, numpy tables
    tbl = tables
    x, x0_hat = x_init, jnp.zeros_like(x_init)
    for t, travel in zip(tbl.t_cur, tbl.is_travel):
        t = int(t)
        if bool(travel):
            x, key = _host_undo(noise_fn, x, key, _undo_beta(tbl, t))
        else:
            x, x0_hat, key = _host_step(
                body, noise_fn, has_paste, has_ctx, params, x, apy,
                paste_mask, paste_content, op_ctx, key,
                *_host_scalars(tbl, t),
            )
    return x, x0_hat
