"""DDNM / DDNM+ samplers: one step body, two loop drivers.

Implements the reference's two sampling modes with identical numerics:

  - simplified mode (functional A/A+, guided_diffusion/diffusion.py:346-396):
    Eq.12 x0|t, Eq.19 lambda_t/gamma_t gating, Eq.17 null-space projection,
    DDIM update with gamma-gated noise, RePaint time-travel re-noising.
  - SVD mode (A_functions, functions/svd_ddnm.py:19-164): noise-free DDNM
    (exact A+ projection) and noisy DDNM+ (Lambda range-space scaling +
    Lambda_noise spectral noise, Eq.51).

Faithfully-replicated reference quirks:
  - the simplified path computes sigma_t = sqrt(1 - alpha_bar_next^2)
    (squared! diffusion.py:356) and compares against alpha_bar_next * sigma_y
    (no sqrt, :368), while the SVD path uses sigma_t = sqrt(1 - alpha_bar)
    and a = sqrt(alpha_bar_next) (svd_ddnm.py:121-126). Both are kept.
  - the final step clamps t_next to -1 where alpha_bar = 1 exactly.

TPU-first design: the trajectory runs entirely on device with no per-step
host round-trips; the jump schedule is data-independent, so it is
precomputed host-side. Two interchangeable loop drivers share one step body:

  - loop="scan": one `lax.scan` over the whole trajectory (single
    executable; travel/normal branch is a `lax.cond` on a precomputed flag);
  - loop="host": a Python loop dispatching one jitted step per timestep.
    Because the schedule is static, travel steps take a separate tiny jitted
    re-noise function and the model step needs no `lax.cond`. Dispatch is
    async, so steps pipeline on device exactly like the scan.

Default is "auto": the axon remote-compile backend takes minutes to compile
scan-over-UNet bodies for LARGE models (measured 480 s cold for the 114M
flagship vs 5 s for the same step jitted alone), so "auto" picks "host"
there for big models and "scan" everywhere else — including small models
on axon, whose host loops are dispatch-bound through the tunnel (measured
67x slower than scan at 6.8M params; see _AUTO_SCAN_PARAM_BYTES).
Numerics agree to fp32 rounding — both drivers call the same step function.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu import schedules as sch
from ddnm_tpu.operators.base import SVDOperator
from ddnm_tpu.operators.functional import FunctionalOperator
from ddnm_tpu.sampling.rng import default_noise as _default_noise
from ddnm_tpu.sampling.rng import draw_noise, split_key

__all__ = ["DDNMSchedule", "build_schedule", "sample_simplified", "sample_svd"]

Array = jnp.ndarray
ModelFn = Callable[[Array, Array], Array]  # (x_nhwc, t_float[B]) -> eps pred
NoiseFn = Callable[[jax.Array, tuple], Array]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DDNMSchedule:
    """Per-run sampling schedule (host-precomputed; a pytree of arrays so it
    flows through jit/scan as data)."""

    alpha_bar: np.ndarray  # padded table, [t+1] = prod_{s<=t}(1-beta_s)
    t_cur: np.ndarray  # (S,) int32, diffusion-space timestep i
    t_next: np.ndarray  # (S,) int32, diffusion-space timestep j (or -1)
    is_travel: np.ndarray  # (S,) bool

    @property
    def num_steps(self) -> int:
        return len(self.t_cur)

    def tree_flatten(self):
        return (self.alpha_bar, self.t_cur, self.t_next, self.is_travel), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_schedule(
    *,
    betas: np.ndarray,
    t_sampling: int,
    travel_length: int = 1,
    travel_repeat: int = 1,
) -> DDNMSchedule:
    """Assemble the scan-ready schedule from betas + time-travel params."""
    num_t = len(betas)
    times = sch.get_schedule_jump(t_sampling, travel_length, travel_repeat)
    pairs = sch.build_time_pairs(times, skip=num_t // t_sampling)
    return DDNMSchedule(
        alpha_bar=sch.alpha_bar_table(betas).astype(np.float32),
        t_cur=pairs.t_cur,
        t_next=pairs.t_next,
        is_travel=pairs.is_travel,
    )


# Below this many parameter bytes, "auto" picks the scan driver even on a
# remote-compile backend: the per-step dispatch latency of the host loop
# dominates small models there (measured on the axon tunnel: the 6.8M-param
# mid64 fixture runs 50-77 s/batch host-driven vs 0.75-0.99 s scanned — 67x —
# while the 114M flagship pipelines fine either way; docs/PERFORMANCE.md
# "Scan vs host"), and a small scan body compiles in seconds, so the host
# driver's only advantage (no scan-over-model compile) is moot.
_AUTO_SCAN_PARAM_BYTES = 64 * 1024 * 1024


def _params_nbytes(params) -> Optional[int]:
    if params is None:
        return None
    return sum(
        getattr(a, "nbytes", 0) for a in jax.tree_util.tree_leaves(params)
    )


def _resolve_loop(loop: str, params=None) -> str:
    if loop == "auto":
        from ddnm_tpu.utils import is_remote_compile_backend

        if jax.default_backend() == "cpu":
            return "scan"
        if not is_remote_compile_backend():
            return "scan"
        nbytes = _params_nbytes(params)
        if nbytes is not None and nbytes < _AUTO_SCAN_PARAM_BYTES:
            return "scan"
        return "host"
    return loop


def _scan_inputs(sched: DDNMSchedule):
    return (
        jnp.asarray(sched.t_cur),
        jnp.asarray(sched.t_next),
        jnp.asarray(sched.is_travel),
    )


# --------------------------------------------------------------- step bodies
# Each step body takes per-step scalars (t_i as a float for the model, the
# alpha_bar values at t and t_next) plus the carried state, and returns
# (x_next, x0_t). Both loop drivers call exactly these functions.


@dataclasses.dataclass(frozen=True)
class _Body:
    """Hashable closure over a step body's static context.

    Used as a jit static argument: equal (fn, args) tuples hash equal, so
    repeated sampler calls with the same model/operator/settings hit the jit
    cache (a functools.partial would hash by identity and recompile)."""

    fn: Callable
    args: tuple

    def __call__(self, *a):
        return self.fn(*self.args, *a)


def _travel_step(x0_pred, at_next, noise):
    """RePaint re-noising (diffusion.py:388-395 / svd_ddnm.py:69-76)."""
    return jnp.sqrt(at_next) * x0_pred + noise * jnp.sqrt(1.0 - at_next)


def _call_model(model_fn, params, x, t_f):
    """Call the model with params as a traced argument when provided.

    Closure-captured params become giant HLO *constants*; on remote-compile
    backends that means shipping every weight inside the compile request
    (observed: HTTP 413 at ~456 MB). Passing params as an argument keeps
    the HLO small and lets shardings propagate."""
    return model_fn(x, t_f) if params is None else model_fn(params, x, t_f)


def _simplified_update(operator, eta, sigma_y, x, y, et, at, at_next, noise,
                       op_ctx=None):
    """The pure DDNM+ update given the model's eps prediction
    (Eq.12 / Eq.19 / Eq.17 / gamma-gated DDIM, diffusion.py:365-384)."""
    et = et[..., :3] if et.shape[-1] == 6 else et
    # Eq. 12
    x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
    # Eq. 19 (reference uses sigma_t = sqrt(1 - at_next^2), :356)
    sigma_t = jnp.sqrt(1.0 - at_next**2)
    lambda_t = jnp.where(
        sigma_t >= at_next * sigma_y, 1.0, sigma_t / (at_next * sigma_y)
    )
    gamma_t = jnp.where(
        sigma_t >= at_next * sigma_y,
        jnp.sqrt(jnp.maximum(sigma_t**2 - (at_next * sigma_y) ** 2, 0.0)),
        0.0,
    )
    # Eq. 17 (op_ctx: runtime operator context, e.g. a per-image mask)
    proj = (operator.Ap_ctx(operator.A_ctx(x0_t, op_ctx) - y, op_ctx)
            if op_ctx is not None
            else operator.Ap(operator.A(x0_t) - y))
    x0_t_hat = x0_t - lambda_t * proj
    c1 = jnp.sqrt(1.0 - at_next) * eta
    c2 = jnp.sqrt(1.0 - at_next) * (1.0 - eta**2) ** 0.5
    x_next = jnp.sqrt(at_next) * x0_t_hat + gamma_t * (c1 * noise + c2 * et)
    return x_next, x0_t


def _simplified_body(model_fn, operator, eta, sigma_y, params, x, y, t_f, at,
                     at_next, noise, op_ctx=None):
    et = _call_model(model_fn, params, x, t_f)
    return _simplified_update(operator, eta, sigma_y, x, y, et, at, at_next,
                              noise, op_ctx)


def _nhwc_to_vec(x: Array) -> Array:
    """NHWC image -> channel-major flattened vector (operator layout)."""
    b = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)


def _vec_to_nhwc(v: Array, shape: tuple) -> Array:
    b, h, w, c = shape
    return jnp.transpose(v.reshape(b, c, h, w), (0, 2, 3, 1))


def _svd_body(
    model_fn, operator, eta, sigma_y, guidance_fn, params, x, y_spec, t_f,
    at, at_next, noise, op_ctx=None,
):
    """`y_spec` is the per-image constant A_pinv(y)
    (operator.prepare_measurement(y)), hoisted out of the loop by sample_svd;
    A_pinv(A x0 - y) then costs one range-space projection per step instead
    of four spectral transforms (see operators/base.py range_correction)."""
    img_shape = x.shape
    et = _call_model(model_fn, params, x, t_f)
    et = et[..., :3] if et.shape[-1] == 6 else et
    if guidance_fn is not None:
        g = (guidance_fn(x, t_f, at) if params is None
             else guidance_fn(params, x, t_f, at))
        et = et - jnp.sqrt(1.0 - at) * g
    x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)

    x0_vec = _nhwc_to_vec(x0_t)
    if sigma_y == 0.0:
        # svd_ddnm.py:59-65
        x0_hat = x0_vec - operator.range_correction(x0_vec, y_spec)
        c1 = jnp.sqrt(1.0 - at_next) * eta
        c2 = jnp.sqrt(1.0 - at_next) * (1.0 - eta**2) ** 0.5
        x_next = (
            jnp.sqrt(at_next) * _vec_to_nhwc(x0_hat, img_shape)
            + c1 * noise
            + c2 * et
        )
    else:
        # svd_ddnm.py:119-131 (Eq. 17 via Lambda, Eq. 51 via Lambda_noise)
        a = jnp.sqrt(at_next)
        sigma_t = jnp.sqrt(1.0 - at_next)
        lam_corr, spectral_noise = operator.noisy_update(
            x0_vec, y_spec, a, sigma_y, sigma_t, eta,
            _nhwc_to_vec(noise), _nhwc_to_vec(et),
        )
        x0_hat = x0_vec - lam_corr
        x_next = jnp.sqrt(at_next) * _vec_to_nhwc(
            x0_hat, img_shape
        ) + _vec_to_nhwc(spectral_noise, img_shape)
    return x_next, x0_t


# --------------------------------------------------------------- loop drivers


@partial(
    jax.jit,
    static_argnames=("body", "noise_fn"),
)
def _run_scan(body, noise_fn, params, x_init, y, sched: DDNMSchedule, key,
              op_ctx=None):
    """Whole-trajectory scan; travel/normal via lax.cond on the static flag."""
    alpha_bar = jnp.asarray(sched.alpha_bar)
    n = x_init.shape[0]

    def step(carry, inputs):
        x, x0_pred, key = carry
        t_i, t_j, travel = inputs
        key, k_noise = split_key(key)
        at = alpha_bar[t_i + 1]
        at_next = alpha_bar[t_j + 1]
        noise = draw_noise(noise_fn, k_noise, x.shape)

        def normal(_):
            t_f = jnp.full((n,), t_i, dtype=jnp.float32)
            return body(params, x, y, t_f, at, at_next, noise, op_ctx)

        def travel_back(_):
            return _travel_step(x0_pred, at_next, noise), x0_pred

        x_next, x0_t = jax.lax.cond(travel, travel_back, normal, operand=None)
        return (x_next, x0_t, key), None

    (x, x0_pred, _), _ = jax.lax.scan(
        step, (x_init, jnp.zeros_like(x_init), key), _scan_inputs(sched)
    )
    return x, x0_pred


@partial(jax.jit, static_argnames=("body", "noise_fn"))
def _host_step(body, noise_fn, params, x, y, key, t_i, at, at_next,
               op_ctx=None):
    n = x.shape[0]
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    t_f = jnp.full((n,), t_i, dtype=jnp.float32)
    x_next, x0_t = body(params, x, y, t_f, at, at_next, noise, op_ctx)
    return x_next, x0_t, key


@partial(jax.jit, static_argnames=("noise_fn",))
def _host_travel(noise_fn, x0_pred, key, at_next):
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x0_pred.shape)
    return _travel_step(x0_pred, at_next, noise), key


def _run_host(body, noise_fn, params, x_init, y, sched: DDNMSchedule, key,
              op_ctx=None):
    """Host-driven loop: one async jitted dispatch per step.

    The schedule is static numpy, so the travel branch is a *Python* branch
    — travel steps never trace the model. RNG-key carry order matches the
    scan driver exactly, so both drivers produce numerically equivalent trajectories (fp32-rounding-level differences from XLA fusion order).
    """
    abar = np.asarray(sched.alpha_bar)
    x, x0_pred = x_init, jnp.zeros_like(x_init)
    for t_i, t_j, travel in zip(sched.t_cur, sched.t_next, sched.is_travel):
        at = float(abar[int(t_i) + 1])
        at_next = float(abar[int(t_j) + 1])
        if bool(travel):
            x, key = _host_travel(noise_fn, x0_pred, key, at_next)
        else:
            x, x0_pred, key = _host_step(
                body, noise_fn, params, x, y, key, float(t_i), at, at_next,
                op_ctx,
            )
    return x, x0_pred


def _drive(loop, body, noise_fn, params, x_init, y, sched, key, op_ctx=None):
    if _resolve_loop(loop, params) == "scan":
        return _run_scan(body, noise_fn, params, x_init, y, sched, key, op_ctx)
    return _run_host(body, noise_fn, params, x_init, y, sched, key, op_ctx)


# ----------------------------------------------------------------- public API


def sample_simplified(
    model_fn: ModelFn,
    x_init: Array,
    y: Array,
    operator: FunctionalOperator,
    sched: DDNMSchedule,
    key: jax.Array,
    *,
    eta: float = 0.85,
    sigma_y: float = 0.0,
    noise_fn: NoiseFn = _default_noise,
    loop: str = "auto",
    params=None,
    op_ctx=None,
    solver: str = "ddim",
) -> tuple[Array, Array]:
    """Simplified DDNM+ over NHWC images. Returns (x_final, x0_pred_final).

    `sigma_y` here is the *scaled* measurement noise (the runner doubles the
    CLI value to account for [-1,1] scaling, diffusion.py:294).

    `params`: optional pytree passed to model_fn as its first argument
    (model_fn(params, x, t)); REQUIRED for large models on remote-compile
    backends so weights travel as jit arguments, not HLO constants.

    `op_ctx`: runtime operator context for context-parameterised operators
    (FunctionalOperator.A_ctx), e.g. a (B, H, W, 1) per-image mask batch —
    every step projects through A_ctx/Ap_ctx with this tensor instead of
    the operator's baked static forms. One compiled executable serves any
    mask; with ctx == the static mask the trajectories are identical.

    `solver`: "ddim" (the reference's first-order update, default) or
    "multistep" (second-order, deterministic, noise-free only — `eta` is
    ignored; see sampling/solvers.py).
    """
    if solver == "multistep":
        from ddnm_tpu.sampling.solvers import sample_simplified_multistep

        if sigma_y != 0.0:
            raise ValueError(
                "solver='multistep' is deterministic and supports "
                "noise-free DDNM only (sigma_y == 0); the noisy DDNM+ "
                "gamma_t noise injection is tied to the DDIM kernel"
            )
        return sample_simplified_multistep(
            model_fn, x_init, y, operator, sched, key, noise_fn=noise_fn,
            loop=loop, params=params, op_ctx=op_ctx,
        )
    if solver != "ddim":
        raise ValueError(f"unknown solver {solver!r} (ddim | multistep)")
    if op_ctx is not None and not operator.has_ctx:
        raise ValueError(
            f"operator {operator.name!r} has no A_ctx/Ap_ctx forms; "
            "op_ctx requires a context-parameterised operator"
        )
    body = _Body(_simplified_body, (model_fn, operator, eta, sigma_y))
    return _drive(loop, body, noise_fn, params, x_init, y, sched, key, op_ctx)


def sample_svd(
    model_fn: ModelFn,
    x_init: Array,
    y: Array,
    operator: SVDOperator,
    sched: DDNMSchedule,
    key: jax.Array,
    *,
    eta: float = 0.85,
    sigma_y: float = 0.0,
    noise_fn: NoiseFn = _default_noise,
    guidance_fn: Optional[Callable] = None,
    loop: str = "auto",
    params=None,
    solver: str = "ddim",
) -> tuple[Array, Array]:
    """SVD-mode DDNM (sigma_y == 0) / DDNM+ (sigma_y > 0) over NHWC images.

    `y` is the measurement in the operator's flattened layout (B, M).
    `guidance_fn(x, t, at) -> eps_correction` implements classifier guidance
    (svd_ddnm.py:49-52): et <- et - sqrt(1-at) * grad log p(y|x). When
    `params` is given, model_fn and guidance_fn receive it as their first
    argument (see sample_simplified).

    INTENTIONAL DIVERGENCE: the reference evaluates cls_fn on the sampler's
    *initial noise* argument every step (svd_ddnm.py:52 passes `x`, which is
    never reassigned, instead of `xt`) — an apparent bug that freezes the
    guidance signal. We follow the reference's own hq pipeline instead
    (condition on the current state, hq_demo gaussian_diffusion.py:423),
    which is also what the guided-diffusion upstream does.

    `solver`: "ddim" (reference parity, default) or "multistep"
    (second-order, noise-free only — see sample_simplified).
    """
    if solver == "multistep":
        from ddnm_tpu.sampling.solvers import sample_svd_multistep

        if sigma_y != 0.0:
            raise ValueError(
                "solver='multistep' is deterministic and supports "
                "noise-free DDNM only (sigma_y == 0)"
            )
        return sample_svd_multistep(
            model_fn, x_init, y, operator, sched, key, noise_fn=noise_fn,
            guidance_fn=guidance_fn, loop=loop, params=params,
        )
    if solver != "ddim":
        raise ValueError(f"unknown solver {solver!r} (ddim | multistep)")
    body = _Body(_svd_body, (model_fn, operator, eta, sigma_y, guidance_fn))
    y_spec = operator.prepare_measurement(y)
    return _drive(loop, body, noise_fn, params, x_init, y_spec, sched, key)
