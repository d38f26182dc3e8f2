"""Encoder-propagation acceleration (OPT-IN, approximate).

Implements the "Faster Diffusion" observation (Li et al., arXiv 2312.09608,
listed in PAPERS.md): a diffusion UNet's encoder features change slowly
across adjacent timesteps, so at non-key steps the cached encoder output
(bottleneck h + skip list) from the last key step can be reused and only
the decoder runs — with a fresh time embedding, so timestep conditioning in
the decoder stays exact.

This is an APPROXIMATION: outputs differ from the exact sampler (with
`interval=1` it reduces to the exact host-loop sampler, tested bitwise).
The reference framework has no counterpart. Quality impact should be
validated per checkpoint before production use — we deliberately ship it
off-by-default and unvalidated on real weights (none are reachable in this
build environment).

Measured speedup (v5e, CelebA UNet, batch 8, 100 steps): ~10-12% at
interval 3 (2.41 -> 2.69 img/s). Modest because this UNet is decoder-heavy
(the up path has num_res_blocks+1 blocks per level on concatenated
channels, so the skipped encoder is only ~1/3 of FLOPs); the technique
pays more on encoder-heavy text-to-image UNets, which is the paper's
setting.

Key-step placement: by default the cache refreshes every `interval`-th
model call (uniform — the obvious baseline). `key_steps` instead pins the
full forwards to explicit model-call indices; `measure_feature_drift` +
`select_key_steps` calibrate that set from the ACTUAL encoder-feature
drift of one exact trajectory (the paper selects key timesteps from
observed feature dynamics, Sec. 3.2) — refreshes then concentrate where
the features genuinely move. A schedule-only proxy (refresh by |Δᾱ|
drift) was tried and measured CATASTROPHICALLY bad on the trained-toy
harness (-49 dB: ᾱ barely moves at the high-noise end of the trajectory
exactly where x_t moves most), which is why calibration uses measured
drift, not the noise schedule. Results in docs/PERFORMANCE.md;
tools/experiments/encoder_cache_policies.py reproduces.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu.sampling.rng import draw_noise, split_key
from ddnm_tpu.sampling.ddnm import (
    DDNMSchedule,
    _default_noise,
    _simplified_update,
    _travel_step,
)

__all__ = [
    "sample_simplified_encoder_prop",
    "sample_posterior_encoder_prop",
    "ddpm_split_fns",
    "adm_split_fns",
    "measure_feature_drift",
    "select_key_steps",
    "key_steps_end_dense",
    "n_model_calls",
]


def n_model_calls(is_travel) -> int:
    """Model calls per trajectory (non-travel steps) — the key_steps domain.

    Shared by the runner and the tiling engine so the domain definition
    cannot drift between them."""
    return int(np.sum(~np.asarray(is_travel, bool)))


def key_steps_end_dense(n_calls: int, n_keys: int, exact_tail=None) -> list:
    """End-weighted key schedule: run the LAST `exact_tail` model calls
    exact (full forwards) and spread the remaining budget uniformly over
    the head. Default exact_tail = n_keys // 2.

    Rationale (measured, tools/experiments/encoder_cache_policies.py): on
    a trained DDPM the cached-encoder error is benign at the high-noise
    start of the trajectory but fatal near the end where the image forms —
    the binding constraints are an exact tail and a bounded head gap, not
    uniform spacing and not encoder-feature drift. On the trained-toy
    harness this schedule holds EXACT-sampler PSNR at 25/100 full
    forwards, where uniform k=2 (50/100) already loses 3 dB and k=3 loses
    20 dB. Validate per checkpoint; the cliff below the critical budget is
    sharp."""
    if not 1 <= n_keys <= n_calls:
        raise ValueError(f"n_keys must be in [1, {n_calls}], got {n_keys}")
    if exact_tail is None:
        exact_tail = n_keys // 2
    exact_tail = int(min(exact_tail, n_keys - 1, n_calls - 1))
    tail = list(range(n_calls - exact_tail, n_calls))
    head_budget = n_keys - exact_tail
    head = np.linspace(0, n_calls - exact_tail - 1, head_budget).astype(int)
    return sorted(set([0]) | set(int(i) for i in head) | set(tail))


def _make_key_pred(interval: int, key_steps):
    """`is_key(segment_call, global_call) -> bool`.

    Default: uniform — every `interval`-th call since the segment start (a
    segment restarts after each time-travel jump). With `key_steps`, a set
    of GLOBAL model-call indices pins the full forwards instead (jump
    invalidation still forces a full step at each segment start).
    interval == 1 is always-full (the exactness contract) — passing
    key_steps alongside it is contradictory and raises rather than
    silently dropping the exactness guarantee."""
    if key_steps is not None:
        if interval == 1:
            raise ValueError(
                "interval=1 guarantees the exact sampler; passing key_steps "
                "with it is contradictory (drop key_steps or use interval>1)"
            )
        keys = frozenset(int(k) for k in key_steps)
        return lambda seg_call, glob_call: glob_call in keys
    if interval == 1:
        return lambda seg_call, glob_call: True
    return lambda seg_call, glob_call: seg_call % interval == 0


def key_steps_for_policy(n_calls: int, interval: int, policy) -> list | None:
    """CLI-facing dispatch: None (uniform predicate) or the end-dense set
    at the uniform policy's budget (ceil(n_calls / interval))."""
    if interval <= 1 or policy in (None, "uniform"):
        return None
    if policy != "end_dense":
        raise ValueError(
            f"encoder-cache policy must be 'uniform' or 'end_dense', "
            f"got {policy!r}"
        )
    return key_steps_end_dense(n_calls, -(-n_calls // interval))


def measure_feature_drift(encode_fn, decode_fn, x_init, y, operator, sched,
                          key, *, eta: float = 0.85, sigma_y: float = 0.0,
                          noise_fn=_default_noise, params=None) -> np.ndarray:
    """Per-model-call encoder-feature drift of one EXACT trajectory.

    Runs the full sampler (every step a full forward) and returns
    drift[i] = mean relative change of the encoder bottleneck between
    model call i-1 and i (drift[0] = 0). This is the paper's observable:
    where drift is small, caching is safe. Calibrate once per
    (checkpoint, task, schedule) on a representative batch, then pass
    `select_key_steps(drift, n_keys)` to the sampler."""
    abar = np.asarray(sched.alpha_bar)
    x, x0_pred = x_init, jnp.zeros_like(x_init)
    prev = None
    drifts = []
    for t_i, t_j, travel in zip(sched.t_cur, sched.t_next, sched.is_travel):
        at = float(abar[int(t_i) + 1])
        at_next = float(abar[int(t_j) + 1])
        if bool(travel):
            x, key = _travel(noise_fn, x0_pred, key, at_next)
            continue
        x, x0_pred, cache, key = _key_step(
            encode_fn, decode_fn, operator, eta, sigma_y, noise_fn,
            params, x, y, key, float(t_i), at, at_next,
        )
        h = np.asarray(cache[0], np.float32).ravel()
        if prev is None:
            drifts.append(0.0)
        else:
            denom = float(np.linalg.norm(prev)) or 1.0
            drifts.append(float(np.linalg.norm(h - prev)) / denom)
        prev = h
    return np.asarray(drifts, np.float64)


def select_key_steps(drift: np.ndarray, n_keys: int) -> list:
    """Pick `n_keys` global model-call indices for `key_steps` from a
    measured drift profile: walk the trajectory accumulating drift and
    start a new cache window whenever the accumulated drift exceeds an
    equal-budget threshold (bisected so the number of windows is exactly
    `n_keys`). Step 0 is always a key step."""
    drift = np.asarray(drift, np.float64)
    n = len(drift)
    if not 1 <= n_keys <= n:
        raise ValueError(f"n_keys must be in [1, {n}], got {n_keys}")

    def windows(thr):
        keys, acc = [0], 0.0
        for i in range(1, n):
            acc += drift[i]
            if acc > thr:
                keys.append(i)
                acc = 0.0
        return keys

    lo, hi = 0.0, float(drift.sum()) + 1.0
    for _ in range(80):
        mid = (lo + hi) / 2
        if len(windows(mid)) > n_keys:
            lo = mid
        else:
            hi = mid
    keys = windows(hi)
    # bisection can land under budget on plateaus; fill with the largest
    # remaining single-step drifts
    if len(keys) < n_keys:
        have = set(keys)
        extra = [i for i in np.argsort(-drift) if i not in have]
        keys = sorted(have | set(int(i) for i in extra[: n_keys - len(keys)]))
    return [int(k) for k in keys]


def _ddpm_encode(mdl, x, t):
    """DDPMUNet encoder half: (h, skips) — the cacheable pair."""
    temb = mdl.time_embed(t)
    h, hs = mdl.encode(x, temb)
    return h, tuple(hs)


def _ddpm_decode(mdl, h, hs, t, dtype):
    """DDPMUNet decoder half with a FRESH time embedding."""
    temb = mdl.time_embed(t)
    return mdl.decode(h, list(hs), temb, orig_dtype=dtype)


def ddpm_split_fns(model):
    """(encode_fn, decode_fn) for a DDPMUNet, matching the
    sample_posterior_encoder_prop contract: `encode_fn(params, x, t) ->
    cache`, `decode_fn(params, cache, x, t) -> eps`. Build ONCE per model
    and reuse — the returned closures are jit static arguments."""

    def encode_fn(params, x, t):
        return model.apply(params, x, t, method=_ddpm_encode)

    def decode_fn(params, cache, x, t):
        return model.apply(params, cache[0], cache[1], t, x.dtype,
                           method=_ddpm_decode)

    return encode_fn, decode_fn


def adm_split_fns(model, label=None):
    """(encode_fn, decode_fn) for an ADMUNet via its mode="encode"/"decode"
    forward splits (models/unet_adm.py). `label`: optional int class label,
    broadcast to the batch (class-conditional models). Build ONCE per model
    and reuse — the returned closures are jit static arguments."""

    def _y(x):
        if label is None:
            return None
        return jnp.full((x.shape[0],), label, dtype=jnp.int32)

    def encode_fn(params, x, t):
        return model.apply(params, x, t, _y(x), mode="encode")

    def decode_fn(params, cache, x, t):
        return model.apply(params, x, t, _y(x), mode="decode", cache=cache)

    return encode_fn, decode_fn


def _eps_of(out, x):
    """Strip a learn-sigma head: (B,H,W,2C) -> eps (mirrors ddnm._call_model)."""
    c = x.shape[-1]
    return out[..., :c] if out.shape[-1] == 2 * c else out


@partial(jax.jit, static_argnames=(
    "encode_fn", "decode_fn", "operator", "eta", "sigma_y", "noise_fn",
    "has_ctx"))
def _key_step(encode_fn, decode_fn, operator, eta, sigma_y, noise_fn, params,
              x, y, key, t_f, at, at_next, op_ctx=None, has_ctx=False):
    """Full forward: run encoder + decoder, return the encoder cache."""
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    t_b = jnp.full((x.shape[0],), t_f, jnp.float32)
    cache = encode_fn(params, x, t_b)
    et = _eps_of(decode_fn(params, cache, x, t_b), x)
    x_next, x0_t = _simplified_update(
        operator, eta, sigma_y, x, y, et, at, at_next, noise,
        op_ctx if has_ctx else None)
    return x_next, x0_t, cache, key


@partial(jax.jit, static_argnames=(
    "decode_fn", "operator", "eta", "sigma_y", "noise_fn", "has_ctx"))
def _cached_step(decode_fn, operator, eta, sigma_y, noise_fn, params, x, y,
                 cache, key, t_f, at, at_next, op_ctx=None, has_ctx=False):
    """Decoder-only forward from the cached encoder features."""
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    t_b = jnp.full((x.shape[0],), t_f, jnp.float32)
    et = _eps_of(decode_fn(params, cache, x, t_b), x)
    x_next, x0_t = _simplified_update(
        operator, eta, sigma_y, x, y, et, at, at_next, noise,
        op_ctx if has_ctx else None)
    return x_next, x0_t, key


@partial(jax.jit, static_argnames=("noise_fn",))
def _travel(noise_fn, x0_pred, key, at_next):
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x0_pred.shape)
    return _travel_step(x0_pred, at_next, noise), key


def sample_simplified_encoder_prop(
    encode_fn,
    decode_fn,
    x_init,
    y,
    operator,
    sched: DDNMSchedule,
    key: jax.Array,
    *,
    eta: float = 0.85,
    sigma_y: float = 0.0,
    interval: int = 3,
    key_steps=None,
    noise_fn=_default_noise,
    params=None,
    op_ctx=None,
):
    """Simplified DDNM+ with encoder features reused for `interval-1` of
    every `interval` model calls. `encode_fn(params, x, t) -> cache`,
    `decode_fn(params, cache, x, t) -> eps` (a learn-sigma 2C head is
    sliced automatically) — build the pair with `ddpm_split_fns` /
    `adm_split_fns`. Host-driven loop. `key_steps` (optional) pins the
    full forwards to explicit global model-call indices instead of the
    uniform interval — calibrate with `measure_feature_drift` +
    `select_key_steps` (see module docstring). `op_ctx` as in
    sample_simplified: runtime operator context (e.g. a (B,H,W,1)
    per-image mask batch) routed through A_ctx/Ap_ctx each step.

    interval=1 is exactly the standard host-loop sampler (tested)."""
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    if op_ctx is not None and not getattr(operator, "has_ctx", False):
        # getattr: SVD operators don't define has_ctx; misuse should get
        # this clear error, not an AttributeError (ADVICE r2)
        raise ValueError(
            f"operator {operator.name!r} has no A_ctx/Ap_ctx forms; "
            "op_ctx requires a context-parameterised functional operator"
        )
    has_ctx = op_ctx is not None
    if not has_ctx:
        op_ctx = jnp.zeros((), jnp.float32)
    is_key = _make_key_pred(interval, key_steps)
    abar = np.asarray(sched.alpha_bar)
    x, x0_pred = x_init, jnp.zeros_like(x_init)
    cache = None
    seg_call = glob_call = 0
    for t_i, t_j, travel in zip(sched.t_cur, sched.t_next, sched.is_travel):
        at = float(abar[int(t_i) + 1])
        at_next = float(abar[int(t_j) + 1])
        if bool(travel):
            x, key = _travel(noise_fn, x0_pred, key, at_next)
            # a time-travel jump breaks the adjacent-timestep premise:
            # invalidate the cache so a key (full) step follows every jump
            cache, seg_call = None, 0
            continue
        if cache is None or is_key(seg_call, glob_call):
            x, x0_pred, cache, key = _key_step(
                encode_fn, decode_fn, operator, eta, sigma_y, noise_fn,
                params, x, y, key, float(t_i), at, at_next,
                op_ctx, has_ctx=has_ctx,
            )
        else:
            x, x0_pred, key = _cached_step(
                decode_fn, operator, eta, sigma_y, noise_fn, params, x, y,
                cache, key, float(t_i), at, at_next,
                op_ctx, has_ctx=has_ctx,
            )
        seg_call += 1
        glob_call += 1
    return x, x0_pred


# ---------------------------------------------------------------------------
# Posterior (hq / ADM) encoder propagation
# ---------------------------------------------------------------------------
# Same Faster-Diffusion idea applied to the hq posterior sampler: the ADM
# UNet exposes mode="encode"/"decode" splits (models/unet_adm.py ADMUNet);
# build the (encode_fn, decode_fn) pair with adm_split_fns / ddpm_split_fns
# above. Host-driven loop; interval=1 is exactly the standard host-loop
# posterior sampler (tested).

from ddnm_tpu.sampling.posterior import (  # noqa: E402
    PosteriorTables,
    _host_scalars,
    _host_undo,
    _posterior_update,
    _undo_beta,
)


@partial(jax.jit, static_argnames=(
    "encode_fn", "decode_fn", "operator", "guidance_fn", "clip_denoised",
    "noise_fn", "has_paste", "has_ctx"))
def _p_key_step(encode_fn, decode_fn, operator, guidance_fn, clip_denoised,
                noise_fn, has_paste, has_ctx, params, x, apy, paste_mask,
                paste_content, op_ctx, key, t_orig, sqrt_recip, sqrt_recipm1,
                lam, coef1, coef2, gamma, nonzero):
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    t_b = jnp.full((x.shape[0],), t_orig, dtype=jnp.float32)
    cache = encode_fn(params, x, t_b)
    out = decode_fn(params, cache, x, t_b)
    x_next, x0_hat = _posterior_update(
        operator, guidance_fn, clip_denoised, params, x, apy,
        paste_mask if has_paste else None,
        paste_content if has_paste else None,
        noise, out, t_b, sqrt_recip, sqrt_recipm1, lam, coef1, coef2, gamma,
        nonzero, op_ctx if has_ctx else None,
    )
    return x_next, x0_hat, cache, key


@partial(jax.jit, static_argnames=(
    "decode_fn", "operator", "guidance_fn", "clip_denoised", "noise_fn",
    "has_paste", "has_ctx"))
def _p_cached_step(decode_fn, operator, guidance_fn, clip_denoised, noise_fn,
                   has_paste, has_ctx, params, x, apy, paste_mask,
                   paste_content, op_ctx, cache, key, t_orig, sqrt_recip,
                   sqrt_recipm1, lam, coef1, coef2, gamma, nonzero):
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    t_b = jnp.full((x.shape[0],), t_orig, dtype=jnp.float32)
    out = decode_fn(params, cache, x, t_b)
    x_next, x0_hat = _posterior_update(
        operator, guidance_fn, clip_denoised, params, x, apy,
        paste_mask if has_paste else None,
        paste_content if has_paste else None,
        noise, out, t_b, sqrt_recip, sqrt_recipm1, lam, coef1, coef2, gamma,
        nonzero, op_ctx if has_ctx else None,
    )
    return x_next, x0_hat, key


def sample_posterior_encoder_prop(
    encode_fn,
    decode_fn,
    x_init,
    apy,
    operator,
    tables: PosteriorTables,
    key,
    *,
    interval: int = 3,
    key_steps=None,
    paste_mask=None,
    paste_content=None,
    guidance_fn=None,
    clip_denoised: bool = True,
    noise_fn=_default_noise,
    params=None,
    op_ctx=None,
):
    """Posterior DDNM with encoder features reused for `interval-1` of every
    `interval` model calls (see module docstring; APPROXIMATE for
    interval > 1). `encode_fn(params, x, t) -> cache`,
    `decode_fn(params, cache, x, t) -> (B,H,W,2C)`. RNG-key carry order
    matches sample_posterior's host driver, so interval=1 is bit-identical.
    `key_steps` pins the full forwards to explicit global model-call
    indices (see module docstring). `op_ctx` as in sample_posterior.
    """
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    if op_ctx is not None and not getattr(operator, "has_ctx", False):
        raise ValueError(
            f"operator {operator.name!r} has no A_ctx/Ap_ctx forms; "
            "op_ctx requires a context-parameterised functional operator"
        )
    is_key = _make_key_pred(interval, key_steps)
    has_paste = paste_mask is not None
    has_ctx = op_ctx is not None
    if not has_paste:
        paste_mask = jnp.zeros((), jnp.float32)
        paste_content = jnp.zeros((), jnp.float32)
    if not has_ctx:
        op_ctx = jnp.zeros((), jnp.float32)
    tbl = tables
    x, x0_hat = x_init, jnp.zeros_like(x_init)
    cache = None
    seg_call = glob_call = 0
    for t, travel in zip(tbl.t_cur, tbl.is_travel):
        t = int(t)
        if bool(travel):
            x, key = _host_undo(noise_fn, x, key, _undo_beta(tbl, t))
            # invalidate across time-travel jumps (see simplified variant)
            cache, seg_call = None, 0
            continue
        scalars = _host_scalars(tbl, t)
        if cache is None or is_key(seg_call, glob_call):
            x, x0_hat, cache, key = _p_key_step(
                encode_fn, decode_fn, operator, guidance_fn, clip_denoised,
                noise_fn, has_paste, has_ctx, params, x, apy, paste_mask,
                paste_content, op_ctx, key, *scalars,
            )
        else:
            x, x0_hat, key = _p_cached_step(
                decode_fn, operator, guidance_fn, clip_denoised, noise_fn,
                has_paste, has_ctx, params, x, apy, paste_mask,
                paste_content, op_ctx, cache, key, *scalars,
            )
        seg_call += 1
        glob_call += 1
    return x, x0_hat
