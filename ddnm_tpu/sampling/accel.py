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
]


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
    "encode_fn", "decode_fn", "operator", "eta", "sigma_y", "noise_fn"))
def _key_step(encode_fn, decode_fn, operator, eta, sigma_y, noise_fn, params,
              x, y, key, t_f, at, at_next):
    """Full forward: run encoder + decoder, return the encoder cache."""
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    t_b = jnp.full((x.shape[0],), t_f, jnp.float32)
    cache = encode_fn(params, x, t_b)
    et = _eps_of(decode_fn(params, cache, x, t_b), x)
    x_next, x0_t = _simplified_update(operator, eta, sigma_y, x, y, et, at, at_next, noise)
    return x_next, x0_t, cache, key


@partial(jax.jit, static_argnames=(
    "decode_fn", "operator", "eta", "sigma_y", "noise_fn"))
def _cached_step(decode_fn, operator, eta, sigma_y, noise_fn, params, x, y,
                 cache, key, t_f, at, at_next):
    """Decoder-only forward from the cached encoder features."""
    key, k_noise = split_key(key)
    noise = draw_noise(noise_fn, k_noise, x.shape)
    t_b = jnp.full((x.shape[0],), t_f, jnp.float32)
    et = _eps_of(decode_fn(params, cache, x, t_b), x)
    x_next, x0_t = _simplified_update(operator, eta, sigma_y, x, y, et, at, at_next, noise)
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
    noise_fn=_default_noise,
    params=None,
):
    """Simplified DDNM+ with encoder features reused for `interval-1` of
    every `interval` model calls. `encode_fn(params, x, t) -> cache`,
    `decode_fn(params, cache, x, t) -> eps` (a learn-sigma 2C head is
    sliced automatically) — build the pair with `ddpm_split_fns` /
    `adm_split_fns`. Host-driven loop.

    interval=1 is exactly the standard host-loop sampler (tested)."""
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    abar = np.asarray(sched.alpha_bar)
    x, x0_pred = x_init, jnp.zeros_like(x_init)
    cache = None
    model_call = 0
    for t_i, t_j, travel in zip(sched.t_cur, sched.t_next, sched.is_travel):
        at = float(abar[int(t_i) + 1])
        at_next = float(abar[int(t_j) + 1])
        if bool(travel):
            x, key = _travel(noise_fn, x0_pred, key, at_next)
            # a time-travel jump breaks the adjacent-timestep premise:
            # invalidate the cache so a key (full) step follows every jump
            cache, model_call = None, 0
            continue
        if cache is None or model_call % interval == 0:
            x, x0_pred, cache, key = _key_step(
                encode_fn, decode_fn, operator, eta, sigma_y, noise_fn,
                params, x, y, key, float(t_i), at, at_next,
            )
        else:
            x, x0_pred, key = _cached_step(
                decode_fn, operator, eta, sigma_y, noise_fn, params, x, y,
                cache, key, float(t_i), at, at_next,
            )
        model_call += 1
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
    `op_ctx` as in sample_posterior.
    """
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
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
    model_call = 0
    for t, travel in zip(tbl.t_cur, tbl.is_travel):
        t = int(t)
        if bool(travel):
            x, key = _host_undo(noise_fn, x, key, _undo_beta(tbl, t))
            # invalidate across time-travel jumps (see simplified variant)
            cache, model_call = None, 0
            continue
        scalars = _host_scalars(tbl, t)
        if cache is None or model_call % interval == 0:
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
        model_call += 1
    return x, x0_hat
