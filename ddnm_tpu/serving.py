"""Serving export: serialize the jitted DDNM step as a portable artifact.

Production deployments serve compiled programs, not Python. This module
exports the sampling step (UNet forward + DDNM projection + DDIM update)
through `jax.export` into a self-contained serialized StableHLO function
that any JAX runtime (same or newer jaxlib, matching platform) can
deserialize and call without the ddnm_tpu Python stack — the TPU-native
equivalent of shipping a TorchScript/ONNX file.

The exported step has signature
(params, x, y, key, t, at, at_next) -> (x_next, x0_prediction)
with a fixed batch/shape; export per deployment shape (static shapes are a
feature: the serving binary never retraces).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp

from ddnm_tpu.operators.functional import FunctionalOperator
from ddnm_tpu.sampling.ddnm import _simplified_body
from ddnm_tpu.sampling.posterior import _posterior_body

__all__ = [
    "export_simplified_step",
    "export_simplified_trajectory",
    "export_posterior_step",
    "export_posterior_trajectory",
    "load_exported",
]


def export_simplified_step(
    model_fn: Callable,
    params,
    operator: FunctionalOperator,
    *,
    batch: int,
    image_size: int,
    y_shape: tuple,
    eta: float = 0.85,
    sigma_y: float = 0.0,
    platforms: tuple[str, ...] | None = None,
    path: str | Path | None = None,
) -> bytes:
    """Serialize one simplified-DDNM step for serving.

    model_fn(params, x, t) -> eps. Returns the serialized bytes (and writes
    them to `path` when given). `platforms` defaults to the current backend;
    pass ("tpu", "cpu") to produce a multi-platform artifact.
    """

    def step(params, x, y, key, t, at, at_next):
        noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
        t_b = jnp.full((x.shape[0],), t, dtype=jnp.float32)
        x_next, x0 = _simplified_body(
            model_fn, operator, eta, sigma_y, params, x, y, t_b, at, at_next, noise
        )
        return x_next, x0

    scalar = jax.ShapeDtypeStruct((), jnp.float32)
    args = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32),
        jax.ShapeDtypeStruct(y_shape, jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),  # raw PRNG key
        scalar,
        scalar,
        scalar,
    )
    exp = jax.export.export(
        jax.jit(step),
        platforms=list(platforms) if platforms else None,
    )(*args)
    blob = exp.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def export_simplified_trajectory(
    model_fn: Callable,
    params,
    operator: FunctionalOperator,
    sched,
    *,
    batch: int,
    image_size: int,
    y_shape: tuple,
    eta: float = 0.85,
    sigma_y: float = 0.0,
    per_image_keys: bool = False,
    platforms: tuple[str, ...] | None = None,
    path: str | Path | None = None,
) -> bytes:
    """Serialize the WHOLE simplified-DDNM trajectory as one artifact.

    Where `export_simplified_step` ships one step and leaves the (host-
    side, data-independent) schedule to the serving process, this exports
    the complete `lax.scan` over the jump schedule — signature
    (params, x_init, y, key) -> (x_final, x0_pred) — with the schedule
    tables baked in as constants (a few hundred floats). One call restores
    a batch end-to-end: the deployment shape for directly-attached
    production TPUs, where the serving runtime should do nothing but feed
    requests (no Python schedule driving, no per-step dispatch).

    `sched` is a DDNMSchedule (`sampling.build_schedule`). With
    `per_image_keys=True` the key argument is a (batch, 2) raw-uint32 key
    batch and every image gets its own noise stream (what the online
    server uses — outputs independent of batch composition); otherwise a
    single (2,) key is shared by the whole batch (the reference's
    torch.randn_like semantics, diffusion.py:384).
    """
    from ddnm_tpu.sampling import sample_simplified

    def traj(params, x_init, y, key):
        return sample_simplified(
            model_fn, x_init, y, operator, sched, key,
            eta=eta, sigma_y=sigma_y, loop="scan", params=params,
        )

    key_shape = (batch, 2) if per_image_keys else (2,)
    args = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32),
        jax.ShapeDtypeStruct(y_shape, jnp.float32),
        jax.ShapeDtypeStruct(key_shape, jnp.uint32),
    )
    exp = jax.export.export(
        jax.jit(traj),
        platforms=list(platforms) if platforms else None,
    )(*args)
    blob = exp.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def export_posterior_step(
    model_fn: Callable,
    params,
    operator: FunctionalOperator,
    *,
    batch: int,
    image_size: int,
    clip_denoised: bool = True,
    with_ctx: bool = False,
    platforms: tuple[str, ...] | None = None,
    path: str | Path | None = None,
) -> bytes:
    """Serialize one posterior-DDNM step (the hq pipeline's inner step,
    sampling/posterior.py) for serving.

    model_fn(params, x, t_orig[B]) -> (B,H,W,2C) learned-range ADM head.
    The exported step has signature
    (params, x, apy, key, t_orig, sqrt_recip, sqrt_recipm1, lam, coef1,
     coef2, gamma, nonzero) -> (x_next, x0_hat) — the per-timestep scalars
    come from `build_posterior_tables`; the serving process drives the
    jump schedule host-side exactly like `sample_posterior(loop="host")`.
    Guidance and mask-shift pasting are tiling/CLI concerns and are not
    part of the serving artifact. `with_ctx=True` (context-parameterised
    operators, e.g. per-tile masks) appends an (B,H,W,1) `op_ctx` tensor
    to the signature, between `apy` and `key`.
    """
    if with_ctx and not operator.has_ctx:
        raise ValueError("with_ctx=True needs an operator with A_ctx/Ap_ctx")

    if with_ctx:
        def step(params, x, apy, op_ctx, key, t_orig, sqrt_recip,
                 sqrt_recipm1, lam, coef1, coef2, gamma, nonzero):
            noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
            return _posterior_body(
                model_fn, operator, None, clip_denoised, params, x, apy,
                None, None, noise, t_orig, sqrt_recip, sqrt_recipm1, lam,
                coef1, coef2, gamma, nonzero, op_ctx,
            )
    else:
        def step(params, x, apy, key, t_orig, sqrt_recip, sqrt_recipm1, lam,
                 coef1, coef2, gamma, nonzero):
            noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
            return _posterior_body(
                model_fn, operator, None, clip_denoised, params, x, apy,
                None, None, noise, t_orig, sqrt_recip, sqrt_recipm1, lam,
                coef1, coef2, gamma, nonzero,
            )

    scalar = jax.ShapeDtypeStruct((), jnp.float32)
    img = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32)
    ctx = (jax.ShapeDtypeStruct((batch, image_size, image_size, 1),
                                jnp.float32),) if with_ctx else ()
    args = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        img,
        img,
    ) + ctx + (
        jax.ShapeDtypeStruct((2,), jnp.uint32),  # raw PRNG key
    ) + (scalar,) * 8
    exp = jax.export.export(
        jax.jit(step),
        platforms=list(platforms) if platforms else None,
    )(*args)
    blob = exp.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def export_posterior_trajectory(
    model_fn: Callable,
    params,
    operator: FunctionalOperator,
    tables,
    *,
    batch: int,
    image_size: int,
    clip_denoised: bool = True,
    with_paste: bool = False,
    with_ctx: bool = False,
    per_image_keys: bool = False,
    platforms: tuple[str, ...] | None = None,
    path: str | Path | None = None,
) -> bytes:
    """Serialize the WHOLE posterior (hq) jump-schedule loop as one artifact.

    The Mask-Shift inner loop — respaced posterior DDNM with time-travel —
    as a single exported scan with the `build_posterior_tables` tables
    baked in. Signature (params, x_init, apy[, paste_mask, paste_content]
    [, op_ctx], key) -> (x_final, x0_hat): exactly `sample_posterior
    (loop="scan")`, so a deployment runs one call per tile/batch.

    `with_paste` adds the Mask-Shift overlap-consistency inputs
    (tile-shaped paste mask + content); `with_ctx` adds the runtime
    operator-context tensor (e.g. per-tile/per-request keep-masks); both
    are traced inputs, so one artifact serves every tile position and
    mask. Classifier guidance closes over Python callables and is not
    exportable — bake it into `model_fn` if needed.
    """
    if with_ctx and not operator.has_ctx:
        raise ValueError("with_ctx=True needs an operator with A_ctx/Ap_ctx")

    from ddnm_tpu.sampling.posterior import sample_posterior

    if with_paste and with_ctx:
        def traj(params, x_init, apy, paste_mask, paste_content, op_ctx, key):
            return sample_posterior(
                model_fn, x_init, apy, operator, tables, key,
                paste_mask=paste_mask, paste_content=paste_content,
                op_ctx=op_ctx, clip_denoised=clip_denoised, loop="scan",
                params=params)
    elif with_paste:
        def traj(params, x_init, apy, paste_mask, paste_content, key):
            return sample_posterior(
                model_fn, x_init, apy, operator, tables, key,
                paste_mask=paste_mask, paste_content=paste_content,
                clip_denoised=clip_denoised, loop="scan", params=params)
    elif with_ctx:
        def traj(params, x_init, apy, op_ctx, key):
            return sample_posterior(
                model_fn, x_init, apy, operator, tables, key, op_ctx=op_ctx,
                clip_denoised=clip_denoised, loop="scan", params=params)
    else:
        def traj(params, x_init, apy, key):
            return sample_posterior(
                model_fn, x_init, apy, operator, tables, key,
                clip_denoised=clip_denoised, loop="scan", params=params)

    img = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32)
    one = jax.ShapeDtypeStruct((batch, image_size, image_size, 1), jnp.float32)
    # paste_mask is single-plane, matching what the tiling engine feeds
    # sample_posterior (tiling.py:280); paste_content is a full RGB tile
    paste = (one, img) if with_paste else ()
    ctx = (one,) if with_ctx else ()
    key_shape = (batch, 2) if per_image_keys else (2,)
    args = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        img,
        img,
    ) + paste + ctx + (jax.ShapeDtypeStruct(key_shape, jnp.uint32),)
    exp = jax.export.export(
        jax.jit(traj),
        platforms=list(platforms) if platforms else None,
    )(*args)
    blob = exp.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def load_exported(blob_or_path):
    """Deserialize an exported step; returns a callable `Exported.call`."""
    if isinstance(blob_or_path, (str, Path)):
        blob = Path(blob_or_path).read_bytes()
    else:
        blob = bytes(blob_or_path)
    exp = jax.export.deserialize(blob)
    return exp.call
