"""PRNG-key plumbing shared by all samplers, with per-example key batches.

Samplers accept either ONE key (the whole batch shares a noise stream, the
reference's torch.randn_like semantics, diffusion.py:384) or a BATCH of
keys — shape (B,) typed keys / (B, 2) raw uint32 — giving every batch
element its own independent stream. Per-example keys make Mask-Shift
wavefront grouping schedule-independent under stochastic noise: a tile
draws the same noise whether it is sampled alone (sequential) or inside
any batch grouping (tiling.py passes per-tile keys), because
jax.random.normal's bit stream for a given key depends only on the
per-example element count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["is_key_batch", "split_key", "draw_noise", "default_noise"]


def default_noise(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


def is_key_batch(key) -> bool:
    """True if `key` carries a leading per-example batch axis."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim >= 1
    return key.ndim >= 2  # raw uint32 keys: scalar key is shape (2,)


def split_key(key):
    """jax.random.split(key, 2) that maps over a leading key-batch axis."""
    if is_key_batch(key):
        ks = jax.vmap(jax.random.split)(key)  # (B, 2[, key_data])
        return ks[:, 0], ks[:, 1]
    return jax.random.split(key)


def draw_noise(noise_fn, key, shape):
    """noise_fn over the full batch shape, or per-example under a key batch.

    With a key batch, element i gets noise_fn(key[i], shape[1:]) — the same
    values it would get in ANY other batch grouping (incl. batch 1)."""
    if is_key_batch(key):
        return jax.vmap(lambda k: noise_fn(k, shape[1:]))(key)
    return noise_fn(key, shape)
