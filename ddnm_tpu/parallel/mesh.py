"""Device mesh utilities for batch-sharded DDNM sampling."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "sharded_sampler"]

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over the first n devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) axis of every leaf across the data axis."""
    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate every leaf across the mesh (model parameters)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def sharded_sampler(sample_fn, mesh: Mesh):
    """Wrap a sampler so batch inputs are data-sharded and params replicated.

    `sample_fn(model_fn, x_init, y, operator, sched, key, **kw)` — the jitted
    samplers in ddnm_tpu.sampling propagate input shardings, so explicitly
    placing the inputs is all SPMD needs; XLA partitions the scan body
    (UNet + operator) across the mesh with no collectives in the hot loop.
    """

    def wrapped(model_fn, x_init, y, operator, sched, key, **kw):
        x_init = shard_batch(mesh, x_init)
        y = shard_batch(mesh, y)
        return sample_fn(model_fn, x_init, y, operator, sched, key, **kw)

    return wrapped
