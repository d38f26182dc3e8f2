"""Spatial partitioning (SP): shard the image H axis over a mesh axis.

The hq pipeline's reference-parity schedule is a SEQUENTIAL chain of
batch-1 256px tiles (gaussian_diffusion.py:665-748) — data parallelism
cannot cut its latency. The TPU answer is spatial partitioning: shard the
tile's height axis across chips and let XLA's SPMD partitioner insert the
conv halo exchanges and GroupNorm/attention cross-shard reductions
automatically. Convolutions dominate the UNet at 256px, and their halos
are thin (3x3 kernels -> 1-row halos per conv), so SP scales single-tile
latency nearly linearly on an ICI-connected slice; the small attention
grids (<=32x32 tokens) are gathered, which is cheap at that size.

Composes with data parallelism on a 2-D ("data", "spatial") mesh: batched
wavefront tile groups shard over "data", each tile's rows over "spatial".

No reference counterpart (the reference is single-device); validated on
the virtual CPU mesh (tests/test_parallel_spatial.py) and compiled in
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddnm_tpu.parallel.mesh import DATA_AXIS

__all__ = ["SPATIAL_AXIS", "make_mesh_2d", "shard_tiles"]

SPATIAL_AXIS = "spatial"

logger = logging.getLogger("ddnm_tpu")
_warned: set = set()  # (axis, n_shards, dim) combos already reported


def _warn_once(axis: str, n: int, dim: int):
    key = (axis, n, dim)
    if key not in _warned:
        _warned.add(key)
        logger.warning(
            "mesh axis %r (size %d) does not divide dimension %d — leaf "
            "replicated on that axis (no speedup from those chips)",
            axis, n, dim,
        )


def make_mesh_2d(
    dp: int, sp: int, devices: Optional[Sequence] = None
) -> Mesh:
    """(dp x sp) mesh with axes ("data", "spatial") over the first dp*sp
    devices. dp=1 gives pure spatial partitioning (single-image latency);
    sp=1 degenerates to the 1-D data mesh layout."""
    devs = list(devices if devices is not None else jax.devices())
    if dp * sp > len(devs):
        raise ValueError(f"need {dp * sp} devices, have {len(devs)}")
    grid = np.array(devs[: dp * sp]).reshape(dp, sp)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def _specs(mesh: Mesh, x) -> P:
    """Partition spec for one NHWC (or lower-rank) array on this mesh:
    batch over "data" (when present and divisible), H over "spatial".
    An axis that does not divide falls back to replication on that axis —
    correct but wasted chips, so it is logged (once per combination)."""
    axes = mesh.axis_names
    batch = None
    if DATA_AXIS in axes and x.ndim >= 1 and mesh.shape[DATA_AXIS] > 1:
        if x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            batch = DATA_AXIS
        else:
            _warn_once(DATA_AXIS, mesh.shape[DATA_AXIS], x.shape[0])
    spatial = None
    if SPATIAL_AXIS in axes and x.ndim >= 4 and mesh.shape[SPATIAL_AXIS] > 1:
        if x.shape[1] % mesh.shape[SPATIAL_AXIS] == 0:
            spatial = SPATIAL_AXIS
        else:
            _warn_once(SPATIAL_AXIS, mesh.shape[SPATIAL_AXIS], x.shape[1])
    spec = [None] * x.ndim
    if x.ndim:
        spec[0] = batch
    if x.ndim >= 4:
        spec[1] = spatial
    return P(*spec)


def shard_tiles(mesh: Mesh, tree):
    """Place every leaf on the mesh: leading axis over "data" (if the mesh
    has that axis and it divides), H (axis 1 of 4-D leaves) over "spatial"
    (likewise). Works for 1-D data meshes and 2-D (data, spatial) meshes,
    so call sites don't branch on mesh rank."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, _specs(mesh, x)))

    return jax.tree.map(put, tree)
