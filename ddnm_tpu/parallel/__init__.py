"""Parallelism: device meshes, batch sharding, spatial partitioning.

DDNM's workload is embarrassingly parallel over images (the reference's only
"distributed" surface is a no-op DataParallel wrap — see SURVEY.md §2):
the TPU-native pattern is a 1-D data mesh with parameters replicated and the
image batch sharded over ICI, plus a psum for metric reduction. RNG is
per-device via fold_in.

Beyond that reference-derived need, `spatial.py` adds opt-in spatial
partitioning (shard the image H axis) to scale the hq pipeline's
inherently sequential batch-1 tile chain — the one latency data
parallelism cannot touch.
"""

from ddnm_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_sampler,
)
from ddnm_tpu.parallel.spatial import (
    SPATIAL_AXIS,
    make_mesh_2d,
    shard_tiles,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "sharded_sampler",
    "SPATIAL_AXIS",
    "make_mesh_2d",
    "shard_tiles",
]
