"""Parallelism: device meshes and batch-sharded sampling.

DDNM's workload is embarrassingly parallel over images (the reference's only
"distributed" surface is a no-op DataParallel wrap — see SURVEY.md §2):
the TPU-native pattern is a 1-D data mesh with parameters replicated and the
image batch sharded over ICI, plus a psum for metric reduction. RNG is
per-device via fold_in. No TP/PP/SP is needed by any reference behaviour.
"""

from ddnm_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_sampler,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "sharded_sampler"]
