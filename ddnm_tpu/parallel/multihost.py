"""Multi-host (pod / multi-slice) support.

DDNM sampling has no cross-image dependencies, so the multi-host recipe is
the degenerate-ideal one: every host runs the same program on a disjoint
contiguous slice of the dataset, shards its local batch over its local
chips (parallel/mesh.py), and writes its own outputs — zero DCN traffic in
the hot path (the prompt-level rule: collectives ride ICI, not DCN; here
there are none at all). The reference exposes the same idea manually via
--subset_start/--subset_end (main.py:70-75, diffusion.py:218-223); these
helpers automate it from the JAX process topology.

Testable only in the single-process degenerate case in this environment
(one chip); the process-slicing arithmetic is unit-tested for arbitrary
topologies.
"""

from __future__ import annotations

import logging
import os

import jax

__all__ = ["maybe_init_distributed", "process_subset"]

logger = logging.getLogger("ddnm_tpu")

# evidence of a multi-process launch environment. Checked BEFORE touching
# any jax API: querying jax.process_count() initializes the backends, after
# which jax.distributed.initialize() unconditionally raises — so detection
# must be env-only.
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",     # multi-host TPU pod
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
)


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when the environment indicates a
    multi-process launch (TPU pod worker env, a coordinator address, or a
    Slurm/OpenMPI job). MUST run before any other JAX call in the process.
    No-op (False) on single-host dev boxes; initialization failures in a
    detected cluster are logged as warnings, not swallowed silently."""
    evidence = [v for v in _CLUSTER_ENV_VARS if os.environ.get(v)]
    if not evidence:
        return False
    if evidence == ["SLURM_JOB_NUM_NODES"] and \
            os.environ.get("SLURM_JOB_NUM_NODES") == "1":
        return False
    try:
        jax.distributed.initialize()
        logger.info(
            "jax.distributed initialized: process %d/%d (%s)",
            jax.process_index(), jax.process_count(), ",".join(evidence),
        )
        return True
    except Exception as e:
        logger.warning(
            "cluster environment detected (%s) but jax.distributed."
            "initialize failed: %s — running single-process",
            ",".join(evidence), e,
        )
        return False


def process_subset(n_items: int, process_index=None, process_count=None):
    """(start, end) of this process's contiguous dataset slice.

    Splits n_items as evenly as possible (first `n_items % count` processes
    get one extra), covering every item exactly once across processes —
    the automated form of the reference's manual --subset_start/--subset_end
    job sharding."""
    p = jax.process_index() if process_index is None else process_index
    c = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n_items, c)
    start = p * base + min(p, extra)
    end = start + base + (1 if p < extra else 0)
    return start, end
