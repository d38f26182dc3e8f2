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

import jax

__all__ = ["maybe_init_distributed", "process_subset"]

logger = logging.getLogger("ddnm_tpu")


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed on multi-host platforms (TPU pods read the
    coordinator from the environment). No-op — returning False — when
    already initialized or single-host; never raises (dev boxes without a
    cluster config just stay single-process)."""
    try:
        if jax.process_count() > 1:
            return False  # runtime already knows the topology
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize()
        return True
    except Exception as e:  # single-host dev environment
        logger.debug("jax.distributed not initialized (%s)", e)
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
