"""Sampling: the DDNM/DDNM+ null-space diffusion samplers.

One `lax.scan` per image batch with zero host round-trips (the reference
ping-pongs xt between CPU and GPU every step, svd_ddnm.py:45,67-68);
time-travel is a `lax.cond` on precomputed static flags.
"""

from ddnm_tpu.sampling.ddnm import (
    DDNMSchedule,
    build_schedule,
    sample_simplified,
    sample_svd,
)
from ddnm_tpu.sampling.posterior import (
    PosteriorTables,
    build_posterior_tables,
    respace_betas,
    sample_posterior,
)
from ddnm_tpu.sampling.solvers import (
    sample_posterior_multistep,
    sample_simplified_multistep,
    sample_svd_multistep,
)

__all__ = [
    "sample_posterior_multistep",
    "sample_simplified_multistep",
    "sample_svd_multistep",
    "DDNMSchedule",
    "build_schedule",
    "sample_simplified",
    "sample_svd",
    "PosteriorTables",
    "build_posterior_tables",
    "respace_betas",
    "sample_posterior",
]
