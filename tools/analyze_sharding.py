"""Sharding audit: count the XLA collectives each multi-chip executable
actually contains.

docs/PERFORMANCE.md makes two structural claims about the parallel design:
(1) the data-parallel sampling hot loop has ZERO collectives (DDNM is
batch-elementwise; params are replicated, the batch is sharded), and
(2) spatial partitioning's cross-shard traffic is thin (1-row conv halos
as collective-permutes plus GroupNorm/attention reductions). This tool
turns those claims into checked facts: it compiles the real sampler steps
over a virtual device mesh and counts the collective ops in the optimized
HLO. Run anywhere:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/analyze_sharding.py

Prints one JSON object; `tests/test_cli_and_parallel.py` asserts the
invariants so a refactor that accidentally introduces hot-loop collectives
(e.g. a stray sharding annotation making XLA all-gather the batch) fails
CI rather than silently taxing every step.
"""

from __future__ import annotations

import collections
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# ops that move data between devices in SPMD executables
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def count_collectives(compiled_text: str) -> dict:
    """Count collective HLO ops in a compiled module's text."""
    counts = collections.Counter()
    for line in compiled_text.splitlines():
        # match op invocations ("%x = ... all-reduce(...)"), not comments
        for op in _COLLECTIVES:
            if re.search(rf"\b{op}(-start)?\(", line):
                counts[op] += 1
                break
    return dict(counts)


def _flagship_dp_step(n_devices: int):
    """One simplified-DDNM step, batch sharded over a 1-D data mesh."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.parallel import make_mesh, replicate, shard_batch
    from ddnm_tpu.sampling import build_schedule
    from ddnm_tpu.sampling.ddnm import _Body, _host_step, _simplified_body
    from ddnm_tpu.sampling.rng import default_noise

    res = 32
    mesh = make_mesh(n_devices)
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=res)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (n_devices, res, res, 3))
    params = jax.jit(model.init)(rng, x[:1], jnp.zeros((1,)))
    params = replicate(mesh, params)
    op = build_functional_operator("sr_averagepooling", image_size=res,
                                   deg_scale=4)
    x, y = shard_batch(mesh, (x, op.A(x)))
    body = _Body(_simplified_body,
                 (lambda p, xx, tt: model.apply(p, xx, tt), op, 0.85, 0.0))
    args = (body, default_noise, params, x, y, jax.random.PRNGKey(1),
            50.0, 0.9, 0.95, None)
    lowered = _host_step.lower(*args)
    return lowered.compile().as_text()


def _sp_forward(dp: int, sp: int):
    """The UNet forward with image rows sharded over the spatial axis."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.parallel import make_mesh_2d, replicate, shard_tiles

    res = 32
    mesh = make_mesh_2d(dp, sp)
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=res)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (dp, res, res, 3))
    params = jax.jit(model.init)(rng, x[:1], jnp.zeros((1,)))
    params = replicate(mesh, params)
    x = shard_tiles(mesh, x)
    fwd = jax.jit(lambda p, xx: model.apply(p, xx, jnp.zeros((xx.shape[0],))))
    return fwd.lower(params, x).compile().as_text()


def main(n_devices: int = 8) -> dict:
    # the environment's TPU plugin pre-sets jax_platforms over the env var;
    # force CPU + virtual devices before the backend initialises (the same
    # dance as __graft_entry__.dryrun_multichip / tests/conftest.py)
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices (run with JAX_PLATFORMS=cpu "
        f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices})"
    )
    dp_counts = count_collectives(_flagship_dp_step(n_devices))
    sp_counts = count_collectives(_sp_forward(2, n_devices // 2))
    report = {
        "dp_step_collectives": dp_counts,
        "dp_step_total": sum(dp_counts.values()),
        "sp_forward_collectives": sp_counts,
        "sp_forward_total": sum(sp_counts.values()),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
