#!/usr/bin/env python
"""Diagnostic: where does flagship step time go? (run on the real chip)

Times, hot, for the bench workload (batch 8, 256px, bf16 DDPM UNet):
(a) the raw jitted UNet forward, (b) the full 100-step sampler wall time,
(c) dispatch time vs completion time of one sampler run (how well the
host loop pipelines).
"""
import time, sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from ddnm_tpu.utils import enable_compilation_cache, jit_init

enable_compilation_cache()

from ddnm_tpu import schedules
from ddnm_tpu.models.unet_ddpm import DDPMUNet
from ddnm_tpu.operators import build_functional_operator
from ddnm_tpu.sampling import build_schedule, sample_simplified

BATCH, RES = 8, 256


def mark(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


model = DDPMUNet(dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (BATCH, RES, RES, 3), dtype=jnp.float32)
t = jnp.zeros((BATCH,))
params = jit_init(model, rng, x[:1], t[:1])
jax.device_get(jax.tree.leaves(params)[0])
mark("init done")

fwd = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt))

# (a) raw forward
out = fwd(params, x, t)
jax.device_get(out)
for label, n in [("fwd x10", 10), ("fwd x30", 30)]:
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, x, t)
    jax.device_get(out)
    dt = time.perf_counter() - t0
    mark(f"{label}: {dt:.3f}s total, {1000*dt/n:.1f} ms/fwd")

# (c) full sampler
betas = schedules.get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                                    num_diffusion_timesteps=1000)
sched = build_schedule(betas=betas, t_sampling=100)
op = build_functional_operator("sr_averagepooling", image_size=RES, deg_scale=4)
y = op.A(x)
kw = dict(eta=0.85, sigma_y=0.0)
model_fn = lambda p, xx, tt: model.apply(p, xx, tt)
out, _ = sample_simplified(model_fn, x, y, op, sched, jax.random.PRNGKey(1),
                           params=params, **kw)
jax.device_get(out)
mark("sampler warm")
t0 = time.perf_counter()
out, _ = sample_simplified(model_fn, x, y, op, sched, jax.random.PRNGKey(2),
                           params=params, **kw)
jax.device_get(out)
dt = time.perf_counter() - t0
mark(f"sampler 100 steps: {dt:.3f}s = {1000*dt/100:.1f} ms/step -> {BATCH/dt:.2f} img/s")

# dispatch-only probe: submit all steps, measure dispatch vs completion
t0 = time.perf_counter()
out, _ = sample_simplified(model_fn, x, y, op, sched, jax.random.PRNGKey(3),
                           params=params, **kw)
t_dispatch = time.perf_counter() - t0
jax.device_get(out)
t_total = time.perf_counter() - t0
mark(f"dispatch {t_dispatch:.3f}s vs total {t_total:.3f}s")
