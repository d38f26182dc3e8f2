#!/usr/bin/env python
"""Diagnostic: per-step cost of the SVD path by operator (run on real chip).

Compares hot sampler throughput: simplified sr_ap vs SVD {denoising (pure
transpose overhead), deblur_gauss (matmuls+gathers), sr_averagepooling}.
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from ddnm_tpu.utils import enable_compilation_cache, jit_init

enable_compilation_cache()

from ddnm_tpu import schedules
from ddnm_tpu.models.unet_ddpm import DDPMUNet
from ddnm_tpu.operators import build_functional_operator
from ddnm_tpu.operators.svd_ops import build_svd_operator
from ddnm_tpu.sampling import build_schedule, sample_simplified, sample_svd

BATCH, RES, T = 8, 256, 100


def mark(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


model = DDPMUNet(dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (BATCH, RES, RES, 3), dtype=jnp.float32)
params = jit_init(model, rng, x[:1], jnp.zeros((1,)))
jax.device_get(jax.tree.leaves(params)[0])
model_fn = lambda p, xx, tt: model.apply(p, xx, tt)

betas = schedules.get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                                    num_diffusion_timesteps=1000)
sched = build_schedule(betas=betas, t_sampling=T)


def timed(label, fn):
    out, _ = fn(jax.random.PRNGKey(1))
    jax.device_get(out)
    t0 = time.perf_counter()
    out, _ = fn(jax.random.PRNGKey(2))
    jax.device_get(out)
    dt = time.perf_counter() - t0
    mark(f"{label}: {dt:.2f}s -> {BATCH/dt:.2f} img/s")


op_s = build_functional_operator("sr_averagepooling", image_size=RES, deg_scale=4)
y_s = op_s.A(x)
timed("simplified sr_ap", lambda k: sample_simplified(
    model_fn, x, y_s, op_s, sched, k, eta=0.85, sigma_y=0.0, params=params))

x_vec = jnp.transpose(x, (0, 3, 1, 2)).reshape(BATCH, -1)
for name, kw in [
    ("denoising", {}),
    ("sr_averagepooling", dict(deg_scale=4)),
    ("deblur_gauss", {}),
]:
    op = build_svd_operator(name, channels=3, image_size=RES, **kw)
    y = op.A(x_vec)
    timed(f"svd {name}", lambda k, op=op, y=y: sample_svd(
        model_fn, x, y, op, sched, k, eta=0.85, sigma_y=0.0, params=params))

# noisy DDNM+ probes (Lambda / Lambda_noise per-step cost)
if "--noisy" in sys.argv:
    for name, kw in [("sr_averagepooling", dict(deg_scale=4)),
                     ("deblur_gauss", {}),
                     ("cs_walshhadamard", dict(deg_scale=0.25)),
                     ("sr_bicubic", dict(deg_scale=4)),
                     ("deblur_aniso", {}),
                     ("inpainting", None)]:
        if kw is None:
            mask = np.ones((RES, RES), bool); mask[64:192, 64:192] = False
            op = build_svd_operator("inpainting", channels=3, image_size=RES,
                                    mask=mask)
        else:
            op = build_svd_operator(name, channels=3, image_size=RES, **kw)
        y = op.A(x_vec)
        timed(f"svd {name} noisy", lambda k, op=op, y=y: sample_svd(
            model_fn, x, y, op, sched, k, eta=0.85, sigma_y=0.1, params=params))
