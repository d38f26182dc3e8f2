#!/usr/bin/env python
"""Quantify the encoder-cache approximation on a TRAINED (toy) model.

No pretrained reference checkpoints are reachable in this environment, so
the encoder-propagation acceleration (sampling/accel.py) ships with a
"validate quality per checkpoint" caveat. This experiment closes the
loop as far as locally possible: train a small DDPM UNet on a synthetic
image family (random soft blobs), then run 4x-SR DDNM restoration with the
exact sampler vs --encoder_cache 2/3/5 and report PSNR against ground
truth for each.

Usage:  python tools/experiments/toy_quality_encoder_cache.py
        [--steps 3000] [--res 32] [--eval 32]

Prints one JSON line per sampler variant.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def make_blobs(key, n, res):
    """Synthetic family: 3 soft colored gaussian blobs on a dark field."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(k1, (n, 3, 2), minval=0.15, maxval=0.85)
    colors = jax.random.uniform(k2, (n, 3, 3), minval=-1.0, maxval=1.0)
    widths = jax.random.uniform(k3, (n, 3, 1), minval=0.05, maxval=0.22)
    yy, xx = jnp.meshgrid(
        jnp.linspace(0, 1, res), jnp.linspace(0, 1, res), indexing="ij"
    )
    grid = jnp.stack([yy, xx], -1)  # (res, res, 2)
    d2 = jnp.sum(
        (grid[None, None] - centers[:, :, None, None, :]) ** 2, axis=-1
    )  # (n, 3, res, res)
    w = jnp.exp(-d2 / (2 * widths[..., None] ** 2))  # (n, 3, res, res)
    img = jnp.einsum("nbhw,nbc->nhwc", w, colors)
    return jnp.clip(img - 0.6, -1.0, 1.0)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--eval", type=int, default=32, help="eval images")
    ap.add_argument("--batch", type=int, default=128)
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ddnm_tpu import schedules
    from ddnm_tpu.data.metrics import psnr
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule, sample_simplified
    from ddnm_tpu.sampling.accel import (
        ddpm_split_fns,
        sample_simplified_encoder_prop,
    )
    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    enable_compilation_cache()
    res, T = ns.res, 1000
    model = DDPMUNet(ch=64, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=res)
    rng = jax.random.PRNGKey(0)
    params = jit_init(model, rng, jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=T
    ).astype("float32")
    abar = jnp.asarray((1.0 - betas).cumprod())

    opt = optax.adam(2e-4)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        k_img, k_t, k_noise = jax.random.split(key, 3)
        x0 = make_blobs(k_img, ns.batch, res)
        t = jax.random.randint(k_t, (ns.batch,), 0, T)
        noise = jax.random.normal(k_noise, x0.shape)
        at = abar[t][:, None, None, None]
        xt = jnp.sqrt(at) * x0 + jnp.sqrt(1 - at) * noise

        def loss_fn(p):
            eps = model.apply(p, xt, t.astype(jnp.float32))
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    key = jax.random.PRNGKey(1)
    for step in range(ns.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, k)
        if step % 500 == 0:
            print(f"# step {step} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    print(f"# trained {ns.steps} steps in {time.time()-t0:.0f}s, "
          f"final loss {float(loss):.4f}")

    # ---- evaluate: exact vs encoder-cached 4x SR restoration ----
    gt = make_blobs(jax.random.PRNGKey(99), ns.eval, res)
    op = build_functional_operator("sr_averagepooling", image_size=res,
                                   deg_scale=4)
    y = op.A(gt)
    sched = build_schedule(betas=betas, t_sampling=100)
    x_init = jax.random.normal(jax.random.PRNGKey(7), gt.shape)

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    def run_exact(k):
        return sample_simplified(model_fn, x_init, y, op, sched, k,
                                 params=params, loop="host")[0]

    enc_fn, dec_fn = ddpm_split_fns(model)

    def run_enc(k, interval):
        return sample_simplified_encoder_prop(
            enc_fn, dec_fn, x_init, y, op, sched, k, interval=interval,
            params=params)[0]

    k_eval = jax.random.PRNGKey(3)
    to01 = lambda a: jnp.clip((a + 1) / 2, 0, 1)
    results = {}
    x_exact = run_exact(k_eval)
    results["exact"] = float(jnp.mean(psnr(to01(x_exact), to01(gt))))
    for interval in (2, 3, 5):
        x_acc = run_enc(k_eval, interval)
        results[f"encoder_cache_{interval}"] = float(
            jnp.mean(psnr(to01(x_acc), to01(gt))))
        results[f"drift_vs_exact_{interval}"] = float(
            jnp.mean(psnr(to01(x_acc), to01(x_exact))))

    for k_, v in results.items():
        print(json.dumps({"metric": k_, "value": round(v, 3), "unit": "dB"}))
    return results


if __name__ == "__main__":
    main()
