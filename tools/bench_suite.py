#!/usr/bin/env python
"""Extended benchmark suite: per-workload throughput beyond bench.py.

Measures images/sec/chip for:
  - simplified: 4x SR, 100-step DDNM+ (same as bench.py's headline)
  - svd_deblur: SVD-mode deblur_gauss, 100 steps (operator matmuls + perms)
  - svd_cs_wh: Walsh-Hadamard CS 0.25, 100 steps (FWHT hot path)
  - hq_tile: one 256px tile of the posterior sampler, jump 100/10x3
    (~380 model calls — the hq_demo per-tile workload)
  - hq_tile_enc3: same tile with encoder-propagation at interval 3
    (sampling/accel.py, opt-in approximate accel)
  - hq_sweep_b8: 8 single-tile sweep images batched into one sampler call
    (tiling.batched_tile_sample, the hq_main --sweep_batch path) — compare
    its img/s against hq_tile's to see the sweep-batching win

Prints one JSON line per workload. All on the DDPM UNet (114M, bf16 torso)
except hq_tile which uses a learn-sigma variant head.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH, RES, T = 8, 256, 100


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="extended DDNM benchmarks")
    ap.add_argument("--workloads", type=str, default=None,
                    help="comma-separated filter: simplified_sr4, svd_deblur, "
                         "svd_cs_wh, hq_tile, hq_tile_enc3, hq_sweep_b8")
    ns = ap.parse_args(argv)
    want = set(ns.workloads.split(",")) if ns.workloads else None

    def wanted(name):
        return want is None or name in want

    import jax
    import jax.numpy as jnp

    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    enable_compilation_cache()

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator, build_svd_operator
    from ddnm_tpu.sampling import build_schedule, sample_simplified, sample_svd
    from ddnm_tpu.sampling.posterior import build_posterior_tables, sample_posterior

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, RES, RES, 3), dtype=jnp.float32)

    model = DDPMUNet(dtype=jnp.bfloat16)
    params = jit_init(model, rng, x[:1], jnp.zeros((1,)))

    def model_fn(p, xx, tt):
        return model.apply(p, xx, tt)

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    )
    sched = build_schedule(betas=betas, t_sampling=T)
    sched_warm = build_schedule(betas=betas, t_sampling=10)

    def timeit(fn, n_runs=3, items_per_run=BATCH):
        jax.device_get(fn(jax.random.PRNGKey(1))[0])  # warm
        t0 = time.perf_counter()
        out = None
        for i in range(n_runs):
            out = fn(jax.random.PRNGKey(2 + i))
        jax.device_get(out[0])
        dt = time.perf_counter() - t0
        return n_runs * items_per_run / dt

    results = {}

    # 1) simplified 4x SR
    op = build_functional_operator("sr_averagepooling", image_size=RES, deg_scale=4)
    y = op.A(x)
    if wanted("simplified_sr4"):
        sample_simplified(model_fn, x, y, op, sched_warm, jax.random.PRNGKey(0),
                          params=params)  # absorb one-time costs
        results["simplified_sr4"] = timeit(
            lambda k: sample_simplified(model_fn, x, y, op, sched, k, params=params)
        )

    # 2) SVD deblur_gauss
    xvec = jnp.transpose(x, (0, 3, 1, 2)).reshape(BATCH, -1)
    for name, deg, kw in [
        ("svd_deblur", "deblur_gauss", {}),
        ("svd_cs_wh", "cs_walshhadamard", dict(deg_scale=0.25)),
    ]:
        if not wanted(name):
            continue
        sop = build_svd_operator(deg, channels=3, image_size=RES, **kw)
        ysvd = sop.A(xvec)
        results[name] = timeit(
            lambda k, sop=sop, ysvd=ysvd: sample_svd(
                model_fn, x, ysvd, sop, sched, k, params=params
            )
        )

    # 3) one hq posterior tile (learn-sigma head via output concat shim)
    def model6_fn(p, xx, tt):
        eps = model.apply(p, xx, tt)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    if not (wanted("hq_tile") or wanted("hq_tile_enc3")
            or wanted("hq_sweep_b8")):
        for k, v in results.items():
            print(json.dumps({"metric": k, "value": round(float(v), 4), "unit": "img/s"}))
        return
    tables = build_posterior_tables(
        betas=schedules.named_beta_schedule("linear", 1000, use_scale=True),
        timestep_respacing="100", sigma_y=0.0,
        schedule_jump_params=dict(t_T=100, n_sample=1, jump_length=10,
                                  jump_n_sample=3),
    )
    apy = op.Ap(op.A(x[:1]))
    n_model_calls = int((~tables.is_travel).sum())
    if wanted("hq_tile"):
        results["hq_tile"] = timeit(
            lambda k: sample_posterior(model6_fn, x[:1], apy, op, tables, k,
                                       params=params),
            n_runs=3, items_per_run=1,  # averages out tunnel transients
        )
        results["hq_tile_model_calls"] = n_model_calls

    if wanted("hq_tile_enc3"):
        from ddnm_tpu.sampling.accel import (
            ddpm_split_fns,
            sample_posterior_encoder_prop,
        )

        enc_fn, dec_raw = ddpm_split_fns(model)

        def dec_fn(p, cache, xx, tt):
            eps = dec_raw(p, cache, xx, tt)
            # learn-sigma head shim, as model6_fn above
            return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

        results["hq_tile_enc3"] = timeit(
            lambda k: sample_posterior_encoder_prop(
                enc_fn, dec_fn, x[:1], apy, op, tables, k,
                interval=3, params=params,
            ),
            n_runs=3, items_per_run=1,
        )

    if wanted("hq_sweep_b8"):
        import numpy as np

        from ddnm_tpu.tiling import batched_tile_sample

        masks = []
        for i in range(BATCH):
            m = np.ones((RES, RES), np.float32)
            m[(16 * i) : (16 * i) + 96, 80:176] = 0.0
            masks.append(m)

        def sweep(k):
            out = batched_tile_sample(
                model6_fn, x, "inpainting", tables,
                [jax.random.fold_in(k, i) for i in range(BATCH)],
                masks=masks, params=params,
            )
            return (out["final"],)

        results["hq_sweep_b8"] = timeit(sweep, n_runs=3, items_per_run=BATCH)

    for k, v in results.items():
        unit = "img/s" if k != "hq_tile_model_calls" else "calls"
        print(json.dumps({"metric": k, "value": round(float(v), 4), "unit": unit}))


if __name__ == "__main__":
    main()
