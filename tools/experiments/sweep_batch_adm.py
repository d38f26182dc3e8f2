#!/usr/bin/env python
"""Measure the hq dataset-sweep batching win on the face256-class ADM model.

The face256 sweep (hq_main --gt_path/--mask_path_dir or the conf data.eval
entry) restores many independent single-tile 256px canvases. The per-image
path runs the posterior sampler at batch 1; `--sweep_batch` batches B
images into one call (tiling.batched_tile_sample). This experiment times
both paths on the REAL model family the sweep uses — the face256-style ADM
(configs/hq/face256.yml geometry: 128ch x (1,1,2,2,4,4), res_blocks 1,
attention at ds 16, learn_sigma, scale-shift norm, resblock_updown) at
random init (throughput is weight-independent) — over one jump-schedule
protocol (respacing 100, jump 100/10x3, ~280 model calls/image; the real
face256 protocol is 250/10x10, ~9x more calls, time-proportional).

Run on the TPU: `python tools/experiments/sweep_batch_adm.py`.
Prints one JSON line per variant (3-run medians).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

N_IMAGES = 8
RES = 256


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    enable_compilation_cache()

    from ddnm_tpu import schedules
    from ddnm_tpu.config import load_hq_config
    from ddnm_tpu.models import cast_torso
    from ddnm_tpu.sampling.posterior import build_posterior_tables
    from ddnm_tpu.tiling import batched_tile_sample, mask_shift_sample

    import hq_main

    conf = load_hq_config(Path(__file__).resolve().parents[2] / "configs/hq/face256.yml")
    model = hq_main.build_adm_from_hq(conf, jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jit_init(model, rng, jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))
    params = {"model": cast_torso(params, jnp.bfloat16)}
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    print(f"# face256-class ADM: {n_params/1e6:.0f}M params", file=sys.stderr)

    def model_fn(p, x, t):
        return model.apply(p["model"], x, t)

    tables = build_posterior_tables(
        betas=schedules.named_beta_schedule("linear", 1000, use_scale=True),
        timestep_respacing="100", sigma_y=0.0,
        schedule_jump_params=dict(t_T=100, n_sample=1, jump_length=10,
                                  jump_n_sample=3),
    )

    rr = np.random.default_rng(1)
    gts = rr.uniform(-1, 1, (N_IMAGES, RES, RES, 3)).astype(np.float32)
    masks = []
    for i in range(N_IMAGES):
        m = np.ones((RES, RES), np.float32)
        m[(16 * i): (16 * i) + 96, 80:176] = 0.0
        masks.append(m)

    key = jax.random.PRNGKey(7)
    keys = [jax.random.fold_in(key, i) for i in range(N_IMAGES)]

    def run_sequential():
        outs = []
        for i in range(N_IMAGES):
            out = mask_shift_sample(
                model_fn, gts[i][None], "inpainting", tables, keys[i],
                mask=masks[i], params=params,
            )
            outs.append(out["final"])
        return outs

    def run_batched():
        return batched_tile_sample(
            model_fn, gts, "inpainting", tables, keys,
            masks=masks, params=params,
        )["final"]

    def timeit(fn, label, n_runs=3):
        fn()  # warm: compile + first-execution costs
        trials = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            trials.append(time.perf_counter() - t0)
        dt = sorted(trials)[len(trials) // 2]
        print(json.dumps({
            "metric": label,
            "value": round(N_IMAGES / dt, 4),
            "unit": "img/s",
            "s_per_image": round(dt / N_IMAGES, 3),
            "trials_s": [round(t, 2) for t in trials],
        }))

    timeit(run_sequential, "sweep_sequential_b1")
    timeit(run_batched, "sweep_batched_b8")


if __name__ == "__main__":
    main()
