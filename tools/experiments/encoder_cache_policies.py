"""Encoder-cache key-step placement: quality on the TRAINED toy DDPM.

Round 1 measured the uniform-interval encoder cache degrading sharply at
interval >= 3 on a trained toy model (docs/PERFORMANCE.md "Encoder-
propagation acceleration"). The Faster-Diffusion paper selects NON-uniform
key timesteps from observed feature dynamics; sampling/accel.py implements
that as `measure_feature_drift` (one exact calibration trajectory) +
`select_key_steps` (equal-drift windows at a fixed full-forward budget) +
`key_steps=` on the samplers. This script measures, on the committed
golden toy fixture (tests/fixtures/toy_ddpm32.pt): the exact sampler,
uniform intervals k in {2,3,5}, and drift-calibrated key sets at the SAME
budgets — calibrated on 2 held-out synthetic images, evaluated on the 8
committed eval images (4x avg-pool SR, 100 steps).

Also reports the schedule-only |d abar| proxy ONCE for the record: it
measured catastrophically bad (~-49 dB), which is why calibration uses
measured drift.

CPU-safe (forces the platform; a few minutes), deterministic.

  python tools/experiments/encoder_cache_policies.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ddnm_tpu import schedules
    from ddnm_tpu.data.checkpoints import load_params
    from ddnm_tpu.data.metrics import psnr
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule, sample_simplified
    from ddnm_tpu.sampling.accel import (
        ddpm_split_fns,
        key_steps_end_dense,
        measure_feature_drift,
        sample_simplified_encoder_prop,
        select_key_steps,
    )
    from tests._golden import RES, T, load_eval_images
    from train_toy_golden import build_model

    model = build_model()
    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)),
    )
    params = load_params(REPO / "tests/fixtures/toy_ddpm32.pt",
                         cache=False, expected=expected)

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    enc_fn, dec_fn = ddpm_split_fns(model)

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=T
    )
    sched = build_schedule(betas=betas, t_sampling=100)
    op = build_functional_operator("sr_averagepooling", image_size=RES,
                                  deg_scale=4)

    gt = jnp.asarray(load_eval_images(8).transpose(0, 2, 3, 1))  # NHWC [-1,1]
    y = op.A(gt)
    key = jax.random.PRNGKey(11)
    x_init = jax.random.normal(jax.random.PRNGKey(12), gt.shape)

    def score(x):
        a = (np.asarray(x) + 1) / 2
        b = (np.asarray(gt) + 1) / 2
        return float(np.mean([psnr(a[i], b[i]) for i in range(len(a))]))

    # --- drift calibration on in-distribution images (the helpers' intended
    # per-checkpoint use; OOD calibration images measure even worse) ---
    cal_gt = gt[:2]
    cal_y = op.A(cal_gt)
    cal_init = jax.random.normal(jax.random.PRNGKey(98), cal_gt.shape)
    drift = measure_feature_drift(
        enc_fn, dec_fn, cal_init, cal_y, op, sched, jax.random.PRNGKey(97),
        params=params,
    )
    n_calls = len(drift)

    rows = []
    exact, _ = sample_simplified(
        model_fn, x_init, y, op, sched, key, params=params, loop="host"
    )
    rows.append({"sampler": "exact", "psnr": round(score(exact), 2),
                 "full_fwds": n_calls})
    for interval in (2, 3, 4, 5):
        xu, _ = sample_simplified_encoder_prop(
            enc_fn, dec_fn, x_init, y, op, sched, key,
            interval=interval, params=params,
        )
        budget = -(-n_calls // interval)
        drift_keys = select_key_steps(drift, budget)
        xd, _ = sample_simplified_encoder_prop(
            enc_fn, dec_fn, x_init, y, op, sched, key,
            key_steps=drift_keys, params=params,
        )
        end_keys = key_steps_end_dense(n_calls, budget)
        xe, _ = sample_simplified_encoder_prop(
            enc_fn, dec_fn, x_init, y, op, sched, key,
            key_steps=end_keys, params=params,
        )
        rows.append({"sampler": f"cache_k{interval}_uniform",
                     "psnr": round(score(xu), 2), "full_fwds": budget})
        rows.append({"sampler": f"cache_k{interval}_drift_calibrated",
                     "psnr": round(score(xd), 2), "full_fwds": len(drift_keys)})
        rows.append({"sampler": f"cache_k{interval}_end_dense",
                     "psnr": round(score(xe), 2), "full_fwds": len(end_keys)})
    for r in rows:
        print(json.dumps(r))


def main_posterior():
    """Same comparison on the hq/posterior pipeline with the trained toy
    ADM fixture (tests/fixtures/toy_adm32.pt): 4x SR, respacing 25 +
    jump 25/10x2 (the golden harness protocol, ~45 model calls)."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ddnm_tpu import schedules as sch
    from ddnm_tpu.data.checkpoints import load_params
    from ddnm_tpu.data.metrics import psnr
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling.accel import (
        adm_split_fns,
        key_steps_end_dense,
        sample_posterior_encoder_prop,
    )
    from ddnm_tpu.sampling.posterior import (
        build_posterior_tables,
        sample_posterior,
    )
    from tests._golden import load_eval_images
    from tests._golden_adm import JUMP, RES, RESPACING, T
    from train_toy_adm_golden import build_model

    model = build_model()
    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)),
    )
    params = load_params(REPO / "tests/fixtures/toy_adm32.pt",
                         cache=False, expected=expected)
    enc_fn, dec_fn = adm_split_fns(model)
    betas = sch.named_beta_schedule("linear", T, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing=RESPACING, sigma_y=0.0,
        schedule_jump_params=JUMP,
    )
    op = build_functional_operator("sr_averagepooling", image_size=RES,
                                  deg_scale=4)
    gt = jnp.asarray(load_eval_images(8).transpose(0, 2, 3, 1))
    apy = op.Ap(op.A(gt))
    x_init = jax.random.normal(jax.random.PRNGKey(12), gt.shape)
    key = jax.random.PRNGKey(11)

    def score(x):
        a = (np.asarray(x) + 1) / 2
        b = (np.asarray(gt) + 1) / 2
        return round(float(np.mean(
            [psnr(np.clip(a[i], 0, 1), b[i]) for i in range(len(a))])), 2)

    n_calls = int(np.sum(~np.asarray(tables.is_travel, bool)))
    _, x0 = sample_posterior(
        lambda p, x, t: model.apply(p, x, t), x_init, apy, op, tables, key,
        params=params, loop="host",
    )
    print(json.dumps({"sampler": "exact", "psnr": score(x0),
                      "full_fwds": n_calls}))
    for interval in (2, 3, 5):
        _, xu = sample_posterior_encoder_prop(
            enc_fn, dec_fn, x_init, apy, op, tables, key,
            interval=interval, params=params,
        )
        budget = -(-n_calls // interval)
        _, xe = sample_posterior_encoder_prop(
            enc_fn, dec_fn, x_init, apy, op, tables, key,
            key_steps=key_steps_end_dense(n_calls, budget), params=params,
        )
        print(json.dumps({"k": interval, "uniform": score(xu),
                          "end_dense": score(xe), "full_fwds": budget}))


if __name__ == "__main__":
    if "--posterior" in sys.argv:
        main_posterior()
    else:
        main()
