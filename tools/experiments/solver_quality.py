"""Quality-vs-NFE for the second-order multistep DDNM solver.

Runs the trained golden fixtures (toy32 / mid64) through the
reference-protocol DDIM sampler and the multistep solver at a sweep of
step budgets, reporting restored-vs-GT PSNR per task. The claim under
test: multistep reaches the 100-step DDIM quality at ~4x fewer model
calls (docs/PERFORMANCE.md "Fewer steps: second-order multistep").

CPU-friendly (the fixtures are small); zero-noise deterministic like the
golden suites, eta=0.85 for DDIM (the reference protocol, main.py:25).

  python tools/experiments/solver_quality.py [--tier toy32|mid64]
      [--images 4] [--nfe 6,10,15,25,50,100]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", choices=["toy32", "mid64"], default="toy32")
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--nfe", type=str, default="6,10,15,25,50,100")
    ns = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ddnm_tpu import schedules as sch
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule, sample_simplified, sample_svd
    from tests._golden import (
        TIERS,
        build_our_operator,
        load_eval_images,
        load_our_model,
        psnr01,
    )

    tier = TIERS[ns.tier]
    res = tier.res
    model_fn, params = load_our_model(tier)
    x = load_eval_images(ns.images, tier)
    x_orig = jnp.asarray(x.transpose(0, 2, 3, 1))
    gt01 = (np.asarray(x_orig) + 1.0) / 2.0
    betas = sch.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=2e-2,
        num_diffusion_timesteps=1000,
    )
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)  # noqa: E731
    x_init = jax.random.normal(jax.random.PRNGKey(5), x_orig.shape)

    # (name, mode, deg, deg_scale) — noise-free tasks across both modes
    tasks = [
        ("sr_ap_4x/simpl", "simplified", "sr_averagepooling", 4),
        ("sr_bicubic_4x/svd", "svd", "sr_bicubic", 4.0),
        ("deblur_gauss/svd", "svd", "deblur_gauss", 4.0),
    ]

    def run(mode, deg, deg_scale, solver, n_steps):
        sched = build_schedule(betas=betas, t_sampling=n_steps)
        if mode == "simplified":
            op = build_functional_operator(
                deg, image_size=res, deg_scale=deg_scale
            )
            y = op.A(x_orig)
            out, _ = sample_simplified(
                model_fn, x_init, y, op, sched, jax.random.PRNGKey(1),
                eta=0.85, sigma_y=0.0, noise_fn=zero_noise, loop="scan",
                params=params, solver=solver,
            )
        else:
            op = build_our_operator(deg, deg_scale, res=res)
            x_vec = jnp.transpose(x_orig, (0, 3, 1, 2)).reshape(
                len(x_orig), -1
            )
            y = op.A(x_vec)
            out, _ = sample_svd(
                model_fn, x_init, y, op, sched, jax.random.PRNGKey(1),
                eta=0.85, sigma_y=0.0, noise_fn=zero_noise, loop="scan",
                params=params, solver=solver,
            )
        out01 = np.clip((np.asarray(out) + 1.0) / 2.0, 0.0, 1.0)
        return round(psnr01(out01, gt01), 3)

    nfes = [int(s) for s in ns.nfe.split(",")]
    results = {}
    for name, mode, deg, scale in tasks:
        rows = {}
        for solver in ("ddim", "multistep"):
            rows[solver] = {
                n: run(mode, deg, scale, solver, n) for n in nfes
            }
            print(f"# {name} {solver}: {rows[solver]}", flush=True)
        results[name] = rows

    header = "| task | solver | " + " | ".join(f"{n} steps" for n in nfes)
    print(f"\n{header} |")
    print("|" + "---|" * (len(nfes) + 2))
    for name, rows in results.items():
        for solver, vals in rows.items():
            cells = " | ".join(f"{vals[n]:.2f}" for n in nfes)
            print(f"| {name} | {solver} | {cells} |")
    print(json.dumps({"tier": ns.tier, "nfe": nfes, "results": results}))


if __name__ == "__main__":
    main()
