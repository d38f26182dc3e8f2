"""Execute the lax.scan sampling driver on the real TPU (VERDICT r2 item #3).

docs/PERFORMANCE.md claimed scan is "best for production TPUs" while every
on-chip measurement ever taken used the host driver (`loop="auto"` picks
"host" on the axon remote-compile backend, sampling/ddnm.py:101-108,
because one scan executable embeds the whole 100-step chain and its cold
compile through the tunnel is minutes). This experiment converts the claim
into a measurement:

  1. flagship workload (bench.py's: 114M-param DDPM UNet, 256px, batch 8,
     100-step simplified DDNM+ 4x SR, bf16 torso) with loop="host";
  2. the same with loop="scan" — first-call wall time recorded separately
     (compile; cached in .jax_cache for subsequent runs) then steady-state;
  3. numerics: same PRNG key => the two drivers share step bodies, but XLA
     compiles DIFFERENT fusions for the per-step executable vs the scan
     body. Under a bf16 torso those differ at the last ulp, and a 100-step
     trajectory through a random-weights (non-contractive) UNet amplifies
     ulp-level divergence chaotically. `--dtype float32` is the control:
     if fp32 host-vs-scan agrees tightly on the chip, the bf16 divergence
     is rounding chaos, not a driver bug.

Writes one JSON line. Run ALONE on the chip (one-TPU-process rule):
  python tools/experiments/scan_on_tpu.py [--t_sampling 100] [--batch 8]
      [--dtype float32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

RES = 256


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--t_sampling", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--dtype", choices=["bfloat16", "float32"],
                    default="bfloat16")
    ap.add_argument("--trained", choices=["none", "toy32", "mid64"],
                    default="none",
                    help="use a TRAINED golden-tier fixture instead of the "
                         "random-init flagship: trained denoisers are "
                         "contractive, so host-vs-scan fusion divergence "
                         "stops amplifying chaotically — the driver-"
                         "correctness control at trajectory length")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule, sample_simplified
    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    enable_compilation_cache()
    print(f"# backend: {jax.default_backend()} {jax.devices()}", flush=True)

    global RES
    rng = jax.random.PRNGKey(0)
    if ns.trained != "none":
        sys.path.insert(0, str(REPO / "tests"))
        from _golden import TIERS, load_eval_images, load_our_model

        tier = TIERS[ns.trained]
        RES = tier.res
        model_fn, params = load_our_model(tier, dtype=ns.dtype)
        gt = load_eval_images(ns.batch, tier=tier)  # (n, 3, res, res)
        n = gt.shape[0]
        reps = -(-ns.batch // n)
        gt = np.tile(gt, (reps, 1, 1, 1))[: ns.batch]
        x = jnp.asarray(gt.transpose(0, 2, 3, 1))  # NHWC in [-1, 1]
    else:
        model = DDPMUNet(dtype=jnp.dtype(ns.dtype))
        x = jax.random.normal(rng, (ns.batch, RES, RES, 3),
                              dtype=jnp.float32)
        params = jit_init(model, rng, x[:1], jnp.zeros((1,)))

        def model_fn(p, xx, tt):
            return model.apply(p, xx, tt)

    jax.block_until_ready(params)
    print("# init done", flush=True)

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000)
    sched = build_schedule(betas=betas, t_sampling=ns.t_sampling)
    op = build_functional_operator("sr_averagepooling", image_size=RES,
                                   deg_scale=4)
    y = op.A(x)
    x_init = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
    kwargs = dict(eta=0.85, sigma_y=0.0, params=params)

    results = {}
    outs = {}
    for loop in ("host", "scan"):
        t0 = time.perf_counter()
        out, _ = sample_simplified(model_fn, x_init, y, op, sched,
                                   jax.random.PRNGKey(7), loop=loop, **kwargs)
        outs[loop] = np.asarray(jax.device_get(out), np.float32)
        first = time.perf_counter() - t0
        trials = []
        for i in range(ns.trials):
            t0 = time.perf_counter()
            out, _ = sample_simplified(model_fn, x_init, y, op, sched,
                                       jax.random.PRNGKey(7), loop=loop,
                                       **kwargs)
            jax.device_get(out)
            trials.append(time.perf_counter() - t0)
        steady = sorted(trials)[len(trials) // 2]
        results[loop] = {
            "first_call_s": round(first, 2),
            "steady_s": round(steady, 2),
            "img_per_sec": round(ns.batch / steady, 3),
            "trials_s": [round(t, 2) for t in trials],
        }
        print(f"# {loop}: {results[loop]}", flush=True)

    diff = float(np.abs(outs["host"] - outs["scan"]).max())
    mse = float(np.mean((outs["host"] - outs["scan"]) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # [-1,1] range -> peak 2
    results["numerics"] = {"max_abs_diff": diff,
                           "host_vs_scan_psnr_db": round(float(psnr), 2)}
    if ns.trained != "none":
        # end-metric agreement: with a contractive trained denoiser both
        # drivers must restore the gt equally well even where trajectories
        # differ pointwise
        gt_arr = np.asarray(x, np.float32)
        for loop in ("host", "scan"):
            m = float(np.mean((outs[loop] - gt_arr) ** 2))
            results["numerics"][f"{loop}_vs_gt_psnr_db"] = round(
                10 * np.log10(4.0 / max(m, 1e-12)), 2)
    results["speedup_scan_over_host"] = round(
        results["host"]["steady_s"] / results["scan"]["steady_s"], 3)
    results["dtype"] = ns.dtype
    results["trained"] = ns.trained
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
