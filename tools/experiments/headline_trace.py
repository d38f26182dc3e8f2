"""Capture a fresh xplane trace of the EXACT headline-bench hot step.

VERDICT r4 groundwork (r3 item 4: "move the headline bench or prove it
immovable"): bench.py's flagship workload — CelebA-HQ-class DDPM UNet
(114M, bf16 torso / fp32 GN), batch 8, 256px, simplified DDNM+ 4x SR,
host loop driver (what `auto` resolves to for >64 MB params on the
remote-compile backend) — traced over a short window of hot steps so
tools/trace_report.py and tools/experiments/headline_roofline.py can
break the serialized device timeline down per fusion.

Run on the TPU:
  python tools/experiments/headline_trace.py [--steps 12]
      [--out /tmp/headline_trace] [--donate]

--donate additionally times a donated-carry variant of the hot step
(x buffer donated via jax.jit(..., donate_argnums)) for the VERDICT item
4(b) measurement — end-to-end timed, no trace.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--out", type=str, default="/tmp/headline_trace")
    ap.add_argument("--donate", action="store_true")
    ap.add_argument("--runs", type=int, default=3,
                    help="timed end-to-end runs per variant (--donate)")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule
    from ddnm_tpu.sampling import ddnm as ddnm_mod
    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    enable_compilation_cache()
    BATCH, RES = 8, 256

    model = DDPMUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, RES, RES, 3), dtype=jnp.float32)
    params = jit_init(model, rng, x[:1], jnp.zeros((1,)))
    jax.block_until_ready(params)
    print("# init done", flush=True)

    def model_fn(p, xx, tt):
        return model.apply(p, xx, tt)

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000)
    sched = build_schedule(betas=betas, t_sampling=100)
    op = build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)
    y = op.A(x)

    body = ddnm_mod._Body(  # the bench's simplified step body
        ddnm_mod._simplified_body,
        (model_fn, op, 0.85, 0.0))
    abar = sched.alpha_bar

    def hot_step(xx, key, t_i, at, at_next):
        return ddnm_mod._host_step(
            body, ddnm_mod._default_noise, params, xx, y, key,
            t_i, at, at_next, None)

    # warm the step executable with a few mid-schedule steps
    key = jax.random.PRNGKey(1)
    t_i = float(sched.t_cur[50])
    at = float(abar[int(sched.t_cur[50]) + 1])
    at_next = float(abar[int(sched.t_next[50]) + 1])
    xx = x
    for _ in range(3):
        xx, _, key = hot_step(xx, key, t_i, at, at_next)
    jax.device_get(xx)
    print("# warmup done", flush=True)

    with jax.profiler.trace(ns.out):
        for _ in range(ns.steps):
            xx, _, key = hot_step(xx, key, t_i, at, at_next)
        jax.device_get(xx)
    print(f"# traced {ns.steps} hot steps -> {ns.out}", flush=True)

    if ns.donate:
        # VERDICT item 4(b): donate the x carry buffer through the step.
        donated = jax.jit(
            ddnm_mod._host_step.__wrapped__,
            static_argnames=("body", "noise_fn"),
            donate_argnums=(3,),  # x
        )

        def run(step_fn, tag):
            times = []
            for r in range(ns.runs):
                zz = jnp.array(x)  # fresh buffer (donation consumes it)
                k = jax.random.PRNGKey(10 + r)
                t0 = time.perf_counter()
                for _ in range(100):
                    zz, _, k = step_fn(
                        body, ddnm_mod._default_noise, params, zz, y, k,
                        t_i, at, at_next, None)
                jax.device_get(zz)
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            print(f"# {tag}: {med:.3f}s /100 steps "
                  f"(trials {[round(t, 3) for t in times]})", flush=True)
            return med

        # warm the donated executable
        zz = jnp.array(x)
        zz, _, _ = donated(body, ddnm_mod._default_noise, params, zz, y,
                           jax.random.PRNGKey(9), t_i, at, at_next, None)
        jax.device_get(zz)
        base = run(lambda *a: ddnm_mod._host_step(*a), "plain   ")
        don = run(lambda *a: donated(*a), "donated ")
        print(f"# donation delta: {100 * (base - don) / base:+.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
