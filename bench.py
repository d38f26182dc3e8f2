#!/usr/bin/env python
"""Benchmark: images/sec/chip for the flagship DDNM restoration workload.

Workload (matches the tracked baseline config, BASELINE.md): 4x
super-resolution at 256x256 with 100 DDIM steps of the CelebA-HQ-class DDPM
UNet (128ch x (1,1,2,2,4,4), ~114M params), simplified DDNM+, bf16 torso,
batched sampling on one TPU chip. Weights are random-initialised (no
pretrained checkpoints are reachable in this environment); throughput is
weight-independent.

Baseline: the reference publishes no throughput numbers
(BASELINE.json.published == {}). We benchmark against the documented
estimate of the PyTorch reference on its own GPU setup: ~0.1 images/sec
(100 UNet passes at 256px, batch 1, torch fp16/fp32 on a V100/3090-class
card — consistent with the README's "may take hours" for larger jobs).
`vs_baseline` = ours / 0.1.

Prints ONE JSON line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s", "vs_baseline": N}
Multi-chip: `--dp N` shards the image batch over an N-way data mesh
(batch scales to 8*N), `--sp N` additionally shards each image's rows
(spatial partitioning). On real multi-chip hardware this makes scaling a
one-command measurement; on this one-chip dev host use it with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N for
a layout sanity run (timings then mean nothing).
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import time

# Reference throughput anchors (VERDICT round-1 #2). Measured:
# tools/measure_reference_baseline.py runs the reference's OWN simplified
# DDNM+ loop (random-init weights; timing is weight-independent) on this
# host's CPU — see BASELINE.md "measured reference" for the current
# numbers. The GPU figure stays an extrapolation (no CUDA here): ~0.1
# img/s on a V100/3090-class card (100 UNet passes at 256px, batch 1),
# consistent with the README's "may take hours" for larger jobs and with
# the measured ~6.2 s/step CPU floor (a V100 runs this UNet forward
# ~60-100x faster than one Rome-class core).
REFERENCE_IMG_PER_SEC = 0.1  # documented GPU estimate (headline divisor)
REFERENCE_IMG_PER_SEC_CPU_MEASURED = 0.00139  # measured 2026-08-17, BASELINE.md

# sampling workload
BATCH = 8
RES = 256
T_SAMPLING = 100


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel mesh width (batch scales to 8*dp)")
    ap.add_argument("--sp", type=int, default=1,
                    help="spatial partitioning: shard image rows this many ways")
    ap.add_argument("--batch", type=int, default=BATCH,
                    help="per-chip sampler batch (tracked config: 8)")
    ap.add_argument("--loop", type=str, default="auto",
                    choices=["auto", "host", "scan"],
                    help="sampler loop driver (see docs/PERFORMANCE.md)")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="model torso dtype. bfloat16 is the production "
                         "headline config; float32 is the parity-default "
                         "config every golden-suite fidelity claim runs "
                         "(VERDICT r4 item 7: quote both)")
    ap.add_argument("--accel", action="store_true",
                    help="additionally measure the opt-in accelerated "
                         "configs (encoder_cache 3 at ~matched quality; "
                         "10-step multistep for the few-step regime) and "
                         "report them in the same JSON line under 'accel' "
                         "(VERDICT r3 item 4c). The headline 'value' stays "
                         "the exact reference-parity config.")
    ns = ap.parse_args(argv)

    # Watchdog: the remote-compile tunnel can hang indefinitely at first
    # device contact (observed: jax.devices() never returns when the
    # backend is unreachable). Rather than hanging the caller, emit the
    # one-line JSON with value 0 and an error marker, and exit non-zero.
    def _arm(seconds: float, stage: str) -> threading.Timer:
        def boom():
            print(json.dumps({
                "metric": "images_per_sec_per_chip",
                "value": 0.0,
                "unit": "img/s (256px, 100-step DDNM 4x SR)",
                "vs_baseline": 0.0,
                "error": f"device backend unresponsive for {seconds:.0f}s "
                         f"during {stage} (remote-compile tunnel down?)",
            }), flush=True)
            os._exit(1)

        t = threading.Timer(seconds, boom)
        t.daemon = True
        t.start()
        return t

    import jax
    import jax.numpy as jnp

    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    enable_compilation_cache()

    wd = _arm(300.0, "first device contact")
    jax.devices()  # force backend/tunnel initialisation under the watchdog
    wd.cancel()
    # compiles can legitimately take minutes cold through the tunnel; only
    # a hard hang should trip this
    wd = _arm(1800.0, "compile/warmup")

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule, sample_simplified

    import sys

    def mark(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)

    mark("start")
    n_chips = ns.dp * ns.sp
    batch = ns.batch * ns.dp
    dtype = jnp.bfloat16 if ns.dtype == "bfloat16" else jnp.float32
    model = DDPMUNet(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, RES, RES, 3), dtype=jnp.float32)
    t = jnp.zeros((batch,))
    params = jit_init(model, rng, x[:1], t[:1])
    jax.block_until_ready(params)
    mark("init done")

    shard_in = lambda a: a
    if n_chips > 1:
        if ns.sp > 1:
            from ddnm_tpu.parallel import make_mesh_2d, replicate, shard_tiles

            mesh = make_mesh_2d(ns.dp, ns.sp)
            shard_in = lambda a: shard_tiles(mesh, a)
        else:
            from ddnm_tpu.parallel import make_mesh, replicate, shard_batch

            mesh = make_mesh(ns.dp)
            shard_in = lambda a: shard_batch(mesh, a)
        params = replicate(mesh, params)
        x = shard_in(x)
        mark(f"mesh {ns.dp}x{ns.sp} over {len(jax.devices())} devices")

    def model_fn(p, xx, tt):
        return model.apply(p, xx, tt)

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    )
    sched = build_schedule(betas=betas, t_sampling=T_SAMPLING)
    sched_warm = build_schedule(betas=betas, t_sampling=10)
    mark("schedule built")
    op = build_functional_operator("sr_averagepooling", image_size=RES, deg_scale=4)
    y = shard_in(op.A(x))

    kwargs = dict(eta=0.85, sigma_y=0.0, loop=ns.loop)

    # warmup / compile
    # short warmup: the host-loop step executable is schedule-length
    # independent, so 10 steps absorb compile + one-time relay costs
    mark("warmup begin")
    out, _ = sample_simplified(
        model_fn, x, y, op, sched_warm, jax.random.PRNGKey(1), params=params, **kwargs
    )
    jax.device_get(out)  # full sync (block_until_ready is unreliable on axon)
    # one full-length run to absorb residual first-execution costs
    out, _ = sample_simplified(
        model_fn, x, y, op, sched, jax.random.PRNGKey(99), params=params, **kwargs
    )
    jax.device_get(out)
    mark("warmup done")
    wd.cancel()  # timed runs below are bounded by real compute

    # timed runs: time each run separately and take the median, so a
    # transient stall of the shared chip / remote-compile tunnel (observed:
    # a single cold run at ~2x the hot step time) cannot halve the
    # recorded steady-state number.
    n_trials, runs_per_trial = 3, 2
    per_trial = []
    for i in range(n_trials):
        t0 = time.perf_counter()
        for j in range(runs_per_trial):
            out, _ = sample_simplified(
                model_fn, x, y, op, sched,
                jax.random.PRNGKey(2 + i * runs_per_trial + j),
                params=params, **kwargs
            )
        jax.device_get(out)
        per_trial.append(time.perf_counter() - t0)
        mark(f"trial {i}: {per_trial[-1]:.2f}s")
    dt = sorted(per_trial)[len(per_trial) // 2]

    # per-chip divisor = mesh size (1 for the default single-device jit,
    # regardless of how many devices the host exposes)
    img_per_sec_chip = (runs_per_trial * batch) / dt / n_chips
    from ddnm_tpu.models.nn import gn_impl

    result = {
        "metric": "images_per_sec_per_chip",
        "value": round(img_per_sec_chip, 4),
        "unit": "img/s (256px, 100-step DDNM 4x SR)",
        "vs_baseline": round(img_per_sec_chip / REFERENCE_IMG_PER_SEC, 2),
        # active-config markers (VERDICT r4 item 2: make dtype/GN
        # discrepancies diagnosable from the one JSON line of record)
        "dtype": ns.dtype,
        "gn": gn_impl(),
        "loop": ns.loop,
        "trials_s": [round(v, 3) for v in sorted(per_trial)],
    }

    if ns.accel and n_chips == 1:
        # Opt-in accelerated configs (docs/PERFORMANCE.md for the quality
        # framing; both are OFF by default in the CLIs):
        #  - encoder_cache 3: ~matched quality (approximate — encoder
        #    features reused 2 of every 3 calls), same 100-call schedule;
        #  - multistep 10-step: the few-step serving regime where the
        #    second-order solver BEATS 100-step ddim quality is not claimed;
        #    at <=10 NFE it wins +4-10 dB over 10-step ddim (solver table).
        from ddnm_tpu.sampling import sample_simplified_multistep
        from ddnm_tpu.sampling.accel import (
            ddpm_split_fns,
            sample_simplified_encoder_prop,
        )

        def timed(run):
            run()  # warm
            trials = []
            for i in range(3):
                t0 = time.perf_counter()
                run()
                trials.append(time.perf_counter() - t0)
            return sorted(trials)[1]

        enc, dec = ddpm_split_fns(model)
        dt_ec = timed(lambda: jax.device_get(sample_simplified_encoder_prop(
            enc, dec, x, y, op, sched, jax.random.PRNGKey(5),
            eta=0.85, sigma_y=0.0, interval=3, params=params)[0]))
        sched10 = build_schedule(betas=betas, t_sampling=10)
        dt_ms = timed(lambda: jax.device_get(sample_simplified_multistep(
            model_fn, x, y, op, sched10, jax.random.PRNGKey(6),
            loop=ns.loop, params=params)[0]))
        result["accel"] = {
            "encoder_cache3_img_per_sec": round(batch / dt_ec, 4),
            "multistep_nfe10_img_per_sec": round(batch / dt_ms, 4),
            "note": "opt-in approximate configs; headline value is the "
                    "exact reference-parity sampler",
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
