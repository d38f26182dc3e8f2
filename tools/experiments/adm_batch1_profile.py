#!/usr/bin/env python
"""Profile the batch-1 ADM-552M posterior step (the hq sequential chain).

VERDICT round-1 weak #7 / next #6: the sequential batch-1 hq chain is the
one workload where the chip looks underused (22 ms/step vs a rough ~12 ms
roofline floor). This experiment pins the number down:

  1. XLA cost analysis of the batch-1 class-conditional ADM forward
     (FLOPs + bytes) -> the roofline floor on this chip.
  2. A traced 30-step run of the real posterior chain -> device busy
     ms/step + idle fraction (tools/trace_report.py on the xplane).

Usage:  python tools/experiments/adm_batch1_profile.py [--steps 30]
        [--trace /tmp/adm_b1_trace] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

PEAK_TFLOPS = 197.0  # v5e bf16
SUSTAINED_GBS = 550.0  # measured on fused bf16 chains (docs/PERFORMANCE.md)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--trace", type=str, default="/tmp/adm_b1_trace")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no-trace", action="store_true",
                    help="skip the xplane trace pass (batch-sweep probes "
                         "only need the timed chain)")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddnm_tpu.config import load_hq_config
    from ddnm_tpu.models import cast_torso
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling.posterior import build_posterior_tables, sample_posterior
    from ddnm_tpu.schedules import named_beta_schedule
    from ddnm_tpu.utils import enable_compilation_cache, jit_init
    from hq_main import build_adm_from_hq

    enable_compilation_cache()
    conf = load_hq_config(REPO / "configs/hq/inet256.yml")
    dtype = jnp.bfloat16 if ns.dtype == "bfloat16" else jnp.float32
    model = build_adm_from_hq(conf, dtype)
    rng = jax.random.PRNGKey(0)
    b = ns.batch
    x = jax.random.normal(rng, (b, 256, 256, 3), jnp.float32)
    t = jnp.zeros((b,))
    y = jnp.zeros((b,), jnp.int32)
    params = jit_init(model, rng, x, t, y)
    if dtype == jnp.bfloat16:
        params = cast_torso(params, jnp.bfloat16)

    def model_fn(p, xx, tt):
        cls = jnp.full((xx.shape[0],), 0, dtype=jnp.int32)
        return model.apply(p, xx, tt, cls)

    # ---- 1. cost analysis of the forward ----
    lowered = jax.jit(model_fn).lower(params, x, t)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    floor_compute_ms = flops / (PEAK_TFLOPS * 1e12) * 1e3
    floor_memory_ms = bytes_acc / (SUSTAINED_GBS * 1e9) * 1e3
    print(json.dumps({
        "forward_tflop": round(flops / 1e12, 3),
        "forward_gb": round(bytes_acc / 1e9, 3),
        "floor_compute_ms": round(floor_compute_ms, 2),
        "floor_memory_ms": round(floor_memory_ms, 2),
        "batch": b, "dtype": ns.dtype,
    }), flush=True)

    # ---- 2. timed + traced chain ----
    tables = build_posterior_tables(
        betas=named_beta_schedule("linear", 1000, use_scale=True),
        timestep_respacing="100", sigma_y=0.0,
        schedule_jump_params=dict(t_T=100, n_sample=1, jump_length=10,
                                  jump_n_sample=3),
    )
    # truncate to the first ns.steps schedule entries for the traced run
    import dataclasses

    short = dataclasses.replace(
        tables, t_cur=tables.t_cur[: ns.steps],
        is_travel=tables.is_travel[: ns.steps],
    )
    op = build_functional_operator("sr_averagepooling", image_size=256,
                                   deg_scale=4)
    apy = op.Ap(op.A(x))

    def run(tbl, key):
        out, _ = sample_posterior(model_fn, x, apy, op, tbl, key, params=params)
        return out

    jax.device_get(run(short, jax.random.PRNGKey(1)))  # warm/compile
    t0 = time.perf_counter()
    jax.device_get(run(short, jax.random.PRNGKey(2)))
    warm_dt = time.perf_counter() - t0
    n_model = int((~short.is_travel).sum())
    print(json.dumps({
        "steps": int(ns.steps), "model_calls": n_model,
        "wall_s": round(warm_dt, 3),
        "wall_ms_per_model_call": round(warm_dt * 1e3 / n_model, 2),
    }), flush=True)

    if not ns.no_trace:
        with jax.profiler.trace(ns.trace):
            jax.device_get(run(short, jax.random.PRNGKey(3)))
        print(f"trace written to {ns.trace}; analyze with "
              f"python tools/trace_report.py {ns.trace}")


if __name__ == "__main__":
    main()
