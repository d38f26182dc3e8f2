"""NFE-vs-PSNR for the posterior (hq / Mask-Shift) multistep solver.

VERDICT r3 item 5: the few-step regime the second-order solver wins is
exactly where hq tiling's ~380-model-calls-per-tile cost
(hq_demo/guided_diffusion/scheduler.py:70-147) hurts most — so evaluate
the solver in the POSTERIOR parameterisation on a genuine MULTI-TILE
Mask-Shift run, not just the single-image main pipeline.

Protocol: 128px canvases from the committed natural-image family
(tools/experiments/natural_family.py) restored with the trained mid64 ADM
fixture (12.25M, learn_sigma) through `tiling.mask_shift_sample` with the
tile geometry scaled to the model (TILE=64, STRIDE=32 — same 2:1
tile:stride ratio as the reference's 256/128, giving a 3x3 = 9-tile
sequential carry chain with overlap pastes). Zero-noise deterministic like
the golden suites; 4x avg-pool SR (the reference hq demo task,
hq_demo/evaluation.sh:3-17).

Rows: pure respacing budgets (no travel) x {ddim, multistep}, plus a
jump-schedule anchor (respacing 25 + jump 25/10x2 ~= 45 calls/tile — the
reference-protocol shape) for both solvers.

CPU-friendly (the fixture is small):
  python tools/experiments/solver_posterior_quality.py
      [--tier mid64|toy32] [--images 2] [--canvas 128]
      [--nfe 6,10,15,25,50,100]
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
    ap.add_argument("--tier", choices=["toy32", "mid64"], default="mid64")
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--canvas", type=int, default=None,
                    help="canvas size (default 2x the tile/model res)")
    ap.add_argument("--nfe", type=str, default="6,10,15,25,50,100")
    ns = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ddnm_tpu import schedules as sch
    from ddnm_tpu import tiling
    from ddnm_tpu.sampling import build_posterior_tables
    from tests._golden import psnr01
    from tests._golden_adm import ADM_TIERS, load_our_model

    sys.path.insert(0, str(REPO / "tools/experiments"))
    from natural_family import make_naturals  # tools/experiments sibling

    tier = ADM_TIERS[ns.tier]
    if not tier.fixture.exists():
        raise SystemExit(f"{ns.tier} adm fixture not trained: {tier.fixture}")
    res = tier.res
    canvas = ns.canvas or 2 * res

    # scale the Mask-Shift geometry to the fixture's native tile size,
    # keeping the reference's 2:1 tile:stride overlap structure
    tiling.TILE = res
    tiling.STRIDE = res // 2
    n_tiles = len(tiling.tile_grid(canvas, canvas))
    print(f"# {ns.tier}: {canvas}px canvas, TILE={res} STRIDE={res // 2} "
          f"-> {n_tiles} tiles", flush=True)

    model_fn, params = load_our_model(tier)
    gts = np.asarray(
        make_naturals(jax.random.PRNGKey(42), ns.images, canvas))
    betas = sch.named_beta_schedule("linear", 1000, use_scale=True)
    zero = lambda key, shape: jnp.zeros(shape, jnp.float32)

    def run(solver, tables):
        # tile_init rides the library default: ddim keeps the reference's
        # sequential carry chain, multistep gets fresh per-tile inits (the
        # ODE solver needs each tile's init at the top noise level; the
        # overlap PASTE still enforces cross-tile consistency) — see
        # tiling.mask_shift_sample.
        ps = []
        for i in range(ns.images):
            out = tiling.mask_shift_sample(
                model_fn, gts[i : i + 1], "sr_averagepooling", tables,
                jax.random.fold_in(jax.random.PRNGKey(7), i), scale=4,
                params=params, noise_fn=zero, solver=solver)
            gt01 = (gts[i] + 1.0) / 2.0
            out01 = np.clip((out["final"][0] + 1.0) / 2.0, 0.0, 1.0)
            ps.append(psnr01(out01, gt01))
        return float(np.mean(ps))

    rows = []
    for nfe in [int(s) for s in ns.nfe.split(",")]:
        tables = build_posterior_tables(
            betas=betas, timestep_respacing=str(nfe),
            schedule_jump_params=dict(t_T=nfe, n_sample=1, jump_length=1,
                                      jump_n_sample=1))
        r = {"nfe": nfe, "schedule": "respacing",
             "ddim": round(run("ddim", tables), 2),
             "multistep": round(run("multistep", tables), 2)}
        rows.append(r)
        print(json.dumps(r), flush=True)

    # jump-schedule anchor: the reference-protocol shape (time-travel on)
    jump_tables = build_posterior_tables(
        betas=betas, timestep_respacing="25",
        schedule_jump_params=dict(t_T=25, n_sample=1, jump_length=10,
                                  jump_n_sample=2))
    jump_nfe = int(np.sum(~np.asarray(jump_tables.is_travel)))
    r = {"nfe": jump_nfe, "schedule": "respace25+jump10x2",
         "ddim": round(run("ddim", jump_tables), 2),
         "multistep": round(run("multistep", jump_tables), 2)}
    rows.append(r)
    print(json.dumps(r), flush=True)

    print("\n| NFE/tile | schedule | ddim PSNR | multistep PSNR |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['nfe']} | {r['schedule']} | {r['ddim']} | "
              f"{r['multistep']} |")


if __name__ == "__main__":
    main()
