"""Emit the trained-weights golden PSNR tables (VERDICT r1 #1b, r2 #1/#2).

Runs every task of a family's golden suite through BOTH frameworks
(zero-noise deterministic, shared trained weights) and writes JSON goldens:

  --family ddpm (default): main pipeline, "simple" DDPM family,
      evaluation.sh task matrix (tests/_golden.TASKS via sample_svd vs the
      reference's svd_ddnm)
  --family adm: hq pipeline, ADM family with learn_sigma, hq task matrix
      (tests/_golden_adm.TASKS_HQ via sample_posterior vs the reference's
      SpacedDiffusion.p_sample loop)

  --tier toy32|mid64 selects the golden scale tier (toy 32px/0.7M vs mid
      64px/6.8M-12.3M — VERDICT r2 item #2).
  --dtype bfloat16 runs OUR side in the production configuration (bf16
      torso + bf16-resident params; the torch reference always runs fp32)
      and additionally reports ours-bf16 vs ours-fp32 trajectory PSNR —
      how much of the fidelity budget the production dtype consumes
      (VERDICT r2 item #1).

Golden JSON paths: tests/fixtures/{toy_golden_psnr,mid_golden_psnr,
toy_adm32_psnr,mid_adm64_psnr}[_bf16].json.

stdout: markdown table for BASELINE.md.

Run after (re)training a fixture:
  python tools/golden_suite.py [--family adm] [--tier mid64]
      [--dtype bfloat16] --emit-goldens
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _assert_fixtures_tracked(tier) -> None:
    """Refuse to emit goldens whose inputs aren't reproducible from git.

    VERDICT round-4 item 1: the big128 goldens landed while their eval
    images (exp/datasets/natural128) were never committed, so the gates
    went red on a fresh checkout. Goldens are only meaningful if both the
    trained fixture AND the eval images they were computed on are tracked.
    """
    import subprocess

    missing = []
    for p, what in ((tier.fixture, "trained fixture"),
                    (tier.eval_dir, "eval image dir")):
        tracked = subprocess.run(
            ["git", "ls-files", "--", str(p.relative_to(REPO))],
            cwd=REPO, capture_output=True, text=True).stdout.strip()
        if not tracked:
            missing.append(f"{what} {p.relative_to(REPO)}")
    if missing:
        raise SystemExit(
            "refusing --emit-goldens: the following golden inputs are not "
            "tracked by git (a fresh checkout could not reproduce the "
            "emitted goldens): " + "; ".join(missing) +
            ". `git add` them first.")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit-goldens", action="store_true")
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--family", choices=["ddpm", "adm"], default="ddpm")
    ap.add_argument("--tier", choices=["toy32", "mid64", "big128", "flag256"],
                    default="toy32")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32")
    ap.add_argument("--also-emit-fp32", action="store_true",
                    help="with --dtype bfloat16 --emit-goldens: also write "
                         "the fp32 golden JSON from the fp32+reference pass "
                         "the bf16 protocol already runs per task (one "
                         "combined emission instead of two full suites)")
    ns = ap.parse_args(argv)
    if ns.also_emit_fp32 and ns.dtype != "bfloat16":
        raise SystemExit("--also-emit-fp32 requires --dtype bfloat16")

    import jax

    jax.config.update("jax_platforms", "cpu")  # torch oracle side by side

    bf16 = ns.dtype == "bfloat16"

    if ns.family == "ddpm":
        from tests._golden import TIERS, TASKS, run_task

        tier = TIERS[ns.tier]
        tasks = TASKS

        def run(t, dtype=None, skip_ref=False):
            return run_task(t[1], t[2], t[3], n_images=ns.images, tier=tier,
                            dtype=dtype, return_images=True,
                            skip_ref=skip_ref)

        out_path = tier.golden_json
    else:
        from tests._golden_adm import (
            ADM_TIERS,
            TASKS_HQ,
            run_hq_guided_task,
            run_hq_task,
        )

        if ns.tier not in ADM_TIERS:
            raise SystemExit(
                f"--family adm has no {ns.tier!r} tier (available: "
                f"{sorted(ADM_TIERS)})")
        tier = ADM_TIERS[ns.tier]
        n_img = min(ns.images, 2)
        if n_img != ns.images:
            print(f"# adm family: clamping --images {ns.images} -> {n_img} "
                  "(the reference hq ops are batch-1; per-image driving)")
        tasks = list(TASKS_HQ)

        def run(t, dtype=None, skip_ref=False):
            if t[0] == "hq_guided_sr":
                return run_hq_guided_task(t[1], t[2], n_images=n_img,
                                          tier=tier, dtype=dtype,
                                          skip_ref=skip_ref)
            return run_hq_task(t[1], t[2], t[3], n_images=n_img, tier=tier,
                               dtype=dtype, skip_ref=skip_ref)

        if tier.clf_fixture.exists():
            tasks.append(("hq_guided_sr", "sr_averagepooling", 4, 0.0))
        elif ns.emit_goldens:
            raise SystemExit(
                f"refusing --emit-goldens without {tier.clf_fixture}: "
                "the rewritten goldens would drop the hq_guided_sr row and "
                "silently disarm test_golden_guided_trained's drift check. "
                f"Train it first (tools/{tier.clf_mod}.py).")
        out_path = tier.golden_json

    if bf16:
        out_path = out_path.with_name(out_path.stem + "_bf16.json")

    if ns.emit_goldens:
        _assert_fixtures_tracked(tier)

    results = {}
    fp32_results = {}
    if bf16:
        lines = ["| task | ours bf16 PSNR (dB) | ours fp32 PSNR | "
                 "reference fp32 PSNR | bf16-fp32 delta | "
                 "bf16-vs-fp32 traj PSNR |",
                 "|---|---|---|---|---|---|"]
    else:
        lines = ["| task | ours PSNR (dB) | reference PSNR (dB) | delta | "
                 "max abs diff |",
                 "|---|---|---|---|---|"]
    for task in tasks:
        name = task[0]
        if bf16:
            # fp32 pass carries the torch reference; bf16 pass is ours-only
            r32 = run(task, dtype=None)
            fp32_results[name] = {
                k: v for k, v in r32.items() if k != "images"}
            rb = run(task, dtype="bfloat16", skip_ref=True)
            from tests._golden import psnr01

            traj = psnr01(rb["images"]["ours"], r32["images"]["ours"])
            r = {
                "ours_psnr": rb["ours_psnr"],
                "fp32_psnr": r32["ours_psnr"],
                "ref_psnr": r32["ref_psnr"],
                "bf16_minus_fp32_db": round(
                    rb["ours_psnr"] - r32["ours_psnr"], 4),
                "bf16_vs_fp32_traj_psnr": round(traj, 2),
            }
            lines.append(
                f"| {name} | {r['ours_psnr']:.4f} | {r['fp32_psnr']:.4f} | "
                f"{r['ref_psnr']:.4f} | {r['bf16_minus_fp32_db']:+.4f} | "
                f"{r['bf16_vs_fp32_traj_psnr']:.2f} |")
        else:
            r = {k: v for k, v in run(task).items() if k != "images"}
            lines.append(
                f"| {name} | {r['ours_psnr']:.4f} | {r['ref_psnr']:.4f} | "
                f"{r['ours_psnr'] - r['ref_psnr']:+.4f} | "
                f"{r['max_abs_diff']:.2e} |")
        results[name] = r
        print(f"# {name}: {r}", flush=True)

    print("\n".join(lines))
    if ns.emit_goldens:
        out_path.write_text(json.dumps(results, indent=2) + "\n")
        print(f"\nwrote {out_path}")
        if ns.also_emit_fp32:
            tier.golden_json.write_text(
                json.dumps(fp32_results, indent=2) + "\n")
            print(f"wrote {tier.golden_json}")
    return results


if __name__ == "__main__":
    main()
