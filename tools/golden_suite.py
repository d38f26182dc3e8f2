"""Emit the trained-weights golden PSNR tables (VERDICT round-1 #1b).

Runs every task of a family's golden suite through BOTH frameworks
(zero-noise deterministic, shared trained weights) and writes:

  --family ddpm (default): tests/fixtures/toy_golden_psnr.json
      main pipeline, "simple" DDPM family, evaluation.sh task matrix
      (tests/_golden.TASKS via sample_svd vs the reference's svd_ddnm)
  --family adm: tests/fixtures/toy_adm32_psnr.json
      hq pipeline, ADM family with learn_sigma, hq task matrix
      (tests/_golden_adm.TASKS_HQ via sample_posterior vs the reference's
      SpacedDiffusion.p_sample loop)

stdout: markdown table for BASELINE.md.

Run after (re)training a fixture:
  python tools/golden_suite.py [--family adm] --emit-goldens
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit-goldens", action="store_true")
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--family", choices=["ddpm", "adm"], default="ddpm")
    ns = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # torch oracle side by side

    if ns.family == "ddpm":
        from tests._golden import TASKS, run_task

        tasks = TASKS
        run = lambda t: run_task(t[1], t[2], t[3], n_images=ns.images)
        out_path = REPO / "tests/fixtures/toy_golden_psnr.json"
    else:
        from tests._golden_adm import (
            CLF_PT,
            TASKS_HQ,
            run_hq_guided_task,
            run_hq_task,
        )

        n_img = min(ns.images, 2)
        if n_img != ns.images:
            print(f"# adm family: clamping --images {ns.images} -> {n_img} "
                  "(the reference hq ops are batch-1; per-image driving)")
        tasks = list(TASKS_HQ)
        run = lambda t: (run_hq_guided_task(t[1], t[2], n_images=n_img)
                         if t[0] == "hq_guided_sr"
                         else run_hq_task(t[1], t[2], t[3], n_images=n_img))
        if CLF_PT.exists():
            tasks.append(("hq_guided_sr", "sr_averagepooling", 4, 0.0))
        elif ns.emit_goldens:
            raise SystemExit(
                "refusing --emit-goldens without tests/fixtures/toy_clf32.pt: "
                "the rewritten goldens would drop the hq_guided_sr row and "
                "silently disarm test_golden_guided_trained's drift check. "
                "Train it first (tools/train_toy_classifier_golden.py).")
        out_path = REPO / "tests/fixtures/toy_adm32_psnr.json"

    results = {}
    lines = ["| task | ours PSNR (dB) | reference PSNR (dB) | delta | max abs diff |",
             "|---|---|---|---|---|"]
    for task in tasks:
        name = task[0]
        r = {k: v for k, v in run(task).items() if k != "images"}
        results[name] = r
        lines.append(
            f"| {name} | {r['ours_psnr']:.4f} | {r['ref_psnr']:.4f} | "
            f"{r['ours_psnr'] - r['ref_psnr']:+.4f} | {r['max_abs_diff']:.2e} |"
        )
        print(f"# {name}: {r}", flush=True)

    print("\n".join(lines))
    if ns.emit_goldens:
        out_path.write_text(json.dumps(results, indent=2) + "\n")
        print(f"\nwrote {out_path}")
    return results


if __name__ == "__main__":
    main()
