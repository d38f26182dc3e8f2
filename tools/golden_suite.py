"""Emit the trained-weights golden PSNR table (VERDICT round-1 #1b).

Runs every task in tests/_golden.TASKS through BOTH frameworks (zero-noise
deterministic, shared trained weights) and writes:
  tests/fixtures/toy_golden_psnr.json  — committed regression goldens
  stdout                               — markdown table for BASELINE.md

Run after (re)training the fixture:  python tools/golden_suite.py --emit-goldens
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
    ns = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # torch oracle side by side

    from tests._golden import TASKS, run_task

    results = {}
    lines = ["| task | ours PSNR (dB) | reference PSNR (dB) | delta | max abs diff |",
             "|---|---|---|---|---|"]
    for name, deg, scale, sigma_y in TASKS:
        r = run_task(deg, scale, sigma_y, n_images=ns.images)
        results[name] = r
        lines.append(
            f"| {name} | {r['ours_psnr']:.4f} | {r['ref_psnr']:.4f} | "
            f"{r['ours_psnr'] - r['ref_psnr']:+.4f} | {r['max_abs_diff']:.2e} |"
        )
        print(f"# {name}: {r}", flush=True)

    print("\n".join(lines))
    if ns.emit_goldens:
        out = REPO / "tests/fixtures/toy_golden_psnr.json"
        out.write_text(json.dumps(results, indent=2) + "\n")
        print(f"\nwrote {out}")
    return results


if __name__ == "__main__":
    main()
