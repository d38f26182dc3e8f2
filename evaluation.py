#!/usr/bin/env python
"""Quantitative evaluation sweep — the reference's evaluation.sh:1-36 as a
parameterised harness.

Runs the same 14 task x dataset combinations (CelebA-HQ noise-free x6,
CelebA-HQ noisy x2, ImageNet noise-free x6) through main.py and collects the
per-run average PSNR into one JSON report. Extras over the reference:
--tasks/--datasets filters, --dry-run, batched sampling, and a machine-
readable summary.

Usage:
  python evaluation.py --ckpt-celeba /path/celeba_hq.ckpt \
      --ckpt-imagenet /path/256x256_diffusion_uncond.pt --exp exp -i eval_out
  python evaluation.py --random-init --smoke   # toy-size CI sweep
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# (name, config, deg, deg_scale, sigma_y, simplified, add_noise)
CELEBA_RUNS = [
    ("celeba_sr_bicubic_4x", "celeba_hq.yml", "sr_bicubic", 4.0, 0.0, False, False),
    ("celeba_sr_ap_4x", "celeba_hq.yml", "sr_averagepooling", 4.0, 0.0, False, False),
    ("celeba_deblur_gauss", "celeba_hq.yml", "deblur_gauss", 4.0, 0.0, False, False),
    ("celeba_colorization", "celeba_hq.yml", "colorization", 4.0, 0.0, False, False),
    ("celeba_cs_wh_025", "celeba_hq.yml", "cs_walshhadamard", 0.25, 0.0, False, False),
    ("celeba_inpainting", "celeba_hq.yml", "inpainting", 4.0, 0.0, False, False),
    # noisy (evaluation.sh:21-24)
    ("celeba_sr_ap_16x_noisy", "celeba_hq.yml", "sr_averagepooling", 16.0, 0.2, False, True),
    ("celeba_cs_wh_noisy", "celeba_hq.yml", "cs_walshhadamard", 0.25, 0.2, False, True),
]
IMAGENET_RUNS = [
    ("imagenet_sr_bicubic_4x", "imagenet_256.yml", "sr_bicubic", 4.0, 0.0, False, False),
    ("imagenet_sr_ap_4x", "imagenet_256.yml", "sr_averagepooling", 4.0, 0.0, False, False),
    ("imagenet_deblur_gauss", "imagenet_256.yml", "deblur_gauss", 4.0, 0.0, False, False),
    ("imagenet_colorization", "imagenet_256.yml", "colorization", 4.0, 0.0, False, False),
    ("imagenet_cs_wh_025", "imagenet_256.yml", "cs_walshhadamard", 0.25, 0.0, False, False),
    ("imagenet_inpainting", "imagenet_256.yml", "inpainting", 4.0, 0.0, False, False),
]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DDNM evaluation sweep")
    p.add_argument("--exp", type=str, default="exp")
    p.add_argument("-i", "--out", type=str, default="eval_out")
    p.add_argument("--ckpt-celeba", type=str, default=None)
    p.add_argument("--ckpt-imagenet", type=str, default=None)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--smoke", action="store_true",
                   help="toy config + tiny fixture set (CI)")
    p.add_argument("--tasks", type=str, default=None,
                   help="comma-separated run-name filter substrings")
    p.add_argument("--datasets", type=str, default="celeba,imagenet")
    p.add_argument("--path-y-celeba", type=str, default="celeba_hq")
    p.add_argument("--path-y-imagenet", type=str, default="imagenet")
    p.add_argument("--config-celeba", type=str, default=None,
                   help="substitute config for the CelebA rows (e.g. "
                        "flag256.yml to run the locally-trained flagship "
                        "fixture at its exact arch)")
    p.add_argument("--config-imagenet", type=str, default=None,
                   help="substitute config for the ImageNet rows (e.g. "
                        "adm128.yml — the trained ADM stand-in for the "
                        "unreachable 552M checkpoint)")
    p.add_argument("--mask_path", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--t-sampling", type=int, default=None,
                   help="override time_travel.T_sampling for every run "
                        "(reduced-protocol validation)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--dry-run", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    ns = parse_args(argv)
    import main as cli

    runs = []
    if "celeba" in ns.datasets:
        runs += [(r, ns.ckpt_celeba, ns.path_y_celeba) for r in CELEBA_RUNS]
    if "imagenet" in ns.datasets:
        runs += [(r, ns.ckpt_imagenet, ns.path_y_imagenet) for r in IMAGENET_RUNS]
    if ns.tasks:
        keys = [t.strip() for t in ns.tasks.split(",")]
        runs = [r for r in runs if any(k in r[0][0] for k in keys)]

    report = {}
    for (name, config, deg, scale, sigma_y, simplified, noisy), ckpt, path_y in runs:
        if ns.smoke:
            config = "smoke.yml"
        elif config == "celeba_hq.yml" and ns.config_celeba:
            config = ns.config_celeba
        elif config == "imagenet_256.yml" and ns.config_imagenet:
            config = ns.config_imagenet
        argv_run = [
            "--config", config, "--deg", deg, "--deg_scale", str(scale),
            "--sigma_y", str(sigma_y), "--exp", ns.exp, "--path_y", path_y,
            "-i", str(Path(ns.out) / name), "--ni",
        ]
        if simplified:
            argv_run.append("--simplified")
        if noisy:
            argv_run.append("--add_noise")
        if deg in ("inpainting", "mask_color_sr") and ns.mask_path:
            argv_run += ["--mask_path", ns.mask_path]
        if ns.t_sampling is not None:
            argv_run += ["--t_sampling", str(ns.t_sampling)]
        if ckpt:
            argv_run += ["--ckpt", ckpt]
        elif ns.random_init:
            argv_run.append("--random_init")
        if ns.batch_size:
            argv_run += ["--batch_size", str(ns.batch_size)]
        if ns.max_images:
            argv_run += ["--max_images", str(ns.max_images)]

        print(f"== {name}: main.py {' '.join(argv_run)}")
        if ns.dry_run:
            continue
        try:
            stats = cli.main(argv_run)
            report[name] = stats
        except Exception as e:  # keep sweeping
            print(f"!! {name} failed: {e}")
            report[name] = {"error": str(e)}

    # main.py re-roots relative -i under <exp>/image_samples (main.py:85-91);
    # write the report into the SAME tree the images landed in
    out_root = Path(ns.out)
    if not out_root.is_absolute():
        out_root = Path(ns.exp) / "image_samples" / ns.out
    out_path = out_root / "report.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
