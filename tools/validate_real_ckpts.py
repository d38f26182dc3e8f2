"""One-command PSNR-parity validation on REAL pretrained checkpoints.

VERDICT round-1 item #1a. The moment the reference's published weights are
reachable (air-gapped here — see data/checkpoints.py for URLs/paths), this
tool proves the ±0.1 dB BASELINE.md target end-to-end:

  1. STRICT conversion: each provided torch state dict is converted
     (models/convert.py) and validated leaf-for-leaf against the real-size
     flax model's own parameter structure (validate_converted_params) —
     catching key-set drift before any sampling.
  2. OURS: the evaluation.py protocol (the reference's evaluation.sh task
     matrix) runs through main.py with the converted weights.
  3. REFERENCE: the same tasks run through /root/reference/main.py
     in-process (tools/_reference_harness.py; native CUDA if available,
     CPU-patched otherwise) on the same images.
  4. A per-task PSNR table (ours vs reference vs delta) is printed and
     written as markdown, flagging any |delta| > 0.1 dB.

Usage:
  python tools/validate_real_ckpts.py \
      --ckpt-celeba exp/logs/celeba/celeba_hq.ckpt \
      --ckpt-imagenet exp/logs/imagenet/256x256_diffusion_uncond.pt \
      [--tasks sr_ap,colorization] [--images 2] [--skip-reference] \
      [--out BASELINE_real.md]

Convert-only sanity (no sampling):
  python tools/validate_real_ckpts.py --ckpt-celeba ... --convert-only
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

TOOLS = Path(__file__).resolve().parent
REPO = TOOLS.parent
sys.path.insert(0, str(TOOLS))
sys.path.insert(0, str(REPO))


def strict_convert(ckpt: Path, family: str) -> dict:
    """Convert + validate a real checkpoint against the real-size model."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.config import Config, load_config
    from ddnm_tpu.data.checkpoints import load_params

    if family == "celeba":
        from ddnm_tpu.models.unet_ddpm import DDPMUNet

        cfg = load_config(REPO / "configs/celeba_hq.yml")
        model = DDPMUNet.from_config(cfg)
        dummy = (jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)))
    elif family in ("imagenet", "imagenet_cond"):
        from ddnm_tpu.models.unet_adm import ADMUNet

        cfg = load_config(REPO / "configs/imagenet_256.yml"
                          if family == "imagenet"
                          else REPO / "configs/imagenet_256_cc.yml")
        model = ADMUNet.from_config(cfg)
        dummy = (jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)))
        if family == "imagenet_cond":
            dummy = dummy + (jnp.zeros((1,), jnp.int32),)
    elif family == "classifier":
        from ddnm_tpu.models.unet_adm import ADMClassifier

        cfg = load_config(REPO / "configs/imagenet_256_cc.yml")
        model = ADMClassifier.from_config(cfg.classifier, 256)
        dummy = (jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)))
    else:
        raise ValueError(family)

    expected = jax.eval_shape(model.init, jax.random.PRNGKey(0), *dummy)
    load_params(ckpt, expected=expected)  # raises on any structural drift
    n_leaves = len(jax.tree_util.tree_leaves(expected))
    return {"family": family, "ckpt": str(ckpt), "strict_convert": "ok",
            "leaves": n_leaves}


def _avg_psnr_from_outputs(out_dir: Path) -> float | None:
    """Recompute the reference's Total Average PSNR from its saved files:
    final `{idx}_0.png` vs `Apy/orig_{idx}.png` (diffusion.py:404-410)."""
    import numpy as np
    from PIL import Image

    apy = out_dir / "Apy"
    psnrs = []
    for orig_p in sorted(apy.glob("orig_*.png")):
        idx = orig_p.stem.split("_")[1]
        final_p = out_dir / f"{idx}_0.png"
        if not final_p.exists():
            continue
        a = np.asarray(Image.open(final_p), np.float32) / 255.0
        b = np.asarray(Image.open(orig_p), np.float32) / 255.0
        mse = float(np.mean((a - b) ** 2))
        psnrs.append(10.0 * np.log10(1.0 / max(mse, 1e-12)))
    return float(np.mean(psnrs)) if psnrs else None


def main(argv=None):
    from ddnm_tpu.utils import apply_platform_env

    apply_platform_env()  # honour JAX_PLATFORMS before any backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-celeba", type=str, default=None)
    ap.add_argument("--ckpt-imagenet", type=str, default=None)
    ap.add_argument("--ckpt-imagenet-cond", type=str, default=None)
    ap.add_argument("--ckpt-classifier", type=str, default=None)
    ap.add_argument("--tasks", type=str, default=None,
                    help="evaluation.py run-name filter substrings")
    ap.add_argument("--images", type=int, default=2,
                    help="images per task (the full protocol uses the whole "
                         "fixture set; keep small for a first validation)")
    ap.add_argument("--t-sampling", type=int, default=None,
                    help="override T_sampling on BOTH sides for a fast "
                         "first validation (e.g. 10); omit for the full "
                         "100-step protocol")
    ap.add_argument("--exp", type=str, default="exp")
    ap.add_argument("--workdir", type=str, default="/tmp/validate_real")
    ap.add_argument("--out", type=str, default="BASELINE_real.md")
    ap.add_argument("--convert-only", action="store_true")
    ap.add_argument("--skip-reference", action="store_true")
    ns = ap.parse_args(argv)

    ckpts = {
        "celeba": ns.ckpt_celeba,
        "imagenet": ns.ckpt_imagenet,
        "imagenet_cond": ns.ckpt_imagenet_cond,
        "classifier": ns.ckpt_classifier,
    }
    ckpts = {k: Path(v) for k, v in ckpts.items() if v}
    if not ckpts:
        raise SystemExit("pass at least one --ckpt-* path")
    for k, p in ckpts.items():
        if not p.exists():
            raise SystemExit(f"{k}: {p} does not exist")

    # -- 1. strict conversion ------------------------------------------------
    report = {"convert": [], "tasks": {}}
    for family, path in ckpts.items():
        r = strict_convert(path, family)
        print(f"[convert] {family}: ok ({r['leaves']} leaves)")
        report["convert"].append(r)
    if ns.convert_only:
        print(json.dumps(report, indent=2))
        return report

    # -- 2. ours (evaluation.py protocol) ------------------------------------
    import evaluation

    eval_args = ["--exp", ns.exp, "-i", str(Path(ns.workdir) / "ours"),
                 "--max-images", str(ns.images)]
    datasets = []
    if "celeba" in ckpts:
        datasets.append("celeba")
        eval_args += ["--ckpt-celeba", str(ckpts["celeba"])]
    if "imagenet" in ckpts:
        datasets.append("imagenet")
        eval_args += ["--ckpt-imagenet", str(ckpts["imagenet"])]
    eval_args += ["--datasets", ",".join(datasets)]
    if ns.tasks:
        eval_args += ["--tasks", ns.tasks]
    if ns.t_sampling is not None:
        eval_args += ["--t-sampling", str(ns.t_sampling)]
    ours = evaluation.main(eval_args)
    for name, stats in ours.items():
        report["tasks"].setdefault(name, {})["ours_psnr"] = (
            stats.get("avg_psnr") if isinstance(stats, dict) else None
        )

    # -- 3. reference, same tasks -------------------------------------------
    if not ns.skip_reference:
        from _reference_harness import (
            install_torchvision_stub,
            patch_cuda_to_cpu,
            run_reference_main,
            seed_checkpoint,
            seed_images,
            write_config,
        )

        install_torchvision_stub()
        patch_cuda_to_cpu()
        exp = Path(ns.workdir) / "ref_exp"
        if "celeba" in ckpts:
            seed_checkpoint(exp, "logs/celeba/celeba_hq.ckpt", ckpts["celeba"])
            seed_images(exp, "celeba_hq", Path(ns.exp) / "datasets/celeba_hq")
        if "imagenet" in ckpts:
            seed_checkpoint(exp, "logs/imagenet/256x256_diffusion_uncond.pt",
                            ckpts["imagenet"])
            seed_images(exp, "imagenet", Path(ns.exp) / "datasets/imagenet")

        sel = evaluation.CELEBA_RUNS if "celeba" in ckpts else []
        sel = sel + (evaluation.IMAGENET_RUNS if "imagenet" in ckpts else [])
        if ns.tasks:
            keys = [t.strip() for t in ns.tasks.split(",")]
            sel = [r for r in sel if any(k in r[0] for k in keys)]
        for name, config, deg, scale, sigma_y, simplified, add_noise in sel:
            overrides = {"data.num_workers": 0}
            if ns.t_sampling is not None:
                overrides["time_travel.T_sampling"] = ns.t_sampling
            cfg_path = write_config(exp, config, overrides)
            path_y = "celeba_hq" if name.startswith("celeba") else "imagenet"
            out_dir = run_reference_main(
                exp, cfg_path, deg=deg, deg_scale=scale, sigma_y=sigma_y,
                image_folder=f"ref_{name}", path_y=path_y,
                simplified=simplified, add_noise=add_noise,
                subset=(0, ns.images),
            )
            report["tasks"].setdefault(name, {})["ref_psnr"] = (
                _avg_psnr_from_outputs(out_dir)
            )

    # -- 4. delta table -------------------------------------------------------
    lines = ["# Real-checkpoint PSNR parity", "",
             f"images/task: {ns.images}", "",
             "| task | ours PSNR | reference PSNR | delta (dB) | within 0.1? |",
             "|---|---|---|---|---|"]
    worst = 0.0
    for name, vals in sorted(report["tasks"].items()):
        o, r = vals.get("ours_psnr"), vals.get("ref_psnr")
        if o is not None and r is not None:
            d = o - r
            worst = max(worst, abs(d))
            ok = "yes" if abs(d) <= 0.1 else "**NO**"
            lines.append(f"| {name} | {o:.2f} | {r:.2f} | {d:+.3f} | {ok} |")
        else:
            lines.append(f"| {name} | {o} | {r} | — | — |")
    lines += ["", f"worst |delta|: {worst:.3f} dB"]
    md = "\n".join(lines)
    Path(ns.out).write_text(md + "\n")
    print(md)
    return report


if __name__ == "__main__":
    main()
