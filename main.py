#!/usr/bin/env python
"""CLI entry point — flag-compatible with the reference's main.py:19-90 plus
TPU-native extras (--ckpt/--random-init/--batch-size/--dtype).

Examples (mirroring the reference Quick Start, README.md:49-53):

  python main.py --config configs/celeba_hq.yml --path_y celeba_hq \
      --deg sr_averagepooling --deg_scale 4 --sigma_y 0 -i demo --simplified \
      --ckpt /path/to/celeba_hq.ckpt
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native DDNM image restoration")
    p.add_argument("--config", type=str, required=True, help="YAML config under configs/")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--exp", type=str, default="exp", help="experiment root (datasets/, logs/)")
    p.add_argument("--deg", type=str, required=True, help="degradation task string")
    p.add_argument("--path_y", type=str, default="celeba_hq",
                   help="dataset folder name under <exp>/datasets, or absolute path")
    p.add_argument("--sigma_y", type=float, default=0.0, help="measurement noise (in [0,1] domain)")
    p.add_argument("--eta", type=float, default=0.85, help="DDIM eta")
    p.add_argument("--simplified", action="store_true", help="functional A/A+ (no SVD)")
    p.add_argument("-i", "--image_folder", type=str, default="output")
    p.add_argument("--deg_scale", type=float, default=4.0)
    p.add_argument("--add_noise", action="store_true")
    p.add_argument("-n", "--noise_type", type=str, default="gaussian",
                   choices=["gaussian", "3d_gaussian", "poisson", "speckle"])
    p.add_argument("--trace_dir", type=str, default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--subset_start", type=int, default=-1)
    p.add_argument("--subset_end", type=int, default=-1)
    p.add_argument("--verbose", type=str, default="info")
    p.add_argument("--ni", action="store_true", help="non-interactive (overwrite outputs)")
    # TPU-native extras
    p.add_argument("--ckpt", type=str, default=None, help="torch checkpoint to convert+load")
    p.add_argument("--classifier_ckpt", type=str, default=None)
    p.add_argument("--random_init", action="store_true",
                   help="random weights (smoke/bench; no checkpoint available)")
    p.add_argument("--batch_size", type=int, default=None, help="override config batch size")
    p.add_argument("--t_sampling", type=int, default=None,
                   help="override time_travel.T_sampling (reduced-protocol "
                        "runs, e.g. a fast first real-checkpoint validation)")
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--mask_path", type=str, default=None)
    p.add_argument("--manifest", type=str, default=None, help="imagenet manifest txt")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--encoder_cache", type=int, default=1,
                   help="encoder-propagation interval (>1 = approximate "
                        "Faster-Diffusion acceleration; simplified mode, "
                        "both model families)")
    p.add_argument("--encoder_cache_policy", type=str, default="uniform",
                   choices=["uniform", "end_dense"],
                   help="key-step placement for --encoder_cache: end_dense "
                        "holds quality at much deeper budgets (measured; "
                        "docs/PERFORMANCE.md)")
    p.add_argument("--loop", type=str, default="auto",
                   choices=["auto", "scan", "host"],
                   help="sampler loop driver (auto picks per backend)")
    p.add_argument("--solver", type=str, default="ddim",
                   choices=["ddim", "multistep"],
                   help="trajectory solver: ddim = the reference's "
                        "first-order update (best at 25+ steps); "
                        "multistep = second-order deterministic, "
                        "noise-free tasks only — +4-10 dB at <=10-step "
                        "budgets (set --t_sampling accordingly)")
    p.add_argument("--resume", action="store_true",
                   help="skip images whose outputs already exist (restart-friendly; "
                        "the reference can only resume via manual --subset ranges)")
    return p.parse_args(argv)


def main(argv=None):
    ns = parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, ns.verbose.upper(), logging.INFO),
        format="%(asctime)s - %(levelname)s - %(message)s",
    )

    from ddnm_tpu.utils import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    from ddnm_tpu.parallel.multihost import maybe_init_distributed

    maybe_init_distributed()
    enable_compilation_cache()

    from ddnm_tpu.config import load_config
    from ddnm_tpu.runner import RunArgs, Runner

    # reference output-dir semantics (main.py:110-131): relative -i nests
    # under <exp>/image_samples/, existing dirs prompt unless --ni/--resume
    out = Path(ns.image_folder)
    if not out.is_absolute():
        out = Path(ns.exp) / "image_samples" / ns.image_folder
    if out.exists() and not ns.resume:
        if ns.ni:
            import shutil

            shutil.rmtree(out)
        else:
            resp = input(f"Image folder {out} already exists. Overwrite? (Y/N) ")
            if resp.strip().upper() == "Y":
                import shutil

                shutil.rmtree(out)
            else:
                print("Output image folder exists. Program halted.")
                return None
    ns.image_folder = str(out)

    cfg_path = Path(ns.config)
    if not cfg_path.exists():
        cfg_path = REPO_ROOT / "configs" / ns.config
    config = load_config(cfg_path)
    if ns.t_sampling is not None:
        config.time_travel.T_sampling = ns.t_sampling

    args = RunArgs(
        config=str(cfg_path),
        deg=ns.deg,
        deg_scale=ns.deg_scale,
        sigma_y=ns.sigma_y,
        eta=ns.eta,
        seed=ns.seed,
        exp=ns.exp,
        path_y=ns.path_y,
        image_folder=ns.image_folder,
        simplified=ns.simplified,
        add_noise=ns.add_noise,
        noise_type=ns.noise_type,
        trace_dir=ns.trace_dir,
        subset_start=ns.subset_start,
        subset_end=ns.subset_end,
        ckpt=ns.ckpt,
        classifier_ckpt=ns.classifier_ckpt,
        random_init=ns.random_init,
        batch_size=ns.batch_size,
        dtype=ns.dtype,
        mask_path=ns.mask_path,
        manifest=ns.manifest,
        max_images=ns.max_images,
        resume=ns.resume,
        loop=ns.loop,
        solver=ns.solver,
        encoder_cache=ns.encoder_cache,
        encoder_cache_policy=ns.encoder_cache_policy,
    )
    runner = Runner(args, config)
    try:
        stats = runner.run()
    except Exception:
        logging.exception("runner failed")
        raise
    return stats


if __name__ == "__main__":
    main()
