"""Measure the PyTorch reference's end-to-end throughput on CPU.

VERDICT round-1 item #2: the repo's `vs_baseline` divided by a 0.1 img/s
*estimate*; this tool replaces the naked estimate with a measurement. It
drives the reference's own code (`/root/reference/main.py` machinery,
`guided_diffusion/diffusion.py:211-416 simplified_ddnm_plus`) on the
flagship workload — CelebA-HQ 256px, simplified DDNM+ sr_averagepooling 4x,
batch 1 — with a pre-seeded RANDOM-INIT checkpoint (air-gapped env; per-step
cost does not depend on weight values). See tools/_reference_harness.py for
the environment shims (torchvision stub, cuda->cpu mapping) and why they
are required, not optional.

Usage:
  python tools/measure_reference_baseline.py --steps 100 --images 1 \
      --out /tmp/ref_baseline.json

Emits one JSON line: measured s/step, s/img, img/s on CPU. The GPU number
stays an extrapolation (no CUDA here) — BASELINE.md documents both.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from _reference_harness import (
    REPO_ROOT,
    install_torchvision_stub,
    patch_cuda_to_cpu,
    run_reference_main,
    seed_checkpoint,
    seed_images,
    write_config,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100,
                    help="T_sampling for the run (flagship protocol: 100)")
    ap.add_argument("--images", type=int, default=1)
    ap.add_argument("--workdir", type=str, default="/tmp/ref_baseline_exp")
    ap.add_argument("--out", type=str, default="")
    ns = ap.parse_args(argv)

    install_torchvision_stub()
    patch_cuda_to_cpu()
    import torch

    exp = Path(ns.workdir)
    cfg_path = write_config(exp, "celeba_hq.yml", {
        "data.num_workers": 0,
        "time_travel.T_sampling": ns.steps,
    })
    seed_images(exp, "celeba_hq", Path(REPO_ROOT) / "exp/datasets/celeba_hq")
    seed_checkpoint(exp, "logs/celeba/celeba_hq.ckpt", None,
                    random_family="simple", config_name="celeba_hq.yml")
    out_dir = exp / "image_samples/bench"
    if out_dir.exists():
        shutil.rmtree(out_dir)

    t0 = time.perf_counter()
    run_reference_main(
        exp, cfg_path, deg="sr_averagepooling", deg_scale=4, sigma_y=0.0,
        image_folder="bench", simplified=True, subset=(0, ns.images),
    )
    total = time.perf_counter() - t0

    n_steps = ns.steps * ns.images
    result = {
        "workload": "celeba_hq 256px simplified DDNM+ sr_averagepooling 4x, batch 1",
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "images": ns.images,
        "steps_per_image": ns.steps,
        "total_s": round(total, 2),
        "s_per_step": round(total / n_steps, 3),
        "s_per_image_at_100_steps": round(100 * total / n_steps, 2),
        "img_per_sec_cpu": round(n_steps / ns.steps / total, 5),
    }
    line = json.dumps(result)
    print(line)
    if ns.out:
        Path(ns.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
