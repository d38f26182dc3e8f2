#!/usr/bin/env python
"""hq qualitative demo sweep — the reference's hq_demo/evaluation.sh:3-17 as
a harness: five class-conditional arbitrary-size SR demos (orange/bear/zebra
at 4x, flamingo/kimono at 2x, all with --resize_y).

Point --data at a folder containing the demo images (orange.png, bear.png,
flamingo.png, kimono.png, zebra.png — the reference keeps them under
hq_demo/data/datasets/gts/inet256). Any missing image is skipped with a
note. Use --random-init for a weights-free smoke sweep.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# (name, class label, SR scale) — hq_demo/evaluation.sh
DEMOS = [
    ("orange", 950, 4),
    ("bear", 294, 4),
    ("flamingo", 130, 2),
    ("kimono", 614, 2),
    ("zebra", 340, 4),
]


def main(argv=None):
    p = argparse.ArgumentParser(description="hq Mask-Shift demo sweep")
    p.add_argument("--config", type=str, default="configs/hq/inet256.yml")
    p.add_argument("--data", type=str, default="exp/datasets/inet256")
    p.add_argument("-i", "--out", type=str, default="exp/hq_eval")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--classifier_ckpt", type=str, default=None)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--demos", type=str, default=None,
                   help="comma-separated demo-name filter")
    p.add_argument("--parallel_tiles", action="store_true")
    p.add_argument("--encoder_cache", type=int, default=1)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--face_sweep", action="store_true",
                   help="run the face256 inpainting dataset sweep "
                        "(hq_demo/confs/face256.yml eval dataset) instead of "
                        "the five SR demos")
    p.add_argument("--face_config", type=str, default="configs/hq/face256.yml")
    p.add_argument("--face_gt", type=str, default=None,
                   help="override the gt directory for --face_sweep "
                        "(default: the conf's data.eval entry)")
    p.add_argument("--face_masks", type=str, default=None)
    p.add_argument("--max_len", type=int, default=None)
    p.add_argument("--sweep_batch", type=int, default=1,
                   help="batch this many face-sweep images per sampler call "
                        "(hq_main --sweep_batch; single-tile canvases only)")
    ns = p.parse_args(argv)

    import hq_main as hq

    if ns.face_sweep:
        # reference: hq_demo face256 eval — batch inpainting over the
        # conf-declared paired gt/keep-mask trees (conf_base.py:60-106)
        argv_run = ["--config", ns.face_config, "--deg", "inpainting",
                    "-i", str(Path(ns.out) / "face256")]
        if bool(ns.face_gt) != bool(ns.face_masks):
            # never default one to the other: masks-as-gt (or gt-as-masks)
            # silently produces garbage keep-masks
            raise SystemExit("--face_gt and --face_masks must be given together "
                             "(filename-paired trees); omit both to use the "
                             "conf's data.eval entry")
        if ns.face_gt:
            argv_run += ["--gt_path", ns.face_gt,
                         "--mask_path_dir", ns.face_masks]
        if ns.max_len is not None:
            argv_run += ["--max_len", str(ns.max_len)]
        if ns.sweep_batch > 1:
            argv_run += ["--sweep_batch", str(ns.sweep_batch)]
        if ns.ckpt:
            argv_run += ["--ckpt", ns.ckpt]
        elif ns.random_init:
            argv_run.append("--random_init")
        if ns.parallel_tiles:
            argv_run.append("--parallel_tiles")
        if ns.encoder_cache > 1:
            argv_run += ["--encoder_cache", str(ns.encoder_cache)]
        if ns.dtype != "float32":
            argv_run += ["--dtype", ns.dtype]
        print(f"== face256 sweep: hq_main.py {' '.join(argv_run)}")
        if ns.dry_run:
            return {}
        return {"face256": hq.main(argv_run)}

    demos = DEMOS
    if ns.demos:
        keep = {d.strip() for d in ns.demos.split(",")}
        demos = [d for d in demos if d[0] in keep]

    results = {}
    for name, cls, scale in demos:
        src = Path(ns.data) / f"{name}.png"
        if not src.exists():
            print(f"-- {name}: {src} missing, skipped")
            continue
        argv_run = [
            "--config", ns.config, "--deg", "sr_averagepooling",
            "--scale", str(scale), "--resize_y",
            "--path_y", str(src), "--class", str(cls),
            "-i", str(Path(ns.out) / name),
        ]
        if ns.ckpt:
            argv_run += ["--ckpt", ns.ckpt]
        elif ns.random_init:
            argv_run.append("--random_init")
        if ns.classifier_ckpt:
            argv_run += ["--classifier_ckpt", ns.classifier_ckpt]
        if ns.parallel_tiles:
            argv_run.append("--parallel_tiles")
        if ns.encoder_cache > 1:
            argv_run += ["--encoder_cache", str(ns.encoder_cache)]
        if ns.dtype != "float32":
            argv_run += ["--dtype", ns.dtype]
        print(f"== {name}: hq_main.py {' '.join(argv_run)}")
        if ns.dry_run:
            continue
        results[name] = hq.main(argv_run)
    return results


if __name__ == "__main__":
    main()
