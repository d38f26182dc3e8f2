#!/usr/bin/env python
"""Build docs/GALLERY.md: reference-vs-ours side-by-side grids (VERDICT #9).

For every task in the trained-weights golden suite (tests/_golden.TASKS —
the evaluation.sh:1-36 matrix at toy scale), runs BOTH frameworks with the
shared trained toy DDPM fixture and writes a grid PNG per task:

    rows    = eval images
    columns = GT | A^t y (degraded input, pseudo-inverted) | reference | ours

upscaled nearest-neighbor so 32px toy outputs are reviewable by eye. The
committed grids make quality regressions visible without re-running anything;
per-task PSNR captions come from the same run.

Usage:  python tools/make_gallery.py  [--images 2] [--zoom 6]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GALLERY_DIR = REPO / "docs/gallery"

HEADER = """# Gallery — reference vs ours, side by side

Cross-framework output grids for the trained-weights golden suites
(`tests/_golden.py` + `tests/_golden_adm.py`: locally trained toy models
drive BOTH the reference's own samplers/operators and ours, zero-noise
deterministic, so every visual difference is numerics, not sampling
variance). Regenerate with `python tools/make_gallery.py` after retraining
a fixture.

Column order in every grid: **GT | A&dagger;y (degraded) | reference | ours**.
Real-checkpoint grids can be produced the same way the moment pretrained
weights are reachable (`tools/validate_real_ckpts.py`).

## Main pipeline — "simple" DDPM family, SVD samplers (evaluation.sh matrix)

| task | grid | ours PSNR (dB) | reference PSNR (dB) | delta |
|---|---|---|---|---|
"""

HEADER_HQ = """
## hq pipeline — ADM family (learn_sigma), posterior sampler (hq task matrix)

| task | grid | ours PSNR (dB) | reference PSNR (dB) | delta |
|---|---|---|---|---|
"""

HEADER_MID = """
## Mid tier (64px, 6.8M-param DDPM) — naturalistic fixtures (exp/datasets/natural64)

| task | grid | ours PSNR (dB) | reference PSNR (dB) | delta |
|---|---|---|---|---|
"""

HEADER_MID_HQ = """
## Mid tier (64px, 12.3M-param ADM) — hq task matrix + old-photo demo

`mid_oldphoto` is the reference's old-photo restoration class
(configs/oldphoto.yml: scratch mask + grayscale + low-res composite,
diffusion.py:260-274) on naturalistic fixtures with the committed
irregular scratch mask (exp/datasets/natural64/scratch_keep_mask.npy).

| task | grid | ours PSNR (dB) | reference PSNR (dB) | delta |
|---|---|---|---|---|
"""


def to_grid(images: dict, zoom: int) -> np.ndarray:
    """(rows=images, cols=gt/apy/ref/ours) -> one HWC uint8 grid."""
    cols = ["gt", "apy", "ref", "ours"]
    n = images["gt"].shape[0]
    pad = 2  # white separator
    tiles = []
    for i in range(n):
        row = []
        for c in cols:
            img = np.transpose(images[c][i], (1, 2, 0))  # HWC [0,1]
            img = np.repeat(np.repeat(img, zoom, 0), zoom, 1)
            row.append(img)
            row.append(np.ones((img.shape[0], pad, 3)))
        tiles.append(np.concatenate(row[:-1], axis=1))
        tiles.append(np.ones((pad, tiles[-1].shape[1], 3)))
    grid = np.concatenate(tiles[:-1], axis=0)
    return (np.clip(grid, 0, 1) * 255).round().astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--zoom", type=int, default=6)
    ns = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from tests._golden import TASKS, run_task

    GALLERY_DIR.mkdir(parents=True, exist_ok=True)
    lines = [HEADER]

    def emit(name, r, zoom=None):
        grid = to_grid(r["images"], zoom or ns.zoom)
        out = GALLERY_DIR / f"{name}.png"
        Image.fromarray(grid).save(out)
        delta = r["ours_psnr"] - r["ref_psnr"]
        lines.append(
            f"| {name} | ![{name}](gallery/{name}.png) | {r['ours_psnr']:.2f} "
            f"| {r['ref_psnr']:.2f} | {delta:+.4f} |"
        )
        print(f"{name}: ours {r['ours_psnr']:.2f} dB, "
              f"ref {r['ref_psnr']:.2f} dB -> {out}", flush=True)

    for name, deg, scale, sigma_y in TASKS:
        emit(name, run_task(deg, scale, sigma_y, n_images=ns.images,
                            return_images=True))

    from tests._golden_adm import FIXTURE_PT as ADM_PT
    from tests._golden_adm import TASKS_HQ, run_hq_task

    if ADM_PT.exists():
        from tests._golden_adm import CLF_PT, run_hq_guided_task

        lines.append(HEADER_HQ.rstrip("\n"))
        for name, deg, scale, sigma_y in TASKS_HQ:
            emit(name, run_hq_task(deg, scale, sigma_y,
                                   n_images=min(ns.images, 2)))
        if CLF_PT.exists():
            emit("hq_guided_sr",
                 run_hq_guided_task(n_images=min(ns.images, 2)))
    else:
        print("toy_adm32.pt not trained yet — skipping the hq section")

    # ---- mid tier (64px, naturalistic fixtures — VERDICT r2 #2/#7) ----
    from tests._golden import MID64
    from tests._golden_adm import ADM_MID64

    zoom_mid = max(ns.zoom // 2, 1)
    if MID64.fixture.exists():
        lines.append(HEADER_MID.rstrip("\n"))
        for name, deg, scale, sigma_y in TASKS:
            emit(f"mid_{name}",
                 run_task(deg, scale, sigma_y, n_images=ns.images,
                          return_images=True, tier=MID64), zoom=zoom_mid)
    else:
        print("mid_ddpm64.pt not trained yet — skipping the mid section")

    if ADM_MID64.fixture.exists():
        lines.append(HEADER_MID_HQ.rstrip("\n"))
        for name, deg, scale, sigma_y in TASKS_HQ:
            emit(f"mid_{name}",
                 run_hq_task(deg, scale, sigma_y, n_images=min(ns.images, 2),
                             tier=ADM_MID64), zoom=zoom_mid)
        if ADM_MID64.clf_fixture.exists():
            emit("mid_hq_guided_sr",
                 run_hq_guided_task(n_images=min(ns.images, 2),
                                    tier=ADM_MID64), zoom=zoom_mid)
        # the OLD-PHOTO demo class (reference configs/oldphoto.yml +
        # diffusion.py:260-274: scratch-masked + grayscale + low-res on a
        # natural photo) on the naturalistic fixtures with the committed
        # irregular scratch mask — the one reference demo class that had
        # no qualitative counterpart (VERDICT r2 item #7)
        scratch = np.load(MID64.eval_dir / "scratch_keep_mask.npy")
        emit("mid_oldphoto",
             run_hq_task("mask_color_sr", 2, 0.0,
                         n_images=min(ns.images, 2), tier=ADM_MID64,
                         mask=scratch), zoom=zoom_mid)

    (REPO / "docs/GALLERY.md").write_text("".join(lines[:1])
                                          + "\n".join(lines[1:]) + "\n")
    print(f"wrote {REPO / 'docs/GALLERY.md'}")


if __name__ == "__main__":
    main()
