"""Trained-weights cross-framework fidelity suite for the hq/ADM pipeline.

Companion to tests/test_golden_trained.py (the "simple" DDPM family / main
pipeline): the toy ADM UNet in tests/fixtures/toy_adm32.pt was trained to
convergence (tools/train_toy_adm_golden.py) and is loaded by BOTH
frameworks from the same file — the reference runs its own
SpacedDiffusion.p_sample / undo loop with its own operator closures
(hq_demo/guided_diffusion/gaussian_diffusion.py:432-493, 595-643), ours
runs the adm converter (strict validation) + sample_posterior. Zero-noise
determinism means any PSNR delta is numerics, not sampling variance.

Golden values in tests/fixtures/toy_adm32_psnr.json guard regression;
regenerate with `python tools/golden_suite.py --family adm --emit-goldens`
after retraining the fixture.
"""

import json

import pytest

from tests._golden_adm import FIXTURE_PT, REPO, TASKS_HQ, run_hq_task

GOLDEN_PATH = REPO / "tests/fixtures/toy_adm32_psnr.json"

pytestmark = pytest.mark.skipif(
    not FIXTURE_PT.exists(), reason="toy ADM fixture not trained yet"
)


@pytest.mark.parametrize("name,deg,scale,sigma_y", TASKS_HQ,
                         ids=[t[0] for t in TASKS_HQ])
def test_trained_hq_cross_framework_psnr(name, deg, scale, sigma_y):
    pytest.importorskip("torch")
    r = run_hq_task(deg, scale, sigma_y)
    delta = abs(r["ours_psnr"] - r["ref_psnr"])
    assert delta <= 0.1, f"{name}: ours {r['ours_psnr']} vs ref {r['ref_psnr']}"

    # signal floor: gray-ambiguous tasks carry no absolute-PSNR meaning
    floor = 4.0 if deg in ("colorization", "sr_color", "mask_color_sr") else 14.0
    assert r["ours_psnr"] > floor, r["ours_psnr"]

    if GOLDEN_PATH.exists():
        golden = json.loads(GOLDEN_PATH.read_text())
        if name in golden:
            assert abs(r["ours_psnr"] - golden[name]["ours_psnr"]) <= 0.1, (
                f"{name}: drifted from committed golden {golden[name]}"
            )
            # pixel-level: stay within 10x of the recorded cross-framework
            # diff (worst committed ~1e-4) — a PSNR-invisible numerics
            # regression still trips this
            cap = max(10 * golden[name]["max_abs_diff"], 1e-3)
            assert r["max_abs_diff"] <= cap, (name, r["max_abs_diff"], cap)
        else:
            assert r["max_abs_diff"] < 5e-2
