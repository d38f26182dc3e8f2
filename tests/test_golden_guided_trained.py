"""Trained-weights classifier-guided fidelity proof (third checkpoint
family): a toy EncoderUNet classifier trained on noised class-blobs
(tools/train_toy_classifier_golden.py) guides the trained toy ADM through
the hq posterior sampler in BOTH frameworks — torch.autograd cond_fn +
condition_mean on the reference side vs jax.grad classifier_guidance_fn on
ours — zero-noise deterministic.

Golden value lives in tests/fixtures/toy_adm32_psnr.json ("hq_guided_sr");
regenerate with `python tools/golden_suite.py --family adm --emit-goldens`.
"""

import json

import pytest

from tests._golden_adm import CLF_PT, FIXTURE_PT, REPO, run_hq_guided_task

GOLDEN_PATH = REPO / "tests/fixtures/toy_adm32_psnr.json"

pytestmark = pytest.mark.skipif(
    not (FIXTURE_PT.exists() and CLF_PT.exists()),
    reason="toy ADM/classifier fixtures not trained yet",
)


def test_trained_guided_cross_framework_psnr():
    pytest.importorskip("torch")
    r = run_hq_guided_task()
    delta = abs(r["ours_psnr"] - r["ref_psnr"])
    assert delta <= 0.1, f"ours {r['ours_psnr']} vs ref {r['ref_psnr']}"
    assert r["ours_psnr"] > 14.0

    if GOLDEN_PATH.exists():
        golden = json.loads(GOLDEN_PATH.read_text())
        if "hq_guided_sr" in golden:
            g = golden["hq_guided_sr"]
            assert abs(r["ours_psnr"] - g["ours_psnr"]) <= 0.1
            cap = max(10 * g["max_abs_diff"], 1e-3)
            assert r["max_abs_diff"] <= cap, (r["max_abs_diff"], cap)
        else:
            assert r["max_abs_diff"] < 5e-2
    else:
        assert r["max_abs_diff"] < 5e-2
