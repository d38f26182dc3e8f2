"""Big-tier (128px / 71.4M params) trained-weights fidelity suite.

VERDICT round-3 item #3: the trained-weights chain ran 32px/0.7M ->
64px/6.8-12.25M while the flagship bench runs 114M at 256px. This tier
halves the remaining extrapolation: the reference's "simple" CelebA-HQ
family (models.py:192-341 — 128 base channels, attention at feature
resolution 16, configs/celeba_hq.yml:14-26) with the full channel ladder
minus only the 256px stage, trained at 128px (tools/train_big_golden.py)
and evaluated on the committed natural fixtures (exp/datasets/natural128).

The suite keeps big-tier CI cost bounded: ONE cross-framework spot task
(the operator matrix is proven exhaustively at toy32/mid64 — here the new
surface is the 71M UNet's numerics: the flagship channel ladder, deeper
accumulation chains, attention at 16px features) plus an ours-only drift
check against the committed golden table (tests/fixtures/
big_golden_psnr.json, full matrix emitted by tools/golden_suite.py
--tier big128). bf16 rows are gated by tests/test_golden_bf16.py.
"""

import json

import pytest

from tests._golden import BIG128, TASKS, run_task

pytestmark = pytest.mark.skipif(
    not BIG128.fixture.exists(), reason="big128 fixture not trained yet"
)


def test_big_ddpm_cross_framework_psnr():
    """4x avg-pool SR (the headline bench task) through both frameworks on
    the 71.4M fixture: same weights, same x_T, zero noise, ±0.1 dB."""
    pytest.importorskip("torch")
    name, deg, scale, sigma_y = TASKS[1]  # sr_ap_4x
    r = run_task(deg, scale, sigma_y, n_images=2, tier=BIG128)
    delta = abs(r["ours_psnr"] - r["ref_psnr"])
    assert delta <= 0.1, f"{name}: ours {r['ours_psnr']} vs ref {r['ref_psnr']}"
    # trained-model signal floor on the natural held-outs
    assert r["ours_psnr"] > 14.0, r


def test_big_ddpm_golden_drift():
    """Ours-only re-run of one committed golden row (full n_images=4
    protocol). skip_ref keeps the 71M torch oracle out of CI — the
    cross-framework claim is pinned by the test above and by the committed
    table itself."""
    if not BIG128.golden_json.exists():
        pytest.skip("big128 goldens not emitted yet")
    golden = json.loads(BIG128.golden_json.read_text())
    name, deg, scale, sigma_y = TASKS[5]  # inpainting
    if name not in golden:
        pytest.skip(f"{name} not in big128 goldens")
    r = run_task(deg, scale, sigma_y, n_images=4, tier=BIG128, skip_ref=True)
    g = golden[name]
    assert abs(r["ours_psnr"] - g["ours_psnr"]) <= 0.1, (r, g)
