"""Mid-scale (64px) trained-weights cross-framework fidelity suite.

VERDICT round-2 item #2: the toy tier (32px / 0.7M params) left the
at-scale numerics question (attention at multiple feature resolutions,
learn_sigma variance heads, deeper accumulation) extrapolated. This tier
proves the same cross-framework claims on 6.8M-param DDPM and 12.3M-param
ADM UNets with attention at two feature resolutions, trained on the
blob+natural mix (tools/train_mid_golden.py) and evaluated on the
committed NATURALISTIC fixtures (exp/datasets/natural64 — 1/f^alpha
spectra, VERDICT item #7).

Goldens: tests/fixtures/mid_golden_psnr.json / mid_adm64_psnr.json,
regenerated with `python tools/golden_suite.py --tier mid64 [--family adm]
--emit-goldens`. The fixtures are stored fp16 (both frameworks upcast at
load — tests/_golden._upcast_f32 vs torch's load_state_dict cast), so the
cross-framework claim is unchanged: same weights, same x_T, zero noise.
"""

import json

import pytest

from tests._golden import MID64, TASKS, run_task
from tests._golden_adm import ADM_MID64, TASKS_HQ, run_hq_guided_task, run_hq_task

pytestmark = pytest.mark.skipif(
    not MID64.fixture.exists(), reason="mid64 fixtures not trained yet"
)

# subset: one exercising each numerics surface (SVD spectral ops, FWHT,
# permutation ops, noisy Lambda path) — the full matrix runs in
# tools/golden_suite.py; CI spot-checks to keep the suite's runtime sane
DDPM_SPOT = [TASKS[0], TASKS[2], TASKS[4], TASKS[6]]
HQ_SPOT = [TASKS_HQ[0], TASKS_HQ[3], TASKS_HQ[5]]


@pytest.mark.parametrize("name,deg,scale,sigma_y", DDPM_SPOT,
                         ids=[t[0] for t in DDPM_SPOT])
def test_mid_ddpm_cross_framework_psnr(name, deg, scale, sigma_y):
    pytest.importorskip("torch")
    r = run_task(deg, scale, sigma_y, n_images=2, tier=MID64)
    delta = abs(r["ours_psnr"] - r["ref_psnr"])
    assert delta <= 0.1, f"{name}: ours {r['ours_psnr']} vs ref {r['ref_psnr']}"
    # trained-model signal floor on the natural held-outs
    assert r["ours_psnr"] > 14.0, r


def test_mid_ddpm_golden_drift():
    """Full-protocol (n_images=4) drift check of one row vs the committed
    golden table."""
    if not MID64.golden_json.exists():
        pytest.skip("mid64 goldens not emitted yet")
    golden = json.loads(MID64.golden_json.read_text())
    name, deg, scale, sigma_y = TASKS[1]
    r = run_task(deg, scale, sigma_y, n_images=4, tier=MID64)
    g = golden[name]
    assert abs(r["ours_psnr"] - g["ours_psnr"]) <= 0.1, (r, g)
    cap = max(10 * g["max_abs_diff"], 1e-3)
    assert r["max_abs_diff"] <= cap, (r["max_abs_diff"], cap)


@pytest.mark.parametrize("name,deg,scale,sigma_y", HQ_SPOT,
                         ids=[t[0] for t in HQ_SPOT])
def test_mid_adm_cross_framework_psnr(name, deg, scale, sigma_y):
    pytest.importorskip("torch")
    if not ADM_MID64.fixture.exists():
        pytest.skip("mid64 adm fixture not trained yet")
    r = run_hq_task(deg, scale, sigma_y, n_images=2, tier=ADM_MID64)
    delta = abs(r["ours_psnr"] - r["ref_psnr"])
    assert delta <= 0.1, f"{name}: ours {r['ours_psnr']} vs ref {r['ref_psnr']}"


def test_mid_guided_cross_framework_psnr():
    """Classifier-guided restoration at the mid tier: jax.grad guidance on
    the 64px EncoderUNet (attention pool, 2 attention ds) vs the
    reference's torch.autograd cond_fn."""
    pytest.importorskip("torch")
    if not ADM_MID64.clf_fixture.exists():
        pytest.skip("mid64 classifier not trained yet")
    r = run_hq_guided_task(n_images=2, tier=ADM_MID64)
    delta = abs(r["ours_psnr"] - r["ref_psnr"])
    assert delta <= 0.1, r
