"""bf16-torso fidelity regression suite (VERDICT round-2 item #1).

The flagship bench and all headline throughput numbers run the PRODUCTION
configuration: bf16 torso + bf16-resident params, fp32 GroupNorm
(`--dtype bfloat16`, runner.py:139-144 / hq_main.py:207-213, the TPU-native
analogue of the reference's fp16 torso, fp16_util.py:15-32). Round 2 had
zero fidelity coverage of that configuration; these tests gate it on
trained weights for BOTH families, against the measured goldens committed
by `python tools/golden_suite.py --dtype bfloat16 --emit-goldens`
(tests/fixtures/*_bf16.json; measured tables in BASELINE.md).

The torch reference has no bf16 path, so these run OUR side only
(skip_ref) and regress against the committed bf16 goldens, which also
record the fp32 row they were measured against.
"""

import json

import pytest

from tests._golden import GOLDEN_N_IMAGES, TIERS, TASKS, run_task
from tests._golden_adm import ADM_TIERS, TASKS_HQ, run_hq_task

# how far a re-run may drift from its committed golden. bf16 zero-noise
# trajectories are reproducible only up to REDUCTION ORDER: the goldens are
# emitted on a 1-device CPU process (tools/golden_suite.py) while tests run
# under the 8-virtual-device conftest, whose different XLA threadpool
# partitioning reorders bf16 accumulations — measured ~0.1 dB on the
# posterior chain (fp32 shows the same effect at <1e-4 dB). 0.3 dB still
# catches real numerics changes while tolerating topology-induced noise.
DRIFT_DB = 0.3


def _golden(path):
    if not path.exists():
        pytest.skip(f"bf16 goldens not emitted yet: {path}")
    return json.loads(path.read_text())


def _bf16_json(tier):
    return tier.golden_json.with_name(tier.golden_json.stem + "_bf16.json")


# flag256 is absent here deliberately: one bf16 re-run row at 256px/114M
# costs ~15 min on this host's single CPU core. Its bf16 table is still
# gated structurally by test_bf16_budget_documented (TIERS includes
# flag256) and reproducible via tools/golden_suite.py --tier flag256.
@pytest.mark.parametrize("tier_name", ["toy32", "mid64", "big128"])
@pytest.mark.parametrize("name,deg,scale,sigma_y",
                         [TASKS[1], TASKS[5], TASKS[6]],
                         ids=[TASKS[1][0], TASKS[5][0], TASKS[6][0]])
def test_ddpm_bf16_matches_golden(tier_name, name, deg, scale, sigma_y):
    """Spot-check rows (sr_ap, inpainting, noisy sr_ap) of the DDPM bf16
    table: a re-run must reproduce the committed bf16 golden, and the
    committed bf16-vs-fp32 budget must hold."""
    tier = TIERS[tier_name]
    if not tier.fixture.exists():
        pytest.skip(f"{tier_name} fixture not trained yet")
    golden = _golden(_bf16_json(tier))
    if name not in golden:
        pytest.skip(f"{name} not in bf16 goldens")
    g = golden[name]
    # n_images must match the tier's emission protocol
    r = run_task(deg, scale, sigma_y, n_images=GOLDEN_N_IMAGES[tier_name],
                 tier=tier, dtype="bfloat16", skip_ref=True)
    assert abs(r["ours_psnr"] - g["ours_psnr"]) <= DRIFT_DB, (name, r, g)


@pytest.mark.parametrize("tier_name", ["toy32", "mid64"])
def test_adm_bf16_matches_golden(tier_name):
    """One posterior-pipeline row (hq_sr_ap_4x) of the ADM bf16 table."""
    tier = ADM_TIERS[tier_name]
    if not tier.fixture.exists():
        pytest.skip(f"{tier_name} adm fixture not trained yet")
    golden = _golden(_bf16_json(tier))
    name, deg, scale, sigma_y = TASKS_HQ[0]
    g = golden[name]
    r = run_hq_task(deg, scale, sigma_y, n_images=2, tier=tier,
                    dtype="bfloat16", skip_ref=True)
    assert abs(r["ours_psnr"] - g["ours_psnr"]) <= DRIFT_DB, (name, r, g)


@pytest.mark.parametrize("family,tiers", [("ddpm", TIERS), ("adm", ADM_TIERS)])
def test_bf16_budget_documented(family, tiers):
    """Every committed bf16 golden row records the fp32 row it was measured
    against and a bf16-vs-fp32 trajectory PSNR — the documented answer to
    'how much of the fidelity budget does the production dtype consume'.
    Sanity: the bf16 trajectory must stay close to fp32 (>= 25 dB traj
    PSNR), and the PSNR-vs-gt cost must be EXPLAINED: tasks whose fp32
    PSNR sits below the ~41-73 dB trajectory PSNR measure <0.1 dB (the
    task error dominates), while 40+ dB regimes (deblur, guided SR) are
    bf16-trajectory-bound — their output lands near the trajectory PSNR
    itself (mid-ADM hq_guided_sr: fp32 49.0, traj 44.9, bf16 43.1 — see
    BASELINE.md). So: cost <= 3 dB, OR the row is trajectory-bound
    (fp32 above traj) and the bf16 output is within 3 dB OF the
    trajectory PSNR — anything else is a numerics bug, not the generic
    reduced-precision ceiling.

    One carve-out, calibrated at the big128 tier: rows whose fp32
    restoration sits BELOW the trained-model signal floor (14 dB, the
    floor test_golden_mid_trained uses) are noise-dominated — the prior
    cannot solve that task at that scale (big128 cs_wh_025: fp32
    10.0 dB), the posterior map is not contractive there, and bf16-vs-
    fp32 divergence is chaotic amplification of rounding differences
    (the same mechanism as the random-weights scan controls,
    docs/ROUND3.md) — so the 25 dB trajectory floor is uninformative
    and only the cross-framework fp32 golden (delta 0.0000) gates."""
    checked = 0
    for tier in tiers.values():
        path = _bf16_json(tier) if tier.golden_json else None
        if path is None or not path.exists():
            continue
        golden = json.loads(path.read_text())
        for name, g in golden.items():
            assert {"ours_psnr", "fp32_psnr", "ref_psnr",
                    "bf16_minus_fp32_db", "bf16_vs_fp32_traj_psnr"} <= set(g), (
                tier.name, name)
            sub_signal = g["fp32_psnr"] < 14.0  # noise-dominated row
            assert g["bf16_vs_fp32_traj_psnr"] >= 25.0 or sub_signal, (
                tier.name, name, g)
            traj_bound = (g["fp32_psnr"] > g["bf16_vs_fp32_traj_psnr"]
                          and abs(g["ours_psnr"]
                                  - g["bf16_vs_fp32_traj_psnr"]) <= 3.0)
            assert abs(g["bf16_minus_fp32_db"]) <= 3.0 or traj_bound, (
                tier.name, name, g)
            checked += 1
    if not checked:
        pytest.skip("no bf16 goldens emitted yet")
