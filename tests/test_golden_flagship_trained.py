"""Flagship-tier (256px / 114M params) trained-weights fidelity gates.

VERDICT round-4 item 3: the trained ladder stopped at 128px/71.4M while
every perf claim runs the flagship config — the reference's "simple"
CelebA-HQ family at its EXACT published architecture and resolution
(models.py:192-341, configs/celeba_hq.yml:14-26; ch 128, mult
(1,1,2,2,4,4), attention at res 16). tools/train_flagship_golden.py
trains it on-chip; tools/golden_suite.py --tier flag256 emits the
committed fp32+bf16 tables against exp/datasets/natural256.

CI cost at this scale is the design constraint (the torch oracle costs
~6 s per 256px forward on this host's single CPU core), so the suite is:
one SHORT-schedule cross-framework parity run (cross-framework delta is
protocol-independent — both sides run the same schedule inside the test)
plus structural gates over the committed full-protocol tables. The full
25-step table is reproducible via the golden_suite command above.
"""

import json

import pytest

from tests._golden import FLAG256, GOLDEN_N_IMAGES, TASKS, run_task

pytestmark = pytest.mark.skipif(
    not FLAG256.fixture.exists(), reason="flag256 fixture not trained yet"
)


def test_flag_cross_framework_psnr():
    """4x avg-pool SR (the headline bench task) through both frameworks on
    the 114M fixture at 256px: same weights, same x_T, zero noise. 5-step
    schedule bounds the oracle cost (~20 forwards total); the delta bound
    is the same ±0.1 dB as every other tier."""
    pytest.importorskip("torch")
    name, deg, scale, sigma_y = TASKS[1]  # sr_ap_4x
    r = run_task(deg, scale, sigma_y, n_images=1, tier=FLAG256, t_sampling=5)
    delta = abs(r["ours_psnr"] - r["ref_psnr"])
    assert delta <= 0.1, f"{name}: ours {r['ours_psnr']} vs ref {r['ref_psnr']}"


def test_flag_golden_table_committed():
    """The committed full-protocol (25-step, --images 2) fp32 table must
    cover all 8 evaluation.sh tasks with cross-framework deltas <= 0.05 dB,
    and signal-bearing rows must clear the trained-model floor."""
    if not FLAG256.golden_json.exists():
        pytest.skip("flag256 goldens not emitted yet")
    golden = json.loads(FLAG256.golden_json.read_text())
    assert set(golden) == {t[0] for t in TASKS}
    for name, row in golden.items():
        assert {"ours_psnr", "ref_psnr", "max_abs_diff"} <= set(row), name
        assert abs(row["ours_psnr"] - row["ref_psnr"]) <= 0.05, (name, row)
    # the headline task itself must be signal-bearing on the held-outs
    assert golden["sr_ap_4x"]["ours_psnr"] > 14.0, golden["sr_ap_4x"]


def test_flag_bf16_table_committed():
    """The committed bf16 table (production dtype) must exist alongside the
    fp32 one with the documented budget fields; numeric budget bounds are
    enforced tier-generically by test_golden_bf16.test_bf16_budget_documented
    (TIERS includes flag256)."""
    bf16 = FLAG256.golden_json.with_name(
        FLAG256.golden_json.stem + "_bf16.json")
    if not bf16.exists():
        pytest.skip("flag256 bf16 goldens not emitted yet")
    golden = json.loads(bf16.read_text())
    assert set(golden) == {t[0] for t in TASKS}


def test_flag_protocol_registered():
    """The tier's emission protocol is pinned so drift re-runs can never
    silently diverge from the committed tables."""
    assert GOLDEN_N_IMAGES["flag256"] == 2
    assert FLAG256.res == 256
