"""Big ADM tier (128px, three attention rates) trained-weights gates.

VERDICT round-4 item 4: the ADM/hq trained chain needed a tier whose
attention runs at THREE downsample rates like the flagship
(/root/reference/configs/imagenet_256.yml:14-33 — ds 8/16/32 = 32/16/8
feature grids). tools/train_big_adm_golden.py trains it (+ a 128px
EncoderUNet classifier for the guided row); tools/golden_suite.py
--family adm --tier big128 emits the committed tables.

CI cost bounding (same approach as tests/test_golden_flagship_trained.py):
one SHORT-schedule cross-framework run (the delta is protocol-independent)
plus structural gates over the committed full-protocol tables.
"""

import json

import pytest

from tests._golden_adm import (
    ADM_BIG128,
    ADM_GOLDEN_N_IMAGES,
    TASKS_HQ,
    run_hq_task,
)

pytestmark = pytest.mark.skipif(
    not ADM_BIG128.fixture.exists(), reason="big adm128 fixture not trained"
)


def test_big_adm_cross_framework_psnr():
    """4x avg-pool SR through both frameworks on the trained 128px ADM
    (attention at 32/16/8 feature grids, learn_sigma): same weights, same
    x_T, zero noise, short schedule (respacing 5 + 5-step jump ~= 13
    oracle forwards), ±0.1 dB."""
    pytest.importorskip("torch")
    name, deg, scale, sigma_y = TASKS_HQ[0]
    r = run_hq_task(deg, scale, sigma_y, n_images=1, tier=ADM_BIG128,
                    respacing="5",
                    jump=dict(t_T=5, n_sample=1, jump_length=2,
                              jump_n_sample=2))
    delta = abs(r["ours_psnr"] - r["ref_psnr"])
    assert delta <= 0.1, f"{name}: ours {r['ours_psnr']} vs ref {r['ref_psnr']}"


def test_big_adm_golden_table_committed():
    """The committed full-protocol table must cover the whole hq matrix
    plus the classifier-guided row, with cross-framework deltas <= 0.05 dB."""
    if not ADM_BIG128.golden_json.exists():
        pytest.skip("big adm128 goldens not emitted yet")
    golden = json.loads(ADM_BIG128.golden_json.read_text())
    expected = {t[0] for t in TASKS_HQ}
    if ADM_BIG128.clf_fixture.exists():
        expected.add("hq_guided_sr")
    assert set(golden) >= expected, sorted(expected - set(golden))
    for name, row in golden.items():
        assert {"ours_psnr", "ref_psnr"} <= set(row), name
        assert abs(row["ours_psnr"] - row["ref_psnr"]) <= 0.05, (name, row)
    assert golden["hq_sr_ap_4x"]["ours_psnr"] > 14.0, golden["hq_sr_ap_4x"]


def test_big_adm_bf16_table_committed():
    """bf16 production-dtype table exists with the budget fields; numeric
    bounds enforced tier-generically by test_bf16_budget_documented."""
    bf16 = ADM_BIG128.golden_json.with_name(
        ADM_BIG128.golden_json.stem + "_bf16.json")
    if not bf16.exists():
        pytest.skip("big adm128 bf16 goldens not emitted yet")
    golden = json.loads(bf16.read_text())
    assert {t[0] for t in TASKS_HQ} <= set(golden)


def test_big_adm_protocol_registered():
    assert ADM_GOLDEN_N_IMAGES["big128"] == 1
    assert ADM_BIG128.res == 128
