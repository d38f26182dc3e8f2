import numpy as np
import pytest

from ddnm_tpu import schedules
from tests._reference import import_reference, import_hq_reference


@pytest.mark.parametrize("name", ["quad", "linear", "const", "jsd", "sigmoid"])
def test_beta_schedule_matches_reference(name):
    ref = import_reference("guided_diffusion.diffusion")
    ours = schedules.get_beta_schedule(
        name, beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    )
    theirs = ref.get_beta_schedule(
        name, beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_alpha_bar_table_matches_compute_alpha():
    torch = pytest.importorskip("torch")
    ref = import_reference("functions.svd_ddnm")
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    )
    table = schedules.alpha_bar_table(betas)
    b = torch.from_numpy(betas).float()
    for t in [-1, 0, 1, 57, 500, 999]:
        theirs = ref.compute_alpha(b, torch.tensor([t])).item()
        ours = float(np.float32(table[t + 1]))
        np.testing.assert_allclose(ours, theirs, rtol=2e-6)


def test_jump_schedule_matches_reference():
    ref = import_reference("guided_diffusion.diffusion")
    for T, l, r in [(100, 1, 1), (100, 2, 2), (100, 10, 3), (25, 5, 4)]:
        assert schedules.get_schedule_jump(T, l, r) == ref.get_schedule_jump(T, l, r)


def test_hq_jump_schedule_matches_reference():
    ref = import_hq_reference("scheduler")
    cases = [
        dict(t_T=100, n_sample=1, jump_length=10, jump_n_sample=3),
        dict(t_T=250, n_sample=1, jump_length=10, jump_n_sample=10),
        dict(t_T=250, n_sample=2, jump_length=10, jump_n_sample=10,
             jump2_length=5, jump2_n_sample=2, jump3_length=2, jump3_n_sample=2,
             start_resampling=250),
    ]
    for kw in cases:
        assert schedules.get_schedule_jump_hq(**kw) == ref.get_schedule_jump(**kw)


def test_space_timesteps_matches_reference():
    ref = import_hq_reference("respace")
    for spec in ["ddim25", "ddim100", "250", "100,100,50"]:
        assert schedules.space_timesteps(1000, spec) == ref.space_timesteps(1000, spec)


def test_space_timesteps_oversample_fallback_matches_reference():
    """Single section count > num_timesteps: the reference returns a FLOAT
    linspace set (respace.py:59-60) that is only ever probed with integer
    indices; our int set must match that effective membership exactly."""
    ref = import_hq_reference("respace")
    for num_timesteps, spec in [(10, "15"), (100, "150"), (100, "101"), (7, "20")]:
        ref_set = ref.space_timesteps(num_timesteps, spec)
        effective = {i for i in range(num_timesteps) if i in ref_set}
        assert schedules.space_timesteps(num_timesteps, spec) == effective
    # multi-section oversampling still raises, like the reference
    with pytest.raises(ValueError):
        schedules.space_timesteps(10, "9,9")


def test_time_pairs_semantics():
    times = schedules.get_schedule_jump(100, 1, 1)
    tp = schedules.build_time_pairs(times, skip=10)
    assert tp.num_steps == len(times) - 1
    # plain DDIM: no travel steps, descending, last next-step is -1
    assert not tp.is_travel.any()
    assert tp.t_cur[0] == 990 and tp.t_next[-1] == -1

    times = schedules.get_schedule_jump(100, 10, 3)
    tp = schedules.build_time_pairs(times, skip=10)
    assert tp.is_travel.any()
    # travel steps ascend in diffusion time
    assert (tp.t_next[tp.is_travel] > tp.t_cur[tp.is_travel]).all()


def test_check_times_rejects_bad_schedules():
    with pytest.raises(AssertionError):
        schedules.check_times([3, 2, 1, 0], -1, 100)  # doesn't end at -1
    with pytest.raises(AssertionError):
        schedules.check_times([3, 1, 0, -1], -1, 100)  # step of 2
