"""Property-based (hypothesis) oracle-parity fuzz for the schedule layer.

The jump schedulers and respacing functions are the places where the exact
integer output sequence IS the parity contract (VERDICT copy-paste notes:
condensed transliterations of reference bookkeeping). The fixed-parameter
golden tests (test_schedules.py) pin the shipped configurations; these
fuzz the parameter space against the reference's own implementations as
oracles.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ddnm_tpu import schedules as sch
from ddnm_tpu.sampling.posterior import respace_betas
from tests._reference import import_hq_reference, import_reference


@settings(max_examples=40, deadline=None)
@given(
    t_sampling=st.integers(4, 250),
    travel_length=st.integers(1, 10),
    travel_repeat=st.integers(1, 4),
)
def test_schedule_jump_matches_reference(t_sampling, travel_length, travel_repeat):
    """get_schedule_jump == the reference's (diffusion.py:613-634) for any
    (T_sampling, travel_length, travel_repeat)."""
    ref = import_reference("guided_diffusion.diffusion")
    ours = sch.get_schedule_jump(t_sampling, travel_length, travel_repeat)
    theirs = ref.get_schedule_jump(t_sampling, travel_length, travel_repeat)
    assert ours == list(theirs)


@settings(max_examples=40, deadline=None)
@given(
    t_T=st.integers(4, 250),
    jump_length=st.integers(1, 12),
    jump_n_sample=st.integers(1, 5),
    n_sample=st.integers(1, 3),
    jump2_length=st.integers(1, 4),
    jump2_n_sample=st.integers(1, 3),
    jump3_length=st.integers(1, 4),
    jump3_n_sample=st.integers(1, 3),
    start_resampling=st.sampled_from([100_000_000, 250, 50, 20]),
)
def test_schedule_jump_hq_matches_reference(
    t_T, jump_length, jump_n_sample, n_sample, jump2_length, jump2_n_sample,
    jump3_length, jump3_n_sample, start_resampling,
):
    """3-level jump scheduler == the reference's
    (hq_demo/guided_diffusion/scheduler.py:70-147) across the full
    parameter space incl. nested jump2/jump3 and start_resampling gating."""
    scheduler = import_hq_reference("scheduler")
    kw = dict(
        t_T=t_T, n_sample=n_sample,
        jump_length=jump_length, jump_n_sample=jump_n_sample,
        jump2_length=jump2_length, jump2_n_sample=jump2_n_sample,
        jump3_length=jump3_length, jump3_n_sample=jump3_n_sample,
        start_resampling=start_resampling,
    )
    ours = sch.get_schedule_jump_hq(**kw)
    theirs = scheduler.get_schedule_jump(**kw)
    assert ours == list(theirs)


@settings(max_examples=40, deadline=None)
@given(
    num_timesteps=st.integers(10, 1000),
    data=st.data(),
)
def test_space_timesteps_matches_reference(num_timesteps, data):
    """space_timesteps == the reference's (respace.py:23-79) for section
    lists, "ddimN" specs and the single-section oversampling fallback.
    Float members of the reference's fallback set are compared through the
    only probe the pipeline ever makes: `i in use_timesteps` over
    range(num_timesteps) (respace.py:104-111)."""
    respace = import_hq_reference("respace")
    kind = data.draw(st.sampled_from(["sections", "ddim", "over"]))
    if kind == "sections":
        n_sections = data.draw(st.integers(1, 4))
        size_per = num_timesteps // n_sections
        if size_per < 1:
            return
        spec = [data.draw(st.integers(1, size_per)) for _ in range(n_sections)]
    elif kind == "ddim":
        stride = data.draw(st.integers(1, max(1, num_timesteps // 2)))
        spec = f"ddim{len(range(0, num_timesteps, stride))}"
    else:  # single-section count > num_timesteps (linspace fallback)
        spec = [data.draw(st.integers(num_timesteps + 1, num_timesteps * 3))]
    ours = sch.space_timesteps(num_timesteps, spec)
    theirs = respace.space_timesteps(num_timesteps, spec)
    kept_ours = [i for i in range(num_timesteps) if i in ours]
    kept_theirs = [i for i in range(num_timesteps) if i in theirs]
    assert kept_ours == kept_theirs


@settings(max_examples=25, deadline=None)
@given(
    num_timesteps=st.integers(10, 500),
    n_keep=st.integers(2, 50),
    seed=st.integers(0, 2**31 - 1),
)
def test_respace_betas_reproduces_alpha_bar(num_timesteps, n_keep, seed):
    """Invariant behind respacing (respace.py:104-111): the rebuilt betas'
    cumulative alpha-bar at position i equals the ORIGINAL alpha-bar at the
    i-th kept timestep, for any kept subset."""
    n_keep = min(n_keep, num_timesteps)
    rng = np.random.default_rng(seed)
    keep = np.sort(rng.choice(num_timesteps, size=n_keep, replace=False))
    betas = np.linspace(1e-4, 0.02, num_timesteps)
    new_betas, tmap = respace_betas(betas, set(int(k) for k in keep))
    assert list(tmap) == list(keep)
    abar_orig = np.cumprod(1.0 - betas)
    abar_new = np.cumprod(1.0 - new_betas)
    np.testing.assert_allclose(abar_new, abar_orig[keep], rtol=1e-10)
