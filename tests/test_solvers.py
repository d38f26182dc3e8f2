"""Second-order multistep DDNM solver (sampling/solvers.py).

Three proof layers:

1. Analytic probability-flow ODE: for Gaussian data N(0, v) the exact
   eps-predictor is linear and the flow endpoint has a closed form
   (x_end = x_init * s_end / s_start with s(t)^2 = abar*v + 1 - abar).
   The multistep solver must converge to it at second order — the
   10->20-step error ratio must be ~4x (first order would give ~2x).
   No trained weights or oracle needed; this pins the integrator math.

2. Trained-fixture quality (toy32 golden tier): at a fraction of the
   model calls the multistep solver must match the reference-protocol
   DDIM quality (thresholds pinned from measured values in
   docs/PERFORMANCE.md "Fewer steps").

3. Plumbing: scan/host driver agreement, simplified-vs-SVD mode
   consistency, op_ctx support, time-travel history invalidation,
   and the noise-free-only guards (sampler + runner).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ddnm_tpu import schedules as sch
from ddnm_tpu.operators import build_functional_operator
from ddnm_tpu.sampling import (
    build_schedule,
    sample_simplified,
    sample_svd,
)

from tests._golden import (
    TOY32,
    build_our_operator,
    load_eval_images,
    load_our_model,
    psnr01,
)

T = 1000
RES = 32


def _zero_noise(key, shape):
    return jnp.zeros(shape, jnp.float32)


# ---------------------------------------------------------------- analytic ODE


def _linear_setup(res=8, v=0.25):
    """Gaussian-data analytic case: eps(x, t) = sigma_t x / (alpha_t^2 v +
    sigma_t^2); pure diffusion via a zero-mask inpainting operator
    (A = A+ = 0, so the DDNM projection vanishes)."""
    betas = sch.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=2e-2, num_diffusion_timesteps=T
    )
    table = jnp.asarray(sch.alpha_bar_table(betas), jnp.float32)

    def model_fn(x, t):
        ab = table[t.astype(jnp.int32) + 1].reshape(-1, 1, 1, 1)
        sig2 = 1.0 - ab
        return jnp.sqrt(sig2) * x / (ab * v + sig2)

    op = build_functional_operator(
        "inpainting", image_size=res, mask=np.zeros((res, res), np.int64)
    )
    x_init = jax.random.normal(jax.random.PRNGKey(3), (2, res, res, 3))
    y = jnp.zeros_like(x_init)
    return betas, model_fn, op, x_init, y


def _ode_exact(betas, sched, x_init, v):
    abar = sch.alpha_bar_table(betas)
    ab0 = float(abar[int(sched.t_cur[0]) + 1])
    s_start = np.sqrt(ab0 * v + 1.0 - ab0)
    return np.asarray(x_init) * np.sqrt(v) / s_start


def _ms_err(betas, model_fn, op, x_init, y, v, n_steps):
    sched = build_schedule(betas=betas, t_sampling=n_steps)
    x, _ = sample_simplified(
        model_fn, x_init, y, op, sched, jax.random.PRNGKey(0),
        sigma_y=0.0, noise_fn=_zero_noise, loop="scan", solver="multistep",
    )
    exact = _ode_exact(betas, sched, x_init, v)
    return float(np.max(np.abs(np.asarray(x) - exact)))


def test_multistep_second_order_on_analytic_ode():
    """Asymptotic error ratios measured against a float64 oracle of the
    same update: 40->80 = 4.05x, 80->160 = 4.22x (second order ~4x;
    first order would give ~2x). 10->20 is pre-asymptotic (1.7x) — the
    linear-Gaussian field's lambda-steps are ~0.9 there."""
    v = 0.25
    betas, model_fn, op, x_init, y = _linear_setup(v=v)
    e40 = _ms_err(betas, model_fn, op, x_init, y, v, 40)
    e80 = _ms_err(betas, model_fn, op, x_init, y, v, 80)
    e160 = _ms_err(betas, model_fn, op, x_init, y, v, 160)
    # second order: doubling steps cuts the error ~4x (margin to 3x)
    assert e40 / e80 > 3.0, (e40, e80)
    assert e80 / e160 > 3.0, (e80, e160)
    assert e160 < 1e-2, e160


def test_multistep_beats_reference_update_on_analytic_ode():
    """The reference's simplified update is NOT an ODE integrator — its
    gamma_t = sqrt(1-at^2) quirk (diffusion.py:356,384) shrinks the
    noise-direction coefficient by an O(1) factor every step, so its
    analytic-flow error does not vanish with more steps (measured 1.16 at
    20 steps -> 1.41 at 40: it converges to its own contractive limit
    instead). The multistep solver's error at 40 steps is 11x smaller
    and still shrinking at second order."""
    v = 0.25
    betas, model_fn, op, x_init, y = _linear_setup(v=v)
    sched = build_schedule(betas=betas, t_sampling=40)
    exact = _ode_exact(betas, sched, x_init, v)
    x_dd, _ = sample_simplified(
        model_fn, x_init, y, op, sched, jax.random.PRNGKey(0),
        eta=0.0, sigma_y=0.0, noise_fn=_zero_noise, loop="scan",
    )
    e_dd = float(np.max(np.abs(np.asarray(x_dd) - exact)))
    e_ms = _ms_err(betas, model_fn, op, x_init, y, v, 40)
    assert e_ms < 0.15 * e_dd, (e_ms, e_dd)


# --------------------------------------------------------------- driver parity


def test_multistep_scan_host_drivers_agree():
    v = 0.25
    betas, model_fn, op, x_init, y = _linear_setup(v=v)
    sched = build_schedule(betas=betas, t_sampling=15)
    outs = {}
    for loop in ("scan", "host"):
        x, x0 = sample_simplified(
            model_fn, x_init, y, op, sched, jax.random.PRNGKey(0),
            sigma_y=0.0, noise_fn=_zero_noise, loop=loop, solver="multistep",
        )
        outs[loop] = (np.asarray(x), np.asarray(x0))
    assert np.max(np.abs(outs["scan"][0] - outs["host"][0])) < 1e-4
    assert np.max(np.abs(outs["scan"][1] - outs["host"][1])) < 1e-4


def test_multistep_time_travel_runs_and_is_deterministic():
    """Travel steps re-noise and invalidate the multistep history; with a
    fixed key the whole trajectory is reproducible."""
    v = 0.25
    betas, model_fn, op, x_init, y = _linear_setup(v=v)
    sched = build_schedule(
        betas=betas, t_sampling=10, travel_length=2, travel_repeat=2
    )
    assert bool(np.any(sched.is_travel))
    xs = [
        np.asarray(
            sample_simplified(
                model_fn, x_init, y, op, sched, jax.random.PRNGKey(11),
                sigma_y=0.0, loop=loop, solver="multistep",
            )[0]
        )
        for loop in ("scan", "host")
    ]
    assert np.all(np.isfinite(xs[0]))
    assert np.max(np.abs(xs[0] - xs[1])) < 1e-4  # same RNG carry order


# ------------------------------------------------------------------- guards


def test_multistep_rejects_noisy_and_unknown_solver():
    v = 0.25
    betas, model_fn, op, x_init, y = _linear_setup(v=v)
    sched = build_schedule(betas=betas, t_sampling=5)
    with pytest.raises(ValueError, match="noise-free"):
        sample_simplified(
            model_fn, x_init, y, op, sched, jax.random.PRNGKey(0),
            sigma_y=0.1, solver="multistep",
        )
    with pytest.raises(ValueError, match="unknown solver"):
        sample_simplified(
            model_fn, x_init, y, op, sched, jax.random.PRNGKey(0),
            solver="euler",
        )


def test_runner_rejects_multistep_misuse():
    from ddnm_tpu.config import load_config
    from ddnm_tpu.runner import RunArgs, Runner
    from pathlib import Path

    cfg = load_config(
        Path(__file__).resolve().parents[1] / "configs" / "smoke.yml"
    )
    with pytest.raises(ValueError, match="noise-free"):
        Runner(RunArgs(solver="multistep", sigma_y=0.1), cfg)
    with pytest.raises(ValueError, match="encoder_cache"):
        Runner(RunArgs(solver="multistep", encoder_cache=3), cfg)


def test_auto_loop_is_param_size_aware(monkeypatch):
    """auto on a remote-compile backend: host only for LARGE models — the
    measured 67x host-dispatch penalty for small models (docs/PERFORMANCE.md
    "Scan vs host") made the old unconditional host pick a footgun."""
    import ddnm_tpu.utils as utils_mod
    from ddnm_tpu.sampling import ddnm as ddnm_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(utils_mod, "is_remote_compile_backend", lambda: True)
    small = {"w": np.zeros((1024,), np.float32)}
    big = {"w": np.zeros((32 * 1024 * 1024,), np.float32)}  # 128 MB
    assert ddnm_mod._resolve_loop("auto", small) == "scan"
    assert ddnm_mod._resolve_loop("auto", big) == "host"
    assert ddnm_mod._resolve_loop("auto", None) == "host"  # size unknown
    assert ddnm_mod._resolve_loop("host", small) == "host"  # explicit wins
    monkeypatch.setattr(utils_mod, "is_remote_compile_backend", lambda: False)
    assert ddnm_mod._resolve_loop("auto", big) == "scan"


# ------------------------------------------------- trained-fixture quality


@pytest.fixture(scope="module")
def toy_setup():
    if not TOY32.fixture.exists():  # pragma: no cover
        pytest.skip("toy golden fixture not trained")
    model_fn, params = load_our_model(TOY32)
    x = load_eval_images(4, TOY32)  # (4, 3, 32, 32) in [-1, 1]
    x_orig = jnp.asarray(x.transpose(0, 2, 3, 1))
    betas = sch.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=2e-2, num_diffusion_timesteps=T
    )
    return model_fn, params, x_orig, betas


def _toy_run(toy_setup, solver, n_steps, mode="simplified", eta=0.85):
    model_fn, params, x_orig, betas = toy_setup
    sched = build_schedule(betas=betas, t_sampling=n_steps)
    x_init = jax.random.normal(jax.random.PRNGKey(5), x_orig.shape)
    if mode == "simplified":
        op = build_functional_operator(
            "sr_averagepooling", image_size=RES, deg_scale=4
        )
        y = op.A(x_orig)
        x, _ = sample_simplified(
            model_fn, x_init, y, op, sched, jax.random.PRNGKey(1),
            eta=eta, sigma_y=0.0, noise_fn=_zero_noise, loop="scan",
            params=params, solver=solver,
        )
    else:
        op = build_our_operator("sr_averagepooling", 4.0, res=RES)
        x_vec = jnp.transpose(x_orig, (0, 3, 1, 2)).reshape(len(x_orig), -1)
        y = op.A(x_vec)
        x, _ = sample_svd(
            model_fn, x_init, y, op, sched, jax.random.PRNGKey(1),
            eta=eta, sigma_y=0.0, noise_fn=_zero_noise, loop="scan",
            params=params, solver=solver,
        )
    gt01 = (np.asarray(x_orig) + 1.0) / 2.0
    out01 = np.clip((np.asarray(x) + 1.0) / 2.0, 0.0, 1.0)
    return psnr01(out01, gt01), out01


def test_multistep_wins_the_ultra_low_nfe_regime(toy_setup):
    """Measured regime split on the trained toy fixture (4x SR, full sweep
    in docs/PERFORMANCE.md "Fewer steps"): at <=10 steps the second-order
    solver beats the reference update by +4-8 dB (ddim@6 = 25.6 vs ms@6 =
    33.1; ddim@10 = 30.7 vs ms@10 = 36.5); from ~25 steps the reference's
    contractive update converges to a HIGHER-PSNR limit (45.3 at 25) than
    the probability-flow solution multistep integrates (~32-36), so ddim
    stays the default. Both halves of that split are pinned here."""
    psnr_ddim6, _ = _toy_run(toy_setup, "ddim", 6)
    psnr_ms6, _ = _toy_run(toy_setup, "multistep", 6)
    assert psnr_ms6 > psnr_ddim6 + 4.0, (psnr_ms6, psnr_ddim6)
    psnr_ddim10, _ = _toy_run(toy_setup, "ddim", 10)
    psnr_ms10, _ = _toy_run(toy_setup, "multistep", 10)
    assert psnr_ms10 > psnr_ddim10 + 3.0, (psnr_ms10, psnr_ddim10)
    # ...and the crossover: at the reference protocol's step counts the
    # first-order contractive update is the quality choice
    psnr_ddim25, _ = _toy_run(toy_setup, "ddim", 25)
    assert psnr_ddim25 > psnr_ms10 + 4.0, (psnr_ddim25, psnr_ms10)


def test_multistep_svd_mode_consistent_with_simplified(toy_setup):
    """avg-pool SR has the same pinv in both modes, so the two multistep
    paths must produce near-identical restorations."""
    _, out_s = _toy_run(toy_setup, "multistep", 10, mode="simplified")
    _, out_v = _toy_run(toy_setup, "multistep", 10, mode="svd")
    assert psnr01(out_s, out_v) > 40.0


def test_multistep_op_ctx_matches_static_mask(toy_setup):
    """ctx-form projection under the multistep solver: one executable per
    mask-agnostic operator, identical trajectory when ctx == static mask."""
    from tests._golden import toy_mask

    model_fn, params, x_orig, betas = toy_setup
    sched = build_schedule(betas=betas, t_sampling=8)
    x_init = jax.random.normal(jax.random.PRNGKey(5), x_orig.shape)
    mask = toy_mask(RES)
    op_static = build_functional_operator(
        "inpainting", image_size=RES, mask=mask
    )
    y = op_static.A(x_orig)
    x_stat, _ = sample_simplified(
        model_fn, x_init, y, op_static, sched, jax.random.PRNGKey(1),
        sigma_y=0.0, noise_fn=_zero_noise, loop="scan", params=params,
        solver="multistep",
    )
    op_ctx = build_functional_operator(
        "inpainting", image_size=RES, mask=np.ones((RES, RES), np.int64)
    )
    ctx = jnp.broadcast_to(
        jnp.asarray(mask, jnp.float32)[None, :, :, None],
        (x_orig.shape[0], RES, RES, 1),
    )
    x_ctx, _ = sample_simplified(
        model_fn, x_init, y, op_ctx, sched, jax.random.PRNGKey(1),
        sigma_y=0.0, noise_fn=_zero_noise, loop="scan", params=params,
        solver="multistep", op_ctx=ctx,
    )
    assert np.max(np.abs(np.asarray(x_stat) - np.asarray(x_ctx))) < 1e-5


# ------------------------------------------- posterior (hq) multistep form


def _posterior_linear_setup(res=8, v=0.25):
    """The analytic Gaussian case of _linear_setup wrapped for the posterior
    sampler: the model emits a learned-range head (eps, var) — var unused
    by the deterministic solver — and t arrives as the ORIGINAL timestep
    (timestep_map), matching the respaced-abar grid exactly."""
    betas, eps_fn, op, x_init, y = _linear_setup(res=res, v=v)

    def model_fn(x, t):
        eps = eps_fn(x, t)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    apy = jnp.zeros_like(x_init)  # zero-mask operator: A = A+ = 0
    return betas, model_fn, op, x_init, apy


def _posterior_tables_nt(betas, n_steps, sigma_y=0.0):
    """Respaced posterior tables with NO time-travel (pure descent)."""
    from ddnm_tpu.sampling import build_posterior_tables

    tables = build_posterior_tables(
        betas=betas, timestep_respacing=str(n_steps), sigma_y=sigma_y,
        schedule_jump_params=dict(t_T=n_steps, n_sample=1, jump_length=1,
                                  jump_n_sample=1),
    )
    assert not bool(np.any(tables.is_travel))
    return tables


def _pms_err(betas, model_fn, op, x_init, apy, v, n_steps):
    from ddnm_tpu.sampling import sample_posterior

    tables = _posterior_tables_nt(betas, n_steps)
    x, _ = sample_posterior(
        model_fn, x_init, apy, op, tables, jax.random.PRNGKey(0),
        clip_denoised=False, noise_fn=_zero_noise, loop="scan",
        solver="multistep",
    )
    abar = 1.0 / (np.asarray(tables.sqrt_recip_alphas_cumprod) ** 2)
    ab0 = float(abar[int(tables.t_cur[0])])
    s_start = np.sqrt(ab0 * v + 1.0 - ab0)
    exact = np.asarray(x_init) * np.sqrt(v) / s_start
    return float(np.max(np.abs(np.asarray(x) - exact)))


def test_posterior_multistep_second_order_on_analytic_ode():
    """Same convergence proof as the simplified form, on the RESPACED grid:
    halving the respacing step must shrink the ODE error ~4x (order 2).
    40/80/160 as in the simplified test — coarser grids are pre-asymptotic
    (lambda-steps ~0.9)."""
    v = 0.25
    betas, model_fn, op, x_init, apy = _posterior_linear_setup(v=v)
    errs = [_pms_err(betas, model_fn, op, x_init, apy, v, n)
            for n in (40, 80, 160)]
    assert errs[0] / errs[1] > 3.0, errs
    assert errs[1] / errs[2] > 3.0, errs
    assert errs[2] < 1e-2, errs


def test_posterior_multistep_drivers_agree_and_travel_runs():
    from ddnm_tpu.sampling import build_posterior_tables, sample_posterior

    v = 0.25
    betas, model_fn, op, x_init, apy = _posterior_linear_setup(v=v)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="12",
        schedule_jump_params=dict(t_T=12, n_sample=1, jump_length=3,
                                  jump_n_sample=2),
    )
    assert bool(np.any(tables.is_travel))  # jumps exercise the invalidation
    outs = {}
    for loop in ("scan", "host"):
        x, x0 = sample_posterior(
            model_fn, x_init, apy, op, tables, jax.random.PRNGKey(2),
            clip_denoised=False, loop=loop, solver="multistep",
        )
        outs[loop] = (np.asarray(x), np.asarray(x0))
    assert np.all(np.isfinite(outs["scan"][0]))
    assert np.max(np.abs(outs["scan"][0] - outs["host"][0])) < 1e-4
    assert np.max(np.abs(outs["scan"][1] - outs["host"][1])) < 1e-4


def test_posterior_multistep_paste_constraint_holds():
    """The Mask-Shift paste participates in the data prediction: pasted
    pixels of the returned x0_hat equal paste_content exactly."""
    from ddnm_tpu.sampling import sample_posterior

    v = 0.25
    betas, model_fn, op, x_init, apy = _posterior_linear_setup(v=v)
    tables = _posterior_tables_nt(betas, 8)
    mask = np.zeros((1, 8, 8, 1), np.float32)
    mask[:, :, :4, :] = 1.0  # left half pasted (a solved neighbour strip)
    content = jnp.full(x_init.shape, 0.25, jnp.float32)
    _, x0_hat = sample_posterior(
        model_fn, x_init, apy, op, tables, jax.random.PRNGKey(0),
        paste_mask=jnp.asarray(mask), paste_content=content,
        clip_denoised=False, noise_fn=_zero_noise, loop="scan",
        solver="multistep",
    )
    pasted = np.asarray(x0_hat)[:, :, :4, :]
    np.testing.assert_allclose(pasted, 0.25, atol=1e-6)


def test_posterior_multistep_rejects_noisy_tables():
    from ddnm_tpu.sampling import sample_posterior

    v = 0.25
    betas, model_fn, op, x_init, apy = _posterior_linear_setup(v=v)
    noisy_tables = _posterior_tables_nt(betas, 8, sigma_y=0.5)
    with pytest.raises(ValueError, match="noise-free"):
        sample_posterior(
            model_fn, x_init, apy, op, noisy_tables, jax.random.PRNGKey(0),
            solver="multistep",
        )
    with pytest.raises(ValueError, match="unknown solver"):
        sample_posterior(
            model_fn, x_init, apy, op, _posterior_tables_nt(betas, 8),
            jax.random.PRNGKey(0), solver="rk4",
        )


def test_posterior_multistep_wins_low_nfe_regime():
    """Measured regime split in the POSTERIOR / Mask-Shift setting (full
    mid64 sweep in docs/PERFORMANCE.md "Posterior / hq regime"; same
    protocol at toy scale here): on a 9-tile Mask-Shift chain the
    second-order solver beats the reference update by +5.8 dB at 6
    NFE/tile (24.62 vs 18.85 measured), while at the reference protocol's
    25 NFE/tile the contractive ddim update is the quality choice
    (27.85 > every low-NFE number). Both halves pinned, mirroring
    test_multistep_wins_the_ultra_low_nfe_regime."""
    from ddnm_tpu import tiling
    from ddnm_tpu.sampling import build_posterior_tables
    from tests._golden_adm import ADM_TOY32, _tools_on_path
    from tests._golden_adm import load_our_model as load_adm

    _tools_on_path()
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parents[1]
                            / "tools/experiments"))
    from natural_family import make_naturals

    if not ADM_TOY32.fixture.exists():
        pytest.skip("toy32 adm fixture not trained")

    res, canvas = ADM_TOY32.res, 2 * ADM_TOY32.res
    model_fn, params = load_adm(ADM_TOY32)
    gt = np.asarray(make_naturals(jax.random.PRNGKey(42), 1, canvas))
    betas = sch.named_beta_schedule("linear", T, use_scale=True)

    old_tile, old_stride = tiling.TILE, tiling.STRIDE
    tiling.TILE, tiling.STRIDE = res, res // 2
    try:
        def run(solver, nfe):
            tables = build_posterior_tables(
                betas=betas, timestep_respacing=str(nfe),
                schedule_jump_params=dict(t_T=nfe, n_sample=1,
                                          jump_length=1, jump_n_sample=1))
            out = tiling.mask_shift_sample(
                model_fn, gt, "sr_averagepooling", tables,
                jax.random.fold_in(jax.random.PRNGKey(7), 0), scale=4,
                params=params, noise_fn=_zero_noise, solver=solver)
            gt01 = (gt[0] + 1.0) / 2.0
            out01 = np.clip((out["final"][0] + 1.0) / 2.0, 0.0, 1.0)
            return psnr01(out01, gt01)

        ms6 = run("multistep", 6)
        ddim6 = run("ddim", 6)
        assert ms6 > ddim6 + 3.5, (ms6, ddim6)
        # crossover: at the reference protocol's per-tile budget the
        # contractive update converges to the higher-PSNR limit
        ddim25 = run("ddim", 25)
        assert ddim25 > ms6 + 2.0, (ddim25, ms6)
    finally:
        tiling.TILE, tiling.STRIDE = old_tile, old_stride


def test_posterior_auto_loop_is_scan():
    """The posterior/hq path's 'auto' ALWAYS means scan — unlike the
    simplified sampler's size-aware rule. Measured on the remote-compile
    backend (round 5): 45-call tile chain = 9.5-12.8 s scanned vs
    293-326 s host-driven (~25-30x) at 59M params; round 3's size-aware
    auto had silently regressed the hq tile chain to host."""
    from ddnm_tpu.sampling.posterior import _resolve_posterior_loop

    assert _resolve_posterior_loop("auto") == "scan"
    assert _resolve_posterior_loop("scan") == "scan"
    assert _resolve_posterior_loop("host") == "host"
