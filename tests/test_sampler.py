"""End-to-end DDNM sampler parity vs the reference loops.

Oracle: functions/svd_ddnm.py::ddnm_diffusion / ddnm_plus_diffusion run under
torch-cpu with (a) .to('cuda') redirected to cpu and (b) torch.randn_like
patched to zeros — the stochastic terms are externally injected noise, so
zeroing them on both sides makes the trajectories deterministic while still
exercising every deterministic term (including time-travel re-noising paths).

The simplified-mode oracle is an eager torch transcription of
guided_diffusion/diffusion.py:346-396 (that code is embedded in a method that
needs datasets/checkpoints; the formulas are re-expressed here directly from
Eq.12/17/19 with the reference's sigma_t = sqrt(1-at_next^2) quirk)."""

import contextlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ddnm_tpu import schedules as sch
from ddnm_tpu.models.convert import torch_state_dict_to_flax
from ddnm_tpu.models.unet_ddpm import DDPMUNet
from ddnm_tpu.operators import build_functional_operator, build_svd_operator
from ddnm_tpu.sampling import build_schedule, sample_simplified, sample_svd
from tests._reference import import_reference

RES = 32
T = 100  # diffusion timesteps (small for test speed)
T_SAMPLING = 10


class _NS:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _NS(v) if isinstance(v, dict) else v)


@contextlib.contextmanager
def _cpu_as_cuda_and_zero_noise():
    import torch

    orig_to = torch.Tensor.to
    orig_randn_like = torch.randn_like

    def patched_to(self, *args, **kwargs):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = patched_to
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        yield
    finally:
        torch.Tensor.to = orig_to
        torch.randn_like = orig_randn_like


@pytest.fixture(scope="module")
def tiny_model():
    torch = pytest.importorskip("torch")
    ref_models = import_reference("guided_diffusion.models")
    ref_cfg = _NS(
        {
            "model": {
                "type": "simple", "ch": 32, "out_ch": 3, "ch_mult": [1, 2],
                "num_res_blocks": 1, "attn_resolutions": [16], "dropout": 0.0,
                "in_channels": 3, "resamp_with_conv": True,
            },
            "data": {"image_size": RES},
            "diffusion": {"num_diffusion_timesteps": T},
        }
    )
    torch.manual_seed(7)
    ref = ref_models.Model(ref_cfg)
    ref.eval()

    model = DDPMUNet(
        ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(16,), resolution=RES,
    )
    params = {"params": torch_state_dict_to_flax(ref.state_dict())}

    def model_fn(x, t):
        return model.apply(params, x, t)

    return ref, model_fn, model, params


def _betas():
    return sch.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=T
    ).astype(np.float32)


ZERO_NOISE = lambda key, shape: jnp.zeros(shape, jnp.float32)


@pytest.mark.parametrize("travel_l,travel_r", [(1, 1), (3, 2)])
@pytest.mark.parametrize("sigma_y", [0.0, 0.1])
def test_svd_sampler_parity(tiny_model, travel_l, travel_r, sigma_y):
    torch = pytest.importorskip("torch")
    svd_ddnm = import_reference("functions.svd_ddnm")

    ref_model, model_fn, _, _ = tiny_model
    betas = _betas()
    op = build_svd_operator("sr_averagepooling", image_size=RES, deg_scale=2)

    rng = np.random.RandomState(0)
    x_orig = rng.randn(1, 3, RES, RES).astype(np.float32)
    x_T = rng.randn(1, 3, RES, RES).astype(np.float32)
    y = np.asarray(op.A(jnp.asarray(x_orig.reshape(1, -1))))

    cfg = _NS(
        {
            "diffusion": {"num_diffusion_timesteps": T},
            "time_travel": {
                "T_sampling": T_SAMPLING,
                "travel_length": travel_l,
                "travel_repeat": travel_r,
            },
        }
    )

    class TorchOp:
        """Adapter: reference loop calls torch-tensor methods on A_funcs."""

        def A(self, v):
            return torch.from_numpy(np.asarray(op.A(jnp.asarray(v.numpy()))))

        def A_pinv(self, v):
            return torch.from_numpy(np.asarray(op.A_pinv(jnp.asarray(v.numpy()))))

        def Lambda(self, v, a, s_y, s_t, eta):
            return torch.from_numpy(np.asarray(
                op.Lambda(jnp.asarray(v.numpy()), float(a), s_y, float(s_t), eta)
            ))

        def Lambda_noise(self, v, a, s_y, s_t, eta, eps):
            return torch.from_numpy(np.asarray(
                op.Lambda_noise(
                    jnp.asarray(v.numpy()), float(a), s_y, float(s_t), eta,
                    jnp.asarray(eps.numpy()),
                )
            ))

    with _cpu_as_cuda_and_zero_noise(), torch.no_grad():
        fn = svd_ddnm.ddnm_diffusion if sigma_y == 0 else svd_ddnm.ddnm_plus_diffusion
        args = [torch.from_numpy(x_T.copy()), ref_model, torch.from_numpy(betas), 0.85,
                TorchOp(), torch.from_numpy(y)]
        if sigma_y != 0:
            args.append(sigma_y)
        xs, _ = fn(*args, config=cfg)
        ref_out = xs[-1].numpy()

    sched = build_schedule(
        betas=betas, t_sampling=T_SAMPLING,
        travel_length=travel_l, travel_repeat=travel_r,
    )
    x, _ = sample_svd(
        model_fn,
        jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))),
        jnp.asarray(y),
        op,
        sched,
        jax.random.PRNGKey(0),
        eta=0.85,
        sigma_y=sigma_y,
        noise_fn=ZERO_NOISE,
    )
    ours = np.transpose(np.asarray(x), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_out, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("sigma_y", [0.0, 0.2])
def test_simplified_sampler_parity(tiny_model, sigma_y):
    """Eager torch transcription of diffusion.py:346-396 vs our scan."""
    torch = pytest.importorskip("torch")
    ref_model, model_fn, _, _ = tiny_model
    betas = _betas()
    scale = 2
    op = build_functional_operator("sr_averagepooling", image_size=RES, deg_scale=scale)

    rng = np.random.RandomState(1)
    x_orig = rng.randn(1, 3, RES, RES).astype(np.float32)
    x_T = rng.randn(1, 3, RES, RES).astype(np.float32)

    def A_t(z):
        return torch.nn.AdaptiveAvgPool2d((RES // scale, RES // scale))(z)

    def Ap_t(z):
        n, c, h, w = z.shape
        return (
            (torch.zeros(n, c, h, scale, w, scale) + z.view(n, c, h, 1, w, 1))
            .view(n, c, scale * h, scale * w)
        )

    y_t = A_t(torch.from_numpy(x_orig))
    eta = 0.85
    b_t = torch.from_numpy(betas)

    def compute_alpha(t):
        beta = torch.cat([torch.zeros(1), b_t], dim=0)
        return (1 - beta).cumprod(dim=0).index_select(0, t + 1).view(-1, 1, 1, 1)

    skip = T // T_SAMPLING
    times = sch.get_schedule_jump(T_SAMPLING, 1, 1)
    x_ref = torch.from_numpy(x_T.copy())
    x0_preds = []
    with torch.no_grad():
        for i, j in zip(times[:-1], times[1:]):
            i, j = i * skip, j * skip
            if j < 0:
                j = -1
            if j < i:
                t = torch.ones(1) * i
                next_t = torch.ones(1) * j
                at = compute_alpha(t.long())
                at_next = compute_alpha(next_t.long())
                sigma_t = (1 - at_next**2).sqrt()
                et = ref_model(x_ref, t)
                x0_t = (x_ref - et * (1 - at).sqrt()) / at.sqrt()
                if sigma_t >= at_next * sigma_y:
                    lambda_t = 1.0
                    gamma_t = (sigma_t**2 - (at_next * sigma_y) ** 2).sqrt()
                else:
                    lambda_t = sigma_t / (at_next * sigma_y)
                    gamma_t = 0.0
                x0_t_hat = x0_t - lambda_t * Ap_t(A_t(x0_t) - y_t)
                c1 = (1 - at_next).sqrt() * eta
                c2 = (1 - at_next).sqrt() * ((1 - eta**2) ** 0.5)
                x_ref = at_next.sqrt() * x0_t_hat + gamma_t * (
                    c1 * torch.zeros_like(x0_t) + c2 * et
                )
                x0_preds.append(x0_t)
            else:
                at_next = compute_alpha((torch.ones(1) * j).long())
                x_ref = at_next.sqrt() * x0_preds[-1]

    sched = build_schedule(betas=betas, t_sampling=T_SAMPLING)
    y = np.transpose(y_t.numpy(), (0, 2, 3, 1))
    x, _ = sample_simplified(
        model_fn,
        jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))),
        jnp.asarray(y),
        op,
        sched,
        jax.random.PRNGKey(0),
        eta=eta,
        sigma_y=sigma_y,
        noise_fn=ZERO_NOISE,
    )
    ours = np.transpose(np.asarray(x), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, x_ref.numpy(), atol=2e-3, rtol=1e-3)


def test_svd_sampler_guidance_params_style():
    """Classifier guidance through the params-passing path: the guidance
    gradient must change the trajectory, and both params-style and
    closure-style guidance must agree."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.operators import build_svd_operator
    from ddnm_tpu.sampling import build_schedule, sample_svd
    from ddnm_tpu import schedules as sch

    size, batch = 16, 2
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3)), jnp.float32)
    betas = sch.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=50
    )
    sched = build_schedule(betas=betas, t_sampling=5)
    op = build_svd_operator("colorization", channels=3, image_size=size)
    y = op.A(jnp.transpose(x0, (0, 3, 1, 2)).reshape(batch, -1))
    x_init = jnp.asarray(rng.standard_normal((batch, size, size, 3)), jnp.float32)

    def model_fn(p, x, t):
        return p["model"]["scale"] * x

    def guidance_closure(x, t, at=None):
        return 0.1 * x

    def guidance_params(p, x, t, at=None):
        return p["clf"]["g"] * x

    params = {"model": {"scale": jnp.float32(0.1)}, "clf": {"g": jnp.float32(0.1)}}
    key = jax.random.PRNGKey(3)
    zero = lambda k, s: jnp.zeros(s, jnp.float32)

    a, _ = sample_svd(
        lambda x, t: 0.1 * x, x_init, y, op, sched, key,
        guidance_fn=guidance_closure, noise_fn=zero,
    )
    b, _ = sample_svd(
        model_fn, x_init, y, op, sched, key,
        guidance_fn=guidance_params, noise_fn=zero, params=params,
    )
    c, _ = sample_svd(
        model_fn, x_init, y, op, sched, key, noise_fn=zero, params=params,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert np.abs(np.asarray(b) - np.asarray(c)).max() > 1e-4  # guidance acts


def test_encoder_prop_interval1_exact_and_interval3_close(tiny_model):
    """Encoder-propagation sampler: interval=1 equals the exact host-loop
    sampler; interval=3 is a finite approximation that actually differs."""
    from ddnm_tpu.sampling.accel import (
        ddpm_split_fns,
        sample_simplified_encoder_prop,
    )

    _, model_fn, model, params = tiny_model
    enc_fn, dec_fn = ddpm_split_fns(model)
    betas = _betas()
    sched = build_schedule(betas=betas, t_sampling=T_SAMPLING)
    op = build_functional_operator("sr_averagepooling", image_size=RES, deg_scale=4)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (1, RES, RES, 3)), jnp.float32)
    y = op.A(x0)
    x_init = jnp.asarray(rng.standard_normal((1, RES, RES, 3)), jnp.float32)
    key = jax.random.PRNGKey(5)

    exact, _ = sample_simplified(
        model_fn, x_init, y, op, sched, key, noise_fn=ZERO_NOISE, loop="host"
    )
    acc1, _ = sample_simplified_encoder_prop(
        enc_fn, dec_fn, x_init, y, op, sched, key, interval=1,
        noise_fn=ZERO_NOISE, params=params,
    )
    np.testing.assert_allclose(np.asarray(acc1), np.asarray(exact), atol=1e-5)

    acc3, _ = sample_simplified_encoder_prop(
        enc_fn, dec_fn, x_init, y, op, sched, key, interval=3,
        noise_fn=ZERO_NOISE, params=params,
    )
    diff = float(np.abs(np.asarray(acc3) - np.asarray(exact)).max())
    assert 0.0 < diff < 1.0  # approximate but bounded
    assert np.isfinite(np.asarray(acc3)).all()


def test_encoder_prop_key_steps_and_calibration(tiny_model):
    """Explicit key_steps pin the full forwards; the drift-calibration
    helpers produce a valid same-budget key set; all-steps key_steps is
    exactly the exact sampler."""
    from ddnm_tpu.sampling.accel import (
        ddpm_split_fns,
        measure_feature_drift,
        sample_simplified_encoder_prop,
        select_key_steps,
    )

    _, model_fn, model, params = tiny_model
    enc_fn, dec_fn = ddpm_split_fns(model)
    betas = _betas()
    sched = build_schedule(betas=betas, t_sampling=T_SAMPLING)
    op = build_functional_operator("sr_averagepooling", image_size=RES, deg_scale=4)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (1, RES, RES, 3)), jnp.float32)
    y = op.A(x0)
    x_init = jnp.asarray(rng.standard_normal((1, RES, RES, 3)), jnp.float32)
    key = jax.random.PRNGKey(5)

    exact, _ = sample_simplified(
        model_fn, x_init, y, op, sched, key, noise_fn=ZERO_NOISE, loop="host"
    )
    n_calls = int(np.sum(~np.asarray(sched.is_travel, bool)))

    # all steps are keys -> exact
    all_keys, _ = sample_simplified_encoder_prop(
        enc_fn, dec_fn, x_init, y, op, sched, key, interval=5,
        key_steps=range(n_calls), noise_fn=ZERO_NOISE, params=params,
    )
    np.testing.assert_allclose(np.asarray(all_keys), np.asarray(exact), atol=1e-5)

    # measured drift profile: one value per model call, step 0 drift = 0
    drift = measure_feature_drift(
        enc_fn, dec_fn, x_init, y, op, sched, key,
        noise_fn=ZERO_NOISE, params=params,
    )
    assert drift.shape == (n_calls,) and drift[0] == 0.0 and (drift >= 0).all()

    # budget-respecting key selection
    n_keys = -(-n_calls // 3)  # uniform-k3 budget
    keys = select_key_steps(drift, n_keys)
    assert keys[0] == 0 and len(keys) == n_keys
    assert keys == sorted(set(keys)) and keys[-1] < n_calls

    calibrated, _ = sample_simplified_encoder_prop(
        enc_fn, dec_fn, x_init, y, op, sched, key, key_steps=keys,
        noise_fn=ZERO_NOISE, params=params,
    )
    uniform, _ = sample_simplified_encoder_prop(
        enc_fn, dec_fn, x_init, y, op, sched, key, interval=3,
        noise_fn=ZERO_NOISE, params=params,
    )
    assert np.isfinite(np.asarray(calibrated)).all()
    # calibrated should track the exact trajectory at least as well as
    # uniform on the image it was calibrated on (weak sanity bound: not
    # catastrophically worse)
    err_cal = float(np.abs(np.asarray(calibrated) - np.asarray(exact)).mean())
    err_uni = float(np.abs(np.asarray(uniform) - np.asarray(exact)).mean())
    assert err_cal <= err_uni * 2 + 1e-6

    with pytest.raises(ValueError, match="n_keys"):
        select_key_steps(drift, 0)


@pytest.mark.parametrize("loop", ["scan", "host"])
@pytest.mark.parametrize("deg", ["inpainting", "mask_color_sr"])
def test_simplified_op_ctx_matches_static_mask(tiny_model, loop, deg):
    """Per-image runtime masks (op_ctx) through ONE executable must match
    per-image runs with the mask baked statically into the operator —
    per-image keys make the noise streams grouping-independent, so the
    match is bitwise."""
    _, _, model, params = tiny_model
    model_fn = lambda p, x, t: model.apply(p, x, t)
    sched = build_schedule(betas=_betas(), t_sampling=T_SAMPLING,
                           travel_length=1, travel_repeat=2)
    rng = np.random.default_rng(5)
    masks = (rng.random((2, RES, RES, 1)) > 0.4).astype(np.float32)
    gts = jnp.asarray(rng.uniform(-1, 1, (2, RES, RES, 3)), jnp.float32)
    keys = jnp.stack([
        jax.random.key_data(jax.random.PRNGKey(11)),
        jax.random.key_data(jax.random.PRNGKey(12)),
    ]).astype(jnp.uint32)
    x_init = jax.vmap(
        lambda k: jax.random.normal(jax.random.wrap_key_data(
            k, impl="threefry2x32"), (RES, RES, 3), jnp.float32)
    )(keys)

    # one ctx-capable operator; its static mask is irrelevant to ctx runs
    op = build_functional_operator(
        deg, image_size=RES, mask=np.ones((RES, RES, 1), np.float32),
        deg_scale=4)
    assert op.has_ctx
    ctx = jnp.asarray(masks)

    # (1) ctx math == static math, bitwise, at the same batch shape: a
    # batch-1 ctx run reproduces the static-mask operator's run exactly
    for i in range(2):
        op_i = build_functional_operator(
            deg, image_size=RES, mask=masks[i], deg_scale=4)
        x_st, _ = sample_simplified(
            model_fn, x_init[i : i + 1], op_i.A(gts[i : i + 1]), op_i, sched,
            keys[i : i + 1], loop=loop, params=params,
        )
        x_c1, _ = sample_simplified(
            model_fn, x_init[i : i + 1], op.A_ctx(gts[i : i + 1], ctx[i : i + 1]),
            op, sched, keys[i : i + 1], loop=loop, params=params,
            op_ctx=ctx[i : i + 1],
        )
        np.testing.assert_array_equal(np.asarray(x_c1), np.asarray(x_st))

    # (2) lanes are independent inside one batched ctx executable: lane 0
    # is bitwise-unchanged when lane 1's mask changes, lane 1 is not
    ctx_b = jnp.asarray(np.stack([masks[0], masks[0]]))
    x_a, _ = sample_simplified(
        model_fn, x_init, op.A_ctx(gts, ctx), op, sched, keys,
        loop=loop, params=params, op_ctx=ctx)
    x_b, _ = sample_simplified(
        model_fn, x_init, op.A_ctx(gts, ctx_b), op, sched, keys,
        loop=loop, params=params, op_ctx=ctx_b)
    np.testing.assert_array_equal(np.asarray(x_a[0]), np.asarray(x_b[0]))
    assert not np.array_equal(np.asarray(x_a[1]), np.asarray(x_b[1]))

    # (3) ctx on an operator without ctx forms is an error
    with pytest.raises(ValueError, match="A_ctx"):
        sample_simplified(
            model_fn, x_init, op.A_ctx(gts, ctx), build_functional_operator(
                "sr_averagepooling", image_size=RES, deg_scale=4),
            sched, keys, params=params, op_ctx=ctx,
        )


def test_encoder_prop_rejects_bad_interval():
    import pytest as _pytest

    from ddnm_tpu.sampling.accel import (
        sample_posterior_encoder_prop,
        sample_simplified_encoder_prop,
    )

    with _pytest.raises(ValueError, match="interval"):
        sample_simplified_encoder_prop(
            None, None, None, None, None, None, None, interval=0
        )
    with _pytest.raises(ValueError, match="interval"):
        sample_posterior_encoder_prop(
            None, None, None, None, None, None, None, interval=0
        )
    # interval=1 promises the EXACT sampler; pairing it with key_steps
    # would silently drop that guarantee — it must raise instead
    with _pytest.raises(ValueError, match="contradictory"):
        sample_simplified_encoder_prop(
            None, None, None, None, None, None, None,
            interval=1, key_steps=[0, 2],
        )
    with _pytest.raises(ValueError, match="contradictory"):
        sample_posterior_encoder_prop(
            None, None, None, None, None, None, None,
            interval=1, key_steps=[0, 2],
        )


def test_encoder_prop_adm_simplified_interval1_exact():
    """adm_split_fns + simplified encoder-prop on a class-conditional ADM
    learn-sigma model: interval=1 equals the exact host-loop sampler (incl.
    automatic 6->3 eps slicing and label broadcast)."""
    from ddnm_tpu.models import ADMUNet
    from ddnm_tpu.sampling.accel import (
        adm_split_fns,
        sample_simplified_encoder_prop,
    )

    size = 32
    model = ADMUNet(
        image_size=size, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
        num_heads=1, num_head_channels=32, use_scale_shift_norm=True,
        resblock_updown=True, num_classes=10,
    )
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)), jnp.float32)
    x_init = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=4)
    y = op.A(x0)
    sched = build_schedule(betas=_betas(), t_sampling=4)
    key = jax.random.PRNGKey(6)

    def model_fn(p, x, t):
        cls = jnp.full((x.shape[0],), 7, jnp.int32)
        return model.apply(p, x, t, cls)

    exact, _ = sample_simplified(
        model_fn, x_init, y, op, sched, key, noise_fn=ZERO_NOISE,
        loop="host", params=params,
    )
    enc_fn, dec_fn = adm_split_fns(model, label=7)
    acc1, _ = sample_simplified_encoder_prop(
        enc_fn, dec_fn, x_init, y, op, sched, key, interval=1,
        noise_fn=ZERO_NOISE, params=params,
    )
    np.testing.assert_allclose(np.asarray(acc1), np.asarray(exact), atol=1e-5)
