"""Trained-weights golden harness for the hq/posterior pipeline (ADM family).

Companion to tests/_golden.py (which proves the main pipeline's "simple"
DDPM family): one locally TRAINED toy ADM UNet with learn_sigma
(tests/fixtures/toy_adm32.pt, produced by tools/train_toy_adm_golden.py)
drives BOTH frameworks through the hq task matrix at toy scale:

  - the reference side loads the state dict into its own
    guided_diffusion.unet.UNetModel and runs the hq fork's OWN
    SpacedDiffusion.p_sample / undo loop (gaussian_diffusion.py:432-493,
    208-217) with the reference's operator closures
    (gaussian_diffusion.py:595-643 mirrored at toy scale);
  - our side loads the SAME file through data/checkpoints.load_params
    (adm converter + strict validation) and runs sample_posterior.

run_hq_guided_task additionally proves the classifier family: a trained
toy EncoderUNet (tests/fixtures/toy_clf32.pt) guides both frameworks —
torch.autograd cond_fn + condition_mean on the reference side vs jax.grad
classifier_guidance_fn on ours.

Zero noise + shared x_T makes every task deterministic, so cross-framework
PSNR deltas are numerics, not sampling variance. This composes trained-UNet
parity, LEARNED_RANGE respacing, the posterior DDNM update, and the 3-level
jump schedule in one run per task.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import importlib
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
FIXTURE_PT = REPO / "tests/fixtures/toy_adm32.pt"
CLF_PT = REPO / "tests/fixtures/toy_clf32.pt"
RES = 32
T = 1000
RESPACING = "25"
JUMP = dict(t_T=25, n_sample=1, jump_length=10, jump_n_sample=2)
GUIDED_CLASS = 2   # blue-dominant blob family
GUIDED_SCALE = 2.0


@dataclasses.dataclass(frozen=True)
class AdmTier:
    """One ADM-family golden scale tier (see tests/_golden.Tier)."""

    name: str
    res: int
    fixture: Path
    clf_fixture: Path
    eval_dir: Path
    trainer_mod: str
    build_fn: str
    ref_build_fn: str
    clf_mod: str
    clf_build_fn: str
    clf_ref_build_fn: str
    golden_json: Path


ADM_TOY32 = AdmTier(
    name="toy32", res=32,
    fixture=REPO / "tests/fixtures/toy_adm32.pt",
    clf_fixture=REPO / "tests/fixtures/toy_clf32.pt",
    eval_dir=REPO / "exp/datasets/toy32",
    trainer_mod="train_toy_adm_golden", build_fn="build_model",
    ref_build_fn="build_ref_model",
    clf_mod="train_toy_classifier_golden", clf_build_fn="build_model",
    clf_ref_build_fn="build_ref_model",
    golden_json=REPO / "tests/fixtures/toy_adm32_psnr.json",
)

ADM_MID64 = AdmTier(
    name="mid64", res=64,
    fixture=REPO / "tests/fixtures/mid_adm64.pt",
    clf_fixture=REPO / "tests/fixtures/mid_clf64.pt",
    eval_dir=REPO / "exp/datasets/natural64",
    trainer_mod="train_mid_golden", build_fn="build_adm",
    ref_build_fn="build_ref_adm",
    clf_mod="train_mid_golden", clf_build_fn="build_clf",
    clf_ref_build_fn="build_ref_clf",
    golden_json=REPO / "tests/fixtures/mid_adm64_psnr.json",
)

ADM_BIG128 = AdmTier(
    name="big128", res=128,
    fixture=REPO / "tests/fixtures/big_adm128.pt",
    clf_fixture=REPO / "tests/fixtures/big_clf128.pt",
    eval_dir=REPO / "exp/datasets/natural128",
    trainer_mod="train_big_adm_golden", build_fn="build_adm",
    ref_build_fn="build_ref_adm",
    clf_mod="train_big_adm_golden", clf_build_fn="build_clf",
    clf_ref_build_fn="build_ref_clf",
    golden_json=REPO / "tests/fixtures/big_adm128_psnr.json",
)

ADM_TIERS = {t.name: t for t in (ADM_TOY32, ADM_MID64, ADM_BIG128)}

# emission protocol (golden_suite --images N) per ADM tier (see
# tests/_golden.GOLDEN_N_IMAGES): big128 uses 1 — one hq task row costs
# ~45 sequential 90M-at-128px oracle forwards on this host's single core
ADM_GOLDEN_N_IMAGES = {"toy32": 2, "mid64": 2, "big128": 1}


def _mod(name: str):
    _tools_on_path()
    return importlib.import_module(name)

# (name, deg, scale, sigma_y) — the hq task matrix
# (gaussian_diffusion.py:595-643) at toy scale; masked tasks use
# tests/_golden.toy_mask. The noisy row exercises the lambda/gamma
# precedence quirk (sigma_t/a_t*sigma_y, gaussian_diffusion.py:330-336 /
# posterior.py:151) on trained weights.
TASKS_HQ = [
    ("hq_sr_ap_4x", "sr_averagepooling", 4, 0.0),
    ("hq_colorization", "colorization", 0, 0.0),
    ("hq_inpainting", "inpainting", 0, 0.0),
    ("hq_mask_color_sr", "mask_color_sr", 2, 0.0),
    ("hq_sr_color", "sr_color", 2, 0.0),
    ("hq_sr_ap_4x_noisy", "sr_averagepooling", 4, 0.25),
]


def _tools_on_path():
    p = str(REPO / "tools")
    if p not in sys.path:
        sys.path.insert(0, p)


def _resolve_dtype(dtype):
    from tests._golden import _resolve_dtype as rd

    return rd(dtype)


def _upcast_f32(params):
    from tests._golden import _upcast_f32 as up

    return up(params)


@functools.lru_cache(maxsize=4)
def load_our_model(tier: AdmTier = ADM_TOY32, dtype=None):
    """(model_fn, params) from the tier's fixture via the FULL strict load
    path. dtype="bfloat16" = the production configuration (bf16 torso +
    bf16-resident params via cast_torso, hq_main.py:186-213)."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.data.checkpoints import load_params

    dt = _resolve_dtype(dtype)
    model = getattr(_mod(tier.trainer_mod), tier.build_fn)(dtype=dt)
    res = tier.res
    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, res, res, 3)), jnp.zeros((1,)),
    )
    params = _upcast_f32(
        load_params(tier.fixture, cache=False, expected=expected))
    if dt == jnp.bfloat16:
        from ddnm_tpu.models import cast_torso

        params = cast_torso(params, jnp.bfloat16)

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    return model_fn, params


@functools.lru_cache(maxsize=2)
def load_ref_model(tier: AdmTier = ADM_TOY32):
    """The reference's UNetModel with the trained fixture weights loaded."""
    import torch

    m = getattr(_mod(tier.trainer_mod), tier.ref_build_fn)()
    m.load_state_dict(torch.load(tier.fixture, map_location="cpu"))
    m.eval()
    return m


@functools.lru_cache(maxsize=4)
def load_our_classifier(tier: AdmTier = ADM_TOY32, dtype=None):
    """(module, params) for the tier's trained classifier (strict load).
    Under bf16 the classifier COMPUTES bf16 but keeps fp32 params —
    mirroring hq_main.py:241-251 (no cast_torso on cparams)."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.data.checkpoints import load_params

    dt = _resolve_dtype(dtype)
    model = getattr(_mod(tier.clf_mod), tier.clf_build_fn)(dtype=dt)
    res = tier.res
    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, res, res, 3)), jnp.zeros((1,)),
    )
    params = _upcast_f32(
        load_params(tier.clf_fixture, cache=False, expected=expected))
    return model, params


@functools.lru_cache(maxsize=2)
def load_ref_classifier(tier: AdmTier = ADM_TOY32):
    import torch

    m = getattr(_mod(tier.clf_mod), tier.clf_ref_build_fn)()
    m.load_state_dict(torch.load(tier.clf_fixture, map_location="cpu"))
    m.eval()
    return m


def build_ref_ops(gd, deg: str, scale: int, mask_t, res: int = RES):
    """The reference's A/Ap closures (gaussian_diffusion.py:595-643) at toy
    scale (256 -> res), built from the reference's OWN helpers
    (gd.color2gray / gd.gray2color / gd.MeanUpsample). Batch-1 only: the
    reference's color2gray relies on the enforced batch size
    (x.repeat(1,3,1,1) on a 3-D tensor)."""
    import torch

    RES = res  # noqa: N806 — keep the closure bodies verbatim below
    if deg == "sr_averagepooling":
        pool = torch.nn.AdaptiveAvgPool2d((RES // scale, RES // scale))
        return (lambda z: pool(z)), (lambda z: gd.MeanUpsample(z, scale))
    if deg == "colorization":
        return (lambda z: gd.color2gray(z)), (lambda z: gd.gray2color(z))
    if deg == "inpainting":
        return (lambda z: z * mask_t), (lambda z: z * mask_t)
    if deg == "mask_color_sr":
        pool = torch.nn.AdaptiveAvgPool2d((RES // scale, RES // scale))
        A = lambda z: pool(gd.color2gray(z * mask_t))
        Ap = lambda z: gd.gray2color(gd.MeanUpsample(z, scale)) * mask_t
        return A, Ap
    if deg == "sr_color":
        pool = torch.nn.AdaptiveAvgPool2d((RES // scale, RES // scale))
        A = lambda z: gd.color2gray(pool(z))
        Ap = lambda z: gd.MeanUpsample(gd.gray2color(z), scale)
        return A, Ap
    raise ValueError(deg)


def build_our_operator(deg: str, scale: int, res: int = RES, mask=None):
    from ddnm_tpu.operators import build_functional_operator

    from tests._golden import toy_mask

    kw = {}
    if deg in ("inpainting", "mask_color_sr"):
        kw["mask"] = (toy_mask(res) if mask is None else mask).astype(
            np.float32)
    return build_functional_operator(deg, image_size=res,
                                     deg_scale=float(scale or 1), **kw)


class _Conf(dict):
    """Minimal Default_Conf stand-in for SpacedDiffusion construction."""

    def __getattr__(self, k):
        return self.get(k)


def _spaced(gd, respace, betas, respacing: str = RESPACING):
    return respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(T, respacing),
        conf=_Conf(respace_interpolate=False, use_value_logger=False),
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
    )


@contextlib.contextmanager
def _silence_ref_io(gd):
    """Stub the reference's intermediate-save side effects
    (gaussian_diffusion.py:382-386 writes results/<save_path>/... PNGs and
    mkdirs them unconditionally whenever t%25==0). gd.os IS the global os
    module, so the makedirs patch is process-wide while active — restored
    on exit; nothing else mkdirs during the loop."""
    orig_save = getattr(gd, "save_image", None)
    orig_makedirs = gd.os.makedirs
    gd.save_image = lambda *a, **k: None
    gd.os.makedirs = lambda *a, **k: None
    try:
        yield
    finally:
        if orig_save is not None:
            gd.save_image = orig_save
        gd.os.makedirs = orig_makedirs


def _run_ref_loop(gd, scheduler, sd, tmodel, x_T, apy_ref, sigma_y,
                  n_images, ops, cond_fn=None, res: int = RES, jump=None):
    """Drive the reference's own p_sample/undo jump-schedule loop per image
    (the reference CLI is batch-1) under zero noise; returns (n, 3, H, W).

    The reference CLI wraps sampling in th.no_grad() even when guided —
    cond_fn re-enables grad internally (hq_demo/main.py:87-96)."""
    import torch

    from tests._golden import cpu_as_cuda_and_zero_noise

    refA, refAp = ops
    ref_imgs = []
    times = scheduler.get_schedule_jump(**(jump or JUMP))
    with cpu_as_cuda_and_zero_noise(), _silence_ref_io(gd), torch.no_grad():
        for i in range(n_images):
            kwargs = {
                "A": refA, "Ap": refAp, "sigma_y": sigma_y,
                "Apy": torch.from_numpy(apy_ref[i:i + 1].copy()),
                "shift_w": 0, "shift_h": 0,
                "shift_w_total": 1, "shift_h_total": 1,
                "H_target": res, "W_target": res, "x_temp": None,
                "save_path": "x", "gt": None,
            }
            x = torch.from_numpy(x_T[i:i + 1].copy())
            for t_last, t_cur in zip(times[:-1], times[1:]):
                tt = torch.tensor([t_last])
                if t_cur < t_last:
                    out = sd.p_sample(tmodel, x, tt, cond_fn=cond_fn,
                                      model_kwargs=kwargs)
                    x = out["sample"]
                else:
                    x = sd.undo(None, x, est_x_0=None, t=tt + 1)
            ref_imgs.append(x.detach().numpy())
    return np.concatenate(ref_imgs)


def _result(ours, ref_out, x_orig, apy):
    from tests._golden import psnr01

    to01 = lambda a: np.clip((a + 1) / 2, 0, 1)
    out = {
        "ours_psnr": round(psnr01(to01(ours), to01(x_orig)), 4),
        "images": {
            "gt": to01(x_orig),
            "apy": to01(apy),
            "ours": to01(ours),
        },
    }
    if ref_out is not None:
        out["ref_psnr"] = round(psnr01(to01(ref_out), to01(x_orig)), 4)
        out["max_abs_diff"] = float(np.abs(ours - ref_out).max())
        out["images"]["ref"] = to01(ref_out)
    return out


def _apy_both(op, refA, refAp, x_orig, n_images, deg):
    """Range-space projection through both operator stacks + equality check
    (reference side per image — its ops are batch-1 only)."""
    import jax.numpy as jnp
    import torch

    gt_t = torch.from_numpy(x_orig.copy())
    apy_ref = np.concatenate(
        [refAp(refA(gt_t[i:i + 1])).numpy() for i in range(n_images)])
    apy_ours = np.transpose(
        np.asarray(op.Ap(op.A(jnp.asarray(np.transpose(x_orig, (0, 2, 3, 1)))))),
        (0, 3, 1, 2))
    np.testing.assert_allclose(apy_ours, apy_ref, atol=2e-5,
                               err_msg=f"operator mismatch: {deg}")
    return apy_ours, apy_ref


def run_hq_task(deg: str, scale: int, sigma_y: float = 0.0,
                n_images: int = 2, tier: AdmTier = ADM_TOY32, dtype=None,
                skip_ref: bool = False, mask=None,
                respacing: str = RESPACING, jump=None):
    """One hq task through both frameworks (zero noise, shared x_T).

    Returns ours/ref PSNR vs gt, cross-framework max abs diff, and the
    output arrays for the gallery under "images". `tier`/`dtype`/`skip_ref`
    as in tests/_golden.run_task (the reference side always runs fp32)."""
    import jax
    import jax.numpy as jnp
    import torch

    from ddnm_tpu import schedules as sch
    from ddnm_tpu.sampling.posterior import (
        build_posterior_tables,
        sample_posterior,
    )

    from tests._golden import TIERS, load_eval_images, toy_mask
    from tests._reference import import_hq_reference

    gd = import_hq_reference("gaussian_diffusion")
    respace = import_hq_reference("respace")
    scheduler = import_hq_reference("scheduler")

    res = tier.res
    x_orig = load_eval_images(n_images, TIERS[tier.name])  # NCHW [-1,1]
    rng = np.random.RandomState(7)
    x_T = rng.randn(*x_orig.shape).astype(np.float32)
    betas = sch.named_beta_schedule("linear", T, use_scale=True)

    mask_np = (toy_mask(res) if mask is None else mask).astype(np.float32)
    mask_t = torch.from_numpy(mask_np).reshape(1, 1, res, res)
    refA, refAp = build_ref_ops(gd, deg, scale, mask_t, res)
    op = build_our_operator(deg, scale, res, mask=mask_np)
    apy_ours, apy_ref = _apy_both(op, refA, refAp, x_orig, n_images, deg)

    # ---- ours ----
    model_fn, params = load_our_model(tier, dtype)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing=respacing, sigma_y=sigma_y,
        schedule_jump_params=jump or JUMP,
    )
    zero = lambda key, shape: jnp.zeros(shape, jnp.float32)
    x_fin, _ = sample_posterior(
        model_fn,
        jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))),
        jnp.asarray(apy_ours.transpose(0, 2, 3, 1)),
        op, tables, jax.random.PRNGKey(0),
        noise_fn=zero, params=params,
    )
    ours = np.transpose(np.asarray(x_fin, np.float32), (0, 3, 1, 2))

    if skip_ref:
        return _result(ours, None, x_orig, apy_ours)

    # ---- reference (its own SpacedDiffusion.p_sample / undo loop) ----
    ref_model = load_ref_model(tier)

    def tmodel(x, ts, **kw):
        return ref_model(x, ts)

    ref_out = _run_ref_loop(gd, scheduler,
                            _spaced(gd, respace, betas, respacing),
                            tmodel, x_T, apy_ref, sigma_y, n_images,
                            (refA, refAp), res=res, jump=jump)
    return _result(ours, ref_out, x_orig, apy_ours)


def run_hq_guided_task(deg: str = "sr_averagepooling", scale: int = 4,
                       n_images: int = 2, tier: AdmTier = ADM_TOY32,
                       dtype=None, skip_ref: bool = False):
    """Classifier-GUIDED hq restoration through both frameworks on TRAINED
    weights (toy ADM + toy EncoderUNet classifier): the reference builds
    cond_fn = grad_x log p(y|x) * scale with torch.autograd
    (hq_demo/main.py:87-96) inside condition_mean
    (gaussian_diffusion.py:413-430); ours uses classifier_guidance_fn
    (jax.grad) inside sample_posterior. Class-pure gt images (GUIDED_CLASS)
    make the guidance signal meaningful, zero noise keeps it
    deterministic."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from ddnm_tpu import schedules as sch
    from ddnm_tpu.models.unet_adm import classifier_guidance_fn
    from ddnm_tpu.sampling.posterior import (
        build_posterior_tables,
        sample_posterior,
    )

    from tests._reference import import_hq_reference

    _tools_on_path()
    from train_toy_classifier_golden import make_class_blobs

    gd = import_hq_reference("gaussian_diffusion")
    respace = import_hq_reference("respace")
    scheduler = import_hq_reference("scheduler")

    res = tier.res
    x_nhwc, _ = make_class_blobs(jax.random.PRNGKey(123), n_images, res,
                                 classes=GUIDED_CLASS)
    x_orig = np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))
    rng = np.random.RandomState(11)
    x_T = rng.randn(*x_orig.shape).astype(np.float32)
    betas = sch.named_beta_schedule("linear", T, use_scale=True)

    refA, refAp = build_ref_ops(gd, deg, scale, None, res)
    op = build_our_operator(deg, scale, res)
    apy_ours, apy_ref = _apy_both(op, refA, refAp, x_orig, n_images, deg)

    # ---- ours ----
    model_fn_raw, mparams = load_our_model(tier, dtype)
    cmodel, cparams = load_our_classifier(tier, dtype)
    run_params = {"model": mparams, "classifier": cparams}

    def model_fn(p, x, t):
        return model_fn_raw(p["model"], x, t)

    guidance = classifier_guidance_fn(
        cmodel.apply, jnp.full((n_images,), GUIDED_CLASS, jnp.int32),
        GUIDED_SCALE,
    )
    tables = build_posterior_tables(
        betas=betas, timestep_respacing=RESPACING, sigma_y=0.0,
        schedule_jump_params=JUMP,
    )
    zero = lambda key, shape: jnp.zeros(shape, jnp.float32)
    x_fin, _ = sample_posterior(
        model_fn,
        jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))),
        jnp.asarray(apy_ours.transpose(0, 2, 3, 1)),
        op, tables, jax.random.PRNGKey(0),
        noise_fn=zero, params=run_params, guidance_fn=guidance,
    )
    ours = np.transpose(np.asarray(x_fin, np.float32), (0, 3, 1, 2))

    if skip_ref:
        return _result(ours, None, x_orig, apy_ours)

    # ---- reference ----
    ref_model = load_ref_model(tier)
    ref_clf = load_ref_classifier(tier)

    def cond_fn(x, t, **kw):  # hq_demo/main.py:87-96
        with torch.enable_grad():
            x_in = x.detach().requires_grad_(True)
            logits = ref_clf(x_in, t)
            logp = F.log_softmax(logits, dim=-1)
            sel = logp[range(len(logits)), GUIDED_CLASS]
            return torch.autograd.grad(sel.sum(), x_in)[0] * GUIDED_SCALE

    def tmodel(x, ts, **kw):
        return ref_model(x, ts)

    ref_out = _run_ref_loop(gd, scheduler, _spaced(gd, respace, betas),
                            tmodel, x_T, apy_ref, 0.0, n_images,
                            (refA, refAp), cond_fn=cond_fn, res=res)
    return _result(ours, ref_out, x_orig, apy_ours)
