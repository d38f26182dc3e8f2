"""Trained-weights golden-suite harness (VERDICT round-1 item #1b).

One locally TRAINED toy DDPM (tests/fixtures/toy_ddpm32.pt, produced by
tools/train_toy_golden.py) drives BOTH frameworks on the evaluation.sh task
matrix at toy scale: the reference side loads the state dict into its own
`guided_diffusion.models.Model` and runs its own `functions/svd_ddnm.py`
loops with its own `functions/svd_operators.py`; our side loads the SAME
file through data/checkpoints.load_params (converter + strict validation in
the loop) and runs sample_svd. Zero-noise + shared x_T makes every task
deterministic, so cross-framework PSNR deltas are numerics, not sampling
variance.
"""

from __future__ import annotations

import contextlib
import dataclasses
import importlib
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
FIXTURE_PT = REPO / "tests/fixtures/toy_ddpm32.pt"
EVAL_DIR = REPO / "exp/datasets/toy32"
RES = 32
T = 1000
T_SAMPLING = 25


@dataclasses.dataclass(frozen=True)
class Tier:
    """One trained-weights golden scale tier (VERDICT round-2 item #2:
    toy 32px/0.7M is joined by mid 64px/6.8M to close the 0.7M->552M
    numerics extrapolation). `trainer_mod` is the tools/ module whose
    `build_fn(dtype)` / `ref_build_fn()` construct the two frameworks'
    models for `fixture`."""

    name: str
    res: int
    fixture: Path
    eval_dir: Path
    trainer_mod: str
    build_fn: str
    ref_build_fn: str
    golden_json: Path


TOY32 = Tier(
    name="toy32", res=32,
    fixture=REPO / "tests/fixtures/toy_ddpm32.pt",
    eval_dir=REPO / "exp/datasets/toy32",
    trainer_mod="train_toy_golden", build_fn="build_model",
    ref_build_fn="build_ref_model",
    golden_json=REPO / "tests/fixtures/toy_golden_psnr.json",
)

MID64 = Tier(
    name="mid64", res=64,
    fixture=REPO / "tests/fixtures/mid_ddpm64.pt",
    eval_dir=REPO / "exp/datasets/natural64",
    trainer_mod="train_mid_golden", build_fn="build_ddpm",
    ref_build_fn="build_ref_ddpm",
    golden_json=REPO / "tests/fixtures/mid_golden_psnr.json",
)

BIG128 = Tier(
    name="big128", res=128,
    fixture=REPO / "tests/fixtures/big_ddpm128.pt",
    eval_dir=REPO / "exp/datasets/natural128",
    trainer_mod="train_big_golden", build_fn="build_ddpm",
    ref_build_fn="build_ref_ddpm",
    golden_json=REPO / "tests/fixtures/big_golden_psnr.json",
)

FLAG256 = Tier(
    name="flag256", res=256,
    fixture=REPO / "tests/fixtures/flag_ddpm256.pt",
    eval_dir=REPO / "exp/datasets/natural256",
    trainer_mod="train_flagship_golden", build_fn="build_ddpm",
    ref_build_fn="build_ref_ddpm",
    golden_json=REPO / "tests/fixtures/flag_golden_psnr.json",
)

TIERS = {t.name: t for t in (TOY32, MID64, BIG128, FLAG256)}

# emission protocol (golden_suite --images N) per tier: drift re-runs must
# match it exactly. flag256 uses 2 (the 114M torch oracle at 256px costs
# ~6 s/forward on this host's single core — BASELINE.md measured reference)
GOLDEN_N_IMAGES = {"toy32": 4, "mid64": 4, "big128": 4, "flag256": 2}


def _trainer(tier: Tier):
    p = str(REPO / "tools")
    if p not in sys.path:
        sys.path.insert(0, p)
    return importlib.import_module(tier.trainer_mod)


def _upcast_f32(params):
    """fp16-stored fixtures (mid tier) -> fp32, mirroring torch's
    load_state_dict cast on the reference side; fp32 passes through."""
    import jax

    return jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if getattr(a, "dtype", None) == np.float16 else a, params)


def _resolve_dtype(dtype):
    import jax.numpy as jnp

    if dtype in (None, "float32", jnp.float32):
        return jnp.float32
    if dtype in ("bfloat16", jnp.bfloat16):
        return jnp.bfloat16
    raise ValueError(f"unsupported golden dtype: {dtype!r}")

# (name, deg, deg_scale, sigma_y) — evaluation.sh:1-36 at toy scale
# (16x SR is impossible at 32px; the noisy rows keep their tasks at 4x/0.25)
TASKS = [
    ("sr_bicubic_4x", "sr_bicubic", 4.0, 0.0),
    ("sr_ap_4x", "sr_averagepooling", 4.0, 0.0),
    ("deblur_gauss", "deblur_gauss", 4.0, 0.0),
    ("colorization", "colorization", 4.0, 0.0),
    ("cs_wh_025", "cs_walshhadamard", 0.25, 0.0),
    ("inpainting", "inpainting", 4.0, 0.0),
    ("sr_ap_4x_noisy", "sr_averagepooling", 4.0, 0.1),
    ("cs_wh_noisy", "cs_walshhadamard", 0.25, 0.1),
]


def toy_mask(res: int = RES) -> np.ndarray:
    """Deterministic keep-mask (center hole), shared by both sides.
    Scales the toy 32px hole proportionally for larger tiers."""
    m = np.ones((res, res), np.int64)
    m[res * 10 // 32:res * 22 // 32, res * 8 // 32:res * 26 // 32] = 0
    return m


def toy_perm(res: int = RES) -> np.ndarray:
    """Deterministic pixel permutation for cs_walshhadamard."""
    return np.random.default_rng(7).permutation(res * res)


def load_eval_images(n: int = 4, tier: Tier = TOY32) -> np.ndarray:
    """(n, 3, res, res) in [-1, 1] from the tier's committed PNGs (NCHW)."""
    from PIL import Image

    paths = sorted(tier.eval_dir.glob("*.png"))[:n]
    assert paths, f"run tools/{tier.trainer_mod}.py first ({tier.eval_dir})"
    imgs = [np.asarray(Image.open(p), np.float32) / 255.0 for p in paths]
    x = np.stack(imgs).transpose(0, 3, 1, 2) * 2.0 - 1.0
    return x.astype(np.float32)


def build_our_operator(deg: str, deg_scale: float, ref_op=None,
                       res: int = RES):
    from ddnm_tpu.operators import build_svd_operator

    if deg == "deblur_gauss" and ref_op is not None:
        # inject the oracle's singular-value sort permutation: sigma=10
        # gives a near-uniform kernel whose many near-tied singulars sort
        # differently between numpy and torch (see test_svd_operators.py:4-7)
        from ddnm_tpu.operators import Deblurring

        sigma = 10.0
        k = np.exp(-0.5 * (np.array([-2, -1, 0, 1, 2]) / sigma) ** 2)
        return Deblurring((k / k.sum()).astype(np.float32), 3, res,
                          perm=ref_op._perm.numpy())
    kw = {}
    if deg == "inpainting":
        kw["mask"] = toy_mask(res)
    if deg == "cs_walshhadamard":
        kw["perm"] = toy_perm(res)
    return build_svd_operator(deg, channels=3, image_size=res,
                              deg_scale=deg_scale, **kw)


def build_ref_operator(deg: str, deg_scale: float, res: int = RES):
    """The reference's own operator, constructed exactly as
    guided_diffusion/diffusion.py:451-520 does (device='cpu')."""
    import torch

    RES = res  # noqa: N806 — keep the construction bodies verbatim below
    dev = "cpu"
    if deg == "sr_averagepooling":
        from functions.svd_operators import SuperResolution

        return SuperResolution(3, RES, int(deg_scale), dev)
    if deg == "sr_bicubic":
        from functions.svd_operators import SRConv

        factor = int(deg_scale)

        def bicubic_kernel(x, a=-0.5):
            if abs(x) <= 1:
                return (a + 2) * abs(x) ** 3 - (a + 3) * abs(x) ** 2 + 1
            if 1 < abs(x) < 2:
                return a * abs(x) ** 3 - 5 * a * abs(x) ** 2 + 8 * a * abs(x) - 4 * a
            return 0

        k = np.zeros((factor * 4))
        for i in range(factor * 4):
            xx = (1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5)
            k[i] = bicubic_kernel(xx)
        k = torch.from_numpy(k / k.sum()).float()
        return SRConv(k / k.sum(), 3, RES, dev, stride=factor)
    if deg == "deblur_gauss":
        from functions.svd_operators import Deblurring

        sigma = 10
        pdf = lambda x: torch.exp(torch.Tensor([-0.5 * (x / sigma) ** 2]))
        kernel = torch.Tensor([pdf(-2), pdf(-1), pdf(0), pdf(1), pdf(2)])
        return Deblurring(kernel / kernel.sum(), 3, RES, dev)
    if deg == "colorization":
        from functions.svd_operators import Colorization

        return Colorization(RES, dev)
    if deg == "cs_walshhadamard":
        from functions.svd_operators import WalshHadamardCS

        compress_by = round(1 / deg_scale)
        perm = torch.from_numpy(toy_perm(RES)).long()
        return WalshHadamardCS(3, RES, compress_by, perm, dev)
    if deg == "inpainting":
        from functions.svd_operators import Inpainting

        mask = torch.from_numpy(toy_mask(RES)).reshape(-1)
        missing_r = torch.nonzero(mask == 0).long().reshape(-1) * 3
        missing = torch.cat([missing_r, missing_r + 1, missing_r + 2], dim=0)
        return Inpainting(3, RES, missing, dev)
    raise ValueError(deg)


def load_our_model(tier: Tier = TOY32, dtype=None):
    """(model_fn, params) from the tier's fixture via the FULL load path.

    `dtype="bfloat16"` builds the PRODUCTION configuration: model torso
    computes bf16 AND params are stored bf16-resident via cast_torso —
    exactly what `--dtype bfloat16` does in both CLIs (runner.py:139-144,
    hq_main.py:207-213)."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.data.checkpoints import load_params

    dt = _resolve_dtype(dtype)
    model = getattr(_trainer(tier), tier.build_fn)(dtype=dt)
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


def load_ref_model(tier: Tier = TOY32):
    """The reference's Model with the trained fixture weights loaded
    (torch's load_state_dict upcasts fp16-stored tiers to the module's
    fp32 params — the same values _upcast_f32 gives our side)."""
    import torch

    m = getattr(_trainer(tier), tier.ref_build_fn)()
    m.load_state_dict(torch.load(tier.fixture, map_location="cpu"))
    m.eval()
    return m


@contextlib.contextmanager
def cpu_as_cuda_and_zero_noise():
    """Make reference code written for CUDA + stochastic sampling run
    deterministically on CPU: .to('cuda') -> cpu, randn_like -> zeros, and
    torch.ones' device kwarg stripped (the hq fork passes device=...)."""
    import torch

    orig_to = torch.Tensor.to
    orig_randn_like = torch.randn_like
    orig_ones = torch.ones

    def patched_to(self, *args, **kwargs):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = patched_to
    torch.randn_like = lambda x: torch.zeros_like(x)
    torch.ones = lambda *a, **kw: orig_ones(
        *a, **{k: v for k, v in kw.items() if k != "device"})
    try:
        yield
    finally:
        torch.Tensor.to = orig_to
        torch.randn_like = orig_randn_like
        torch.ones = orig_ones


def psnr01(a01: np.ndarray, b01: np.ndarray) -> float:
    mse = float(np.mean((a01 - b01) ** 2))
    return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))


def run_task(deg: str, deg_scale: float, sigma_y: float, n_images: int = 4,
             return_images: bool = False, tier: Tier = TOY32, dtype=None,
             skip_ref: bool = False, t_sampling: int = T_SAMPLING,
             travel_length: int = 1, travel_repeat: int = 1):
    """Run one task through both frameworks (zero noise, shared x_T).

    Returns dict with ours/ref PSNR vs gt and ours-vs-ref max abs diff.
    With return_images, adds an "images" dict of [0,1] NCHW arrays
    (gt / apy / ref / ours) for the side-by-side gallery
    (tools/make_gallery.py, docs/GALLERY.md). `tier` selects the golden
    scale tier, `dtype="bfloat16"` runs OUR side in the production bf16
    configuration (the reference has no bf16 path — its torso reduction is
    fp16, fp16_util.py:15-32 — so the ref side always runs fp32).
    `skip_ref=True` runs our side only (ref_psnr/max_abs_diff omitted) —
    the bf16 regression tests compare against committed goldens instead of
    re-running the torch oracle."""
    import jax
    import jax.numpy as jnp
    import torch

    from ddnm_tpu import schedules as sch
    from ddnm_tpu.sampling import build_schedule, sample_svd
    from tests._reference import import_reference

    # the reference tree must be importable before build_ref_operator
    # (import_reference sets sys.path + stubs)
    svd_ddnm = import_reference("functions.svd_ddnm")

    res = tier.res
    x_orig = load_eval_images(n_images, tier)  # NCHW [-1,1]
    rng = np.random.RandomState(42)
    x_T = rng.randn(*x_orig.shape).astype(np.float32)
    betas = sch.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=T
    ).astype(np.float32)

    # reference side first: its own operator on the same gt (deblurring's
    # sort permutation is injected into ours, see build_our_operator). Raw
    # measurement layouts legitimately differ for the tiled-spectral
    # operators (svd_ops.py:15-23), so equivalence is checked on the
    # layout-free range-space projection Ap(A(x)) instead.
    ref_op = build_ref_operator(deg, deg_scale, res)
    our_op = build_our_operator(deg, deg_scale, ref_op, res)
    y = np.asarray(our_op.A(jnp.asarray(x_orig.reshape(n_images, -1))))
    y_ref = ref_op.A(torch.from_numpy(x_orig).reshape(n_images, -1))
    apay_ours = np.asarray(our_op.A_pinv(jnp.asarray(y)))
    apay_ref = ref_op.A_pinv(y_ref).numpy()
    np.testing.assert_allclose(apay_ours, apay_ref, atol=2e-3,
                               err_msg=f"range-space projection mismatch: {deg}")

    ref_out = None
    if not skip_ref:

        class _NS:
            def __init__(self, d):
                for k, v in d.items():
                    setattr(self, k, _NS(v) if isinstance(v, dict) else v)

        cfg = _NS({
            "diffusion": {"num_diffusion_timesteps": T},
            "time_travel": {"T_sampling": t_sampling,
                            "travel_length": travel_length,
                            "travel_repeat": travel_repeat},
        })

        ref_model = load_ref_model(tier)
        with cpu_as_cuda_and_zero_noise(), torch.no_grad():
            fn = (svd_ddnm.ddnm_diffusion if sigma_y == 0
                  else svd_ddnm.ddnm_plus_diffusion)
            args = [torch.from_numpy(x_T.copy()), ref_model,
                    torch.from_numpy(betas), 0.85, ref_op, y_ref]
            if sigma_y != 0:
                args.append(sigma_y)
            xs, _ = fn(*args, config=cfg)
            ref_out = xs[-1].numpy()

    model_fn, params = load_our_model(tier, dtype)
    sched = build_schedule(betas=betas, t_sampling=t_sampling,
                           travel_length=travel_length,
                           travel_repeat=travel_repeat)
    zero = lambda key, shape: jnp.zeros(shape, jnp.float32)
    x, _ = sample_svd(
        model_fn,
        jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))),
        jnp.asarray(y),
        our_op,
        sched,
        jax.random.PRNGKey(0),
        eta=0.85,
        sigma_y=sigma_y,
        noise_fn=zero,
        params=params,
    )
    ours = np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2))

    to01 = lambda a: np.clip((a + 1) / 2, 0, 1)
    out = {"ours_psnr": round(psnr01(to01(ours), to01(x_orig)), 4)}
    if ref_out is not None:
        out["ref_psnr"] = round(psnr01(to01(ref_out), to01(x_orig)), 4)
        out["max_abs_diff"] = float(np.abs(ours - ref_out).max())
    if return_images:
        out["images"] = {
            "gt": to01(x_orig),
            "apy": to01(apay_ours.reshape(n_images, 3, res, res)),
            "ours": to01(ours),
        }
        if ref_out is not None:
            out["images"]["ref"] = to01(ref_out)
    return out
