"""Train the MID-SCALE (64px) golden fixtures — all three model families.

VERDICT round-2 item #2: the trained-weights fidelity proof was only at
adversarially tiny scale (32px / 0.7M params); the flagship bench runs
114M/552M-param models. This trainer adds a third golden tier between
them: 64px, 5-20M params, attention at >=2 feature resolutions,
learn_sigma on the ADM — the structures whose at-scale numerics were
previously extrapolated (reference guided_diffusion/unet.py:396-664).

Families (--family, default all):
  ddpm       6.8M-param "simple" DDPM UNet (reference models.py family),
             attention at 32x32 AND 16x16       -> tests/fixtures/mid_ddpm64.pt
  adm        12.3M-param ADM UNet, learn_sigma, attention at ds 2 (32x32)
             and ds 4 (16x16) + middle (8x8)    -> tests/fixtures/mid_adm64.pt
  classifier EncoderUNet (pool=attention) on the 4-class blob family
             at 64px                            -> tests/fixtures/mid_clf64.pt

Training data: a 50/50 mix of the toy blob family and the procedurally
natural family (tools/experiments/natural_family.py — 1/f^alpha texture +
objects), so the mid models restore the committed natural64 fixtures
in-distribution (VERDICT item #7's old-photo gallery rows).

Weights are exported as fp16 TORCH state dicts (half the repo weight; both
frameworks upcast to fp32 at load, so the fp16-rounded values stay
bit-identical across sides) via the inverse converter — ONE file drives
both frameworks, exactly like the toy tier.

Run (TPU; ~minutes per family):
  python tools/train_mid_golden.py [--family ddpm|adm|classifier|all]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tools/experiments"))

RES = 64
T = 1000
N_CLASSES = 4

DDPM_KW = dict(ch=64, ch_mult=(1, 2, 2), num_res_blocks=2,
               attn_resolutions=(16, 32), resolution=RES)

ADM_KW = dict(
    image_size=RES, in_channels=3, model_channels=64, out_channels=6,
    num_res_blocks=2, attention_resolutions=(2, 4), channel_mult=(1, 2, 3),
    num_heads=4, num_head_channels=32, use_scale_shift_norm=True,
    resblock_updown=True,
)

CLF_KW = dict(
    image_size=RES, in_channels=3, model_channels=64, out_channels=N_CLASSES,
    num_res_blocks=1, attention_resolutions=(2, 4), channel_mult=(1, 2, 2),
    num_heads=4, num_head_channels=32, use_scale_shift_norm=True,
    resblock_updown=True, pool="attention",
)

MID_CONFIG_YAML = f"""\
# Mid-scale golden-tier config: the reference's "simple" (CelebA) family at
# {RES}px / 6.8M params with attention at two feature resolutions, trained
# locally on the blob+natural mix (tools/train_mid_golden.py). Used by the
# trained-weights fidelity suite's mid tier.
data:
    dataset: "CelebA_HQ"
    image_size: {RES}
    channels: 3
    logit_transform: false
    uniform_dequantization: false
    gaussian_dequantization: false
    random_flip: false
    rescaled: true
    num_workers: 0
    out_of_dist: false

model:
    type: "simple"
    in_channels: 3
    out_ch: 3
    ch: {DDPM_KW["ch"]}
    ch_mult: [{", ".join(str(m) for m in DDPM_KW["ch_mult"])}]
    num_res_blocks: {DDPM_KW["num_res_blocks"]}
    attn_resolutions: [{", ".join(str(a) for a in DDPM_KW["attn_resolutions"])}]
    dropout: 0.0
    var_type: fixedsmall
    ema_rate: 0.999
    ema: True
    resamp_with_conv: True

diffusion:
    beta_schedule: linear
    beta_start: 0.0001
    beta_end: 0.02
    num_diffusion_timesteps: {T}

sampling:
    batch_size: 1

time_travel:
    T_sampling: 100
    travel_length: 1
    travel_repeat: 1
"""


# ---------------------------------------------------------------- builders
def build_ddpm(dtype=None):
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_ddpm import DDPMUNet

    return DDPMUNet(**DDPM_KW, dtype=dtype or jnp.float32)


def build_ref_ddpm():
    import yaml

    from tests._reference import import_reference

    ref_models = import_reference("guided_diffusion.models")

    class _NS:
        def __init__(self, d):
            for k, v in d.items():
                setattr(self, k, _NS(v) if isinstance(v, dict) else v)

    return ref_models.Model(_NS(yaml.safe_load(MID_CONFIG_YAML)))


def build_adm(dtype=None):
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_adm import ADMUNet

    return ADMUNet(**ADM_KW, dtype=dtype or jnp.float32)


def build_ref_adm():
    from tests._reference import import_reference

    ref_unet = import_reference("guided_diffusion.unet")
    kw = dict(ADM_KW)
    kw["attention_resolutions"] = set(kw["attention_resolutions"])
    return ref_unet.UNetModel(**kw)


def build_clf(dtype=None):
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_adm import ADMClassifier

    return ADMClassifier(**CLF_KW, dtype=dtype or jnp.float32)


def build_ref_clf():
    from tests._reference import import_reference

    ref_unet = import_reference("guided_diffusion.unet")
    kw = dict(CLF_KW)
    kw["attention_resolutions"] = set(kw["attention_resolutions"])
    return ref_unet.EncoderUNetModel(**kw)


# ---------------------------------------------------------------- data mix
def make_mix(key, n, res):
    """50/50 blob + natural batch (both in [-1, 1] NHWC)."""
    import jax
    import jax.numpy as jnp

    from natural_family import make_naturals
    from toy_quality_encoder_cache import make_blobs

    k1, k2 = jax.random.split(key)
    half = n // 2
    return jnp.concatenate(
        [make_blobs(k1, half, res), make_naturals(k2, n - half, res)])


# ---------------------------------------------------------------- training
def _export(params, build_ref, key_map_name, out_name, meta):
    import jax
    import numpy as np
    import torch

    from ddnm_tpu.models import convert as cv

    key_map = getattr(cv, key_map_name)
    template = build_ref().state_dict()
    params_np = jax.tree.map(np.asarray, params)["params"]
    sd = cv.flax_to_torch_state_dict(params_np, template, key_map)
    fixtures = REPO / "tests/fixtures"
    fixtures.mkdir(exist_ok=True)
    # fp16 on disk: halves fixture weight; harness upcasts both sides
    torch.save(
        {k: torch.from_numpy(v.copy()).half() for k, v in sd.items()},
        fixtures / f"{out_name}.pt")
    (fixtures / f"{out_name}.json").write_text(json.dumps(meta, indent=2))
    print(f"saved {fixtures / f'{out_name}.pt'} "
          f"({(fixtures / f'{out_name}.pt').stat().st_size / 1e6:.1f} MB)")


def train_eps_family(family: str, steps: int, batch: int, lr: float, *,
                     res: int | None = None, build=None, build_ref=None,
                     export_name: str | None = None, arch_kw=None,
                     extra_meta=None):
    """Shared eps-MSE training loop for ddpm (3-ch out) / adm (6-ch,
    learn_sigma: only the eps half is trained, variance head keeps its
    zero init — same contract as the toy tier).

    The keyword overrides let OTHER golden tiers (tools/train_big_golden.py,
    the 128px/50M tier) reuse this loop: `res`/`build`/`build_ref`/
    `export_name`/`arch_kw` default to this module's mid-64 settings."""
    import jax
    import jax.numpy as jnp
    import optax

    from ddnm_tpu import schedules
    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    enable_compilation_cache()
    res = RES if res is None else res
    if build is None:
        build = build_ddpm if family == "ddpm" else build_adm
    model = build()
    params = jit_init(model, jax.random.PRNGKey(0),
                      jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))
    n_par = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"# {family}: {n_par / 1e6:.2f}M params")

    if family == "ddpm":
        betas = schedules.get_beta_schedule(
            "linear", beta_start=1e-4, beta_end=0.02,
            num_diffusion_timesteps=T)
    else:
        betas = schedules.named_beta_schedule("linear", T, use_scale=True)
    abar = jnp.asarray((1.0 - betas.astype("float32")).cumprod())

    # cosine decay stabilizes the fp16 export (small final update noise)
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        k_img, k_t, k_noise = jax.random.split(key, 3)
        x0 = make_mix(k_img, batch, res)
        t = jax.random.randint(k_t, (batch,), 0, T)
        noise = jax.random.normal(k_noise, x0.shape)
        at = abar[t][:, None, None, None]
        xt = jnp.sqrt(at) * x0 + jnp.sqrt(1 - at) * noise

        def loss_fn(p):
            out = model.apply(p, xt, t.astype(jnp.float32))
            eps = out[..., :3]  # adm learn_sigma: 3:6 is the var head
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    key = jax.random.PRNGKey(1)
    tail = []
    # hang insurance: the axon tunnel can stall an RPC mid-run; snapshot
    # (params, opt_state, step, tail, rng key) so a killed run resumes —
    # including the key stream, so a resumed run is bit-identical to an
    # uninterrupted one. The filename is keyed on the training config so a
    # later retrain with different steps/lr/arch can never resume stale
    # state, and the file is deleted once the fixture is exported.
    import hashlib
    import pickle

    cfg_hash = hashlib.md5(
        repr((family, res, T, steps, batch, lr,
              export_name)).encode()).hexdigest()[:10]
    ckpt = Path(f"/tmp/mid_{family}_train_{cfg_hash}.ckpt")
    start = 0
    if ckpt.exists():
        with ckpt.open("rb") as f:
            params, opt_state, start, tail, key_host = pickle.load(f)
        params = jax.tree.map(jnp.asarray, params)
        opt_state = jax.tree.map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, opt_state)
        key = jnp.asarray(key_host)
        print(f"# {family}: resumed from {ckpt} at step {start}", flush=True)
    for step in range(start, steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, k)
        if step % 500 == 0 or step == steps - 1:
            lv = float(loss)
            tail.append({"step": step, "loss": round(lv, 5)})
            print(f"# {family} step {step} loss {lv:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if step % 1000 == 999:
            host = jax.tree.map(np.asarray, (params, opt_state))
            with ckpt.open("wb") as f:
                pickle.dump(
                    (host[0], host[1], step + 1, tail, np.asarray(key)), f)

    kw = arch_kw if arch_kw is not None else (
        DDPM_KW if family == "ddpm" else ADM_KW)
    meta = {"res": res, "T": T, "params_m": round(n_par / 1e6, 2),
            "arch": {k: list(v) if isinstance(v, tuple) else v
                     for k, v in kw.items()},
            "train_steps": steps, "batch": batch, "lr": lr,
            "data": "50/50 blobs+naturals", "export_dtype": "float16",
            "loss_curve": tail}
    if extra_meta:
        meta.update(extra_meta)
    if family == "ddpm":
        _export(params, build_ref or build_ref_ddpm, "ddpm_key_map",
                export_name or "mid_ddpm64", meta)
        if export_name is None:
            (REPO / "configs/mid64.yml").write_text(MID_CONFIG_YAML)
            print("wrote configs/mid64.yml")
    else:
        _export(params, build_ref or build_ref_adm, "adm_key_map",
                export_name or "mid_adm64", meta)
    ckpt.unlink(missing_ok=True)  # fixture written; drop the hang insurance


def train_classifier(steps: int, batch: int, lr: float, *,
                     res: int | None = None, build=None, build_ref=None,
                     export_name: str | None = None, arch_kw=None,
                     extra_meta=None):
    """Noisy-image classifier training (4-class blob family). The keyword
    overrides let other golden tiers (tools/train_big_adm_golden.py's 128px
    EncoderUNet) reuse this loop, like train_eps_family."""
    import jax
    import jax.numpy as jnp
    import optax

    from ddnm_tpu import schedules
    from ddnm_tpu.utils import enable_compilation_cache, jit_init
    from train_toy_classifier_golden import make_class_blobs

    enable_compilation_cache()
    RES = globals()["RES"] if res is None else res  # noqa: N806
    model = (build or build_clf)()
    params = jit_init(model, jax.random.PRNGKey(0),
                      jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))
    betas = schedules.named_beta_schedule("linear", T, use_scale=True)
    abar = jnp.asarray((1.0 - betas).cumprod())
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        k_img, k_t, k_noise = jax.random.split(key, 3)
        x0, cls = make_class_blobs(k_img, batch, RES)
        t = jax.random.randint(k_t, (batch,), 0, T)
        noise = jax.random.normal(k_noise, x0.shape)
        at = abar[t][:, None, None, None]
        xt = jnp.sqrt(at) * x0 + jnp.sqrt(1 - at) * noise

        def loss_fn(p):
            logits = model.apply(p, xt, t.astype(jnp.float32))
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, cls)
            return ce.mean(), (logits.argmax(-1) == cls).mean()

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    t0 = time.time()
    key = jax.random.PRNGKey(1)
    tail = []
    for step in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, loss, acc = train_step(params, opt_state, k)
        if step % 500 == 0 or step == steps - 1:
            tail.append({"step": step, "loss": round(float(loss), 5),
                         "acc": round(float(acc), 4)})
            print(f"# clf step {step} loss {float(loss):.4f} "
                  f"acc {float(acc):.3f} ({time.time() - t0:.0f}s)",
                  flush=True)

    kw = arch_kw if arch_kw is not None else CLF_KW
    meta = {"res": RES, "T": T, "n_classes": N_CLASSES,
            "arch": {k: list(v) if isinstance(v, tuple) else v
                     for k, v in kw.items()},
            "train_steps": steps, "batch": batch, "lr": lr,
            "export_dtype": "float16", "curve": tail}
    if extra_meta:
        meta.update(extra_meta)
    _export(params, build_ref or build_ref_clf, "adm_key_map",
            export_name or "mid_clf64", meta)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="all",
                    choices=["ddpm", "adm", "classifier", "all"])
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--clf_steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ns = ap.parse_args(argv)

    if ns.family in ("ddpm", "all"):
        train_eps_family("ddpm", ns.steps, ns.batch, ns.lr)
    if ns.family in ("adm", "all"):
        train_eps_family("adm", ns.steps, ns.batch, ns.lr)
    if ns.family in ("classifier", "all"):
        train_classifier(ns.clf_steps, ns.batch, 3e-4)


if __name__ == "__main__":
    main()
