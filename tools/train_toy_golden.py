"""Train the toy golden-suite DDPM and commit its weights as a fixture.

VERDICT round-1 item #1b: real pretrained checkpoints are unreachable here,
so the trained-weights fidelity proof uses a LOCALLY trained model: a small
DDPM UNet (ch=32, mult (1,2), 32px — the reference's "simple" family at toy
scale) trained to convergence on the synthetic soft-blob image family
(tools/experiments/toy_quality_encoder_cache.py:make_blobs). The trained
weights are exported as a TORCH state dict via the inverse converter
(models/convert.py:flax_to_torch_state_dict), so ONE set of trained weights
drives BOTH frameworks:

  - ours loads it through data/checkpoints.load_params (converter + strict
    validation in the loop),
  - the reference loads it into guided_diffusion.models.Model verbatim.

Outputs (committed):
  tests/fixtures/toy_ddpm32.pt       — trained torch state dict (~2.8 MB)
  exp/datasets/toy32/*.png           — 8 held-out eval blobs
  configs/toy32.yml                  — our config for the toy protocol
  tests/fixtures/toy_ddpm32.json     — training metadata (loss curve tail)

Run:  python tools/train_toy_golden.py [--steps 6000] [--batch 256]
(uses the default JAX backend — the TPU when available)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

RES = 32
T = 1000
CH = 32
CH_MULT = (1, 2)
NUM_RES_BLOCKS = 1
ATTN = (16,)

TOY_CONFIG_YAML = f"""\
# Toy golden-suite config: the reference's "simple" (CelebA) family at
# 32px / 0.7M params, trained locally on synthetic blobs
# (tools/train_toy_golden.py). Used by the trained-weights fidelity suite.
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
    ch: {CH}
    ch_mult: [{", ".join(str(m) for m in CH_MULT)}]
    num_res_blocks: {NUM_RES_BLOCKS}
    attn_resolutions: [{", ".join(str(a) for a in ATTN)}]
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


def build_model(dtype=None):
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_ddpm import DDPMUNet

    return DDPMUNet(ch=CH, ch_mult=CH_MULT, num_res_blocks=NUM_RES_BLOCKS,
                    attn_resolutions=ATTN, resolution=RES,
                    dtype=dtype or jnp.float32)


def build_ref_model():
    """The reference's Model with this architecture (config from
    TOY_CONFIG_YAML), weights NOT loaded."""
    import yaml

    from tests._reference import import_reference

    ref_models = import_reference("guided_diffusion.models")

    class _NS:
        def __init__(self, d):
            for k, v in d.items():
                setattr(self, k, _NS(v) if isinstance(v, dict) else v)

    return ref_models.Model(_NS(yaml.safe_load(TOY_CONFIG_YAML)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=2e-4)
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ddnm_tpu import schedules
    from ddnm_tpu.utils import enable_compilation_cache, jit_init

    sys.path.insert(0, str(REPO / "tools/experiments"))
    from toy_quality_encoder_cache import make_blobs

    enable_compilation_cache()
    model = build_model()
    rng = jax.random.PRNGKey(0)
    params = jit_init(model, rng, jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=T
    ).astype("float32")
    abar = jnp.asarray((1.0 - betas).cumprod())

    opt = optax.adam(ns.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        k_img, k_t, k_noise = jax.random.split(key, 3)
        x0 = make_blobs(k_img, ns.batch, RES)
        t = jax.random.randint(k_t, (ns.batch,), 0, T)
        noise = jax.random.normal(k_noise, x0.shape)
        at = abar[t][:, None, None, None]
        xt = jnp.sqrt(at) * x0 + jnp.sqrt(1 - at) * noise

        def loss_fn(p):
            eps = model.apply(p, xt, t.astype(jnp.float32))
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    key = jax.random.PRNGKey(1)
    tail = []
    for step in range(ns.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, k)
        if step % 500 == 0 or step == ns.steps - 1:
            lv = float(loss)
            tail.append({"step": step, "loss": round(lv, 5)})
            print(f"# step {step} loss {lv:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    # ---- export: torch state dict via the inverse converter ----
    import torch

    from ddnm_tpu.models.convert import ddpm_key_map, flax_to_torch_state_dict
    from tests._reference import import_reference

    ref_models = import_reference("guided_diffusion.models")

    class _NS:
        def __init__(self, d):
            for k, v in d.items():
                setattr(self, k, _NS(v) if isinstance(v, dict) else v)

    import yaml

    cfg_dict = yaml.safe_load(TOY_CONFIG_YAML)
    template = ref_models.Model(_NS(cfg_dict)).state_dict()
    params_np = jax.tree.map(np.asarray, params)["params"]
    sd = flax_to_torch_state_dict(params_np, template, ddpm_key_map)
    fixtures = REPO / "tests/fixtures"
    fixtures.mkdir(exist_ok=True)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               fixtures / "toy_ddpm32.pt")
    (REPO / "configs/toy32.yml").write_text(TOY_CONFIG_YAML)
    (fixtures / "toy_ddpm32.json").write_text(json.dumps({
        "res": RES, "ch": CH, "ch_mult": list(CH_MULT), "T": T,
        "train_steps": ns.steps, "batch": ns.batch, "lr": ns.lr,
        "loss_curve": tail,
    }, indent=2))

    # ---- eval fixtures: held-out blobs ----
    from ddnm_tpu.data.io import save_image

    gt = np.asarray(make_blobs(jax.random.PRNGKey(99), 8, RES))
    out_dir = REPO / "exp/datasets/toy32"
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(8):
        save_image((gt[i] + 1.0) / 2.0, out_dir / f"{i:05d}.png")
    print(f"saved fixture weights + {8} eval blobs + configs/toy32.yml")


if __name__ == "__main__":
    main()
