"""Train a toy ADM UNet and commit its weights as a golden fixture.

Extends the trained-weights fidelity proof (tools/train_toy_golden.py, the
"simple" DDPM family) to the SECOND model family and pipeline: a small ADM
UNet with learn_sigma (6-channel eps+var output, the hq/posterior pipeline's
LEARNED_RANGE contract, reference hq_demo/guided_diffusion/
gaussian_diffusion.py:283-290) trained to convergence on the same synthetic
blob family, exported as a TORCH state dict via the inverse converter so ONE
set of trained weights drives BOTH frameworks:

  - ours loads it through data/checkpoints.load_params (adm converter +
    strict key validation in the loop),
  - the reference loads it into guided_diffusion.unet.UNetModel verbatim
    (the hq fork shares the state-dict schema).

Only the eps half is trained (MSE); the variance head keeps its zero-init
output (midpoint LEARNED_RANGE interpolation) — the hq DDNM path overrides
the variance with gamma_t anyway (gaussian_diffusion.py:388-389), and both
frameworks see identical weights either way.

Outputs (committed):
  tests/fixtures/toy_adm32.pt    — trained torch state dict
  tests/fixtures/toy_adm32.json  — training metadata (loss curve tail)
  (eval blobs are shared with the DDPM suite: exp/datasets/toy32/*.png)

Run:  python tools/train_toy_adm_golden.py [--steps 6000] [--batch 256]
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

# toy ADM architecture — shared by trainer, harness and tests.
# attention_resolutions holds DS RATIOS (reference UNetModel semantics):
# ds=2 puts AttentionBlocks on the 16x16 grid in the input AND output
# blocks (the middle block always has attention).
ADM_KW = dict(
    image_size=RES, in_channels=3, model_channels=32, out_channels=6,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, num_head_channels=32, use_scale_shift_norm=True,
    resblock_updown=True,
)


def build_model(dtype=None):
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_adm import ADMUNet

    return ADMUNet(**ADM_KW, dtype=dtype or jnp.float32)


def build_ref_model():
    """The reference's UNetModel with the same architecture (the hq fork
    shares the state-dict schema with guided_diffusion/unet.py)."""
    from tests._reference import import_reference

    ref_unet = import_reference("guided_diffusion.unet")
    kw = dict(ADM_KW)
    kw["attention_resolutions"] = set(kw["attention_resolutions"])
    return ref_unet.UNetModel(**kw)


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
    from ddnm_tpu.utils import (
        apply_platform_env,
        enable_compilation_cache,
        jit_init,
    )

    apply_platform_env()  # honour JAX_PLATFORMS=cpu (site plugin pre-sets axon)

    sys.path.insert(0, str(REPO / "tools/experiments"))
    from toy_quality_encoder_cache import make_blobs

    enable_compilation_cache()
    model = build_model()
    rng = jax.random.PRNGKey(0)
    params = jit_init(model, rng, jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))

    betas = schedules.named_beta_schedule("linear", T, use_scale=True)
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
            out = model.apply(p, xt, t.astype(jnp.float32))
            eps = out[..., :3]  # learn_sigma: channels 3:6 are the var head
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

    from ddnm_tpu.models.convert import adm_key_map, flax_to_torch_state_dict

    template = build_ref_model().state_dict()
    params_np = jax.tree.map(np.asarray, params)["params"]
    sd = flax_to_torch_state_dict(params_np, template, adm_key_map)
    fixtures = REPO / "tests/fixtures"
    fixtures.mkdir(exist_ok=True)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               fixtures / "toy_adm32.pt")
    (fixtures / "toy_adm32.json").write_text(json.dumps({
        "res": RES, "T": T, "adm_kw": {k: list(v) if isinstance(v, tuple)
                                       else v for k, v in ADM_KW.items()},
        "train_steps": ns.steps, "batch": ns.batch, "lr": ns.lr,
        "loss_curve": tail,
    }, indent=2))
    print(f"saved {fixtures / 'toy_adm32.pt'}")


if __name__ == "__main__":
    main()
