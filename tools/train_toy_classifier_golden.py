"""Train a toy noisy classifier and commit its weights as a golden fixture.

Completes the trained-weights proof for the THIRD published checkpoint
family (256x256_classifier.pt): an EncoderUNet half-UNet classifier
(reference guided_diffusion/unet.py:684-895) trained on NOISED images —
ADM classifier-guidance semantics — over a 4-class variant of the blob
family (class = dominant color channel 0/1/2, or 3 = gray), exported as a
TORCH state dict via the inverse converter so one trained classifier
drives BOTH frameworks' guided sampling:

  - the reference side builds cond_fn = grad_x log p(y|x) * scale with its
    own EncoderUNetModel + torch.autograd (hq_demo/main.py:87-96) inside
    its condition_mean posterior step (gaussian_diffusion.py:413-430);
  - our side loads the same file (adm converter, strict validation) into
    ADMClassifier and uses classifier_guidance_fn (jax.grad).

Outputs (committed):
  tests/fixtures/toy_clf32.pt    — trained torch state dict
  tests/fixtures/toy_clf32.json  — training metadata (accuracy curve tail)

Run:  python tools/train_toy_classifier_golden.py [--steps 3000]
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
N_CLASSES = 4

CLF_KW = dict(
    image_size=RES, in_channels=3, model_channels=32, out_channels=N_CLASSES,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, num_head_channels=32, use_scale_shift_norm=True,
    resblock_updown=True, pool="attention",
)


def make_class_blobs(key, n, res, n_classes=N_CLASSES, classes=None):
    """Blob family with a learnable class: 0/1/2 = dominant color channel
    (other channels dimmed), 3 = gray blobs. Geometry matches
    tools/experiments/toy_quality_encoder_cache.make_blobs. `classes`
    forces the labels (e.g. class-pure eval sets for guided sampling)."""
    import jax
    import jax.numpy as jnp

    k0, k1, k2, k3 = jax.random.split(key, 4)
    if classes is None:
        cls = jax.random.randint(k0, (n,), 0, n_classes)
    else:
        cls = jnp.broadcast_to(jnp.asarray(classes, jnp.int32), (n,))
    centers = jax.random.uniform(k1, (n, 3, 2), minval=0.15, maxval=0.85)
    mag = jax.random.uniform(k2, (n, 3, 3), minval=0.4, maxval=1.0)
    widths = jax.random.uniform(k3, (n, 3, 1), minval=0.05, maxval=0.22)

    dom = jnp.where(cls < 3, cls, 0)
    onehot = jax.nn.one_hot(dom, 3)[:, None, :]       # (n, 1, 3)
    colored = mag * (onehot - 0.3 * (1.0 - onehot))   # dominant ch positive
    gray = jnp.broadcast_to(mag[..., :1], mag.shape)  # equal channels
    colors = jnp.where((cls == 3)[:, None, None], gray, colored)

    yy, xx = jnp.meshgrid(
        jnp.linspace(0, 1, res), jnp.linspace(0, 1, res), indexing="ij"
    )
    grid = jnp.stack([yy, xx], -1)
    d2 = jnp.sum((grid[None, None] - centers[:, :, None, None, :]) ** 2, -1)
    w = jnp.exp(-d2 / (2 * widths[..., None] ** 2))
    img = jnp.einsum("nbhw,nbc->nhwc", w, colors)
    return jnp.clip(img - 0.6, -1.0, 1.0), cls


def build_model(dtype=None):
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_adm import ADMClassifier

    return ADMClassifier(**CLF_KW, dtype=dtype or jnp.float32)


def build_ref_model():
    from tests._reference import import_reference

    ref_unet = import_reference("guided_diffusion.unet")
    kw = dict(CLF_KW)
    kw["attention_resolutions"] = set(kw["attention_resolutions"])
    return ref_unet.EncoderUNetModel(**kw)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
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

    apply_platform_env()
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
        x0, cls = make_class_blobs(k_img, ns.batch, RES)
        t = jax.random.randint(k_t, (ns.batch,), 0, T)
        noise = jax.random.normal(k_noise, x0.shape)
        at = abar[t][:, None, None, None]
        xt = jnp.sqrt(at) * x0 + jnp.sqrt(1 - at) * noise

        def loss_fn(p):
            logits = model.apply(p, xt, t.astype(jnp.float32))
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, cls)
            acc = (logits.argmax(-1) == cls).mean()
            return ce.mean(), acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    t0 = time.time()
    key = jax.random.PRNGKey(1)
    tail = []
    for step in range(ns.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss, acc = train_step(params, opt_state, k)
        if step % 500 == 0 or step == ns.steps - 1:
            lv, av = float(loss), float(acc)
            tail.append({"step": step, "loss": round(lv, 5),
                         "acc": round(av, 4)})
            print(f"# step {step} loss {lv:.4f} acc {av:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    import torch

    from ddnm_tpu.models.convert import adm_key_map, flax_to_torch_state_dict

    template = build_ref_model().state_dict()
    params_np = jax.tree.map(np.asarray, params)["params"]
    sd = flax_to_torch_state_dict(params_np, template, adm_key_map)
    fixtures = REPO / "tests/fixtures"
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               fixtures / "toy_clf32.pt")
    (fixtures / "toy_clf32.json").write_text(json.dumps({
        "res": RES, "T": T, "n_classes": N_CLASSES,
        "clf_kw": {k: list(v) if isinstance(v, tuple) else v
                   for k, v in CLF_KW.items()},
        "train_steps": ns.steps, "batch": ns.batch, "lr": ns.lr,
        "curve": tail,
    }, indent=2))
    print(f"saved {fixtures / 'toy_clf32.pt'}")


if __name__ == "__main__":
    main()
