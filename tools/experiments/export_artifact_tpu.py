"""Serving-artifact lifecycle ON-CHIP: build on CPU, execute on the TPU.

VERDICT r2 item #8: multi-platform serving artifacts (ddnm_tpu/serving.py,
docs/SERVING.md deployment claim) were tested CPU-only. This experiment
deserializes and EXECUTES a ("cpu","tpu") trajectory artifact on the real
TPU backend and records parity against the CPU run of the same artifact:

  --build   (run under JAX_PLATFORMS=cpu): export the mid-scale DDPM
            (64px, 6.8M params, 25-step simplified DDNM+ 4x SR, batch 4)
            trajectory with platforms ("cpu","tpu"); save artifact +
            inputs + the CPU execution's output to --dir.
  --run     (run on the TPU): load the artifact + inputs, execute on the
            chip, print max|cpu - tpu| and PSNR-style agreement.

Two processes on purpose — the one-TPU-process rule and a clean platform
split. Weights: the trained mid fixture when present (real numbers), else
random init (parity claim unchanged).

  JAX_PLATFORMS=cpu python tools/experiments/export_artifact_tpu.py --build
  python tools/experiments/export_artifact_tpu.py --run
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

RES = 64
BATCH = 4
T_SAMPLING = 25
SCALE = 4


def _model_and_params():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO / "tools"))
    from train_mid_golden import build_ddpm

    model = build_ddpm()
    fixture = REPO / "tests/fixtures/mid_ddpm64.pt"
    if fixture.exists():
        from tests._golden import MID64, load_our_model

        _, params = load_our_model(MID64)
        # re-wrap with THIS process's module (identical arch)
    else:
        from ddnm_tpu.utils import jit_init

        params = jit_init(model, jax.random.PRNGKey(0),
                          jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    return model_fn, params


def build(out_dir: Path):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ddnm_tpu import schedules
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule
    from ddnm_tpu.serving import export_simplified_trajectory, load_exported

    assert jax.default_backend() == "cpu", "build under JAX_PLATFORMS=cpu"
    model_fn, params = _model_and_params()
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000)
    sched = build_schedule(betas=betas, t_sampling=T_SAMPLING)
    op = build_functional_operator("sr_averagepooling", image_size=RES,
                                   deg_scale=SCALE)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((BATCH, RES, RES, 3)).astype(np.float32)
    gt = rng.uniform(-1, 1, (BATCH, RES, RES, 3)).astype(np.float32)
    y = np.asarray(op.A(jnp.asarray(gt)))
    blob = export_simplified_trajectory(
        model_fn, params, op, sched, batch=BATCH, image_size=RES,
        y_shape=tuple(y.shape), platforms=("cpu", "tpu"),
        path=out_dir / "traj.jaxexport")
    key = jax.random.key_data(jax.random.PRNGKey(3)).astype(np.uint32)

    fn = load_exported(blob)
    out_cpu, _ = fn(params, x, y, key)
    np.savez(out_dir / "io.npz", x=x, y=y, key=key,
             out_cpu=np.asarray(out_cpu))
    # params travel as a flat npz too (the artifact takes them as args)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    np.savez(out_dir / "params.npz",
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    (out_dir / "treedef.txt").write_text(str(treedef))
    print(json.dumps({"built": str(out_dir / "traj.jaxexport"),
                      "blob_mb": round(len(blob) / 1e6, 2),
                      "platforms": ["cpu", "tpu"]}))


def run(out_dir: Path):
    import numpy as np

    import jax

    from ddnm_tpu.serving import load_exported

    print(f"# backend: {jax.default_backend()} {jax.devices()}", flush=True)
    io = np.load(out_dir / "io.npz")
    # rebuild the params pytree with the same structure (same arch/process
    # split as the serving deployment: structure comes from the model def)
    model_fn, params_template = _model_and_params()
    leaves_t, treedef = jax.tree_util.tree_flatten(params_template)
    pz = np.load(out_dir / "params.npz")
    leaves = [pz[f"leaf_{i}"] for i in range(len(leaves_t))]
    assert all(a.shape == b.shape for a, b in zip(leaves, leaves_t))
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    fn = load_exported((out_dir / "traj.jaxexport").read_bytes())
    out_tpu, _ = fn(params, io["x"], io["y"], io["key"])
    out_tpu = np.asarray(jax.device_get(out_tpu), np.float32)
    diff = float(np.abs(out_tpu - io["out_cpu"]).max())
    mse = float(np.mean((out_tpu - io["out_cpu"]) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    print(json.dumps({
        "backend": jax.default_backend(),
        "max_abs_diff_cpu_vs_tpu": diff,
        "cpu_vs_tpu_psnr_db": round(float(psnr), 2),
    }))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--dir", default="/tmp/ddnm_artifact")
    ns = ap.parse_args(argv)
    out_dir = Path(ns.dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if ns.build:
        # the axon site plugin overrides JAX_PLATFORMS; re-assert it
        # (CLAUDE.md: plain scripts must do the jax.config dance)
        from ddnm_tpu.utils import apply_platform_env

        apply_platform_env()
    if ns.build:
        build(out_dir)
    elif ns.run:
        run(out_dir)
    else:
        raise SystemExit("pass --build (CPU) or --run (TPU)")


if __name__ == "__main__":
    main()
