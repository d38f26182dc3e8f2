"""Tests for auxiliary subsystems: noise models, checkpoint registry,
observability, fixtures tooling, and the evaluation harness plumbing."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = Path(__file__).resolve().parents[1]


# ------------------------------------------------------------------ noise
def test_noise_gaussian_stats():
    from ddnm_tpu.data.noise import add_noise

    y = jnp.zeros((4, 64, 64, 3))
    out = add_noise(jax.random.PRNGKey(0), y, 0.2, "gaussian")
    assert abs(float(out.std()) - 0.2) < 0.01
    out3d = add_noise(jax.random.PRNGKey(0), y, 0.2, "3d_gaussian")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out3d))


def test_noise_speckle_multiplicative():
    from ddnm_tpu.data.noise import add_noise

    y = jnp.zeros((2, 16, 16, 3))
    out = add_noise(jax.random.PRNGKey(1), y, 0.5, "speckle")
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero signal -> zero noise


def test_noise_poisson_reasonable():
    from ddnm_tpu.data.noise import add_noise

    y = jnp.full((2, 32, 32, 3), 0.5)  # mid-gray in [-1,1]
    out = add_noise(jax.random.PRNGKey(2), y, 0.1, "poisson")
    assert np.isfinite(np.asarray(out)).all()
    assert abs(float(out.mean()) - 0.5) < 0.05


def test_noise_zero_sigma_identity():
    from ddnm_tpu.data.noise import add_noise

    y = jnp.ones((1, 8, 8, 3))
    out = add_noise(jax.random.PRNGKey(0), y, 0.0, "gaussian")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(y))


def test_noise_unknown_type_raises():
    from ddnm_tpu.data.noise import add_noise

    with pytest.raises(ValueError):
        add_noise(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)), 0.1, "salt")


# ------------------------------------------------------------- checkpoints
def test_checkpoint_registry_and_md5(tmp_path):
    from ddnm_tpu.data.checkpoints import CHECKPOINTS, fetch, md5sum

    assert "celeba_hq" in CHECKPOINTS
    assert "imagenet_256_cond" in CHECKPOINTS
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    assert md5sum(p) == "5d41402abc4b2a76b9719d911017c592"
    with pytest.raises(KeyError):
        fetch("nope", tmp_path)
    with pytest.raises(FileNotFoundError):
        fetch("celeba_hq", tmp_path, allow_download=False)


def test_converted_param_cache_roundtrip(tmp_path):
    """load_params caches the converted pytree and reloads it identically."""
    torch = pytest.importorskip("torch")
    from ddnm_tpu.data.checkpoints import load_params

    sd = {
        "conv_in.weight": torch.randn(8, 3, 3, 3),
        "conv_in.bias": torch.randn(8),
        "temb.dense.0.weight": torch.randn(16, 8),
        "temb.dense.0.bias": torch.randn(16),
    }
    ckpt = tmp_path / "toy.ckpt"
    torch.save(sd, ckpt)
    first = load_params(ckpt)
    assert (tmp_path / "toy.ckpt.flax.npz").exists()
    second = load_params(ckpt)  # cache hit, no torch needed
    f1 = jax.tree.leaves(first)
    f2 = jax.tree.leaves(second)
    assert len(f1) == len(f2) == 4
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ----------------------------------------------------------- observability
def test_metrics_logger(tmp_path):
    from ddnm_tpu.utils import MetricsLogger

    m = MetricsLogger(tmp_path / "m.jsonl")
    m.logkv_mean("psnr", 10.0)
    m.logkv_mean("psnr", 20.0)
    m.logkv("step", 1)
    out = m.dumpkvs()
    assert out["psnr"] == 15.0 and out["step"] == 1
    m.logkv("step", 2)
    m.dumpkvs()
    m.close()
    lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["psnr"] == 15.0


# ------------------------------------------------------------------- tools
def test_make_fixtures_and_get_mask(tmp_path):
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_fixtures.py"),
         "--exp", str(tmp_path), "--size", "32", "--count", "2"],
        check=True, capture_output=True,
    )
    assert len(list((tmp_path / "datasets" / "celeba_hq").glob("*.png"))) == 2
    mask = np.load(tmp_path / "inp_masks" / "mask.npy")
    assert mask.shape == (32, 32) and set(np.unique(mask)) == {0, 1}

    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "get_mask.py"),
         str(tmp_path / "inp_masks" / "mask.png"),
         str(tmp_path / "m2.npy")],
        check=True, capture_output=True,
    )
    m2 = np.load(tmp_path / "m2.npy")
    np.testing.assert_array_equal(m2, mask)


# -------------------------------------------------------------- evaluation
def test_evaluation_dry_run(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "evaluation.py"), "--dry-run",
         "--random-init", "-i", str(tmp_path)],
        check=True, capture_output=True, text=True,
    )
    # all 14 reference runs enumerated (evaluation.sh:1-36)
    assert out.stdout.count("== ") == 14
    assert (tmp_path / "report.json").exists()


def test_evaluation_config_substitution(tmp_path):
    """--config-celeba/--config-imagenet swap the per-dataset configs (the
    executed-sweep path: locally-trained flag256/adm128 stand-ins for the
    unreachable reference checkpoints)."""
    out = subprocess.run(
        [sys.executable, str(REPO / "evaluation.py"), "--dry-run",
         "--random-init", "-i", str(tmp_path),
         "--config-celeba", "flag256.yml", "--config-imagenet", "adm128.yml"],
        check=True, capture_output=True, text=True,
    )
    assert out.stdout.count("== ") == 14
    assert "celeba_hq.yml" not in out.stdout
    assert "imagenet_256.yml" not in out.stdout
    assert out.stdout.count("flag256.yml") == 8
    assert out.stdout.count("adm128.yml") == 6


def test_orbax_roundtrip_with_sharded_target(tmp_path):
    """Orbax save/restore, including restore into explicit shardings on the
    virtual multi-device mesh (production multi-chip restore path)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddnm_tpu.data.checkpoints import load_orbax, save_orbax
    from ddnm_tpu.parallel import make_mesh

    params = {"params": {"dense": {"kernel": jnp.arange(64.0).reshape(8, 8),
                                   "bias": jnp.zeros((8,))}}}
    path = tmp_path / "ckpt"
    save_orbax(params, path)

    plain = load_orbax(path)
    np.testing.assert_array_equal(
        np.asarray(plain["params"]["dense"]["kernel"]),
        np.asarray(params["params"]["dense"]["kernel"]),
    )

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P())
    target = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding),
        params,
    )
    sharded = load_orbax(path, target=target)
    k = sharded["params"]["dense"]["kernel"]
    assert k.sharding == sharding
    np.testing.assert_array_equal(np.asarray(k), np.arange(64.0).reshape(8, 8))


def test_serving_export_roundtrip(tmp_path):
    """Export the DDNM step via jax.export, reload, and match the live step."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.serving import export_simplified_step, load_exported

    size, batch = 32, 2
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=size)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, 3))
    params = model.init(rng, x, jnp.zeros((batch,)))

    def model_fn(p, xx, tt):
        return model.apply(p, xx, tt)

    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=4)
    y = op.A(x)
    blob = export_simplified_step(
        model_fn, params, op, batch=batch, image_size=size,
        y_shape=tuple(y.shape), path=tmp_path / "step.bin",
    )
    assert (tmp_path / "step.bin").stat().st_size == len(blob) > 0

    call = load_exported(tmp_path / "step.bin")
    key = jax.random.key_data(jax.random.PRNGKey(7)).astype(jnp.uint32)
    out, x0 = call(params, x, y, key, 50.0, 0.9, 0.95)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

    # parity with the live (unexported) step
    from ddnm_tpu.sampling.ddnm import _simplified_body

    noise = jax.random.normal(
        jax.random.wrap_key_data(key, impl="threefry2x32"), x.shape, jnp.float32
    )
    t_b = jnp.full((batch,), 50.0, jnp.float32)
    ref_x, ref_x0 = _simplified_body(
        model_fn, op, 0.85, 0.0, params, x, y, t_b,
        jnp.float32(0.9), jnp.float32(0.95), noise,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(ref_x0), atol=1e-5)


def test_serving_export_trajectory_roundtrip(tmp_path):
    """Export the WHOLE trajectory scan, reload, and match the live
    scan-driver sampler bitwise — incl. a time-travel jump schedule and
    per-image key batches (the online server's RNG discipline)."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule, sample_simplified
    from ddnm_tpu.serving import export_simplified_trajectory, load_exported

    size, batch = 32, 2
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=size)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, 3))
    params = model.init(rng, x, jnp.zeros((batch,)))

    def model_fn(p, xx, tt):
        return model.apply(p, xx, tt)

    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=4)
    y = op.A(x)
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    # a schedule WITH travel steps so the exported scan's lax.cond runs both
    sched = build_schedule(betas=betas, t_sampling=5, travel_length=1,
                           travel_repeat=2)
    blob = export_simplified_trajectory(
        model_fn, params, op, sched, batch=batch, image_size=size,
        y_shape=tuple(y.shape), per_image_keys=True,
        path=tmp_path / "traj.bin",
    )
    assert (tmp_path / "traj.bin").stat().st_size == len(blob) > 0

    call = load_exported(tmp_path / "traj.bin")
    keys = jnp.stack([
        jax.random.key_data(jax.random.PRNGKey(7)),
        jax.random.key_data(jax.random.PRNGKey(8)),
    ]).astype(jnp.uint32)
    x_out, x0_out = call(params, x, y, keys)
    assert x_out.shape == x.shape
    assert np.isfinite(np.asarray(x_out)).all()

    ref_x, ref_x0 = sample_simplified(
        model_fn, x, y, op, sched,
        jnp.asarray(keys), loop="scan", params=params,
    )
    np.testing.assert_array_equal(np.asarray(x_out), np.asarray(ref_x))
    np.testing.assert_array_equal(np.asarray(x0_out), np.asarray(ref_x0))


def test_ssim_sanity():
    from ddnm_tpu.data.metrics import ssim

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    assert np.allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-4)
    noisy = jnp.clip(a + 0.25 * jnp.asarray(rng.standard_normal(a.shape)), 0, 1)
    mid = np.asarray(ssim(a, noisy))
    assert np.all((mid > 0.0) & (mid < 0.9))
    b = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    low = np.asarray(ssim(a, b))
    assert np.all(low < mid)


def test_serving_export_posterior_roundtrip(tmp_path):
    """Export the posterior (hq) DDNM step, reload, match the live step."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.serving import export_posterior_step, load_exported

    size, batch = 32, 2
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=size)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, 3))
    params = model.init(rng, x, jnp.zeros((batch,)))

    def model_fn(p, xx, tt):
        eps = model.apply(p, xx, tt)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    op = build_functional_operator("sr_averagepooling", image_size=size, deg_scale=4)
    apy = op.Ap(op.A(x))
    blob = export_posterior_step(
        model_fn, params, op, batch=batch, image_size=size,
        path=tmp_path / "pstep.bin",
    )
    assert (tmp_path / "pstep.bin").stat().st_size == len(blob) > 0

    call = load_exported(tmp_path / "pstep.bin")
    key = jax.random.key_data(jax.random.PRNGKey(7)).astype(jnp.uint32)
    scalars = (412.0, 1.8, 1.5, 1.0, 0.02, 0.97, 1e-4, 1.0)
    out, x0 = call(params, x, apy, key, *scalars)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

    from ddnm_tpu.sampling.posterior import _posterior_body

    noise = jax.random.normal(
        jax.random.wrap_key_data(key, impl="threefry2x32"), x.shape, jnp.float32
    )
    ref_x, ref_x0 = _posterior_body(
        model_fn, op, None, True, params, x, apy, None, None, noise,
        *(jnp.float32(s) for s in scalars)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(ref_x0), atol=1e-5)


def test_flagship_forward_cost_envelope():
    """Perf-regression guard: XLA cost analysis of the flagship (256px,
    114M-param bf16 DDPM UNet) forward must stay inside the measured
    envelope — 0.497 TFLOP and 10.07 GB accessed per batch-1 forward
    (matches docs/PERFORMANCE.md's TPU batch-8 roofline: 3.94 TFLOP,
    which is 8x this). A change that silently bloats compute or memory
    traffic (a lost fusion, an accidental fp32 torso, a layout flip that
    duplicates activations) fails here without needing a TPU."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.models.unet_ddpm import DDPMUNet

    model = DDPMUNet(dtype=jnp.bfloat16)  # the bench.py flagship config
    rng = jax.random.PRNGKey(0)
    x = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    pshapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        jax.eval_shape(model.init, rng, x, t))
    fwd = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt))
    ca = fwd.lower(pshapes, x, t).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops, gbytes = ca["flops"] / 1e12, ca["bytes accessed"] / 1e9
    assert 0.45 <= flops <= 0.55, f"flagship forward FLOPs drifted: {flops} T"
    assert 9.0 <= gbytes <= 11.1, f"flagship forward bytes drifted: {gbytes} GB"


def test_serving_export_multiplatform(tmp_path):
    """A (cpu, tpu) trajectory artifact can be built on a CPU-only host and
    still executes on the CPU side — build-anywhere, deploy-to-TPU."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling import build_schedule
    from ddnm_tpu.serving import export_simplified_trajectory, load_exported

    size, batch = 32, 1
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=size)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, 3))
    params = model.init(rng, x, jnp.zeros((batch,)))
    op = build_functional_operator("sr_averagepooling", image_size=size,
                                   deg_scale=4)
    y = op.A(x)
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100)
    sched = build_schedule(betas=betas, t_sampling=3)
    blob = export_simplified_trajectory(
        lambda p, xx, tt: model.apply(p, xx, tt), params, op, sched,
        batch=batch, image_size=size, y_shape=tuple(y.shape),
        platforms=("cpu", "tpu"))
    call = load_exported(blob)
    key = jax.random.key_data(jax.random.PRNGKey(7)).astype(jnp.uint32)
    out, _ = call(params, x, y, key)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_serving_export_posterior_trajectory_roundtrip(tmp_path):
    """Export the WHOLE posterior jump-schedule loop (paste + ctx + travel)
    and match the live scan-driver sampler bitwise."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling.posterior import (
        build_posterior_tables, sample_posterior)
    from ddnm_tpu.serving import export_posterior_trajectory, load_exported

    size, batch = 32, 2
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=size)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, 3))
    params = model.init(rng, x, jnp.zeros((batch,)))

    def model_fn(p, xx, tt):
        eps = model.apply(p, xx, tt)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    op = build_functional_operator(
        "inpainting", image_size=size,
        mask=np.ones((size, size, 1), np.float32))
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02,
        num_diffusion_timesteps=100)
    tables = build_posterior_tables(
        betas=betas, timestep_respacing="10",
        schedule_jump_params=dict(t_T=10, n_sample=1, jump_length=3,
                                  jump_n_sample=2))
    rng2 = np.random.default_rng(3)
    ctx = jnp.asarray((rng2.random((batch, size, size, 1)) > 0.4), jnp.float32)
    gts = jnp.asarray(rng2.uniform(-1, 1, (batch, size, size, 3)), jnp.float32)
    apy = op.Ap_ctx(op.A_ctx(gts, ctx), ctx)
    paste_mask = jnp.asarray(
        (rng2.random((batch, size, size, 1)) > 0.5), jnp.float32)
    paste_content = jnp.asarray(
        rng2.uniform(-1, 1, (batch, size, size, 3)), jnp.float32)

    blob = export_posterior_trajectory(
        model_fn, params, op, tables, batch=batch, image_size=size,
        with_paste=True, with_ctx=True, per_image_keys=True,
        path=tmp_path / "ptraj.bin",
    )
    assert (tmp_path / "ptraj.bin").stat().st_size == len(blob) > 0

    call = load_exported(tmp_path / "ptraj.bin")
    keys = jnp.stack([
        jax.random.key_data(jax.random.PRNGKey(7)),
        jax.random.key_data(jax.random.PRNGKey(8)),
    ]).astype(jnp.uint32)
    x_out, x0_out = call(params, x, apy, paste_mask, paste_content, ctx, keys)
    assert x_out.shape == x.shape
    assert np.isfinite(np.asarray(x_out)).all()

    ref_x, ref_x0 = sample_posterior(
        model_fn, x, apy, op, tables, jnp.asarray(keys),
        paste_mask=paste_mask, paste_content=paste_content, op_ctx=ctx,
        loop="scan", params=params,
    )
    np.testing.assert_array_equal(np.asarray(x_out), np.asarray(ref_x))
    np.testing.assert_array_equal(np.asarray(x0_out), np.asarray(ref_x0))

    # ctx export on a ctx-less operator is an error
    plain = build_functional_operator(
        "sr_averagepooling", image_size=size, deg_scale=4)
    with pytest.raises(ValueError, match="A_ctx"):
        export_posterior_trajectory(
            model_fn, params, plain, tables, batch=batch, image_size=size,
            with_ctx=True)


def test_aggregate_reports(tmp_path):
    """Cross-host report merge: sample-weighted PSNR, max-wall throughput."""
    import json
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from aggregate_reports import aggregate, main as agg_main

    r0 = {"sr": {"avg_psnr": 30.0, "num_samples": 4, "wall_seconds": 10.0},
          "color": {"error": "boom"}}
    r1 = {"sr": {"avg_psnr": 20.0, "num_samples": 1, "wall_seconds": 8.0},
          "color": {"avg_psnr": 25.0, "num_samples": 2, "wall_seconds": 5.0}}
    merged = aggregate([r0, r1])
    assert merged["sr"]["avg_psnr"] == 28.0         # (30*4 + 20*1) / 5
    assert merged["sr"]["num_samples"] == 5
    assert merged["sr"]["wall_seconds"] == 10.0     # slowest host
    assert merged["color"]["num_samples"] == 2 and merged["color"]["errors"]

    p0, p1 = tmp_path / "a.json", tmp_path / "b.json"
    p0.write_text(json.dumps(r0)); p1.write_text(json.dumps(r1))
    assert agg_main([str(p0), str(p1)])["sr"]["avg_psnr"] == 28.0


def test_serving_export_posterior_with_ctx(tmp_path):
    """Posterior step export with a context-parameterised (masked) operator."""
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.operators.functional import FunctionalOperator
    from ddnm_tpu.serving import export_posterior_step, load_exported

    size, batch = 16, 1

    def model_fn(p, x, t):
        return jnp.concatenate([p["s"] * x, jnp.zeros_like(x)], axis=-1)

    params = {"s": jnp.float32(0.1)}
    mask_ctx = lambda z, c: z * c
    op = FunctionalOperator("inpainting", lambda z: z, lambda z: z,
                            mask_ctx, mask_ctx)
    blob = export_posterior_step(
        model_fn, params, op, batch=batch, image_size=size, with_ctx=True,
        path=tmp_path / "cstep.bin",
    )
    call = load_exported(tmp_path / "cstep.bin")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, 3))
    apy = 0.5 * x
    ctx = (jax.random.uniform(rng, (batch, size, size, 1)) > 0.5).astype(jnp.float32)
    key = jax.random.key_data(jax.random.PRNGKey(7)).astype(jnp.uint32)
    out, x0 = call(params, x, apy, ctx, key, 3.0, 1.2, 0.8, 1.0, 0.1, 0.9,
                   1e-4, 1.0)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()

    import pytest as _pytest

    op_plain = FunctionalOperator("id", lambda z: z, lambda z: z)
    with _pytest.raises(ValueError, match="with_ctx"):
        export_posterior_step(model_fn, params, op_plain, batch=batch,
                              image_size=size, with_ctx=True)


def test_compare_with_reference_tool(tmp_path):
    """tools/compare_with_reference.py end-to-end on a random 'simple'
    checkpoint: reference torch sampler vs ours on converted weights must
    agree (zero noise; measured >100 dB on this toy geometry)."""
    torch = pytest.importorskip("torch")

    import runpy
    import sys

    from tests._reference import import_reference

    models = import_reference("guided_diffusion.models")

    class _N:
        def __init__(self, d):
            for k, v in d.items():
                setattr(self, k, _N(v) if isinstance(v, dict) else v)

    cfg = _N({"model": {"type": "simple", "ch": 32, "out_ch": 3,
                        "ch_mult": [1, 2], "num_res_blocks": 1,
                        "attn_resolutions": [16], "dropout": 0.0,
                        "in_channels": 3, "resamp_with_conv": True},
              "data": {"image_size": 64},
              "diffusion": {"num_diffusion_timesteps": 1000}})
    torch.manual_seed(0)
    m = models.Model(cfg)
    ckpt = tmp_path / "rand.ckpt"
    torch.save(m.state_dict(), ckpt)

    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(0)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(64, 64, 3)).astype(np.float32), src)

    argv = sys.argv
    sys.argv = ["compare", "--ckpt", str(ckpt), "--image", str(src),
                "--deg", "sr_averagepooling", "--deg-scale", "4",
                "--size", "64", "--t-sampling", "3", "--min-psnr", "60",
                "--ch", "32", "--ch-mult", "1,2", "--num-res-blocks", "1"]
    try:
        with pytest.raises(SystemExit) as e:
            runpy.run_path("tools/compare_with_reference.py",
                           run_name="__main__")
        assert e.value.code == 0  # agreement above --min-psnr
    finally:
        sys.argv = argv


def test_hq_evaluation_dry_run(tmp_path, capsys):
    """hq_evaluation constructs the reference's 5 demo invocations."""
    import hq_evaluation as hev
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(0)
    for name, _, _ in hev.DEMOS:
        save_image(rng.uniform(size=(32, 32, 3)).astype(np.float32),
                   tmp_path / f"{name}.png")
    hev.main(["--dry-run", "--random-init", "--data", str(tmp_path),
              "--encoder_cache", "3", "--dtype", "bfloat16",
              "-i", str(tmp_path / "out")])
    out = capsys.readouterr().out
    for name, cls, scale in hev.DEMOS:
        assert f"--class {cls}" in out and f"--scale {scale}" in out
    assert out.count("hq_main.py") == len(hev.DEMOS)
    assert "--encoder_cache 3" in out and "--dtype bfloat16" in out


def test_hq_evaluation_face_sweep_rejects_lone_override(tmp_path):
    """--face_gt / --face_masks must come together: defaulting one to the
    other would threshold gt photos into keep-masks (silent garbage)."""
    import hq_evaluation as hev

    for args in (["--face_gt", str(tmp_path / "gts")],
                 ["--face_masks", str(tmp_path / "masks")]):
        with pytest.raises(SystemExit, match="together"):
            hev.main(["--dry-run", "--random-init", "--face_sweep",
                      "-i", str(tmp_path / "out")] + args)


def test_hq_evaluation_face_sweep_dry_run(tmp_path, capsys):
    """--face_sweep constructs the face256 inpainting dataset-sweep
    invocation (hq_demo/confs/face256.yml eval dataset)."""
    import hq_evaluation as hev

    hev.main(["--dry-run", "--random-init", "--face_sweep",
              "--face_gt", str(tmp_path / "gts"),
              "--face_masks", str(tmp_path / "masks"),
              "--max_len", "2", "-i", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert out.count("hq_main.py") == 1
    assert "--deg inpainting" in out
    assert "--gt_path" in out and "--mask_path_dir" in out
    assert "--max_len 2" in out
    assert "face256.yml" in out


def test_docs_paths_exist():
    """Docs-integrity: every repo file path mentioned in PARITY.md,
    README.md and docs/*.md exists (catches doc rot when files move)."""
    import re

    repo = Path(__file__).resolve().parents[1]
    docs = [repo / "PARITY.md", repo / "README.md",
            *sorted((repo / "docs").glob("*.md"))]
    # slash-qualified repo-relative paths only (bare file names are
    # usually reference-repo citations, which live outside this tree)
    pat = re.compile(
        r"\b((?:ddnm_tpu|tools|tests|configs|docs)/[\w/\.-]+\.\w+)\b")
    missing = {}
    for doc in docs:
        for m in pat.finditer(doc.read_text()):
            rel = m.group(1)
            if not (repo / rel).exists():
                missing.setdefault(doc.name, set()).add(rel)
    missing = {k: sorted(v) for k, v in missing.items()}
    assert not missing, f"docs reference missing files: {missing}"


def test_runner_mask_auto_resize(tmp_path):
    """A default/explicit inpainting mask whose resolution differs from the
    config's image_size is nearest-resized instead of crashing downstream
    with index-out-of-bounds (round-5 find: the 256px default mask against
    the 128px ADM eval config). The reference has no such path — all its
    assets are 256px."""
    from ddnm_tpu.config import load_config
    from ddnm_tpu.runner import RunArgs, Runner

    cfg = load_config(REPO / "configs" / "smoke.yml")  # image_size 64
    big = np.zeros((256, 256), np.float32)
    big[:, :128] = 1.0  # left half kept
    np.save(tmp_path / "mask256.npy", big)
    r = Runner(RunArgs(mask_path=str(tmp_path / "mask256.npy"),
                       deg="inpainting"), cfg)
    m = r._mask()
    assert m.shape == (64, 64)
    assert set(np.unique(m)) == {0.0, 1.0}
    np.testing.assert_array_equal(m[:, :32], 1.0)
    np.testing.assert_array_equal(m[:, 32:], 0.0)

    # matching-size masks pass through bit-identically
    small = (np.arange(64 * 64).reshape(64, 64) % 2).astype(np.float32)
    np.save(tmp_path / "mask64.npy", small)
    r2 = Runner(RunArgs(mask_path=str(tmp_path / "mask64.npy"),
                        deg="inpainting"), cfg)
    np.testing.assert_array_equal(r2._mask(), small)
