"""End-to-end CLI smoke tests (tiny config, reference image fixtures) and
multi-device batch-sharded sampling on the 8-virtual-device CPU mesh."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]

FIXTURES = Path("/root/reference/exp/datasets/celeba_hq")


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_simplified_smoke(tmp_path):
    import main as cli

    stats = cli.main([
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--simplified", "--random_init", "--ni",
        "-i", str(tmp_path / "out"),
        "--max_images", "4",
    ])
    assert stats["num_samples"] == 4
    outs = sorted((tmp_path / "out").glob("*_0.png"))
    assert len(outs) == 4
    apys = sorted((tmp_path / "out" / "Apy").glob("Apy_*.png"))
    assert len(apys) == 4


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_svd_noisy_smoke(tmp_path):
    import main as cli

    stats = cli.main([
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "colorization",
        "--sigma_y", "0.05", "--add_noise",
        "--random_init", "--ni",
        "-i", str(tmp_path / "out"),
        "--max_images", "2",
        "--batch_size", "2",
    ])
    assert stats["num_samples"] == 2
    assert np.isfinite(stats["avg_psnr"])


def test_sharded_sampling_matches_single_device():
    """Data-sharded sampling over 8 virtual devices must equal single-device."""
    from ddnm_tpu import schedules
    from ddnm_tpu.models.unet_ddpm import DDPMUNet
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.parallel import make_mesh, replicate, shard_batch
    from ddnm_tpu.sampling import build_schedule, sample_simplified

    assert len(jax.devices()) >= 8

    res = 32
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=res)
    rng = jax.random.PRNGKey(0)
    batch = 8
    x0 = jax.random.normal(rng, (batch, res, res, 3))
    params = model.init(rng, x0, jnp.zeros((batch,)))

    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    sched = build_schedule(betas=betas, t_sampling=3)
    op = build_functional_operator("sr_averagepooling", image_size=res, deg_scale=4)
    y = op.A(x0)
    x_init = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)

    def model_fn_single(x, t):
        return model.apply(params, x, t)

    single, _ = sample_simplified(
        model_fn_single, x_init, y, op, sched, jax.random.PRNGKey(2),
        eta=0.85, sigma_y=0.0, noise_fn=zero_noise,
    )

    mesh = make_mesh(8)
    params_r = replicate(mesh, params)

    def model_fn_sharded(x, t):
        return model.apply(params_r, x, t)

    sharded, _ = sample_simplified(
        model_fn_sharded,
        shard_batch(mesh, x_init),
        shard_batch(mesh, y),
        op, sched, jax.random.PRNGKey(2),
        eta=0.85, sigma_y=0.0, noise_fn=zero_noise,
    )
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), atol=1e-5
    )
    # output stays sharded across the mesh
    assert len(sharded.sharding.device_set) == 8


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_hq_cli_mask_shift_smoke(tmp_path):
    """hq_main end-to-end on a synthetic 256px input: single-tile
    colorization through the full posterior sampler + canvas assembly."""
    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(0)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(256, 256, 3)).astype(np.float32), src)
    out = hq.main([
        "--config", "configs/hq/smoke.yml",
        "--deg", "colorization",
        "--path_y", str(src),
        "--random_init",
        "-i", str(tmp_path / "hq"),
    ])
    assert out["final"].shape[1:] == (256, 256, 3)
    assert np.isfinite(out["final"]).all()
    assert (tmp_path / "hq" / "final.png").exists()
    assert (tmp_path / "hq" / "Apy.png").exists()


def test_hq_cli_bf16_resident_params(tmp_path):
    """--dtype bfloat16 now also stores params bf16-resident (cast_torso):
    halves the weight HBM stream for the batch-1 tile chain. Finite output
    end-to-end through the CLI."""
    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(3)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(256, 256, 3)).astype(np.float32), src)
    out = hq.main([
        "--config", "configs/hq/smoke.yml",
        "--deg", "colorization",
        "--path_y", str(src),
        "--random_init",
        "--dtype", "bfloat16",
        "-i", str(tmp_path / "hq"),
    ])
    assert np.isfinite(out["final"]).all()


def test_cli_t_sampling_override(tmp_path, monkeypatch):
    """--t_sampling overrides time_travel.T_sampling (reduced-protocol
    validation runs): the runner samples exactly that many steps."""
    import main as cli
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(9)
    src = tmp_path / "in"
    save_image(rng.uniform(size=(64, 64, 3)).astype(np.float32),
               src / "0.png")

    seen = {}
    from ddnm_tpu import runner as runner_mod

    orig = runner_mod.Runner.__init__

    def spy(self, args, config):
        seen["t"] = config.time_travel.T_sampling
        return orig(self, args, config)

    monkeypatch.setattr(runner_mod.Runner, "__init__", spy)
    cli.main([
        "--config", "configs/smoke.yml", "--deg", "colorization",
        "--simplified", "--random_init", "--path_y", str(src),
        "-i", str(tmp_path / "out"), "--ni", "--t_sampling", "2",
    ])
    assert seen["t"] == 2


def test_hq_cli_path_y_wins_over_conf_eval_dataset(tmp_path):
    """An explicit --path_y means single-image mode even when the conf
    declares a data.eval dataset (configs/hq/face256.yml does): the sweep
    branch must not hijack the run (and would FileNotFoundError on the
    conf's absent fixture trees here)."""
    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    conf = tmp_path / "conf.yml"
    conf.write_text(
        (REPO / "configs/hq/smoke.yml").read_text()
        + "\ndata:\n  eval:\n    paper_face_mask:\n"
        "      gt_path: /nonexistent/gts\n"
        "      mask_path: /nonexistent/masks\n"
        "      image_size: 256\n"
    )
    rng = np.random.default_rng(5)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(256, 256, 3)).astype(np.float32), src)
    out = hq.main([
        "--config", str(conf),
        "--deg", "colorization",
        "--path_y", str(src),
        "--random_init",
        "-i", str(tmp_path / "hq"),
    ])
    assert (tmp_path / "hq" / "final.png").exists()
    assert np.isfinite(out["final"]).all()


def test_hq_cli_dataset_sweep(tmp_path):
    """hq_main dataset-sweep mode (--gt_path/--mask_path_dir): iterates
    filename-paired gt/mask trees like the reference's conf-declared eval
    dataset (hq_demo/conf_mgt/conf_base.py:60-106) and writes the
    srs/lrs/gts/gt_keep_masks output tree."""
    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(7)
    gt_dir, mask_dir = tmp_path / "gts", tmp_path / "masks"
    for name in ("a.png", "b.png"):
        save_image(rng.uniform(size=(256, 256, 3)).astype(np.float32),
                   gt_dir / name)
        m = np.ones((256, 256), np.float32)
        m[96:160, 96:160] = 0.0  # hole to inpaint
        save_image(m, mask_dir / name)

    out = hq.main([
        "--config", "configs/hq/smoke.yml",
        "--deg", "inpainting",
        "--gt_path", str(gt_dir),
        "--mask_path_dir", str(mask_dir),
        "--random_init",
        "-i", str(tmp_path / "hq"),
    ])
    assert len(out["psnr"]) == 2
    for sub in ("srs", "lrs", "gts", "gt_keep_masks"):
        for name in ("a.png", "b.png"):
            assert (tmp_path / "hq" / sub / name).exists(), (sub, name)
    # the keep-region must carry gt content in the masked "lrs" image
    from PIL import Image

    lrs = np.asarray(Image.open(tmp_path / "hq" / "lrs" / "a.png"), np.float32)
    gts = np.asarray(Image.open(tmp_path / "hq" / "gts" / "a.png"), np.float32)
    assert np.abs(lrs[:64, :64] - gts[:64, :64]).max() <= 1.0  # kept region
    assert np.abs(lrs[120:140, 120:140]).max() <= 140.0  # hole ~ mid-gray/dark


def test_hq_cli_sweep_batch_matches_sequential(tmp_path):
    """--sweep_batch batches single-tile sweep images into one sampler call
    (tiling.batched_tile_sample); the written srs outputs must be identical
    to the sequential per-image sweep (per-image RNG streams)."""
    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(13)
    gt_dir, mask_dir = tmp_path / "gts", tmp_path / "masks"
    for name in ("a.png", "b.png", "c.png"):
        save_image(rng.uniform(size=(256, 256, 3)).astype(np.float32),
                   gt_dir / name)
        m = np.ones((256, 256), np.float32)
        m[96:160, 96:160] = 0.0
        save_image(m, mask_dir / name)

    common = [
        "--config", "configs/hq/smoke.yml", "--deg", "inpainting",
        "--gt_path", str(gt_dir), "--mask_path_dir", str(mask_dir),
        "--random_init",
    ]
    out_seq = hq.main(common + ["-i", str(tmp_path / "seq")])
    out_bat = hq.main(common + ["-i", str(tmp_path / "bat"),
                                "--sweep_batch", "2"])  # 2 + remainder 1
    np.testing.assert_allclose(out_bat["psnr"], out_seq["psnr"], atol=0.01)
    from PIL import Image

    for name in ("a.png", "b.png", "c.png"):
        seq_png = np.asarray(Image.open(tmp_path / "seq" / "srs" / name))
        bat_png = np.asarray(Image.open(tmp_path / "bat" / "srs" / name))
        # identical 8-bit outputs modulo at most off-by-one quantisation of
        # fp32 fusion-order differences between the two batch shapes
        assert np.abs(seq_png.astype(int) - bat_png.astype(int)).max() <= 1


def test_hq_cli_encoder_cache_smoke(tmp_path):
    """hq_main with --encoder_cache 2: posterior encoder-propagation accel
    through the Mask-Shift pipeline (sampling/accel.py)."""
    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(1)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(256, 256, 3)).astype(np.float32), src)
    out = hq.main([
        "--config", "configs/hq/smoke.yml",
        "--deg", "colorization",
        "--path_y", str(src),
        "--random_init",
        "--encoder_cache", "2",
        "-i", str(tmp_path / "hq"),
    ])
    assert out["final"].shape[1:] == (256, 256, 3)
    assert np.isfinite(out["final"]).all()


def test_hq_cli_encoder_cache_end_dense_smoke(tmp_path):
    """hq_main --encoder_cache_policy end_dense drives key_steps through
    the tiling layer (placement measured in docs/PERFORMANCE.md)."""
    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(1)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(256, 256, 3)).astype(np.float32), src)
    out = hq.main([
        "--config", "configs/hq/smoke.yml",
        "--deg", "colorization",
        "--path_y", str(src),
        "--random_init",
        "--encoder_cache", "2", "--encoder_cache_policy", "end_dense",
        "-i", str(tmp_path / "hq"),
    ])
    assert out["final"].shape[1:] == (256, 256, 3)
    assert np.isfinite(out["final"]).all()


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_poisson_noise_smoke(tmp_path):
    import main as cli

    stats = cli.main([
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--sigma_y", "0.05", "--add_noise", "--noise_type", "poisson",
        "--simplified", "--random_init", "--ni",
        "-i", str(tmp_path / "out"),
        "--max_images", "1", "--batch_size", "1",
    ])
    assert stats["num_samples"] == 1


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_resume_skips_existing(tmp_path):
    import main as cli

    argv = [
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--simplified", "--random_init", "--ni",
        "-i", str(tmp_path / "out"),
        "--max_images", "2", "--batch_size", "2",
    ]
    s1 = cli.main(argv)
    assert s1["num_samples"] == 2
    s2 = cli.main(argv + ["--resume"])
    assert s2["num_samples"] == 0  # everything skipped


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_batch_size_invariance(tmp_path):
    """Per-image RNG streams (global-index fold_in keys in the runner):
    outputs are identical whatever --batch_size groups the images into —
    each image's init noise and sampling stream depend only on
    (seed, dataset index)."""
    import main as cli
    from PIL import Image

    common = [
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--simplified", "--random_init", "--ni",
        "--max_images", "4",
    ]
    cli.main(common + ["-i", str(tmp_path / "b2"), "--batch_size", "2"])
    cli.main(common + ["-i", str(tmp_path / "b4"), "--batch_size", "4"])
    for i in range(4):
        a = np.asarray(Image.open(tmp_path / "b2" / f"{i}_0.png"), int)
        b = np.asarray(Image.open(tmp_path / "b4" / f"{i}_0.png"), int)
        # same streams; <=1 count of 8-bit quantisation on fp32
        # fusion-order differences between the two batch shapes
        assert np.abs(a - b).max() <= 1, f"image {i} differs across batch size"


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_resume_completes_missing_identically(tmp_path):
    """--resume after a partial run produces the SAME outputs for the
    remaining images as the uninterrupted run (per-image keys are
    history-independent)."""
    import main as cli
    from PIL import Image

    common = [
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--simplified", "--random_init", "--ni",
        "--max_images", "4", "--batch_size", "2",
    ]
    cli.main(common + ["-i", str(tmp_path / "full")])
    # partial run: only the first batch done, then "interrupted"
    cli.main(common[:-4] + ["--max_images", "2", "--batch_size", "2",
                            "-i", str(tmp_path / "part")])
    s = cli.main(common + ["-i", str(tmp_path / "part"), "--resume"])
    assert s["num_samples"] == 2  # only images 2..3 were sampled
    for i in range(4):
        a = np.asarray(Image.open(tmp_path / "full" / f"{i}_0.png"), int)
        b = np.asarray(Image.open(tmp_path / "part" / f"{i}_0.png"), int)
        assert np.abs(a - b).max() <= 1, f"image {i} differs after resume"


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_encoder_cache_smoke(tmp_path):
    import main as cli

    stats = cli.main([
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--simplified", "--random_init", "--ni",
        "-i", str(tmp_path / "out"),
        "--max_images", "1", "--batch_size", "1",
        "--encoder_cache", "2",
    ])
    assert stats["num_samples"] == 1


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_encoder_cache_end_dense_smoke(tmp_path):
    """--encoder_cache_policy end_dense drives the key_steps path through
    the runner (placement measured in docs/PERFORMANCE.md)."""
    import main as cli

    stats = cli.main([
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--simplified", "--random_init", "--ni",
        "-i", str(tmp_path / "out"),
        "--max_images", "1", "--batch_size", "1",
        "--encoder_cache", "2", "--encoder_cache_policy", "end_dense",
    ])
    assert stats["num_samples"] == 1


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_subset_range(tmp_path):
    """--subset_start/--subset_end slice the dataset and offset output
    indices (the reference's manual sharding/resume mechanism,
    main.py:70-75 + diffusion.py:218-223)."""
    import main as cli

    stats = cli.main([
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--simplified", "--random_init", "--ni",
        "-i", str(tmp_path / "out"),
        "--subset_start", "2", "--subset_end", "4",
        "--batch_size", "2",
    ])
    assert stats["num_samples"] == 2
    names = sorted(p.name for p in (tmp_path / "out").glob("*_0.png"))
    assert names == ["2_0.png", "3_0.png"]  # indices offset by subset_start


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures unavailable")
def test_cli_trace_dir_writes_profile(tmp_path):
    import main as cli

    cli.main([
        "--config", "configs/smoke.yml",
        "--path_y", str(FIXTURES),
        "--deg", "sr_averagepooling", "--deg_scale", "4",
        "--simplified", "--random_init", "--ni",
        "-i", str(tmp_path / "out"),
        "--max_images", "1", "--batch_size", "1",
        "--trace_dir", str(tmp_path / "trace"),
    ])
    assert list((tmp_path / "trace").rglob("*.xplane.pb")), "no profiler trace written"

    # tools/trace_report.py parses the trace; on the CPU backend there is
    # no device plane, which it must report gracefully (on TPU it prints
    # the per-op-kind device-time breakdown)
    import subprocess, sys as _sys
    r = subprocess.run(
        [_sys.executable, "tools/trace_report.py", str(tmp_path / "trace")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert ("XLA Ops" in r.stdout or "===" in r.stdout
            or "no device plane" in r.stdout), r.stdout


def test_cli_accepts_full_reference_flag_surface():
    """Every flag of the reference CLI (main.py:19-90) parses, with the
    same spellings, plus our extras."""
    import main as cli

    ns = cli.parse_args([
        "--config", "celeba_hq.yml", "--seed", "1234", "--exp", "exp",
        "--deg", "sr_averagepooling", "--path_y", "celeba_hq",
        "--sigma_y", "0.2", "--eta", "0.85", "--simplified",
        "-i", "demo", "--deg_scale", "4", "--verbose", "info", "--ni",
        "--subset_start", "0", "--subset_end", "8",
        "-n", "poisson", "--add_noise",
        # TPU-native extras
        "--ckpt", "x.ckpt", "--batch_size", "8", "--dtype", "bfloat16",
        "--loop", "host", "--encoder_cache", "2", "--resume",
        "--trace_dir", "/tmp/t",
    ])
    assert ns.deg == "sr_averagepooling" and ns.noise_type == "poisson"
    assert ns.subset_end == 8 and ns.encoder_cache == 2


def test_hq_cli_accepts_reference_flag_surface():
    """Reference hq_demo flags (hq_demo/main.py:171-214) all parse."""
    import hq_main as hq

    ns = hq.parse_args([
        "--config", "configs/hq/inet256.yml", "--deg", "sr_averagepooling",
        "--sigma_y", "0.0", "-i", "orange", "--scale", "4", "--resize_y",
        "--path_y", "orange.png", "--class", "950",
        # extras
        "--ckpt", "m.pt", "--classifier_ckpt", "c.pt", "--dtype", "bfloat16",
        "--parallel_tiles", "--seed", "7",
    ])
    assert ns.class_label == 950 and ns.scale == 4 and ns.resize_y
    assert ns.parallel_tiles


def test_process_subset_arithmetic():
    """process_subset covers every item exactly once, contiguously, for
    arbitrary (n_items, process_count) topologies."""
    from ddnm_tpu.parallel.multihost import process_subset

    for n in (0, 1, 7, 8, 100, 1001):
        for c in (1, 2, 3, 8, 16):
            spans = [process_subset(n, p, c) for p in range(c)]
            assert spans[0][0] == 0 and spans[-1][1] == n
            for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
                assert e0 == s1 and s0 <= e0  # contiguous, non-overlapping


def test_runner_multihost_auto_subset(tmp_path, monkeypatch):
    """With >1 JAX processes, the runner slices the dataset per process and
    keeps global output indices (subset_start)."""
    import jax

    import main as cli
    from ddnm_tpu.config import load_config
    from ddnm_tpu.data.io import save_image
    from ddnm_tpu.runner import RunArgs, Runner

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        save_image(rng.uniform(size=(64, 64, 3)).astype(np.float32),
                   d / f"{i}.png")

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    args = RunArgs(config="configs/smoke.yml", deg="sr_averagepooling",
                   path_y=str(d), image_folder=str(tmp_path / "o"),
                   simplified=True, random_init=True)
    runner = Runner(args, load_config("configs/smoke.yml"))
    ds = runner.build_dataset()
    assert len(ds.paths) == 2          # process 1 of 2 over 5 -> items 3,4
    assert args.subset_start == 3


def test_hq_cli_multitile_inpainting_with_mask(tmp_path):
    """hq CLI: canvas-sized mask on a MULTI-TILE canvas (beyond-reference;
    context-parameterised operators, ddnm_tpu/operators/functional.py)."""
    from PIL import Image

    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(6)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(384, 384, 3)).astype(np.float32), src)
    mpath = tmp_path / "mask.png"
    Image.fromarray(
        ((rng.uniform(size=(384, 384)) > 0.3) * 255).astype(np.uint8)
    ).save(mpath)
    out = hq.main([
        "--config", "configs/hq/smoke.yml", "--deg", "inpainting",
        "--path_y", str(src), "--mask_path", str(mpath),
        "--random_init", "-i", str(tmp_path / "hq"),
    ])
    assert out["final"].shape == (1, 384, 384, 3)
    assert np.isfinite(out["final"]).all()


def test_hq_cli_noisy_smoke(tmp_path):
    """hq CLI with sigma_y > 0: noisy posterior DDNM (lambda/gamma tables,
    reference gaussian_diffusion.py:323-336 — sigma_y used RAW, unlike the
    main pipeline's 2x domain scaling)."""
    import hq_main as hq
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(2)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(256, 256, 3)).astype(np.float32), src)
    out = hq.main([
        "--config", "configs/hq/smoke.yml",
        "--deg", "sr_averagepooling", "--scale", "4",
        "--sigma_y", "0.1",
        "--path_y", str(src),
        "--random_init",
        "-i", str(tmp_path / "hq"),
    ])
    assert np.isfinite(out["final"]).all()


def test_sharding_audit_invariants():
    """Compile the real executables over the virtual mesh and assert the
    structural parallelism claims (docs/PERFORMANCE.md): the data-parallel
    sampling step contains ZERO collectives (DDNM is batch-elementwise;
    params replicated, batch sharded), while the spatially-partitioned
    forward contains exactly the expected traffic classes — halo
    collective-permutes and cross-shard normalisation/attention
    reductions. Guards against a refactor silently taxing every step."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from analyze_sharding import (
        _flagship_dp_step, _sp_forward, count_collectives)

    dp = count_collectives(_flagship_dp_step(8))
    assert dp == {}, f"dp hot step grew collectives: {dp}"

    sp = count_collectives(_sp_forward(2, 4))
    assert sp.get("collective-permute", 0) > 0  # conv halo exchanges
    assert sp.get("all-reduce", 0) > 0  # GroupNorm cross-shard stats


def test_hq_cli_tiles_at_config_resolution(tmp_path):
    """The Mask-Shift tile size follows the config's image_size (round-5
    fix): a 32px-model config restoring a 64px canvas must run a 3x3
    overlapped tile grid at TILE=32/STRIDE=16, not a single 256px tile —
    running tiles at a multiple of the trained resolution multiplies the
    attention token count per grid and silently degrades quality. The
    reference hard-codes 256 (its checkpoints are all 256px)."""
    import yaml

    import hq_main as hq
    from ddnm_tpu import tiling
    from ddnm_tpu.data.io import save_image

    conf = yaml.safe_load((REPO / "configs/hq/smoke.yml").read_text())
    conf["image_size"] = 32
    conf["attention_resolutions"] = "8"
    cfg = tmp_path / "hq32.yml"
    cfg.write_text(yaml.dump(conf))

    rng = np.random.default_rng(0)
    src = tmp_path / "in.png"
    save_image(rng.uniform(size=(64, 64, 3)).astype(np.float32), src)
    old = tiling.TILE, tiling.STRIDE
    try:
        out = hq.main([
            "--config", str(cfg), "--deg", "colorization",
            "--path_y", str(src), "--random_init",
            "-i", str(tmp_path / "hq"),
        ])
        assert (tiling.TILE, tiling.STRIDE) == (32, 16)
        assert out["final"].shape[1:] == (64, 64, 3)
        assert np.isfinite(out["final"]).all()
        # 3x3 grid -> per-tile intermediates for every tile position
        tiles = list((tmp_path / "hq" / "tiles").glob("*.png"))
        assert len(tiles) == 9, sorted(t.name for t in tiles)
    finally:
        tiling.TILE, tiling.STRIDE = old
