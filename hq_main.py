#!/usr/bin/env python
"""hq pipeline CLI: arbitrary-size DDNM restoration with Mask-Shift tiling.

Flag-compatible with the reference's hq_demo/main.py:171-214
(--config --deg --sigma_y -i --scale --resize_y --path_y --class) plus the
TPU-native extras (--ckpt/--classifier_ckpt/--random_init/--seed/--dtype).

Example (mirroring hq_demo/evaluation.sh):

  python hq_main.py --config configs/hq/inet256.yml --path_y data/orange.png \
      --deg sr_averagepooling --scale 4 --resize_y --class 950 -i exp/hq_out
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native DDNM hq (Mask-Shift) demo")
    p.add_argument("--config", type=str, default="configs/hq/inet256.yml")
    p.add_argument("--deg", type=str, required=True,
                   help="sr_averagepooling | inpainting | mask_color_sr | colorization | sr_color")
    p.add_argument("--sigma_y", type=float, default=0.0)
    p.add_argument("-i", "--image_folder", type=str, default="exp/hq_out")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--resize_y", action="store_true",
                   help="treat --path_y as the low-res measurement and upsample it")
    p.add_argument("--path_y", type=str, required=True, help="input image path")
    p.add_argument("--class", dest="class_label", type=int, default=None)
    p.add_argument("--mask_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=1234)
    # TPU-native extras
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--classifier_ckpt", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--parallel_tiles", action="store_true",
                   help="batch independent wavefront tiles into one sampler call "
                        "(exact dependency semantics; see ddnm_tpu/tiling.py); "
                        "implies --fresh_tile_init")
    p.add_argument("--fresh_tile_init", action="store_true",
                   help="start every tile from fresh gaussian noise instead of "
                        "the reference's carried image_after_step "
                        "(gaussian_diffusion.py:572-575)")
    p.add_argument("--encoder_cache", type=int, default=1,
                   help=">1: reuse UNet encoder features across this many "
                        "model calls (approximate Faster-Diffusion accel, "
                        "see ddnm_tpu/sampling/accel.py)")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial partitioning: shard each tile's rows over "
                        "this many chips (ddnm_tpu/parallel/spatial.py); "
                        "scales even the sequential tile chain")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh axis for wavefront tile batches "
                        "(combine with --parallel_tiles)")
    p.add_argument("--resume", action="store_true",
                   help="checkpoint the canvas after every tile group under "
                        "-i and resume an interrupted run at tile "
                        "granularity (same seed/flags required)")
    return p.parse_args(argv)


def build_adm_from_hq(conf, dtype):
    """ADM UNet from a flat hq config (channel_mult by size as in the
    reference's create_model, script_util.py:149-185)."""
    import jax.numpy as jnp
    from ddnm_tpu.models import ADMUNet

    size = int(conf.image_size or 256)
    mult_by_size = {512: (0.5, 1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
                    128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4)}
    if conf.channel_mult:
        mult = tuple(int(m) for m in str(conf.channel_mult).split(","))
    else:
        mult = mult_by_size[size]
    attn_ds = tuple(
        size // int(r) for r in str(conf.attention_resolutions).split(",")
    )
    return ADMUNet(
        image_size=size,
        model_channels=int(conf.num_channels),
        num_res_blocks=int(conf.num_res_blocks),
        attention_resolutions=attn_ds,
        channel_mult=mult,
        num_heads=int(conf.num_heads or 4),
        num_head_channels=int(conf.num_head_channels or 64),
        use_scale_shift_norm=bool(conf.use_scale_shift_norm),
        resblock_updown=bool(conf.resblock_updown),
        use_new_attention_order=bool(conf.use_new_attention_order),
        out_channels=6 if conf.learn_sigma else 3,
        num_classes=1000 if conf.class_cond else None,
        dtype=dtype,
    )


def main(argv=None):
    ns = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    logger = logging.getLogger("ddnm_tpu")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ddnm_tpu.utils import apply_platform_env, enable_compilation_cache, jit_init

    apply_platform_env()
    from ddnm_tpu.parallel.multihost import maybe_init_distributed

    maybe_init_distributed()
    enable_compilation_cache()

    from ddnm_tpu.config import load_hq_config
    from ddnm_tpu.data.io import load_image, load_mask, save_image
    from ddnm_tpu.models import ADMClassifier, classifier_guidance_fn
    from ddnm_tpu.data.checkpoints import load_params
    from ddnm_tpu.sampling.posterior import build_posterior_tables
    from ddnm_tpu.schedules import named_beta_schedule
    from ddnm_tpu.tiling import mask_shift_sample

    cfg_path = Path(ns.config)
    if not cfg_path.exists():
        cfg_path = REPO_ROOT / ns.config
    conf = load_hq_config(cfg_path)
    dtype = jnp.bfloat16 if ns.dtype == "bfloat16" else jnp.float32

    key = jax.random.PRNGKey(ns.seed)
    key, k_model = jax.random.split(key)

    model = build_adm_from_hq(conf, dtype)
    size = int(conf.image_size or 256)
    ckpt = ns.ckpt or conf.model_path
    if ckpt and Path(ckpt).exists():
        logger.info("loading checkpoint %s", ckpt)
        params = load_params(ckpt)
    elif ns.random_init:
        logger.warning("random-init model — smoke mode")
        dummy = (jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))
        if conf.class_cond:
            params = jit_init(model, k_model, *dummy, jnp.zeros((1,), jnp.int32))
        else:
            params = jit_init(model, k_model, *dummy)
    else:
        raise FileNotFoundError("pass --ckpt (torch .pt to convert) or --random_init")

    from ddnm_tpu.sampling.accel import adm_split_fns

    if conf.class_cond:
        label = ns.class_label if ns.class_label is not None else 0
        classes = jnp.full((1,), label, dtype=jnp.int32)

        def model_fn(p, x, t):
            # batch-size agnostic (wavefront tiling batches vary)
            cls = jnp.full((x.shape[0],), label, dtype=jnp.int32)
            return model.apply(p["model"], x, t, cls)
    else:
        label = None

        def model_fn(p, x, t):
            return model.apply(p["model"], x, t)

    # encoder-propagation split forwards (sampling/accel.py; opt-in) —
    # rebased onto the model-params subtree the tiling run_params carry
    _enc, _dec = adm_split_fns(model, label=label)
    encode_fn = lambda p, x, t: _enc(p["model"], x, t)
    decode_fn = lambda p, cache, x, t: _dec(p["model"], cache, x, t)

    guidance_fn = None
    cparams = None
    cckpt = ns.classifier_ckpt or conf.classifier_path
    if conf.class_cond and float(conf.classifier_scale or 0) > 0:
        clf = ADMClassifier(
            image_size=size,
            model_channels=int(conf.classifier_width),
            num_res_blocks=int(conf.classifier_depth),
            attention_resolutions=tuple(
                size // int(r)
                for r in str(conf.classifier_attention_resolutions).split(",")
            ),
            channel_mult=(1, 1, 2, 2, 4, 4),
            use_scale_shift_norm=bool(conf.classifier_use_scale_shift_norm),
            resblock_updown=bool(conf.classifier_resblock_updown),
            pool=str(conf.classifier_pool),
            dtype=dtype,
        )
        if cckpt and Path(cckpt).exists():
            cparams = load_params(cckpt)
        elif ns.random_init:
            cparams = jit_init(clf, k_model, jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))
        else:
            raise FileNotFoundError(
                "classifier_scale > 0 but no classifier checkpoint at "
                f"{cckpt!r}; pass --classifier_ckpt or --random_init"
            )
        guidance_fn = classifier_guidance_fn(
            clf.apply, classes, float(conf.classifier_scale)
        )

    betas = named_beta_schedule(
        str(conf.noise_schedule or "linear"),
        int(conf.diffusion_steps or 1000),
        use_scale=True,
    )
    tables = build_posterior_tables(
        betas=betas,
        timestep_respacing=str(conf.timestep_respacing or "100"),
        sigma_y=ns.sigma_y,
        schedule_jump_params=dict(conf.schedule_jump_params or {}),
        time_shift=(1 if conf.inpa_inj_time_shift is None
                    else int(conf.inpa_inj_time_shift)),
    )

    gt = load_image(ns.path_y)  # (H, W, 3) float32 in [0, 1]
    gt = (gt * 2.0 - 1.0)[None]
    mask = load_mask(ns.mask_path) if ns.mask_path else None

    run_params = {"model": params}
    if cparams is not None:
        run_params["classifier"] = cparams
    out_dir = Path(ns.image_folder)
    (out_dir / "tiles").mkdir(parents=True, exist_ok=True)
    try:
        import sys as _sys

        from tqdm import tqdm

        pbar = tqdm(desc="tiles", disable=not _sys.stderr.isatty())
    except ImportError:  # pragma: no cover
        pbar = None

    def progress(tile, x0_np):
        # per-tile intermediate save (the reference dumps intermediates under
        # results/<save_path>/<shift_h>_<shift_w>, gaussian_diffusion.py:382-386)
        i, j = tile.index
        save_image(
            np.clip((x0_np[0] + 1.0) / 2.0, 0.0, 1.0),
            out_dir / "tiles" / f"{i}_{j}.png",
        )
        if pbar is not None:
            pbar.update(1)

    mesh = None
    if ns.dp > 1 or ns.sp > 1:
        from ddnm_tpu.parallel import make_mesh_2d, replicate

        if ns.sp > 1 and 256 % ns.sp != 0:
            raise SystemExit(
                f"--sp {ns.sp} must divide the 256-px tile height "
                "(use 2, 4, 8, ...)"
            )
        mesh = make_mesh_2d(ns.dp, ns.sp)
        run_params = replicate(mesh, run_params)

    out = mask_shift_sample(
        model_fn, gt, ns.deg, tables, key,
        scale=ns.scale, resize_y=ns.resize_y, mask=mask, guidance_fn=guidance_fn,
        params=run_params, parallel=ns.parallel_tiles, progress_fn=progress,
        tile_init="fresh" if (ns.parallel_tiles or ns.fresh_tile_init) else "carry",
        encoder_cache=ns.encoder_cache, encode_fn=encode_fn, decode_fn=decode_fn,
        mesh=mesh,
        checkpoint_dir=out_dir if ns.resume else None, resume=ns.resume,
        resume_salt=(ns.class_label, float(conf.classifier_scale or 0),
                     ns.sigma_y, ns.dtype),
    )
    if pbar is not None:
        pbar.close()

    to01 = lambda a: np.clip((a + 1.0) / 2.0, 0.0, 1.0)
    save_image(to01(out["final"][0]), out_dir / "final.png")
    save_image(to01(out["apy"][0]), out_dir / "Apy.png")
    save_image(to01(out["y"][0]), out_dir / "y.png")
    logger.info("wrote %s", out_dir / "final.png")
    return out


if __name__ == "__main__":
    main()
