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
    p.add_argument("--path_y", type=str, default=None,
                   help="input image path (single-image mode)")
    p.add_argument("--class", dest="class_label", type=int, default=None)
    p.add_argument("--mask_path", type=str, default=None)
    # dataset sweep mode (the reference's conf-declared eval dataset,
    # hq_demo/conf_mgt/conf_base.py:60-106 + image_datasets.py:29-106):
    # iterate filename-paired gt/mask trees and write the reference's
    # srs/lrs/gts/gt_keep_masks output tree
    p.add_argument("--gt_path", type=str, default=None,
                   help="directory of ground-truth images (dataset sweep "
                        "mode; overrides the conf's data.eval entry)")
    p.add_argument("--mask_path_dir", type=str, default=None,
                   help="directory of keep-masks paired with --gt_path by "
                        "filename")
    p.add_argument("--max_len", type=int, default=None,
                   help="cap the number of gt/mask pairs in sweep mode")
    p.add_argument("--sweep_batch", type=int, default=1,
                   help="batch this many sweep images into one sampler call "
                        "(single-tile 256px canvases only; bit-identical "
                        "per image to the sequential sweep — see "
                        "ddnm_tpu/tiling.py batched_tile_sample)")
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
    p.add_argument("--solver", type=str, default="ddim",
                   choices=["ddim", "multistep"],
                   help="posterior transition: 'ddim' = the reference's "
                        "stochastic posterior update (default), 'multistep' "
                        "= second-order deterministic data-prediction "
                        "solver (noise-free only; best at <=10-step "
                        "respacing budgets — sampling/solvers.py)")
    p.add_argument("--encoder_cache", type=int, default=1,
                   help=">1: reuse UNet encoder features across this many "
                        "model calls (approximate Faster-Diffusion accel, "
                        "see ddnm_tpu/sampling/accel.py)")
    p.add_argument("--encoder_cache_policy", type=str, default="uniform",
                   choices=["uniform", "end_dense"],
                   help="key-step placement for --encoder_cache: end_dense "
                        "holds quality at much deeper budgets (measured; "
                        "docs/PERFORMANCE.md)")
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


def build_classifier_from_hq(conf, dtype):
    """ADM classifier from a flat hq config — shared by hq_main and
    serve.py --hq_conf. Standard sizes go through ADMClassifier.from_config
    (channel_mult derived from image_size like the reference's
    create_classifier, script_util.py:229-252); a conf-provided
    classifier_channel_mult overrides it (toy/test sizes)."""
    from ddnm_tpu.models import ADMClassifier

    size = int(conf.image_size or 256)
    if conf.classifier_channel_mult:
        mult = tuple(
            int(m) for m in str(conf.classifier_channel_mult).split(","))
        return ADMClassifier(
            image_size=size,
            model_channels=int(conf.classifier_width),
            num_res_blocks=int(conf.classifier_depth),
            attention_resolutions=tuple(
                size // int(r)
                for r in str(conf.classifier_attention_resolutions).split(",")
            ),
            channel_mult=mult,
            use_scale_shift_norm=bool(conf.classifier_use_scale_shift_norm),
            resblock_updown=bool(conf.classifier_resblock_updown),
            pool=str(conf.classifier_pool),
            dtype=dtype,
        )
    return ADMClassifier.from_config(conf, image_size=size, dtype=dtype)


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
    # scale the Mask-Shift geometry to the model's native tile size, keeping
    # the reference's 2:1 tile:stride overlap (its assets are all 256px so it
    # hard-codes 256/128; a 128px prior must tile at 128 — running tiles at
    # 2x the trained resolution quadruples the attention token count per
    # grid and quietly degrades quality). Same pattern as the golden tools.
    from ddnm_tpu import tiling as _tiling

    _tiling.TILE, _tiling.STRIDE = size, size // 2
    ckpt = ns.ckpt or conf.model_path
    dummy = (jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))
    if conf.class_cond:
        dummy = dummy + (jnp.zeros((1,), jnp.int32),)
    if ckpt and Path(ckpt).exists():
        logger.info("loading checkpoint %s", ckpt)
        # strict load: converted tree must match the model's own structure
        expected = jax.eval_shape(model.init, k_model, *dummy)
        params = load_params(ckpt, expected=expected)
    elif ns.random_init:
        logger.warning("random-init model — smoke mode")
        params = jit_init(model, k_model, *dummy)
    else:
        raise FileNotFoundError("pass --ckpt (torch .pt to convert) or --random_init")
    if ns.dtype == "bfloat16":
        # store params bf16-resident too: at batch 1 the UNet is weight-
        # bandwidth bound, so halving stored weight bytes halves the
        # dominant HBM stream (GroupNorm still computes fp32 internally)
        from ddnm_tpu.models import cast_torso

        params = cast_torso(params, jnp.bfloat16)

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
        clf = build_classifier_from_hq(conf, dtype)
        if cckpt and Path(cckpt).exists():
            cparams = load_params(
                cckpt,
                expected=jax.eval_shape(
                    clf.init, k_model, jnp.zeros((1, size, size, 3)),
                    jnp.zeros((1,)),
                ),
            )
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

    run_params = {"model": params}
    if cparams is not None:
        run_params["classifier"] = cparams
    out_dir = Path(ns.image_folder)

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

    to01 = lambda a: np.clip((a + 1.0) / 2.0, 0.0, 1.0)

    def run_one(gt, mask, run_key, tiles_dir, salt):
        """One Mask-Shift restoration; returns the tiling output dict."""
        tiles_dir.mkdir(parents=True, exist_ok=True)
        try:
            import sys as _sys

            from tqdm import tqdm

            pbar = tqdm(desc="tiles", disable=not _sys.stderr.isatty())
        except ImportError:  # pragma: no cover
            pbar = None

        def progress(tile, x0_np):
            # per-tile intermediate save (the reference dumps intermediates
            # under results/<save_path>/<shift_h>_<shift_w>,
            # gaussian_diffusion.py:382-386)
            i, j = tile.index
            save_image(to01(x0_np[0]), tiles_dir / f"{i}_{j}.png")
            if pbar is not None:
                pbar.update(1)

        out = mask_shift_sample(
            model_fn, gt, ns.deg, tables, run_key,
            scale=ns.scale, resize_y=ns.resize_y, mask=mask,
            guidance_fn=guidance_fn,
            params=run_params, parallel=ns.parallel_tiles, progress_fn=progress,
            tile_init="fresh" if (ns.parallel_tiles or ns.fresh_tile_init) else "carry",
            encoder_cache=ns.encoder_cache,
            encoder_cache_policy=ns.encoder_cache_policy,
            encode_fn=encode_fn, decode_fn=decode_fn,
            mesh=mesh,
            checkpoint_dir=tiles_dir if ns.resume else None, resume=ns.resume,
            resume_salt=salt, solver=ns.solver,
        )
        if pbar is not None:
            pbar.close()
        return out

    base_salt = (ns.class_label, float(conf.classifier_scale or 0),
                 ns.sigma_y, ns.dtype)

    # --- dataset sweep mode (conf-declared eval dataset or --gt_path) ----
    # An explicit --path_y always means single-image mode, even when the
    # conf declares a data.eval dataset (which configs/hq/face256.yml does).
    eval_ds = None
    data_eval = conf.pget("data.eval")
    if (isinstance(data_eval, dict) and data_eval
            and ns.gt_path is None and ns.path_y is None):
        eval_name = next(iter(data_eval))
        eval_ds = dict(data_eval[eval_name] or {})
    if ns.gt_path is not None:
        if ns.mask_path_dir is None:
            raise SystemExit("--gt_path needs --mask_path_dir (filename-paired)")
        eval_ds = {"gt_path": ns.gt_path, "mask_path": ns.mask_path_dir,
                   "image_size": size, "max_len": ns.max_len}

    if eval_ds is not None:
        from ddnm_tpu.data.inpaint_pairs import InpaintPairs

        pairs = InpaintPairs(
            eval_ds["gt_path"], eval_ds["mask_path"],
            image_size=int(eval_ds.get("image_size") or size),
            max_len=(ns.max_len if ns.max_len is not None
                     else eval_ds.get("max_len")),
        )
        # output tree: conf-declared paths (conf_base.py:81-106) with the
        # reference's default names under -i otherwise
        paths = dict(eval_ds.get("paths") or {})
        tree = {
            "srs": Path(paths.get("srs") or out_dir / "srs"),
            "lrs": Path(paths.get("lrs") or out_dir / "lrs"),
            "gts": Path(paths.get("gts") or out_dir / "gts"),
            "gt_keep_masks": Path(paths.get("gt_keep_masks")
                                  or out_dir / "gt_keep_masks"),
        }
        for p in tree.values():
            p.mkdir(parents=True, exist_ok=True)
        from ddnm_tpu.data.metrics import ssim as _ssim

        def write_outputs(idx, name, gt, mask, final, apy):
            final01 = to01(final)
            gt01 = to01(gt)
            save_image(final01, tree["srs"] / name)
            save_image(to01(apy), tree["lrs"] / name)  # gt_masked
            save_image(gt01, tree["gts"] / name)
            save_image(mask, tree["gt_keep_masks"] / name)
            mse = float(np.mean((final01 - gt01) ** 2))
            p = 10.0 * np.log10(1.0 / max(mse, 1e-12))
            s = float(_ssim(final01[None], gt01[None])[0])
            psnrs.append(p)
            ssims.append(s)
            logger.info("[%d/%d] %s PSNR %.2f SSIM %.3f",
                        idx + 1, len(pairs), name, p, s)

        sweep_batch = max(1, int(ns.sweep_batch))
        pair_size = int(eval_ds.get("image_size") or size)
        if sweep_batch > 1 and (ns.resize_y or pair_size != 256 or ns.resume):
            logger.warning(
                "--sweep_batch needs single-tile 256px canvases and no "
                "--resume — falling back to the per-image sweep")
            sweep_batch = 1

        psnrs, ssims = [], []
        if sweep_batch > 1:
            from ddnm_tpu.tiling import batched_tile_sample

            items = list(pairs)
            for c0 in range(0, len(items), sweep_batch):
                chunk = items[c0 : c0 + sweep_batch]
                gts = np.stack([it["GT"] for it in chunk])
                masks = [it["gt_keep_mask"][..., 0] for it in chunk]
                run_keys = [jax.random.fold_in(key, c0 + i)
                            for i in range(len(chunk))]
                out = batched_tile_sample(
                    model_fn, gts, ns.deg, tables, run_keys,
                    scale=ns.scale, masks=masks, guidance_fn=guidance_fn,
                    params=run_params, mesh=mesh,
                    encoder_cache=ns.encoder_cache,
                    encoder_cache_policy=ns.encoder_cache_policy,
                    encode_fn=encode_fn, decode_fn=decode_fn,
                    solver=ns.solver,
                )
                for i, it in enumerate(chunk):
                    write_outputs(c0 + i, it["GT_name"], it["GT"], masks[i],
                                  out["final"][i], out["apy"][i])
        else:
            for idx, item in enumerate(pairs):
                name = item["GT_name"]
                gt = item["GT"][None]
                mask = item["gt_keep_mask"][..., 0]  # (H, W): as_mask convention
                run_key = jax.random.fold_in(key, idx)
                out = run_one(gt, mask, run_key,
                              out_dir / "tiles" / Path(name).stem,
                              base_salt + (name,))
                write_outputs(idx, name, gt[0], mask,
                              out["final"][0], out["apy"][0])
        logger.info("sweep done: %d pairs, avg PSNR %.2f, avg SSIM %.3f",
                    len(psnrs), float(np.mean(psnrs)), float(np.mean(ssims)))
        return {"psnr": psnrs, "ssim": ssims, "tree": tree}

    # --- single-image mode ----------------------------------------------
    if ns.path_y is None:
        raise SystemExit("pass --path_y (single image) or --gt_path + "
                         "--mask_path_dir / a conf data.eval entry (sweep)")
    gt = load_image(ns.path_y)  # (H, W, 3) float32 in [0, 1]
    gt = (gt * 2.0 - 1.0)[None]
    mask = load_mask(ns.mask_path) if ns.mask_path else None

    out = run_one(gt, mask, key, out_dir / "tiles", base_salt)
    save_image(to01(out["final"][0]), out_dir / "final.png")
    save_image(to01(out["apy"][0]), out_dir / "Apy.png")
    save_image(to01(out["y"][0]), out_dir / "y.png")
    logger.info("wrote %s", out_dir / "final.png")
    return out


if __name__ == "__main__":
    main()
