"""Restoration runner: orchestrates config -> model -> operator -> sampler.

The TPU-native counterpart of the reference's Diffusion class
(guided_diffusion/diffusion.py:79-610), unified across both modes:

  - one code path hosts simplified (functional A/A+) and SVD operators;
  - sampling is batched (the reference enforces batch_size 1,
    diffusion.py:308-309) and the whole trajectory is one jitted scan;
  - per-image PNG writes happen on host asynchronously after device work.

Checkpoints: the reference downloads pickled torch state dicts on miss
(ckpt_util.py). Here a `--ckpt` path is converted on load; without a
checkpoint, `--random-init` builds random weights (smoke tests / benchmarks).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu.config import Config
from ddnm_tpu.data.datasets import get_dataset, iterate_batches
from ddnm_tpu.data.io import load_mask, save_image
from ddnm_tpu.data.metrics import psnr, ssim
from ddnm_tpu.data.noise import add_noise
from ddnm_tpu.data.transforms import data_transform, inverse_data_transform
from ddnm_tpu.models import DDPMUNet, ADMUNet, ADMClassifier, classifier_guidance_fn
from ddnm_tpu.data.checkpoints import load_params
from ddnm_tpu.operators import build_functional_operator, build_svd_operator
from ddnm_tpu.sampling import build_schedule, sample_simplified, sample_svd
from ddnm_tpu.sampling.accel import sample_simplified_encoder_prop
from ddnm_tpu.utils import MetricsLogger, jit_init, profile
from ddnm_tpu import schedules as sch

logger = logging.getLogger("ddnm_tpu")

__all__ = ["RunArgs", "Runner"]

# reference svd_ddnm.py:7 — classifier-guided runs force this ImageNet class
GUIDED_CLASS = 951


def _add_noise_per_image(keys, y, sigma: float, noise_type: str):
    """add_noise with one key per batch element (runner per-image streams)."""
    if sigma <= 0.0:
        return y
    return jax.vmap(lambda k, yi: add_noise(k, yi, sigma, noise_type))(keys, y)


@dataclasses.dataclass
class RunArgs:
    """CLI-facing arguments (superset of the reference's main.py:19-90)."""

    config: str = ""
    deg: str = "sr_averagepooling"
    deg_scale: float = 4.0
    sigma_y: float = 0.0
    eta: float = 0.85
    seed: int = 1234
    exp: str = "exp"
    path_y: str = "celeba_hq"
    image_folder: str = "output"
    simplified: bool = False
    add_noise: bool = False
    noise_type: str = "gaussian"
    trace_dir: Optional[str] = None
    subset_start: int = -1
    subset_end: int = -1
    # ours
    ckpt: Optional[str] = None
    classifier_ckpt: Optional[str] = None
    random_init: bool = False
    batch_size: Optional[int] = None
    dtype: str = "float32"  # model torso dtype: float32 | bfloat16
    mask_path: Optional[str] = None
    manifest: Optional[str] = None
    max_images: Optional[int] = None
    resume: bool = False  # skip images whose output PNG already exists
    loop: str = "auto"  # sampler loop driver: auto | scan | host
    solver: str = "ddim"  # trajectory solver: ddim | multistep (noise-free)
    encoder_cache: int = 1  # >1: approximate encoder-propagation accel
    # key-step placement for --encoder_cache: "uniform" (every k-th call)
    # or "end_dense" (same budget, exact tail — measured to hold exact
    # quality at much deeper budgets, see docs/PERFORMANCE.md)
    encoder_cache_policy: str = "uniform"


class Runner:
    def __init__(self, args: RunArgs, config: Config):
        self.args = args
        self.config = config
        self.betas = sch.get_beta_schedule(
            config.diffusion.beta_schedule,
            beta_start=config.diffusion.beta_start,
            beta_end=config.diffusion.beta_end,
            num_diffusion_timesteps=config.diffusion.num_diffusion_timesteps,
        ).astype(np.float32)
        self.sched = build_schedule(
            betas=self.betas,
            t_sampling=config.time_travel.T_sampling,
            travel_length=config.time_travel.travel_length,
            travel_repeat=config.time_travel.travel_repeat,
        )
        self.dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        if args.solver == "multistep":
            if args.sigma_y != 0.0 or args.add_noise:
                raise ValueError(
                    "--solver multistep is deterministic and supports "
                    "noise-free tasks only (sigma_y == 0, no --add_noise)"
                )
            if args.encoder_cache > 1:
                raise ValueError(
                    "--solver multistep does not compose with "
                    "--encoder_cache (the encoder-propagation sampler is "
                    "DDIM-only); drop one of the two"
                )

    # ------------------------------------------------------------------ model
    def build_model(self, rng: jax.Array):
        cfg, args = self.config, self.args
        size = cfg.data.image_size
        if cfg.model.type == "simple":
            model = DDPMUNet.from_config(cfg, dtype=self.dtype)
        elif cfg.model.type == "openai":
            model = ADMUNet.from_config(cfg, dtype=self.dtype)
        else:
            raise ValueError(f"unknown model type {cfg.model.type}")

        dummy = (jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))
        if cfg.model.type == "openai" and cfg.model.class_cond:
            dummy = dummy + (jnp.zeros((1,), jnp.int32),)
        if args.ckpt and Path(args.ckpt).exists():
            logger.info("loading checkpoint %s", args.ckpt)
            # strict: converted tree must match the model's own structure
            params = load_params(
                args.ckpt, expected=jax.eval_shape(model.init, rng, *dummy)
            )
        elif args.random_init:
            logger.warning("random-init model (no checkpoint) — smoke/bench mode")
            params = jit_init(model, rng, *dummy)
        else:
            raise FileNotFoundError(
                f"checkpoint {args.ckpt!r} not found; pass --ckpt or --random-init"
            )
        if self.dtype == jnp.bfloat16:
            # bf16-resident weights: halves the dominant HBM stream for
            # small-batch sampling (GroupNorm still computes fp32)
            from ddnm_tpu.models import cast_torso

            params = cast_torso(params, jnp.bfloat16)

        self._model = model
        self._params = params
        class_cond = cfg.model.type == "openai" and cfg.model.class_cond
        if class_cond:
            classes = jnp.full((self.batch_size,), GUIDED_CLASS, dtype=jnp.int32)

            def model_fn(p, x, t):
                return model.apply(p["model"], x, t, classes)

        else:

            def model_fn(p, x, t):
                return model.apply(p["model"], x, t)

        guidance_fn = None
        if class_cond and cfg.classifier is not None:
            clf = ADMClassifier.from_config(cfg.classifier, size, dtype=self.dtype)
            if args.classifier_ckpt and Path(args.classifier_ckpt).exists():
                cparams = load_params(
                    args.classifier_ckpt,
                    expected=jax.eval_shape(
                        clf.init, rng, jnp.zeros((1, size, size, 3)),
                        jnp.zeros((1,)),
                    ),
                )
            elif args.random_init:
                cparams = jit_init(clf, rng, jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))
            else:
                raise FileNotFoundError("classifier checkpoint missing")
            guidance_fn = classifier_guidance_fn(
                clf.apply, jnp.full((self.batch_size,), GUIDED_CLASS, jnp.int32),
                cfg.classifier.classifier_scale,
            )
        else:
            cparams = None
        run_params = {"model": params}
        if cparams is not None:
            run_params["classifier"] = cparams
        return model_fn, guidance_fn, run_params

    def _encoder_key_steps(self):
        """key_steps for --encoder_cache_policy (None = uniform interval)."""
        from ddnm_tpu.sampling.accel import key_steps_for_policy, n_model_calls

        n_calls = n_model_calls(self.sched.is_travel)
        return key_steps_for_policy(
            n_calls, self.args.encoder_cache, self.args.encoder_cache_policy
        )

    def _split_fns(self):
        """(encode_fn, decode_fn) for --encoder_cache, built once per run
        (the closures are jit static args — rebuilding would retrace)."""
        if getattr(self, "_split_pair", None) is None:
            from ddnm_tpu.sampling.accel import adm_split_fns, ddpm_split_fns

            if self.config.model.type == "simple":
                self._split_pair = ddpm_split_fns(self._model)
            else:
                label = GUIDED_CLASS if self.config.model.class_cond else None
                self._split_pair = adm_split_fns(self._model, label=label)
        return self._split_pair

    # -------------------------------------------------------------- operators
    def _mask(self) -> np.ndarray:
        path = self.args.mask_path
        if path is None:
            # reference default asset location (diffusion.py:256,465)
            default = Path(self.args.exp) / "inp_masks" / "mask.npy"
            if default.exists():
                mask = load_mask(default)
            else:
                raise ValueError(
                    f"task {self.args.deg} needs --mask_path (or {default})"
                )
        else:
            mask = load_mask(path)
        # the reference indexes the mask into a fixed-size image and crashes
        # on size mismatch (its assets are all 256px); at other resolutions
        # nearest-resize the {0,1} mask instead of failing (round-5 find:
        # the 128px ADM eval sweep hit index-out-of-bounds on the default)
        size = self.config.data.image_size
        if mask.ndim >= 2 and mask.shape[-2:] != (size, size):
            logger.info(
                "resizing %sx%s mask to %dpx (nearest)",
                mask.shape[-2], mask.shape[-1], size,
            )
            ys = (np.arange(size) * mask.shape[-2] // size).astype(np.int64)
            xs = (np.arange(size) * mask.shape[-1] // size).astype(np.int64)
            mask = mask[..., ys[:, None], xs[None, :]]
        return mask

    def build_operator(self):
        args, cfg = self.args, self.config
        needs_mask = args.deg in ("inpainting", "mask_color_sr", "diy")
        mask = self._mask() if needs_mask else None
        if args.simplified:
            return build_functional_operator(
                args.deg,
                image_size=cfg.data.image_size,
                deg_scale=args.deg_scale,
                mask=mask,
            )
        return build_svd_operator(
            args.deg,
            channels=cfg.data.channels,
            image_size=cfg.data.image_size,
            deg_scale=args.deg_scale,
            mask=mask,
            seed=args.seed,
        )

    # ------------------------------------------------------------------- data
    @property
    def batch_size(self) -> int:
        return self.args.batch_size or self.config.sampling.batch_size

    def build_dataset(self):
        args, cfg = self.args, self.config
        root = Path(args.path_y)
        if not root.is_absolute():
            root = Path(args.exp) / "datasets" / args.path_y
        subset = None
        if args.subset_start >= 0 and args.subset_end > 0:
            subset = (args.subset_start, args.subset_end)
        ds = get_dataset(
            cfg.data.dataset,
            root=root,
            image_size=cfg.data.image_size,
            manifest=args.manifest,
            subset=subset,
            out_of_dist=bool(getattr(cfg.data, "out_of_dist", False)),
        )
        if args.max_images:
            # global cap, applied BEFORE the per-process slice so a
            # multi-host run covers the same (prefix) image set as a
            # single-host run
            ds.paths = ds.paths[: args.max_images]
            if hasattr(ds, "labels"):
                ds.labels = ds.labels[: args.max_images]
        if subset is None and jax.process_count() > 1:
            # multi-host: every process takes a disjoint contiguous slice
            # (the automated form of the reference's manual
            # --subset_start/--subset_end sharding; parallel/multihost.py)
            from ddnm_tpu.parallel.multihost import process_subset

            s, e = process_subset(len(ds.paths))
            ds.paths = ds.paths[s:e]
            if hasattr(ds, "labels"):
                ds.labels = ds.labels[s:e]
            args.subset_start = s  # output indices / resume stay global
            logger.info(
                "multi-host: process %d/%d takes images [%d, %d)",
                jax.process_index(), jax.process_count(), s, e,
            )
        return ds

    # ---------------------------------------------------------------- running
    def run(self) -> dict:
        args, cfg = self.args, self.config
        key = jax.random.PRNGKey(args.seed)
        key, model_key = jax.random.split(key)

        model_fn, guidance_fn, run_params = self.build_model(model_key)
        operator = self.build_operator()
        dataset = self.build_dataset()
        logger.info("dataset size %d, batch size %d", len(dataset), self.batch_size)

        # multi-chip: shard the image batch over a 1-D data mesh; sharded
        # inputs propagate through the jitted samplers (params replicate)
        mesh = None
        if jax.device_count() > 1 and self.batch_size % jax.device_count() == 0:
            from ddnm_tpu.parallel import make_mesh, shard_batch

            mesh = make_mesh()
            logger.info("sharding batch over %d devices", jax.device_count())

        # reference scales sigma_y once for the [-1,1] domain (diffusion.py:294)
        sigma_y = 2.0 * args.sigma_y

        out_dir = Path(args.image_folder)
        (out_dir / "Apy").mkdir(parents=True, exist_ok=True)

        size = cfg.data.image_size
        total_psnr, count = 0.0, 0
        idx_so_far = max(args.subset_start, 0)
        metrics = MetricsLogger(out_dir / "metrics.jsonl")
        wall_start = time.perf_counter()
        prof = profile(args.trace_dir) if args.trace_dir else None
        if prof is not None:
            prof.__enter__()

        from concurrent.futures import ThreadPoolExecutor

        io_pool = ThreadPoolExecutor(max_workers=4)
        save_futures: list = []
        pending = None  # previous batch awaiting host-side processing

        def drain(x, x_orig, apy, valid, idx0):
            nonlocal total_psnr, count
            x01 = inverse_data_transform(x, rescaled=cfg.data.rescaled)
            orig01 = inverse_data_transform(x_orig, rescaled=cfg.data.rescaled)
            apy01 = inverse_data_transform(apy, rescaled=cfg.data.rescaled)
            batch_psnr = np.asarray(psnr(x01, orig01))
            batch_ssim = np.asarray(ssim(x01, orig01))
            x01_np = np.asarray(x01)
            apy_np = np.asarray(apy01)
            orig_np = np.asarray(orig01)
            for i in range(valid):
                save_futures.append(io_pool.submit(
                    save_image, apy_np[i], out_dir / "Apy" / f"Apy_{idx0 + i}.png"))
                save_futures.append(io_pool.submit(
                    save_image, orig_np[i], out_dir / "Apy" / f"orig_{idx0 + i}.png"))
                save_futures.append(io_pool.submit(
                    save_image, x01_np[i], out_dir / f"{idx0 + i}_0.png"))
                total_psnr += float(batch_psnr[i])
                count += 1
            metrics.logkv_mean("psnr", float(np.mean(batch_psnr[:valid])))
            metrics.logkv_mean("ssim", float(np.mean(batch_ssim[:valid])))
            metrics.logkv("images", count)
            metrics.logkv(
                "images_per_sec", count / (time.perf_counter() - wall_start)
            )
            metrics.dumpkvs()
            logger.info("PSNR: %.2f", total_psnr / max(count, 1))
        try:
            import sys as _sys

            from tqdm import tqdm

            n_batches = -(-len(dataset) // self.batch_size)
            pbar = tqdm(total=n_batches, desc="batches",
                        disable=not _sys.stderr.isatty())
        except ImportError:  # pragma: no cover
            pbar = None

        for imgs, labels, valid in iterate_batches(dataset, self.batch_size):
            if pbar is not None:
                pbar.update(1)
                if count:
                    # running PSNR on the bar (reference diffusion.py:411)
                    pbar.set_description(f"PSNR: {total_psnr / count:.2f}")
            if args.resume and all(
                (out_dir / f"{idx_so_far + i}_0.png").exists()
                for i in range(valid)
            ):
                logger.info("resume: skipping images %d..%d", idx_so_far,
                            idx_so_far + valid - 1)
                idx_so_far += valid
                continue
            x_orig = data_transform(jnp.asarray(imgs), rescaled=cfg.data.rescaled)
            # Per-image RNG streams keyed by GLOBAL dataset index: every
            # image's init/measurement-noise/sampling draws depend only on
            # (seed, index), so outputs are invariant to --batch_size,
            # --resume history, host count and mesh shape. This matches the
            # reference's semantics more closely than a per-batch stream:
            # the reference runs batch 1 (diffusion.py:308-309), i.e. an
            # independent randn stream per image. Samplers consume the
            # stacked k_samp as a per-example key batch (sampling/rng.py).
            img_keys = jnp.stack([
                jax.random.fold_in(key, idx_so_far + i)
                for i in range(len(imgs))
            ])
            ks = jax.vmap(lambda k: jax.random.split(k, 3))(img_keys)
            k_init, k_noise, k_samp = ks[:, 0], ks[:, 1], ks[:, 2]
            x_init = jax.vmap(
                lambda k: jax.random.normal(k, (size, size, 3))
            )(k_init)

            if args.simplified:
                y = operator.A(x_orig)
                if args.add_noise:
                    y = _add_noise_per_image(
                        k_noise, y, sigma_y, args.noise_type
                    )
                apy = operator.Ap(y)
                if mesh is not None:
                    x_init, y = shard_batch(mesh, (x_init, y))
                if args.encoder_cache > 1:
                    x, _ = sample_simplified_encoder_prop(
                        *self._split_fns(), x_init, y, operator,
                        self.sched, k_samp, eta=args.eta, sigma_y=sigma_y,
                        interval=args.encoder_cache,
                        key_steps=self._encoder_key_steps(),
                        params=self._params,
                    )
                else:
                    x, _ = sample_simplified(
                        model_fn, x_init, y, operator, self.sched, k_samp,
                        eta=args.eta, sigma_y=sigma_y, params=run_params,
                        loop=args.loop,
                        solver=getattr(args, "solver", "ddim"),
                    )
            else:
                x_vec = jnp.transpose(x_orig, (0, 3, 1, 2)).reshape(len(imgs), -1)
                y = operator.A(x_vec)
                if args.add_noise:
                    y = _add_noise_per_image(
                        k_noise, y, sigma_y, args.noise_type
                    )
                apy = self._apy_visualisation(operator, y, len(imgs))
                if mesh is not None:
                    x_init, y = shard_batch(mesh, (x_init, y))
                x, _ = sample_svd(
                    model_fn, x_init, y, operator, self.sched, k_samp,
                    eta=args.eta, sigma_y=sigma_y, guidance_fn=guidance_fn,
                    params=run_params, loop=args.loop,
                    solver=getattr(args, "solver", "ddim"),
                )

            # pipeline: drain the previous batch's results (host transfer +
            # PNG writes) while the device computes this batch's trajectory
            if pending is not None:
                drain(*pending)
            pending = (x, x_orig, apy, valid, idx_so_far)
            idx_so_far += valid

        if pending is not None:
            drain(*pending)
        if pbar is not None:
            if count:
                pbar.set_description(f"PSNR: {total_psnr / count:.2f}")
            pbar.close()
        for f in save_futures:
            f.result()
        io_pool.shutdown(wait=True)
        if prof is not None:
            prof.__exit__(None, None, None)
        metrics.close()
        wall = time.perf_counter() - wall_start
        avg = total_psnr / max(count, 1)
        print(f"Total Average PSNR: {avg:.2f}")
        print(f"Number of samples: {count}")
        return {
            "avg_psnr": avg,
            "num_samples": count,
            "wall_seconds": wall,
            "images_per_second": count / wall if wall > 0 else 0.0,
        }

    def _apy_visualisation(self, operator, y, n):
        """SVD-mode A+y preview with the reference's task special cases
        (diffusion.py:555-564)."""
        size = self.config.data.image_size
        deg = self.args.deg

        def as_img(vec):
            return jnp.transpose(
                vec.reshape(n, 3, size, size), (0, 2, 3, 1)
            )

        apy = operator.A_pinv(y)
        if deg.startswith("deblur"):
            return as_img(y)
        if deg == "colorization":
            gray = y.reshape(n, 1, size, size)
            return jnp.transpose(jnp.tile(gray, (1, 3, 1, 1)), (0, 2, 3, 1))
        if deg == "inpainting":
            ones = jnp.ones((n, 3 * size * size))
            apy = apy + operator.A_pinv(operator.A(ones)) - 1.0
        return as_img(apy)
