#!/usr/bin/env python
"""Online restoration server CLI.

Loads a model exactly like main.py (same config schema + checkpoint
converter) and serves DDNM restoration over HTTP with micro-batching
(ddnm_tpu/server.py). The reference has no serving entry point; this is
the deployment shape a production TPU wants — one resident process, one
compiled executable per task at a fixed batch size, requests coalesced.

Example:

  python serve.py --config configs/celeba_hq.yml --ckpt exp/logs/celeba/celeba_hq.ckpt \
      --degs sr_averagepooling,colorization --port 8000 --dtype bfloat16

  curl -X POST --data-binary @low_res.png \
      "http://localhost:8000/restore?deg=sr_averagepooling" -o restored.png
"""

from __future__ import annotations

import argparse
import logging
import sys
import threading
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SIMPLIFIED_DEGS = ("colorization", "denoising", "sr_averagepooling",
                   "inpainting", "sr_color", "mask_color_sr", "diy")
SVD_DEGS = ("cs_walshhadamard", "cs_blockbased", "inpainting", "denoising",
            "colorization", "sr_averagepooling", "sr_bicubic", "deblur_uni",
            "deblur_gauss", "deblur_aniso")
HQ_DEGS = ("sr_averagepooling", "colorization", "sr_color", "inpainting",
           "mask_color_sr")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DDNM restoration server")
    p.add_argument("--config", type=str, default=None,
                   help="main-pipeline config (simplified/SVD serving)")
    p.add_argument("--hq_conf", type=str, default=None,
                   help="hq-pipeline config (configs/hq/*.yml): serve the "
                        "respaced posterior DDNM loop instead; class-"
                        "conditional models take per-request ?class=N")
    p.add_argument("--classifier_ckpt", type=str, default=None,
                   help="(--hq_conf) classifier weights for guidance when "
                        "the conf sets classifier_scale > 0")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--random_init", action="store_true",
                   help="random weights (smoke mode; no checkpoint)")
    p.add_argument("--degs", type=str, default="sr_averagepooling",
                   help=f"comma-separated tasks from {SIMPLIFIED_DEGS}")
    p.add_argument("--svd_degs", type=str, default="",
                   help="comma-separated SVD-mode tasks from "
                        f"{SVD_DEGS}; served under their own names "
                        "(a name cannot appear in both lists)")
    p.add_argument("--deg_scale", type=float, default=4.0)
    p.add_argument("--sigma_y", type=float, default=0.0)
    p.add_argument("--eta", type=float, default=0.85)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--mask_path", type=str, default=None,
                   help="mask for the inpainting-family tasks")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--t_sampling", type=int, default=None)
    p.add_argument("--dp", type=int, default=1,
                   help="shard each served batch over this many chips "
                        "(1-D data mesh; max_batch must divide by it)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=20.0)
    p.add_argument("--queue_size", type=int, default=64,
                   help="pending-request cap; submits beyond it shed with "
                        "503 'queue full' (backpressure)")
    p.add_argument("--request_timeout_s", type=float, default=600.0,
                   help="handler wait budget; timed-out requests are "
                        "cancelled before device work")
    p.add_argument("--encoder_cache", type=int, default=1,
                   help=">1: reuse UNet encoder features across this many "
                        "model calls (APPROXIMATE Faster-Diffusion accel — "
                        "validate quality per checkpoint; see "
                        "ddnm_tpu/sampling/accel.py). Simplified and "
                        "posterior tasks only; SVD-mode tasks need a "
                        "separate exact service")
    p.add_argument("--encoder_cache_policy", type=str, default="uniform",
                   choices=["uniform", "end_dense"],
                   help="key-step placement for --encoder_cache: end_dense "
                        "holds quality at much deeper budgets (measured; "
                        "docs/PERFORMANCE.md)")
    p.add_argument("--loop", type=str, default="auto",
                   choices=("auto", "host", "scan"),
                   help="trajectory loop driver (docs/PERFORMANCE.md 'Scan "
                        "vs host, measured'): steady-state equivalent; "
                        "'scan' restarts ~20x faster from a warm compile "
                        "cache (one executable per task), 'host' keeps the "
                        "step executable schedule-length independent. "
                        "'scan' is incompatible with --encoder_cache > 1 "
                        "(the accel samplers are host-driven); host/auto "
                        "compose with it fine")
    p.add_argument("--no_warmup", action="store_true")
    return p.parse_args(argv)


def build_hq_service(ns):
    """Assemble a PosteriorRestorationService from an hq config — the
    online form of hq_main.py's single-tile (256px) flow: ADM UNet with
    learned-range head, respaced posterior DDNM with time-travel, optional
    classifier guidance, per-request masks and class labels."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from hq_main import build_adm_from_hq
    from ddnm_tpu.config import load_hq_config
    from ddnm_tpu.data.checkpoints import load_params
    from ddnm_tpu.data.io import load_mask
    from ddnm_tpu.models import classifier_guidance_from_params
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.sampling.posterior import build_posterior_tables
    from ddnm_tpu.schedules import named_beta_schedule
    from ddnm_tpu.server import PosteriorRestorationService
    from ddnm_tpu.utils import jit_init

    cfg_path = Path(ns.hq_conf)
    if not cfg_path.exists():
        cfg_path = REPO_ROOT / ns.hq_conf
    conf = load_hq_config(cfg_path)
    dtype = jnp.bfloat16 if ns.dtype == "bfloat16" else jnp.float32
    size = int(conf.image_size or 256)
    class_cond = bool(conf.class_cond)

    model = build_adm_from_hq(conf, dtype)
    k_model = jax.random.PRNGKey(ns.seed)
    dummy = (jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))
    if class_cond:
        dummy = dummy + (jnp.zeros((1,), jnp.int32),)
    ckpt = ns.ckpt or conf.model_path
    if ckpt and Path(ckpt).exists():
        params = load_params(
            ckpt, expected=jax.eval_shape(model.init, k_model, *dummy))
    elif ns.random_init:
        logging.warning("random-init hq model — smoke mode")
        params = jit_init(model, k_model, *dummy)
    else:
        raise SystemExit("pass --ckpt (torch .pt to convert) or --random_init")
    if ns.dtype == "bfloat16":
        from ddnm_tpu.models import cast_torso

        params = cast_torso(params, jnp.bfloat16)

    run_params = {"model": params}
    if class_cond:
        def model_fn(p, x, t):
            return model.apply(p["model"], x, t, p["classes"])
    else:
        def model_fn(p, x, t):
            return model.apply(p["model"], x, t)

    guidance_fn = None
    cckpt = ns.classifier_ckpt or conf.classifier_path
    if class_cond and float(conf.classifier_scale or 0) > 0:
        from hq_main import build_classifier_from_hq

        clf = build_classifier_from_hq(conf, dtype)
        cdummy = (jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))
        if cckpt and Path(cckpt).exists():
            run_params["classifier"] = load_params(
                cckpt, expected=jax.eval_shape(clf.init, k_model, *cdummy))
        elif ns.random_init:
            run_params["classifier"] = jit_init(clf, k_model, *cdummy)
        else:
            raise SystemExit(
                f"classifier_scale > 0 but no classifier checkpoint at "
                f"{cckpt!r}; pass --classifier_ckpt or --random_init")
        # per-request labels ride run_params["classes"] (see server.py)
        guidance_fn = classifier_guidance_from_params(
            clf.apply, float(conf.classifier_scale))

    tables = build_posterior_tables(
        betas=named_beta_schedule(
            str(conf.noise_schedule or "linear"),
            int(conf.diffusion_steps or 1000), use_scale=True),
        timestep_respacing=str(conf.timestep_respacing or "100"),
        sigma_y=ns.sigma_y,
        schedule_jump_params=dict(conf.schedule_jump_params or {}),
        time_shift=(1 if conf.inpa_inj_time_shift is None
                    else int(conf.inpa_inj_time_shift)),
    )

    mask = load_mask(ns.mask_path) if ns.mask_path else None
    operators = {}
    require_ctx = []
    for deg in [d.strip() for d in ns.degs.split(",") if d.strip()]:
        if deg not in HQ_DEGS:
            raise SystemExit(f"unknown hq task {deg!r}; choose from {HQ_DEGS}")
        needs_mask = deg in ("inpainting", "mask_color_sr")
        op_mask = mask
        if needs_mask and op_mask is None:
            # no --mask_path: there is no meaningful static mask, so every
            # request must bring its own (RGBA upload); a maskless request
            # would otherwise be a silent no-op restore under all-ones
            op_mask = np.ones((size, size, 1), np.float32)
            require_ctx.append(deg)
        operators[deg] = build_functional_operator(
            deg, image_size=size, deg_scale=ns.deg_scale,
            mask=op_mask if needs_mask else None,
        )
    mesh = None
    if getattr(ns, "dp", 1) > 1:
        from ddnm_tpu.parallel import make_mesh

        mesh = make_mesh(ns.dp)
    split_fns = None
    if getattr(ns, "encoder_cache", 1) > 1:
        # encode/decode halves over the SAME run_params pytree model_fn
        # takes — per-request classes keep riding p["classes"] as a traced
        # argument, so mixed-class cached batches still coalesce
        def _cls(p, x):
            return p["classes"] if class_cond else None

        def encode_fn(p, x, t):
            return model.apply(p["model"], x, t, _cls(p, x), mode="encode")

        def decode_fn(p, cache, x, t):
            return model.apply(p["model"], x, t, _cls(p, x), mode="decode",
                               cache=cache)

        split_fns = (encode_fn, decode_fn)
    return PosteriorRestorationService(
        model_fn, run_params, tables, operators, image_size=size,
        max_batch=ns.max_batch, base_seed=ns.seed, mesh=mesh,
        guidance_fn=guidance_fn, class_cond=class_cond,
        num_classes=1000 if class_cond else None, require_ctx=require_ctx,
        encoder_cache=getattr(ns, "encoder_cache", 1),
        encoder_cache_policy=getattr(ns, "encoder_cache_policy", "uniform"),
        split_fns=split_fns,
        loop=getattr(ns, "loop", "auto"),
    )


def build_service(ns):
    """Assemble a RestorationService from main.py-style config/ckpt flags."""
    from ddnm_tpu.config import load_config
    from ddnm_tpu.operators import build_functional_operator
    from ddnm_tpu.runner import RunArgs, Runner
    from ddnm_tpu.server import RestorationService
    from ddnm_tpu.data.io import load_mask

    import jax

    cfg_path = Path(ns.config)
    if not cfg_path.exists():
        cfg_path = REPO_ROOT / "configs" / ns.config
    config = load_config(cfg_path)
    if ns.t_sampling is not None:
        config.time_travel.T_sampling = ns.t_sampling

    args = RunArgs(
        config=str(cfg_path), simplified=True, seed=ns.seed,
        ckpt=ns.ckpt, random_init=ns.random_init, dtype=ns.dtype,
        batch_size=ns.max_batch, eta=ns.eta, sigma_y=ns.sigma_y,
    )
    runner = Runner(args, config)
    model_fn, _, run_params = runner.build_model(jax.random.PRNGKey(ns.seed))

    import numpy as np

    size = config.data.image_size
    mask = load_mask(ns.mask_path) if ns.mask_path else None
    operators = {}
    require_ctx = []
    for deg in [d.strip() for d in ns.degs.split(",") if d.strip()]:
        if deg not in SIMPLIFIED_DEGS:
            raise SystemExit(f"unknown task {deg!r}; choose from {SIMPLIFIED_DEGS}")
        needs_mask = deg in ("inpainting", "mask_color_sr", "diy")
        op_mask = mask
        if needs_mask and op_mask is None:
            # no --mask_path: there is no meaningful static mask, so every
            # request must bring its own (RGBA upload); a maskless request
            # would otherwise be a silent no-op restore under all-ones
            op_mask = np.ones((size, size, 1), np.float32)
            require_ctx.append(deg)
        operators[deg] = build_functional_operator(
            deg, image_size=size, deg_scale=ns.deg_scale,
            mask=op_mask if needs_mask else None,
        )
    for deg in [d.strip() for d in ns.svd_degs.split(",") if d.strip()]:
        if deg not in SVD_DEGS:
            raise SystemExit(f"unknown SVD task {deg!r}; choose from {SVD_DEGS}")
        if deg in operators:
            raise SystemExit(
                f"{deg!r} appears in both --degs and --svd_degs; a served "
                "name is bound to exactly one sampler mode")
        from ddnm_tpu.operators import build_svd_operator

        needs_mask = deg == "inpainting"
        svd_mask = mask
        if needs_mask and svd_mask is None:
            svd_mask = np.ones((size, size), np.float32)
        operators[deg] = build_svd_operator(
            deg, image_size=size, deg_scale=ns.deg_scale, seed=ns.seed,
            mask=svd_mask if needs_mask else None,
        )
    mesh = None
    if getattr(ns, "dp", 1) > 1:
        from ddnm_tpu.parallel import make_mesh

        mesh = make_mesh(ns.dp)
    split_fns = None
    if getattr(ns, "encoder_cache", 1) > 1:
        if ns.svd_degs.strip():
            raise SystemExit(
                "--encoder_cache has no SVD-mode sampler; serve --svd_degs "
                "tasks from a separate exact service")
        # the runner's family-correct encode/decode halves take RAW model
        # params; the service's samplers see run_params = {"model": ...}
        enc0, dec0 = runner._split_fns()

        def encode_fn(p, x, t):
            return enc0(p["model"], x, t)

        def decode_fn(p, cache, x, t):
            return dec0(p["model"], cache, x, t)

        split_fns = (encode_fn, decode_fn)
    return RestorationService(
        model_fn, run_params, runner.sched, operators,
        image_size=size, max_batch=ns.max_batch, eta=ns.eta,
        sigma_y=ns.sigma_y, base_seed=ns.seed, mesh=mesh,
        require_ctx=require_ctx,
        encoder_cache=getattr(ns, "encoder_cache", 1),
        encoder_cache_policy=getattr(ns, "encoder_cache_policy", "uniform"),
        split_fns=split_fns,
        loop=getattr(ns, "loop", "auto"),
    )


def main(argv=None):
    ns = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")

    from ddnm_tpu.utils import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    enable_compilation_cache()

    from ddnm_tpu.server import RestorationServer

    if ns.hq_conf and ns.config:
        raise SystemExit("pass --config OR --hq_conf, not both")
    if not ns.hq_conf and not ns.config:
        raise SystemExit("pass --config (main pipeline) or --hq_conf (hq)")
    if ns.hq_conf and ns.svd_degs:
        raise SystemExit("--svd_degs is a main-pipeline option")
    service = build_hq_service(ns) if ns.hq_conf else build_service(ns)
    if not ns.no_warmup:
        logging.info("warming up executables for %s ...", service.tasks)
        t0 = time.time()
        service.warmup()
        logging.info("warmup done in %.1fs", time.time() - t0)
    server = RestorationServer(
        service, host=ns.host, port=ns.port, max_wait_ms=ns.max_wait_ms,
        queue_size=ns.queue_size, request_timeout_s=ns.request_timeout_s,
    )
    server.start()
    logging.info("serving %s on http://%s:%d (max_batch=%d)",
                 service.tasks, *server.address, service.max_batch)

    # graceful drain on SIGTERM (the supervisor's stop signal): pending
    # requests get explicit 503s instead of connection resets; SIGHUP
    # hot-reloads the checkpoint with ZERO recompiles (weights are traced
    # arguments of every executable, so swapping arrays touches no
    # compiled program)
    import signal

    stop_requested = threading.Event()
    reload_requested = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop_requested.set())
    signal.signal(signal.SIGHUP, lambda *_: reload_requested.set())
    try:
        while not stop_requested.wait(timeout=1.0):
            if reload_requested.is_set():
                reload_requested.clear()
                if not ns.ckpt:
                    logging.warning("SIGHUP: no --ckpt to reload from")
                    continue
                try:
                    t0 = time.time()
                    fresh = build_hq_service(ns) if ns.hq_conf \
                        else build_service(ns)
                    service.swap_params(fresh._params)
                    logging.info("SIGHUP: reloaded %s in %.1fs (no "
                                 "recompiles)", ns.ckpt, time.time() - t0)
                except Exception:
                    logging.exception("SIGHUP reload failed; serving the "
                                      "previous weights")
    except KeyboardInterrupt:
        pass
    logging.info("shutting down")
    server.stop()


if __name__ == "__main__":
    main()
