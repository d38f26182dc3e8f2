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


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DDNM restoration server")
    p.add_argument("--config", type=str, required=True)
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
    p.add_argument("--request_timeout_s", type=float, default=600.0,
                   help="handler wait budget; timed-out requests are "
                        "cancelled before device work")
    p.add_argument("--no_warmup", action="store_true")
    return p.parse_args(argv)


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
    for deg in [d.strip() for d in ns.degs.split(",") if d.strip()]:
        if deg not in SIMPLIFIED_DEGS:
            raise SystemExit(f"unknown task {deg!r}; choose from {SIMPLIFIED_DEGS}")
        needs_mask = deg in ("inpainting", "mask_color_sr", "diy")
        op_mask = mask
        if needs_mask and op_mask is None:
            # no --mask_path: static mask defaults to all-keep; clients
            # supply per-request masks via RGBA uploads (server docstring)
            op_mask = np.ones((size, size, 1), np.float32)
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
    return RestorationService(
        model_fn, run_params, runner.sched, operators,
        image_size=size, max_batch=ns.max_batch, eta=ns.eta,
        sigma_y=ns.sigma_y, base_seed=ns.seed, mesh=mesh,
    )


def main(argv=None):
    ns = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")

    from ddnm_tpu.utils import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    enable_compilation_cache()

    from ddnm_tpu.server import RestorationServer

    service = build_service(ns)
    if not ns.no_warmup:
        logging.info("warming up executables for %s ...", service.tasks)
        t0 = time.time()
        service.warmup()
        logging.info("warmup done in %.1fs", time.time() - t0)
    server = RestorationServer(
        service, host=ns.host, port=ns.port, max_wait_ms=ns.max_wait_ms,
        request_timeout_s=ns.request_timeout_s,
    )
    server.start()
    logging.info("serving %s on http://%s:%d (max_batch=%d)",
                 service.tasks, *server.address, service.max_batch)

    # graceful drain on SIGTERM (the supervisor's stop signal): pending
    # requests get explicit 503s instead of connection resets
    import signal

    stop_requested = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop_requested.set())
    try:
        while not stop_requested.wait(timeout=3600):
            pass
    except KeyboardInterrupt:
        pass
    logging.info("shutting down")
    server.stop()


if __name__ == "__main__":
    main()
