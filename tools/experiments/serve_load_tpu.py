"""Online-serving throughput on the real chip (flagship workload).

Measures the end-to-end HTTP serving path of serve.py on the bench.py
flagship workload (CelebA-class DDPM UNet bf16, 256px, 100-step simplified
DDNM+ 4x SR): N concurrent clients each POST a 64px degraded PNG and wait
for the restored 256px PNG. Reports wall img/s and the realized batch
statistics, to compare with bench.py's offline batch number (the serving
path adds PNG codec + HTTP + coalescing overhead; the sampler executable
is the same).

Run on an idle TPU (one process at a time):
  python tools/experiments/serve_load_tpu.py [n_requests] [max_wait_ms]
"""

from __future__ import annotations

import io
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main(n_requests: int = 64, max_wait_ms: float = 300.0, hq: bool = False,
         enc: int = 1, sigma_y: float = 0.0, loop: str = "auto"):
    from PIL import Image

    import serve
    from ddnm_tpu.server import RestorationServer
    from ddnm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # --enc K: APPROXIMATE encoder-cache serving (end_dense placement) —
    # throughput measurement for the opt-in accel path
    enc_args = ([] if enc <= 1 else
                ["--encoder_cache", str(enc),
                 "--encoder_cache_policy", "end_dense"])
    if hq:
        # the hq face256-class posterior workload: per-request RGBA masks
        # through the respaced jump-schedule loop (~330 model calls/image)
        ns = serve.parse_args([
            "--hq_conf", str(REPO / "configs/hq/face256.yml"),
            "--random_init", "--dtype", "bfloat16", "--degs", "inpainting",
            "--max_batch", "8", "--max_wait_ms", str(max_wait_ms),
            "--sigma_y", str(sigma_y), "--loop", loop,
        ] + enc_args)
        service = serve.build_hq_service(ns)
    else:
        ns = serve.parse_args([
            "--config", str(REPO / "configs/celeba_hq.yml"), "--random_init",
            "--dtype", "bfloat16", "--degs", "sr_averagepooling",
            "--max_batch", "8", "--max_wait_ms", str(max_wait_ms),
            "--loop", loop,
        ] + enc_args)
        service = serve.build_service(ns)
    print("warming up ...", flush=True)
    t0 = time.time()
    service.warmup()
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    # size the pending queue to the offered load: this measures throughput,
    # not load-shedding (the 503 backpressure path has its own test)
    server = RestorationServer(
        service, max_wait_ms=max_wait_ms, queue_size=max(64, n_requests))
    server.start()
    host, port = server.address
    deg = "inpainting" if hq else "sr_averagepooling"
    url = f"http://{host}:{port}/restore?deg={deg}" + ("&input=gt" if hq else "")

    rng = np.random.default_rng(0)
    bodies = []
    for _ in range(n_requests):
        if hq:
            size = service.image_size
            gt = (rng.uniform(0.1, 0.9, (size, size, 3)) * 255).astype(np.uint8)
            alpha = ((rng.random((size, size, 1)) > 0.3) * 255).astype(np.uint8)
            img = Image.fromarray(
                np.concatenate([gt, alpha], axis=-1), mode="RGBA")
        else:
            y = (rng.uniform(0.1, 0.9, (64, 64, 3)) * 255).astype(np.uint8)
            img = Image.fromarray(y)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        bodies.append(buf.getvalue())

    import urllib.request

    status = [None] * n_requests

    def post(i):
        req = urllib.request.Request(
            url, data=bodies[i], headers={"Content-Type": "image/png"})
        try:
            with urllib.request.urlopen(req, timeout=1200) as r:
                r.read()
                status[i] = r.status
        except urllib.error.HTTPError as exc:
            status[i] = exc.code

    threads = [threading.Thread(target=post, args=(i,)) for i in range(n_requests)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    stats = server.stats.as_dict()
    server.stop()
    ok = sum(1 for s in status if s == 200)
    shed = sum(1 for s in status if s == 503)
    print(json.dumps({
        "requests": n_requests,
        "ok": ok,
        "shed_503": shed,
        "wall_s": round(wall, 2),
        "img_per_sec": round(ok / wall, 3),
        "batches": server.stats.batches,
        "mean_batch": round(server.stats.requests / max(server.stats.batches, 1), 2),
        "latency_s": stats.get("latency_s"),
        "sigma_y": sigma_y,
        "loop": loop,
    }))


def _flag(argv, name, default):
    if name in argv:
        i = argv.index(name)
        if i + 1 >= len(argv):
            raise SystemExit("usage: serve_load_tpu.py [n] [max_wait_ms] "
                             "[--hq] [--enc INTERVAL] [--sigma_y S]")
        val = argv[i + 1]
        del argv[i:i + 2]
        return val
    return default


if __name__ == "__main__":
    argv = sys.argv[1:]
    enc = int(_flag(argv, "--enc", 1))
    sig = float(_flag(argv, "--sigma_y", 0.0))
    loop = _flag(argv, "--loop", "auto")
    args = [a for a in argv if a != "--hq"]
    n = int(args[0]) if len(args) > 0 else 64
    w = float(args[1]) if len(args) > 1 else 300.0
    main(n, w, hq="--hq" in argv, enc=enc, sigma_y=sig, loop=loop)
