"""Online serving: micro-batching HTTP server (ddnm_tpu/server.py).

The key serving invariant is batch-composition independence: a request's
output must be bit-identical whether it runs alone, padded, or coalesced
with strangers — guaranteed by per-request RNG streams (sampling/rng.py)
plus fixed compiled batch shapes. The reference has no serving surface to
compare against; these are self-consistency and protocol tests.
"""

from __future__ import annotations

import io
import threading
import time
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddnm_tpu import schedules
from ddnm_tpu.models.unet_ddpm import DDPMUNet
from ddnm_tpu.operators import build_functional_operator
from ddnm_tpu.sampling import build_schedule
from ddnm_tpu.server import RestorationServer, RestorationService
from ddnm_tpu.server import _Request

RES = 32


@pytest.fixture(scope="module")
def service():
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=RES)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, RES, RES, 3))
    params = model.init(rng, x0, jnp.zeros((1,)))
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    sched = build_schedule(betas=betas, t_sampling=3)
    ops = {
        "sr_averagepooling": build_functional_operator(
            "sr_averagepooling", image_size=RES, deg_scale=4),
        "colorization": build_functional_operator(
            "colorization", image_size=RES),
    }
    return RestorationService(
        lambda p, x, t: model.apply(p, x, t), params, sched, ops,
        image_size=RES, max_batch=4,
    )


def _gt_images(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.2, 0.8, size=(n, RES, RES, 3)).astype(np.float32)


def test_batch_composition_invariance(service):
    """Alone vs coalesced vs padded: same seq -> bitwise-same output."""
    gts = _gt_images(3)
    together = service.restore(gts, "sr_averagepooling", [10, 11, 12],
                               input_kind="gt")
    alone = service.restore(gts[1:2], "sr_averagepooling", [11],
                            input_kind="gt")
    np.testing.assert_array_equal(together[1], alone[0])
    # different seq -> different stream
    other = service.restore(gts[1:2], "sr_averagepooling", [99],
                            input_kind="gt")
    assert not np.array_equal(other[0], alone[0])


def test_degraded_equals_gt_path(service):
    """Sending A(gt) as the degraded observation reproduces the gt path
    (for tasks whose A commutes with the [0,1]<->[-1,1] affine map)."""
    gts = _gt_images(2, seed=9)
    via_gt = service.restore(gts, "sr_averagepooling", [3, 4], input_kind="gt")
    y01 = gts.reshape(2, RES // 4, 4, RES // 4, 4, 3).mean(axis=(2, 4))
    via_y = service.restore(y01.astype(np.float32), "sr_averagepooling",
                            [3, 4], input_kind="degraded")
    np.testing.assert_allclose(via_y, via_gt, atol=1e-6)


def test_restore_validates(service):
    gts = _gt_images(1)
    with pytest.raises(KeyError):
        service.restore(gts, "deblur_gauss", [0], input_kind="gt")
    with pytest.raises(ValueError):
        service.restore(gts, "sr_averagepooling", [0],
                        input_kind="degraded")  # wrong y shape
    with pytest.raises(ValueError):
        service.restore(np.repeat(gts, 5, axis=0), "sr_averagepooling",
                        list(range(5)), input_kind="gt")  # > max_batch
    assert service.y_shape("sr_averagepooling") == (RES // 4, RES // 4, 3)
    assert service.y_shape("colorization") == (RES, RES, 3)


def _png_bytes(img01):
    from PIL import Image

    buf = io.BytesIO()
    arr = np.clip(img01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, body):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "image/png"})
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def test_http_roundtrip_and_health(service):
    server = RestorationServer(service, max_wait_ms=200.0)
    server.start()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        gts = _gt_images(2, seed=3)
        bodies = [_png_bytes(g) for g in gts]
        results = {}

        def call(i):
            results[i] = _post(f"{base}/restore?deg=sr_averagepooling&input=gt",
                               bodies[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        from PIL import Image

        for i in range(2):
            status, body, headers = results[i]
            assert status == 200, body
            out = Image.open(io.BytesIO(body))
            assert out.size == (RES, RES)
            assert "X-Batch-Size" in headers
        # health + stats
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
            health = resp.read()
        import json

        h = json.loads(health)
        assert h["status"] == "ok"
        assert h["requests"] == 2 and h["batches"] >= 1
        assert set(h["tasks"]) == {"sr_averagepooling", "colorization"}
        # bad task -> 400
        status, body, _ = _post(f"{base}/restore?deg=nope", bodies[0])
        assert status == 400
        # degraded-mode shape mismatch -> per-request error, not a crash
        status, body, _ = _post(
            f"{base}/restore?deg=sr_averagepooling", bodies[0])
        assert status == 400 and b"degraded input" in body
    finally:
        server.stop()


def test_mesh_sharded_service_matches(service):
    """A mesh-sharded service returns bitwise-identical restorations."""
    from ddnm_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=RES)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    sched = build_schedule(betas=betas, t_sampling=3)
    ops = {"sr_averagepooling": build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)}
    mk = lambda mesh: RestorationService(
        lambda p, x, t: model.apply(p, x, t), params, sched, ops,
        image_size=RES, max_batch=8, mesh=mesh)
    plain, sharded = mk(None), mk(make_mesh(8))
    gts = _gt_images(5, seed=13)
    seqs = [20, 21, 22, 23, 24]
    np.testing.assert_array_equal(
        sharded.restore(gts, "sr_averagepooling", seqs, input_kind="gt"),
        plain.restore(gts, "sr_averagepooling", seqs, input_kind="gt"),
    )
    with pytest.raises(ValueError):
        mk_bad = RestorationService(
            lambda p, x, t: model.apply(p, x, t), params, sched, ops,
            image_size=RES, max_batch=6, mesh=make_mesh(8))


def test_http_concurrent_load(service):
    """16 concurrent clients on a max_batch-4 service: all served, batched."""
    server = RestorationServer(service, max_wait_ms=100.0, queue_size=32)
    server.start()
    host, port = server.address
    url = f"http://{host}:{port}/restore?deg=sr_averagepooling&input=gt"
    try:
        gts = _gt_images(16, seed=21)
        bodies = [_png_bytes(g) for g in gts]
        results = {}

        def call(i):
            results[i] = _post(url, bodies[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(results[i][0] == 200 for i in range(16))
        assert server.stats.requests == 16 and server.stats.errors == 0
        # with 16 simultaneous clients and a 100 ms window, coalescing
        # must actually happen (max_batch=4 -> at least a few multi-batches)
        assert server.stats.batches < 16
        assert server.stats.batched_requests > 0
    finally:
        server.stop()


def test_serve_cli_build_service(tmp_path):
    """serve.py assembles a service from main.py-style config flags."""
    import serve

    ns = serve.parse_args([
        "--config", "configs/smoke.yml", "--random_init",
        "--degs", "sr_averagepooling,denoising", "--max_batch", "2",
        "--t_sampling", "2",
    ])
    svc = serve.build_service(ns)
    assert svc.tasks == ("denoising", "sr_averagepooling")
    assert svc.image_size == 64 and svc.max_batch == 2
    imgs = np.random.default_rng(0).uniform(
        0.2, 0.8, size=(2, 64, 64, 3)).astype(np.float32)
    out = svc.restore(imgs, "denoising", [0, 1], input_kind="gt")
    assert out.shape == (2, 64, 64, 3)


def test_swap_params_zero_recompile():
    """Hot-swapping weights changes outputs WITHOUT retracing any
    executable (params are traced arguments, never baked constants); a
    mismatched tree is rejected."""
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=RES)
    traces = {"n": 0}

    def model_fn(p, x, t):
        traces["n"] += 1  # runs at TRACE time only, not per execution
        return model.apply(p, x, t)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, RES, RES, 3))
    params1 = model.init(rng, x0, jnp.zeros((1,)))
    params2 = model.init(jax.random.PRNGKey(9), x0, jnp.zeros((1,)))
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    svc = RestorationService(
        model_fn, params1,
        build_schedule(betas=betas, t_sampling=3),
        {"sr_averagepooling": build_functional_operator(
            "sr_averagepooling", image_size=RES, deg_scale=4)},
        image_size=RES, max_batch=2,
    )
    gts = _gt_images(1, seed=73)
    out1 = svc.restore(gts, "sr_averagepooling", [0], input_kind="gt")
    n_traces = traces["n"]
    assert n_traces > 0
    svc.swap_params(params2)
    out2 = svc.restore(gts, "sr_averagepooling", [0], input_kind="gt")
    assert traces["n"] == n_traces, "weight swap must not retrace"
    assert not np.array_equal(out1, out2), "new weights must take effect"
    # swapping back reproduces the original output bitwise
    svc.swap_params(params1)
    out3 = svc.restore(gts, "sr_averagepooling", [0], input_kind="gt")
    np.testing.assert_array_equal(out1, out3)
    with pytest.raises(ValueError, match="structure"):
        svc.swap_params({"bogus": np.zeros(3)})


def test_serve_cli_maskless_inpainting_requires_ctx():
    """Without --mask_path there is no meaningful static mask: the task is
    served mask-required (maskless requests would be no-op restores)."""
    import serve

    ns = serve.parse_args([
        "--config", "configs/smoke.yml", "--random_init",
        "--degs", "inpainting", "--max_batch", "2", "--t_sampling", "2",
    ])
    svc = serve.build_service(ns)
    assert svc.requires_ctx("inpainting")
    gt = np.zeros((1, 64, 64, 3), np.float32)
    with pytest.raises(ValueError, match="without a static mask"):
        svc.restore(gt, "inpainting", [0], input_kind="gt")
    out = svc.restore(gt, "inpainting", [0], input_kind="gt",
                      ctxs=np.ones((1, 64, 64, 1), np.float32))
    assert out.shape == (1, 64, 64, 3)


def test_bad_request_cannot_poison_batch(service):
    """A wrong-size degraded PNG is rejected at the handler (400) and never
    reaches the batcher, so concurrent well-formed requests still get 200."""
    server = RestorationServer(service, max_wait_ms=150.0)
    server.start()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        good_y = _gt_images(1, seed=5)[0, : RES // 4, : RES // 4]  # (8,8,3)
        bad_y = _gt_images(1, seed=6)[0, : RES // 2, : RES // 2]  # (16,16,3)
        results = {}

        def call(name, body):
            results[name] = _post(
                f"{base}/restore?deg=sr_averagepooling", body)

        threads = [
            threading.Thread(target=call,
                             args=(n, _png_bytes(b)))
            for n, b in [("good", good_y), ("bad", bad_y)]
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results["bad"][0] == 400
        assert b"degraded input" in results["bad"][1]
        assert results["good"][0] == 200, results["good"][1]
        assert server.stats.errors == 0  # nothing reached the worker broken
        # bad input_kind is also a handler-side 400
        status, body, _ = _post(
            f"{base}/restore?deg=sr_averagepooling&input=nope",
            _png_bytes(good_y))
        assert status == 400 and b"input must be" in body
    finally:
        server.stop()


def test_submit_after_stop_rejected(service):
    """stop() fails queued requests with 503 and rejects later submits."""
    server = RestorationServer(service)
    # not started: queue a request, then stop — it must be failed, and
    # the drain must mark it as a server-side (5xx) condition
    req = server.submit(_gt_images(1)[0], "sr_averagepooling", "gt")
    server.stop()
    assert req.event.is_set()
    assert req.error == "server shutting down" and req.error_code == 503
    with pytest.raises(RuntimeError):
        server.submit(_gt_images(1)[0], "sr_averagepooling", "gt")


def test_cancelled_requests_skip_device_work(service):
    """Requests whose clients stopped waiting are acknowledged without a
    device call; live lanes in the same group still get real results."""
    server = RestorationServer(service)
    gone = _Request(image=_gt_images(1)[0], deg="sr_averagepooling",
                    input_kind="gt", seq=101)
    gone.cancelled.set()
    live = _Request(image=_gt_images(1)[0], deg="sr_averagepooling",
                    input_kind="gt", seq=102)
    server._serve_group([gone, live])
    assert gone.event.is_set() and gone.result is None
    assert gone.error_code == 504 and "cancelled" in gone.error
    assert live.event.is_set() and live.error is None
    assert live.result is not None and live.batch_size == 1
    assert server.stats.cancelled == 1 and server.stats.requests == 1
    # an all-cancelled group never touches the device or the batch stats
    gone2 = _Request(image=_gt_images(1)[0], deg="sr_averagepooling",
                     input_kind="gt", seq=103)
    gone2.cancelled.set()
    batches_before = server.stats.batches
    server._serve_group([gone2])
    assert gone2.event.is_set() and server.stats.batches == batches_before
    server._httpd.server_close()


def test_pipelined_worker_matches_direct_restore(service):
    """Under sustained load the worker runs a one-deep dispatch/fetch
    pipeline (groups N+1 dispatched before N is fetched). Every response
    must still be bitwise what a direct, synchronous service.restore of
    that request's seq produces — the pipeline may only reorder waiting."""
    server = RestorationServer(service, max_wait_ms=30.0, queue_size=32)
    server.start()
    host, port = server.address
    url = f"http://{host}:{port}/restore?deg=sr_averagepooling&input=gt"
    try:
        n = 12  # 3+ groups at max_batch 4 -> the pipeline actually engages
        gts = _gt_images(n, seed=31)
        results = {}

        def call(i):
            results[i] = _post(url, _png_bytes(gts[i]))

        threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        from PIL import Image

        assert all(results[i][0] == 200 for i in range(n))
        assert server.stats.requests == n and server.stats.errors == 0
        assert server.stats.batches >= 3  # multiple groups flowed through
        for i in range(n):
            _, body, headers = results[i]
            got = np.asarray(Image.open(io.BytesIO(body)))
            seq = int(headers["X-Seq"])
            # the PNG sent back is the uint8 quantization of the direct
            # single-request restoration with the same RNG identity —
            # fed the upload's OWN uint8 quantization of the gt image
            sent = np.clip(gts[i] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            direct = service.restore(
                (sent.astype(np.float32) / 255.0)[None],
                "sr_averagepooling", [seq], input_kind="gt",
            )[0]
            want = np.clip(direct * 255.0 + 0.5, 0, 255).astype(np.uint8)
            np.testing.assert_array_equal(got, want)
        # the HTTP uploads are identical bytes per-index, so outputs with
        # different seqs must differ (per-request RNG streams are live)
        assert server.stats.batched_requests > 0
    finally:
        server.stop()


def test_healthz_reports_latency_and_depth(service):
    server = RestorationServer(service, max_wait_ms=20.0)
    server.start()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        status, _, _ = _post(
            f"{base}/restore?deg=sr_averagepooling&input=gt",
            _png_bytes(_gt_images(1, seed=40)[0]))
        assert status == 200
        import json

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
            h = json.loads(resp.read())
        assert h["queue_depth"] == 0
        lat = h["latency_s"]
        assert lat["n"] == 1 and lat["p50"] > 0
        assert lat["p50"] <= lat["p95"] <= lat["p99"]
    finally:
        server.stop()


@pytest.fixture(scope="module")
def mask_service():
    """Service with the ctx-capable inpainting task (all-keep static mask)."""
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=RES)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    sched = build_schedule(betas=betas, t_sampling=3)
    ops = {
        "inpainting": build_functional_operator(
            "inpainting", image_size=RES,
            mask=np.ones((RES, RES, 1), np.float32)),
        "mask_color_sr": build_functional_operator(
            "mask_color_sr", image_size=RES, deg_scale=4,
            mask=np.ones((RES, RES, 1), np.float32)),
    }
    return RestorationService(
        lambda p, x, t: model.apply(p, x, t), params, sched, ops,
        image_size=RES, max_batch=4,
    )


def _masks(n, seed=17):
    rng = np.random.default_rng(seed)
    return (rng.random((n, RES, RES, 1)) > 0.4).astype(np.float32)


def test_service_per_request_masks(mask_service):
    """Different per-request masks ride ONE executable; lanes stay
    independent (lane 0 bitwise-unchanged when lane 1's mask changes),
    and a masked degraded upload equals the gt path for the pure mask op."""
    svc = mask_service
    assert svc.ctx_tasks == ("inpainting", "mask_color_sr")
    assert svc.ctx_degraded_ok("inpainting")
    assert not svc.ctx_degraded_ok("mask_color_sr")  # y is pooled gray

    gts = _gt_images(2, seed=11)
    m = _masks(2)
    out_ab = svc.restore(gts, "inpainting", [5, 6], input_kind="gt", ctxs=m)
    m_aa = np.stack([m[0], m[0]])
    out_aa = svc.restore(gts, "inpainting", [5, 6], input_kind="gt", ctxs=m_aa)
    np.testing.assert_array_equal(out_ab[0], out_aa[0])
    assert not np.array_equal(out_ab[1], out_aa[1])

    # masked degraded upload == gt upload for the pure mask projection:
    # y = T(gt * mask_in_01_space)... the degraded client sends gt pixels
    # with invalid ones arbitrary; A(x) zeroes them in [-1,1] space
    via_gt = svc.restore(gts, "inpainting", [7, 8], input_kind="gt", ctxs=m)
    # what a client actually has: the gt with masked-out pixels destroyed
    destroyed = gts * m + (1 - m) * 0.5  # arbitrary filler in holes
    via_deg = svc.restore(destroyed.astype(np.float32), "inpainting", [7, 8],
                          input_kind="degraded", ctxs=m)
    np.testing.assert_allclose(via_deg, via_gt, atol=1e-6)

    # ctx validation
    with pytest.raises(ValueError, match="ctxs must be"):
        svc.restore(gts, "inpainting", [0, 1], input_kind="gt",
                    ctxs=m[:, :16])  # wrong spatial shape
    with pytest.raises(ValueError, match="degraded masked"):
        svc.restore(gts, "mask_color_sr", [0, 1], input_kind="degraded",
                    ctxs=m)


def _rgba_png_bytes(img01, mask01):
    from PIL import Image

    rgb = np.clip(img01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    alpha = (mask01[..., 0] * 255).astype(np.uint8)
    rgba = np.concatenate([rgb, alpha[..., None]], axis=-1)
    buf = io.BytesIO()
    Image.fromarray(rgba, mode="RGBA").save(buf, format="PNG")
    return buf.getvalue()


def test_http_rgba_mask_roundtrip(mask_service):
    """RGBA uploads carry per-request masks; different-mask requests
    coalesce into one batch and each result matches the direct service
    call with that request's seq + mask."""
    server = RestorationServer(mask_service, max_wait_ms=150.0)
    server.start()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        gts = _gt_images(2, seed=23)
        m = _masks(2, seed=29)
        sent = np.clip(gts * 255.0 + 0.5, 0, 255).astype(np.uint8)
        results = {}

        def call(i):
            results[i] = _post(f"{base}/restore?deg=inpainting&input=gt",
                               _rgba_png_bytes(gts[i], m[i]))

        threads = [threading.Thread(target=call, args=(i,)) for i in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        from PIL import Image

        assert all(results[i][0] == 200 for i in (0, 1)), results
        assert server.stats.batched_requests == 2  # they coalesced
        for i in (0, 1):
            _, body, headers = results[i]
            got = np.asarray(Image.open(io.BytesIO(body)))
            seq = int(headers["X-Seq"])
            direct = mask_service.restore(
                (sent[i].astype(np.float32) / 255.0)[None],
                "inpainting", [seq], input_kind="gt", ctxs=m[i : i + 1],
            )[0]
            want = np.clip(direct * 255.0 + 0.5, 0, 255).astype(np.uint8)
            np.testing.assert_array_equal(got, want)
        # health reports ctx tasks
        import json
        import urllib.request as _rq

        with _rq.urlopen(f"{base}/healthz", timeout=30) as resp:
            h = json.loads(resp.read())
        assert h["ctx_tasks"] == ["inpainting", "mask_color_sr"]
        # RGBA on a non-ctx task -> 400 (spin up none; this service has
        # only ctx tasks, so check the degraded-reject path instead)
        status, body, _ = _post(
            f"{base}/restore?deg=mask_color_sr",
            _rgba_png_bytes(gts[0], m[0]))
        assert status == 400 and b"degraded masked" in body
    finally:
        server.stop()


def test_rgba_on_non_ctx_task_rejected(service):
    """An RGBA upload against a task without A_ctx forms is a handler 400."""
    server = RestorationServer(service)
    server.start()
    host, port = server.address
    try:
        gt = _gt_images(1, seed=3)[0]
        mask = _masks(1, seed=4)[0]
        status, body, _ = _post(
            f"http://{host}:{port}/restore?deg=sr_averagepooling&input=gt",
            _rgba_png_bytes(gt, mask))
        assert status == 400 and b"per-request mask" in body
    finally:
        server.stop()


def test_collect_never_mixes_masked_and_maskless(mask_service):
    """Masked and maskless requests target different executables and must
    not share a group."""
    server = RestorationServer(mask_service, max_wait_ms=50.0)
    gt = _gt_images(1)[0]
    m = _masks(1)[0]
    server.submit(gt, "inpainting", "gt", ctx=m)
    server.submit(gt, "inpainting", "gt")  # maskless
    first = server._queue.get()
    group = server._collect(first)
    assert len(group) == 1 and group[0].ctx is not None
    assert server._held is not None and server._held.ctx is None
    server._httpd.server_close()


class _FakeService:
    """Device-free stand-in with the RestorationService surface the server
    touches — lets the soak test hammer the batcher/pipeline at full speed
    and inject failures deterministically."""

    def __init__(self, image_size=8, max_batch=4, fail_seqs=(),
                 dispatch_delay_s=0.0):
        self.image_size = image_size
        self.max_batch = max_batch
        self._fail = frozenset(fail_seqs)
        self._dispatch_delay = dispatch_delay_s
        self.tasks = ("a", "b")
        self.ctx_tasks = ()
        self.class_cond = False
        self.num_classes = None

    def requires_ctx(self, deg):
        return False

    def is_svd(self, deg):
        return False

    def ctx_degraded_ok(self, deg):
        return False

    def y_shape(self, deg):
        return (self.image_size, self.image_size, 3)

    def restore_async(self, images, deg, seqs, *, input_kind="degraded",
                      ctxs=None, classes=None):
        if any(s in self._fail for s in seqs):
            raise RuntimeError("injected dispatch failure")
        if self._dispatch_delay:
            time.sleep(self._dispatch_delay)
        # encode (seq, task) into the result so parity is checkable
        tag = {"a": 1.0, "b": 2.0}[deg]
        return images * 0 + np.asarray(seqs, np.float32)[:, None, None, None] + tag

    @staticmethod
    def fetch(out):
        time.sleep(0.002)  # simulated device time
        return np.asarray(out, np.float32)


def test_server_soak_concurrent_submit_cancel_stop():
    """400 mixed-task requests from 16 threads with random client
    cancellations, then stop() under load: every request's event fires
    exactly once with either its own tagged result, a cancellation, or the
    shutdown error — and the stats ledger adds up."""
    fake = _FakeService()
    server = RestorationServer(fake, max_wait_ms=1.0, queue_size=512)
    server.start()
    rng = np.random.default_rng(0)
    img = np.zeros((8, 8, 3), np.float32)
    lock = threading.Lock()
    submitted = []

    def client(tid):
        local_rng = np.random.default_rng(tid)
        for _ in range(25):
            deg = "a" if local_rng.random() < 0.5 else "b"
            try:
                req = server.submit(img, deg, "degraded")
            except RuntimeError:
                return  # raced with stop(): acceptable, not recorded
            if local_rng.random() < 0.2:
                req.cancelled.set()
            with lock:
                submitted.append((req, deg))

    threads = [threading.Thread(target=client, args=(t,)) for t in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.stop()  # worker drains whatever is still queued

    for req, deg in submitted:
        assert req.event.wait(timeout=10), "request never completed"
        if req.error is not None:
            assert req.error_code in (503, 504), req.error
        else:
            tag = {"a": 1.0, "b": 2.0}[deg]
            assert req.result[0, 0, 0] == req.seq + tag
    served = sum(1 for r, _ in submitted if r.error is None)
    shutdown = sum(1 for r, _ in submitted if r.error_code == 503)
    cancelled_seen = sum(
        1 for r, _ in submitted
        if r.error is not None and r.error_code == 504)
    assert served == server.stats.requests
    assert cancelled_seen == server.stats.cancelled
    assert served + shutdown + cancelled_seen == len(submitted)
    assert server.stats.errors == 0


def test_http_overload_sheds_with_503_queue_full():
    """Offered load beyond queue_size sheds at the HTTP layer with a clean
    503 'queue full' while every accepted request is still served correctly
    (measured live on the chip 2026-08-18: 96 clients vs queue_size 64 ->
    66 ok / 30 shed, accepted-latency percentiles unchanged)."""
    fake = _FakeService(dispatch_delay_s=0.2)  # slow device -> queue backs up
    server = RestorationServer(fake, max_wait_ms=5.0, queue_size=2)
    server.start()
    host, port = server.address
    url = f"http://{host}:{port}/restore?deg=a&input=gt"
    body = _png_bytes(np.zeros((8, 8, 3), np.float32))
    results = {}

    def call(i):
        results[i] = _post(url, body)

    try:
        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        codes = [results[i][0] for i in range(16)]
        ok = codes.count(200)
        shed = codes.count(503)
        assert ok + shed == 16 and ok >= 2 and shed >= 1, codes
        for i in range(16):
            if results[i][0] == 503:
                assert b"queue full" in results[i][1], results[i][1]
        # the shed requests never reached the device ledger
        assert server.stats.requests == ok
        assert server.stats.errors == 0
    finally:
        server.stop()


def test_serve_cli_queue_size_flag():
    """--queue_size reaches the server's pending-queue bound."""
    import serve

    ns = serve.parse_args(["--config", "configs/smoke.yml", "--random_init",
                           "--queue_size", "7"])
    assert ns.queue_size == 7
    server = RestorationServer(_FakeService(), queue_size=ns.queue_size)
    try:
        assert server._queue.maxsize == 7
    finally:
        server._httpd.server_close()


def test_server_soak_dispatch_failures_are_isolated():
    """Injected dispatch failures fail only their own group; the pipeline
    keeps serving groups after an error."""
    fake = _FakeService(fail_seqs={1})
    server = RestorationServer(fake, max_wait_ms=1.0)
    server.start()
    img = np.zeros((8, 8, 3), np.float32)
    try:
        reqs = []
        for _ in range(6):
            reqs.append(server.submit(img, "a", "degraded"))
            time.sleep(0.02)  # separate groups so seq 1 fails alone-ish
        for r in reqs:
            assert r.event.wait(timeout=10)
        failed = [r for r in reqs if r.error is not None]
        okay = [r for r in reqs if r.error is None]
        assert any(r.seq == 1 for r in failed)
        assert all("injected dispatch failure" in r.error for r in failed)
        assert len(okay) >= 4 and all(r.result is not None for r in okay)
        assert server.stats.errors == len(failed)
    finally:
        server.stop()


@pytest.fixture(scope="module")
def svd_service():
    """Service mixing SVD-mode tasks (deblur / CS / colorization)."""
    from ddnm_tpu.operators import build_svd_operator

    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=RES)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    sched = build_schedule(betas=betas, t_sampling=3)
    ops = {
        "deblur_gauss": build_svd_operator("deblur_gauss", image_size=RES),
        "cs_walshhadamard": build_svd_operator(
            "cs_walshhadamard", image_size=RES, deg_scale=0.25, seed=7),
        "colorization": build_svd_operator("colorization", image_size=RES),
    }
    return RestorationService(
        lambda p, x, t: model.apply(p, x, t), params, sched, ops,
        image_size=RES, max_batch=4,
    )


def _vec(x):
    return np.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)


def test_svd_service_shapes_and_invariance(svd_service):
    """SVD tasks serve from gt; per-request RNG keeps outputs independent
    of batch composition; degraded-upload shapes are classified right."""
    svc = svd_service
    assert all(svc.is_svd(t) for t in svc.tasks)
    assert svc.ctx_tasks == ()
    assert svc.y_shape("deblur_gauss") == (RES, RES, 3)
    assert svc.y_shape("colorization") == (RES, RES, 1)
    assert svc.y_shape("cs_walshhadamard") is None  # not an image

    gts = _gt_images(3, seed=41)
    out = svc.restore(gts, "deblur_gauss", [1, 2, 3], input_kind="gt")
    assert out.shape == (3, RES, RES, 3)
    assert np.isfinite(out).all()
    alone = svc.restore(gts[1:2], "deblur_gauss", [2], input_kind="gt")
    np.testing.assert_array_equal(out[1], alone[0])
    # CS from gt works too
    out_cs = svc.restore(gts[:1], "cs_walshhadamard", [4], input_kind="gt")
    assert out_cs.shape == (1, RES, RES, 3)


def test_svd_service_degraded_uploads(svd_service):
    """An image-shaped SVD measurement can be uploaded directly: the
    blurred RGB for deblur, the grayscale for colorization — matching the
    gt path that computes y in-graph."""
    svc = svd_service
    gts = _gt_images(2, seed=43)
    xg = 2.0 * gts - 1.0

    op = svc._operators["deblur_gauss"]
    y = np.asarray(op.A(jnp.asarray(_vec(xg))))
    y_img = np.transpose(y.reshape(2, 3, RES, RES), (0, 2, 3, 1))
    via_deg = svc.restore(((y_img + 1) / 2).astype(np.float32),
                          "deblur_gauss", [9, 10], input_kind="degraded")
    via_gt = svc.restore(gts, "deblur_gauss", [9, 10], input_kind="gt")
    np.testing.assert_allclose(via_deg, via_gt, atol=1e-5)

    opc = svc._operators["colorization"]
    yg = np.asarray(opc.A(jnp.asarray(_vec(xg)))).reshape(2, RES, RES, 1)
    via_deg = svc.restore(((yg + 1) / 2).astype(np.float32),
                          "colorization", [11, 12], input_kind="degraded")
    via_gt = svc.restore(gts, "colorization", [11, 12], input_kind="gt")
    np.testing.assert_allclose(via_deg, via_gt, atol=1e-5)

    with pytest.raises(ValueError, match="not an image"):
        svc.restore(gts, "cs_walshhadamard", [0, 1], input_kind="degraded")
    with pytest.raises(ValueError, match="per-request masks"):
        svc.restore(gts, "deblur_gauss", [0, 1], input_kind="gt",
                    ctxs=_masks(2))


def test_http_svd_roundtrip(svd_service):
    """HTTP: degraded blurred upload (RGB PNG), grayscale upload for
    colorization, CS degraded rejected with a clear 400, healthz schema."""
    server = RestorationServer(svd_service, max_wait_ms=100.0)
    server.start()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        blurred = _gt_images(1, seed=47)[0]
        status, body, headers = _post(
            f"{base}/restore?deg=deblur_gauss", _png_bytes(blurred))
        assert status == 200, body
        from PIL import Image

        assert Image.open(io.BytesIO(body)).size == (RES, RES)

        # grayscale PNG for colorization
        gray = (np.clip(_gt_images(1, seed=48)[0, ..., 0], 0, 1)
                * 255 + 0.5).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(gray, mode="L").save(buf, format="PNG")
        status, body, _ = _post(
            f"{base}/restore?deg=colorization", buf.getvalue())
        assert status == 200, body

        status, body, _ = _post(
            f"{base}/restore?deg=cs_walshhadamard", _png_bytes(blurred))
        assert status == 400 and b"not an image" in body
        # RGBA against an SVD task -> 400
        status, body, _ = _post(
            f"{base}/restore?deg=deblur_gauss&input=gt",
            _rgba_png_bytes(_gt_images(1, seed=49)[0], _masks(1)[0]))
        assert status == 400 and b"per-request mask" in body

        import json
        import urllib.request as _rq

        with _rq.urlopen(f"{base}/healthz", timeout=30) as resp:
            h = json.loads(resp.read())
        assert set(h["svd_tasks"]) == set(h["tasks"])
        assert h["degraded_upload"]["cs_walshhadamard"] is None
        assert h["degraded_upload"]["colorization"] == [RES, RES, 1]
    finally:
        server.stop()


@pytest.fixture(scope="module")
def posterior_service():
    """Class-conditional hq-pipeline service with classifier guidance on a
    tiny learned-range ADM — the online face256/imagenet flow at toy scale."""
    from ddnm_tpu.models import (
        ADMClassifier, ADMUNet, classifier_guidance_from_params)
    from ddnm_tpu.sampling.posterior import build_posterior_tables
    from ddnm_tpu.schedules import named_beta_schedule
    from ddnm_tpu.server import PosteriorRestorationService

    model = ADMUNet(
        image_size=RES, model_channels=32, num_res_blocks=1,
        attention_resolutions=(4,), channel_mult=(1, 2), num_heads=1,
        num_head_channels=32, out_channels=6, num_classes=10)
    rng = jax.random.PRNGKey(0)
    mp = model.init(rng, jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)),
                    jnp.zeros((1,), jnp.int32))
    clf = ADMClassifier(
        image_size=RES, model_channels=32, num_res_blocks=1,
        attention_resolutions=(4,), channel_mult=(1, 2), num_heads=1,
        num_head_channels=32, pool="attention", out_channels=10)
    cp = clf.init(rng, jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))
    tables = build_posterior_tables(
        betas=named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="3",
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1,
                                  jump_n_sample=1))
    ops = {
        "inpainting": build_functional_operator(
            "inpainting", image_size=RES,
            mask=np.ones((RES, RES, 1), np.float32)),
        "sr_averagepooling": build_functional_operator(
            "sr_averagepooling", image_size=RES, deg_scale=4),
    }
    return PosteriorRestorationService(
        lambda p, x, t: model.apply(p["model"], x, t, p["classes"]),
        {"model": mp, "classifier": cp}, tables, ops,
        image_size=RES, max_batch=4,
        guidance_fn=classifier_guidance_from_params(clf.apply, 2.0),
        class_cond=True, num_classes=10,
    )


def test_posterior_service_classes_and_masks(posterior_service, service):
    """Per-request class labels ride the traced params pytree: mixed-class
    batches share one executable, lanes stay independent, and the label
    actually changes the output. Per-request masks compose with it."""
    svc = posterior_service
    assert svc.class_cond and not svc.is_svd("inpainting")
    gts = _gt_images(2, seed=53)

    out_57 = svc.restore(gts, "sr_averagepooling", [1, 2], input_kind="gt",
                         classes=[5, 7])
    out_55 = svc.restore(gts, "sr_averagepooling", [1, 2], input_kind="gt",
                         classes=[5, 5])
    np.testing.assert_array_equal(out_57[0], out_55[0])  # lane 0 untouched
    assert not np.array_equal(out_57[1], out_55[1])      # label matters

    # composition invariance with classes: alone == coalesced
    alone = svc.restore(gts[1:2], "sr_averagepooling", [2], input_kind="gt",
                        classes=[7])
    np.testing.assert_array_equal(out_57[1], alone[0])

    # per-request masks work through the posterior path too
    m = _masks(2, seed=59)
    out_ab = svc.restore(gts, "inpainting", [3, 4], input_kind="gt",
                         ctxs=m, classes=[1, 2])
    m_aa = np.stack([m[0], m[0]])
    out_aa = svc.restore(gts, "inpainting", [3, 4], input_kind="gt",
                         ctxs=m_aa, classes=[1, 2])
    np.testing.assert_array_equal(out_ab[0], out_aa[0])
    assert not np.array_equal(out_ab[1], out_aa[1])

    # classes on a non-class-conditional service is an error
    with pytest.raises(ValueError, match="not class-conditional"):
        service.restore(gts, "sr_averagepooling", [0, 1], input_kind="gt",
                        classes=[1, 2])


def test_posterior_service_mesh_sharded_matches(posterior_service):
    """A mesh-sharded posterior service (classes + masks sharded with the
    batch) returns bitwise-identical restorations."""
    from ddnm_tpu.parallel import make_mesh
    from ddnm_tpu.server import PosteriorRestorationService

    svc = posterior_service
    assert len(jax.devices()) >= 8
    sharded = PosteriorRestorationService(
        svc._model_fn, {k: v for k, v in svc._params.items()},
        svc._tables, svc._operators, image_size=RES, max_batch=8,
        mesh=make_mesh(8), guidance_fn=svc._guidance_fn,
        class_cond=True, num_classes=10,
    )
    plain = PosteriorRestorationService(
        svc._model_fn, {k: v for k, v in svc._params.items()},
        svc._tables, svc._operators, image_size=RES, max_batch=8,
        guidance_fn=svc._guidance_fn, class_cond=True, num_classes=10,
    )
    gts = _gt_images(3, seed=67)
    m = _masks(3, seed=71)
    kw = dict(input_kind="gt", ctxs=m, classes=[1, 5, 9])
    np.testing.assert_array_equal(
        sharded.restore(gts, "inpainting", [30, 31, 32], **kw),
        plain.restore(gts, "inpainting", [30, 31, 32], **kw),
    )


def test_posterior_service_rejects_svd_ops(posterior_service):
    from ddnm_tpu.operators import build_svd_operator
    from ddnm_tpu.server import PosteriorRestorationService

    with pytest.raises(ValueError, match="functional operators only"):
        PosteriorRestorationService(
            lambda p, x, t: None, {"model": {}}, posterior_service._tables,
            {"deblur_gauss": build_svd_operator(
                "deblur_gauss", image_size=RES)},
            image_size=RES)


def test_http_posterior_class_param(posterior_service, service):
    """?class=N flows through HTTP; invalid/unsupported uses are 400s."""
    server = RestorationServer(posterior_service, max_wait_ms=100.0)
    server.start()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        gt = _gt_images(1, seed=61)[0]
        status, body, _ = _post(
            f"{base}/restore?deg=sr_averagepooling&input=gt&class=7",
            _png_bytes(gt))
        assert status == 200, body
        status, body, _ = _post(
            f"{base}/restore?deg=sr_averagepooling&input=gt&class=-1",
            _png_bytes(gt))
        assert status == 400 and b"class must be" in body
        # out-of-range and missing labels are 400s too
        status, body, _ = _post(
            f"{base}/restore?deg=sr_averagepooling&input=gt&class=10",
            _png_bytes(gt))
        assert status == 400 and b"class must be" in body
        status, body, _ = _post(
            f"{base}/restore?deg=sr_averagepooling&input=gt",
            _png_bytes(gt))
        assert status == 400 and b"class-conditional" in body
        import json
        import urllib.request as _rq

        with _rq.urlopen(f"{base}/healthz", timeout=30) as resp:
            assert json.loads(resp.read())["class_cond"] is True
    finally:
        server.stop()
    # ?class against a non-class-conditional service -> 400
    server2 = RestorationServer(service)
    server2.start()
    host, port = server2.address
    try:
        status, body, _ = _post(
            f"http://{host}:{port}/restore?deg=sr_averagepooling&input=gt"
            "&class=3", _png_bytes(_gt_images(1)[0]))
        assert status == 400 and b"not class-conditional" in body
    finally:
        server2.stop()


def test_serve_cli_sigterm_drains(tmp_path):
    """serve.py exits cleanly on SIGTERM (graceful drain path)."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import urllib.request

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.Popen(
        [sys.executable, "serve.py", "--config", "configs/smoke.yml",
         "--random_init", "--degs", "denoising", "--t_sampling", "2",
         "--port", "0", "--no_warmup", "--port", "8733"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.monotonic() + 180
        up = False
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise AssertionError(f"server died: {proc.stdout.read()}")
            try:
                with urllib.request.urlopen(
                        "http://127.0.0.1:8733/healthz", timeout=2) as r:
                    assert json.load(r)["status"] == "ok"
                    up = True
                    break
            except (OSError, ValueError):
                time.sleep(0.5)
        assert up, "server never came up"
        # SIGHUP (hot-reload request) must not kill the server; with no
        # --ckpt it logs a warning and keeps serving
        proc.send_signal(signal.SIGHUP)
        time.sleep(2.0)
        with urllib.request.urlopen(
                "http://127.0.0.1:8733/healthz", timeout=5) as r:
            assert json.load(r)["status"] == "ok"
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
        out_text = proc.stdout.read()
        assert "shutting down" in out_text
        assert "no --ckpt to reload" in out_text
    finally:
        if proc.poll() is None:
            proc.kill()


def test_batcher_grouping_invariants_fuzz():
    """Model-based fuzz of the batcher (threadless, deterministic): for
    random request sequences, groups are homogeneous in
    (task, input_kind, maskedness), never exceed max_batch, and their
    concatenation preserves submission order (collect stops at the first
    mismatch and holds it — it never skips). Cancellation accounting adds
    up after serving every group."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    img = np.zeros((8, 8, 3), np.float32)
    mask = np.ones((8, 8, 1), np.float32)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.sampled_from(["gt", "degraded"]),
                  st.booleans(), st.booleans()),
        min_size=1, max_size=24))
    def run(seq):
        server = RestorationServer(_FakeService(max_batch=3), max_wait_ms=0.001)
        try:
            reqs = []
            for deg, kind, has_ctx, cancel in seq:
                r = server.submit(img, deg, kind,
                                  ctx=mask if has_ctx else None)
                if cancel:
                    r.cancelled.set()
                reqs.append(r)
            groups = []
            while server._held is not None or not server._queue.empty():
                if server._held is not None:
                    first, server._held = server._held, None
                else:
                    first = server._queue.get_nowait()
                groups.append(server._collect(first))
            flat = [r for g in groups for r in g]
            assert [r.seq for r in flat] == [r.seq for r in reqs]
            for g in groups:
                assert len(g) <= server.service.max_batch
                keys = {(r.deg, r.input_kind, r.ctx is None) for r in g}
                assert len(keys) == 1, f"mixed group: {keys}"
            for g in groups:
                server._serve_group(g)
            assert all(r.event.is_set() for r in reqs)
            n_cancelled = sum(1 for _, _, _, c in seq if c)
            assert server.stats.cancelled == n_cancelled
            assert server.stats.requests == len(seq) - n_cancelled
            assert server.stats.errors == 0
        finally:
            server._httpd.server_close()

    run()


def test_collect_coalesces_same_task(service):
    """The batcher groups same-task requests and holds a mismatch back."""
    server = RestorationServer(service, max_wait_ms=50.0)
    # do NOT start the worker: drive _collect directly for determinism
    reqs = [server.submit(_gt_images(1)[0], "sr_averagepooling", "gt")
            for _ in range(3)]
    other = server.submit(_gt_images(1)[0], "colorization", "gt")
    first = server._queue.get()
    group = server._collect(first)
    assert [r.seq for r in group] == [reqs[0].seq, reqs[1].seq, reqs[2].seq]
    assert server._held is other
    server._httpd.server_close()


# ---------------------------------------------------------------------------
# Encoder-cache serving (opt-in approximate accel; sampling/accel.py)
# ---------------------------------------------------------------------------

def _tiny_ddpm():
    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=RES)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    return model, params, build_schedule(betas=betas, t_sampling=4)


def _cached_service(ops, interval=2, policy="uniform", require_ctx=()):
    from ddnm_tpu.sampling.accel import ddpm_split_fns

    model, params, sched = _tiny_ddpm()
    return RestorationService(
        lambda p, x, t: model.apply(p, x, t), params, sched, ops,
        image_size=RES, max_batch=4, require_ctx=require_ctx,
        encoder_cache=interval, encoder_cache_policy=policy,
        split_fns=ddpm_split_fns(model),
    )


@pytest.fixture(scope="module")
def cached_service():
    ops = {
        "sr_averagepooling": build_functional_operator(
            "sr_averagepooling", image_size=RES, deg_scale=4),
        "inpainting": build_functional_operator(
            "inpainting", image_size=RES,
            mask=np.ones((RES, RES, 1), np.float32)),
    }
    return _cached_service(ops)


def test_cached_service_batch_composition_invariance(cached_service):
    """The serving invariant holds through the cached sampler: alone vs
    coalesced -> bitwise-same output; it IS the cached trajectory (differs
    from the exact service's)."""
    gts = _gt_images(3, seed=31)
    together = cached_service.restore(gts, "sr_averagepooling", [10, 11, 12],
                                      input_kind="gt")
    alone = cached_service.restore(gts[1:2], "sr_averagepooling", [11],
                                   input_kind="gt")
    np.testing.assert_array_equal(together[1], alone[0])

    exact_ops = {"sr_averagepooling": build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)}
    model, params, sched = _tiny_ddpm()
    exact = RestorationService(
        lambda p, x, t: model.apply(p, x, t), params, sched, exact_ops,
        image_size=RES, max_batch=4)
    ref = exact.restore(gts[1:2], "sr_averagepooling", [11], input_kind="gt")
    assert not np.array_equal(ref[0], alone[0])  # interval 2 approximates


def test_cached_service_per_request_mask_equals_static(cached_service):
    """The new op_ctx path through the CACHED sampler: a per-request mask
    equal to a baked static mask gives the bitwise-same trajectory."""
    m = _masks(1, seed=41)
    static_ops = {"inpainting": build_functional_operator(
        "inpainting", image_size=RES, mask=m[0])}
    static_svc = _cached_service(static_ops)
    gts = _gt_images(1, seed=43)
    via_ctx = cached_service.restore(gts, "inpainting", [5], input_kind="gt",
                                     ctxs=m)
    via_static = static_svc.restore(gts, "inpainting", [5], input_kind="gt")
    np.testing.assert_array_equal(via_ctx, via_static)


def test_encoder_prop_op_ctx_interval1_is_exact():
    """sample_simplified_encoder_prop with op_ctx reduces bitwise to
    sample_simplified with op_ctx at interval=1 (the exactness contract,
    extended to the ctx form)."""
    from ddnm_tpu.sampling import sample_simplified
    from ddnm_tpu.sampling.accel import (
        ddpm_split_fns, sample_simplified_encoder_prop)

    model, params, sched = _tiny_ddpm()
    op = build_functional_operator(
        "inpainting", image_size=RES,
        mask=np.ones((RES, RES, 1), np.float32))
    ctx = jnp.asarray(_masks(2, seed=47))
    gts = jnp.asarray(_gt_images(2, seed=48) * 2.0 - 1.0)
    y = op.A_ctx(gts, ctx)
    x_init = jax.random.normal(jax.random.PRNGKey(3), gts.shape)
    key = jax.random.PRNGKey(11)
    enc, dec = ddpm_split_fns(model)
    mf = lambda p, x, t: model.apply(p, x, t)
    exact, _ = sample_simplified(mf, x_init, y, op, sched, key,
                                 params=params, op_ctx=ctx, loop="host")
    cached, _ = sample_simplified_encoder_prop(
        enc, dec, x_init, y, op, sched, key, interval=1,
        params=params, op_ctx=ctx)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(cached))
    # and interval=2 actually takes the cached path (differs)
    cached2, _ = sample_simplified_encoder_prop(
        enc, dec, x_init, y, op, sched, key, interval=2,
        params=params, op_ctx=ctx)
    assert not np.array_equal(np.asarray(exact), np.asarray(cached2))


def test_cached_service_construction_validates():
    ops = {"sr_averagepooling": build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)}
    model, params, sched = _tiny_ddpm()
    with pytest.raises(ValueError, match="split_fns"):
        RestorationService(
            lambda p, x, t: model.apply(p, x, t), params, sched, ops,
            image_size=RES, max_batch=4, encoder_cache=2)
    from ddnm_tpu.operators import build_svd_operator
    from ddnm_tpu.sampling.accel import ddpm_split_fns

    svd_ops = dict(ops)
    svd_ops["deblur_gauss"] = build_svd_operator(
        "deblur_gauss", image_size=RES)
    with pytest.raises(ValueError, match="SVD"):
        RestorationService(
            lambda p, x, t: model.apply(p, x, t), params, sched, svd_ops,
            image_size=RES, max_batch=4, encoder_cache=2,
            split_fns=ddpm_split_fns(model))


def test_posterior_cached_service_classes_and_invariance():
    """The hq/posterior service through the cached sampler (end_dense):
    per-request classes + classifier guidance still ride the traced
    params, lanes stay independent, and the cached trajectory differs
    from exact. (Label sensitivity must come through the GUIDANCE
    gradient: the ADM UNet's zero-initialised out-convs make its output
    label-independent at random init.)"""
    from ddnm_tpu.models import (
        ADMClassifier, ADMUNet, classifier_guidance_from_params)
    from ddnm_tpu.sampling.posterior import build_posterior_tables
    from ddnm_tpu.schedules import named_beta_schedule
    from ddnm_tpu.server import PosteriorRestorationService

    model = ADMUNet(
        image_size=RES, model_channels=32, num_res_blocks=1,
        attention_resolutions=(4,), channel_mult=(1, 2), num_heads=1,
        num_head_channels=32, out_channels=6, num_classes=10)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))
    clf = ADMClassifier(
        image_size=RES, model_channels=32, num_res_blocks=1,
        attention_resolutions=(4,), channel_mult=(1, 2), num_heads=1,
        num_head_channels=32, pool="attention", out_channels=10)
    cp = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)),
                  jnp.zeros((1,)))
    tables = build_posterior_tables(
        betas=named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="4",
        schedule_jump_params=dict(t_T=4, n_sample=1, jump_length=1,
                                  jump_n_sample=1))
    ops = {"sr_averagepooling": build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)}

    def encode_fn(p, x, t):
        return model.apply(p["model"], x, t, p["classes"], mode="encode")

    def decode_fn(p, cache, x, t):
        return model.apply(p["model"], x, t, p["classes"], mode="decode",
                           cache=cache)

    def build(**kw):
        return PosteriorRestorationService(
            lambda p, x, t: model.apply(p["model"], x, t, p["classes"]),
            {"model": mp, "classifier": cp}, tables, ops, image_size=RES,
            max_batch=4, class_cond=True, num_classes=10,
            guidance_fn=classifier_guidance_from_params(clf.apply, 2.0),
            **kw)

    cached = build(encoder_cache=2, encoder_cache_policy="end_dense",
                   split_fns=(encode_fn, decode_fn))
    exact = build()
    gts = _gt_images(2, seed=61)
    pair = cached.restore(gts, "sr_averagepooling", [1, 2], input_kind="gt",
                          classes=[5, 7])
    alone = cached.restore(gts[:1], "sr_averagepooling", [1],
                           input_kind="gt", classes=[5])
    np.testing.assert_array_equal(pair[0], alone[0])
    other_cls = cached.restore(gts[:1], "sr_averagepooling", [1],
                               input_kind="gt", classes=[9])
    assert not np.array_equal(other_cls[0], alone[0])  # label matters
    ref = exact.restore(gts[:1], "sr_averagepooling", [1],
                        input_kind="gt", classes=[5])
    assert not np.array_equal(ref[0], alone[0])  # cached != exact


def test_serve_cli_encoder_cache(tmp_path):
    """--encoder_cache plumbs through build_service; SVD tasks refuse it."""
    import serve

    ns = serve.parse_args([
        "--config", "configs/smoke.yml", "--random_init",
        "--degs", "sr_averagepooling", "--max_batch", "2",
        "--t_sampling", "4", "--encoder_cache", "2",
        "--encoder_cache_policy", "end_dense",
    ])
    svc = serve.build_service(ns)
    assert svc._encoder_cache == 2 and svc._split_fns is not None
    imgs = np.random.default_rng(0).uniform(
        0.2, 0.8, size=(1, 64, 64, 3)).astype(np.float32)
    out = svc.restore(imgs, "sr_averagepooling", [0], input_kind="gt")
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()

    ns_bad = serve.parse_args([
        "--config", "configs/smoke.yml", "--random_init",
        "--svd_degs", "deblur_gauss", "--encoder_cache", "2",
    ])
    with pytest.raises(SystemExit, match="SVD"):
        serve.build_service(ns_bad)


# ------------------------------------------------------------- loop driver


def test_loop_driver_knob():
    """`loop=` threads through to the trajectory samplers: a scan-driven
    service reproduces the host-driven one on the same request (CPU: both
    drivers compile the same step fusions — sampling/ddnm.py numerics
    contract), and the knob validates its inputs."""
    model, params, sched = _tiny_ddpm()
    ops = {"sr_averagepooling": build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)}

    def mk(loop):
        return RestorationService(
            lambda p, x, t: model.apply(p, x, t), params, sched, ops,
            image_size=RES, max_batch=2, loop=loop)

    gts = _gt_images(2, seed=53)
    host = mk("host").restore(gts, "sr_averagepooling", [3, 4],
                              input_kind="gt")
    scan = mk("scan").restore(gts, "sr_averagepooling", [3, 4],
                              input_kind="gt")
    np.testing.assert_allclose(scan, host, atol=2e-5)

    with pytest.raises(ValueError, match="auto|host|scan"):
        mk("vectorized")
    from ddnm_tpu.sampling.accel import ddpm_split_fns
    with pytest.raises(ValueError, match="host-driven"):
        RestorationService(
            lambda p, x, t: model.apply(p, x, t), params, sched, ops,
            image_size=RES, max_batch=2, loop="scan",
            encoder_cache=2, split_fns=ddpm_split_fns(model))


def test_serve_cli_loop_flag():
    """--loop plumbs through build_service."""
    import serve

    ns = serve.parse_args([
        "--config", "configs/smoke.yml", "--random_init",
        "--degs", "sr_averagepooling", "--max_batch", "2",
        "--t_sampling", "4", "--loop", "scan",
    ])
    svc = serve.build_service(ns)
    assert svc._loop == "scan"
    imgs = np.random.default_rng(5).uniform(
        0.2, 0.8, size=(1, 64, 64, 3)).astype(np.float32)
    out = svc.restore(imgs, "sr_averagepooling", [0], input_kind="gt")
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()
