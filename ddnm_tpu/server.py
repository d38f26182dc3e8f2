"""Online micro-batching inference server for DDNM restoration.

The reference has no serving story — its entry points are batch evaluation
jobs (main.py, hq_demo/main.py). Production TPU serving wants the opposite
shape: a resident process with ONE compiled executable per (task, batch)
signature, incoming requests coalesced into fixed-size batches (static
shapes — the serving binary never retraces), padding lanes masked out, and
per-request deterministic RNG so a request's output does not depend on
which batch it happened to ride in.

Two pieces:

  - `RestorationService` — the device side. Owns model params, the DDNM
    schedule, a preconfigured set of degradation operators, and a fixed
    serving batch size. `restore()` pads any <= max_batch group up to the
    compiled size and derives every request's RNG stream by folding its
    sequence number into a base key, so outputs are bit-identical whether
    a request runs alone or coalesced (same property the batch runner
    uses, ddnm_tpu/sampling/rng.py).

  - `RestorationServer` — a stdlib ThreadingHTTPServer front.
    Handler threads decode PNGs and enqueue; ONE worker thread drains the
    queue (micro-batching with a max-wait deadline) and drives the device
    — the single-TPU-process discipline the backend requires.
    `POST /restore?deg=<task>[&input=degraded|gt]` with a PNG body returns
    the restored PNG; `GET /healthz` returns JSON stats (counters, realized
    batch, queue depth, request-latency percentiles).

The worker runs a ONE-DEEP dispatch/fetch pipeline: JAX dispatch is async
(the sampler's host loop enqueues every step and returns a device array
without syncing), so the worker dispatches batch N+1 *before* blocking on
batch N's `device_get`. Collecting and dispatching the next group — the
only host work between batches — then overlaps the device computing the
current one, and the device never idles between groups under sustained
load. Results are bit-identical to the unpipelined path (per-request RNG
makes lanes independent of grouping; the pipeline only reorders host-side
waiting).

Requests carry the *degraded observation* y by default (what a restoration
service actually receives); `input=gt` instead applies the task's A to the
uploaded image first — the reference CLI's evaluation semantics
(guided_diffusion/diffusion.py:306).

Per-request masks: for context-parameterised tasks (inpainting,
mask_color_sr — FunctionalOperator.A_ctx) a request may upload an RGBA PNG
whose alpha channel is the keep-mask. The mask rides the sampler as a
runtime `op_ctx` tensor, so ONE compiled executable serves every mask and
requests with different masks still coalesce into one batch. RGB uploads
keep using the task's configured static mask. Masked and maskless requests
never share a batch (their executables differ).

This is the online complement of `ddnm_tpu.serving` (offline `jax.export`
artifacts): the exported step artifact and this service run the same
sampler; deployments that cannot ship Python use the artifact, deployments
that can get micro-batching here.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Mapping, Optional, Sequence
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax
import jax.numpy as jnp

from ddnm_tpu.data.transforms import data_transform, inverse_data_transform
from ddnm_tpu.operators.functional import FunctionalOperator
from ddnm_tpu.sampling import DDNMSchedule, sample_simplified, sample_svd
from ddnm_tpu.sampling.ddnm import _nhwc_to_vec

__all__ = [
    "RestorationService",
    "PosteriorRestorationService",
    "RestorationServer",
    "ServiceStats",
]

_MAX_BODY = 32 << 20  # 32 MB request cap


@dataclass
class ServiceStats:
    requests: int = 0
    batches: int = 0
    batched_requests: int = 0  # requests that rode a >1-request batch
    errors: int = 0
    cancelled: int = 0  # timed-out requests skipped before device work

    def __post_init__(self):
        # enqueue->completion wall times of the most recent requests.
        # Locked: the worker appends while /healthz handlers snapshot, and
        # iterating a deque that mutates raises RuntimeError.
        self._latencies = deque(maxlen=512)
        self._lat_lock = threading.Lock()

    def record_latency(self, seconds: float) -> None:
        with self._lat_lock:
            self._latencies.append(seconds)

    def as_dict(self) -> dict:
        d = {k: v for k, v in self.__dict__.items() if not k.startswith("_")}
        d["mean_batch"] = self.requests / self.batches if self.batches else 0.0
        with self._lat_lock:
            lat = sorted(self._latencies)
        if lat:
            pick = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
            d["latency_s"] = {"p50": round(pick(0.50), 4),
                              "p95": round(pick(0.95), 4),
                              "p99": round(pick(0.99), 4),
                              "n": len(lat)}
        return d


class RestorationService:
    """Device-side restoration: fixed-shape, padded, per-request RNG.

    model_fn(params, x, t) -> epsilon, NHWC; `operators` maps task strings
    to `FunctionalOperator`s OR SVD operators (`operators.svd_ops`), all at
    this service's `image_size` — one service can serve both sampler
    families. Each distinct task compiles one executable at batch
    `max_batch` on first use (warm them at startup via `warmup()`).

    SVD tasks take `input=gt` always; `input=degraded` additionally works
    where the measurement is an image in the operator's channel-major
    layout (deblur family: full-size blurred RGB; sr_*: the low-res RGB;
    colorization: the grayscale) — declared by each operator's
    `SVDOperator.measurement_image`, never inferred from length alone.

    `mesh` (a 1-D jax.sharding.Mesh from `parallel.make_mesh`) serves the
    batch sharded across chips: params replicate, the request batch splits
    over the data axis — multi-chip serving with zero hot-loop collectives
    (DDNM is batch-elementwise, so sharded outputs are bitwise-identical).
    """

    def __init__(
        self,
        model_fn: Callable,
        params,
        sched: DDNMSchedule,
        operators: Mapping[str, FunctionalOperator],
        *,
        image_size: int,
        max_batch: int = 8,
        eta: float = 0.85,
        sigma_y: float = 0.0,
        base_seed: int = 1234,
        mesh=None,
        require_ctx: Sequence[str] = (),
        encoder_cache: int = 1,
        encoder_cache_policy: str = "uniform",
        split_fns=None,
        loop: str = "auto",
    ):
        self._model_fn = model_fn
        self._mesh = mesh
        self._require_ctx = frozenset(require_ctx)
        self._encoder_cache = int(encoder_cache)
        self._encoder_policy = str(encoder_cache_policy)
        self._split_fns = split_fns
        self._key_steps = None
        # Loop driver for the trajectory executables (sampling/ddnm.py
        # docstring). Measured on the real chip (docs/PERFORMANCE.md "Scan
        # vs host"): steady-state equivalent; "scan" restarts ~20x faster
        # from a warm persistent cache (one executable), "host" warms ~10%
        # faster steady throughput on the 100-step flagship. Operators pick
        # per deployment; "auto" keeps the per-backend default.
        if loop not in ("auto", "host", "scan"):
            raise ValueError(f"loop must be auto|host|scan, got {loop!r}")
        if loop == "scan" and self._encoder_cache > 1:
            raise ValueError(
                "encoder_cache > 1 uses the host-driven accel samplers "
                "(sampling/accel.py); loop='scan' is incompatible")
        self._loop = loop
        if self._encoder_cache > 1:
            # APPROXIMATE opt-in (Faster Diffusion, see sampling/accel.py):
            # non-key steps reuse the cached encoder features and run only
            # the decoder. split_fns = (encode_fn, decode_fn) over the SAME
            # params pytree the service's model_fn takes; build once and
            # reuse (they are jit static arguments).
            if split_fns is None:
                raise ValueError(
                    "encoder_cache > 1 requires split_fns=(encode_fn, "
                    "decode_fn) — see sampling.accel.ddpm_split_fns /"
                    " adm_split_fns")
            # unconditional (not gated on the exact type) so subclasses
            # cannot silently skip it; PosteriorRestorationService's own
            # stricter no-SVD check fires right after super().__init__.
            bad = [n for n, op in operators.items()
                   if not isinstance(op, FunctionalOperator)]
            if bad:
                raise ValueError(
                    f"encoder_cache has no SVD-mode sampler; serve "
                    f"{sorted(bad)} from a separate exact service")
        unknown = self._require_ctx - set(operators)
        if unknown:
            raise ValueError(f"require_ctx names unknown tasks: {sorted(unknown)}")
        if mesh is not None:
            from ddnm_tpu.parallel import replicate

            if max_batch % mesh.size != 0:
                raise ValueError(
                    f"max_batch {max_batch} must divide over the "
                    f"{mesh.size}-device mesh"
                )
            params = replicate(mesh, params)
        self._params = params
        self._sched = sched
        if self._encoder_cache > 1 and sched is not None:
            from ddnm_tpu.sampling.accel import (
                key_steps_for_policy, n_model_calls)

            self._key_steps = key_steps_for_policy(
                n_model_calls(sched.is_travel), self._encoder_cache,
                self._encoder_policy)
        self._operators = dict(operators)
        self.image_size = int(image_size)
        self.max_batch = int(max_batch)
        self._eta = float(eta)
        self._sigma_y = float(sigma_y)
        self._base_key = jax.random.PRNGKey(base_seed)
        # Per-task mode + expected degraded-upload shape (shape inference
        # only — no device work). SVD measurements are channel-major flat
        # vectors; where the vector is an image we expose its (h, w, c)
        # so HTTP clients can upload the degraded PNG directly.
        size = self.image_size
        img = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
        vec = jax.ShapeDtypeStruct((1, size * size * 3), jnp.float32)
        self._is_svd = {}
        self._y_shapes = {}  # deg -> (h, w, c) accepted as degraded upload
        for name, op in self._operators.items():
            if isinstance(op, FunctionalOperator):
                self._is_svd[name] = False
                self._y_shapes[name] = jax.eval_shape(op.A, img).shape[1:]
                continue
            self._is_svd[name] = True
            m = int(jax.eval_shape(op.A, vec).shape[1])
            # the OPERATOR declares whether its measurement is an image
            # (SVDOperator.measurement_image); length alone cannot tell an
            # image from coefficients that happen to factor like one
            kind = getattr(op, "measurement_image", None)
            shape = None
            if kind == "gray":
                s = round(m**0.5)
                if s * s != m:
                    raise ValueError(
                        f"{name!r} declares a grayscale measurement but "
                        f"its length {m} is not a square")
                shape = (s, s, 1)
            elif kind == "rgb":
                s = round((m / 3) ** 0.5) if m % 3 == 0 else 0
                if s * s * 3 != m:
                    raise ValueError(
                        f"{name!r} declares an RGB measurement but its "
                        f"length {m} is not 3*k^2")
                shape = (s, s, 3)
            elif kind is not None:
                raise ValueError(
                    f"{name!r}: unknown measurement_image {kind!r}")
            self._y_shapes[name] = shape  # None -> gt uploads only
        # Which ctx tasks accept a *degraded* masked upload: only those whose
        # A_ctx is the pure keep-mask projection (then the masked upload
        # times its own mask IS A(x) exactly — A is idempotent). Checked
        # numerically on a tiny probe, not guessed from the task name.
        self._ctx_mask_projection = {}
        for name, op in self._operators.items():
            if (self._is_svd[name] or not op.has_ctx
                    or self._y_shapes[name] != (size, size, 3)):
                self._ctx_mask_projection[name] = False
                continue
            probe = jnp.asarray(
                np.random.default_rng(0).uniform(-1, 1, (1, 8, 8, 3)),
                jnp.float32)
            pmask = jnp.asarray(
                (np.random.default_rng(1).random((1, 8, 8, 1)) > 0.5),
                jnp.float32)
            self._ctx_mask_projection[name] = bool(
                np.allclose(np.asarray(op.A_ctx(probe, pmask)),
                            np.asarray(probe * pmask))
            )

    def swap_params(self, params) -> None:
        """Replace the served weights in place — ZERO recompiles.

        Params are traced ARGUMENTS of every compiled executable (never
        baked constants), so a checkpoint refresh (EMA update, fine-tune
        rollout) just swaps the arrays the next batch reads; no compiled
        program is touched. The tree structure and shapes must match what
        the executables were traced with. In-flight batches keep the old
        weights (they were already dispatched); attribute assignment is
        atomic under the GIL, so the single worker thread sees either the
        old or the new tree, never a mix."""
        old = jax.tree_util.tree_structure(self._params)
        new = jax.tree_util.tree_structure(params)
        if old != new:
            raise ValueError(
                f"param tree structure mismatch: served {old}, got {new}")
        mismatched = [
            ()
            for a, b in zip(jax.tree.leaves(self._params),
                            jax.tree.leaves(params))
            if a.shape != b.shape
        ]
        if mismatched:
            raise ValueError("param leaf shapes differ from the served tree")
        if self._mesh is not None:
            from ddnm_tpu.parallel import replicate

            params = replicate(self._mesh, params)
        self._params = params

    @property
    def tasks(self) -> tuple:
        return tuple(sorted(self._operators))

    @property
    def ctx_tasks(self) -> tuple:
        """Tasks that accept a per-request mask (RGBA upload)."""
        return tuple(sorted(
            n for n, op in self._operators.items()
            if not self._is_svd[n] and op.has_ctx))

    def ctx_degraded_ok(self, deg: str) -> bool:
        """True if `deg` accepts a *degraded* RGBA upload (pure mask op)."""
        return self._ctx_mask_projection.get(deg, False)

    def y_shape(self, deg: str):
        """(h, w, c) a degraded upload must have for `deg`, or None when
        the task only accepts `input=gt` (non-image SVD measurements)."""
        return self._y_shapes[deg]

    def is_svd(self, deg: str) -> bool:
        return self._is_svd[deg]

    def restore(
        self,
        images: np.ndarray,
        deg: str,
        seqs: Sequence[int],
        *,
        input_kind: str = "degraded",
        ctxs: Optional[np.ndarray] = None,
        classes: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        """Restore a group of <= max_batch requests for one task.

        images: (B, h, w, c) float32 in [0, 1] — the degraded observations
        (input_kind="degraded", default) or ground-truth images to degrade
        first (input_kind="gt"). seqs: one monotone sequence number per
        request (the RNG identity). `ctxs`: optional (B, H, W, 1) per-image
        keep-masks for ctx-capable tasks. `classes`: optional per-image
        class labels for class-conditional services. Returns (B, H, W, 3)
        float32 in [0, 1].

        Blocking form of restore_async + fetch.
        """
        return self.fetch(
            self.restore_async(images, deg, seqs, input_kind=input_kind,
                               ctxs=ctxs, classes=classes)
        )

    @property
    def class_cond(self) -> bool:
        """True if requests MUST carry a class label (?class=N)."""
        return False

    @property
    def num_classes(self):
        """Upper bound (exclusive) for class labels, or None if unknown."""
        return None

    def requires_ctx(self, deg: str) -> bool:
        """True if `deg` must get a per-request mask (it was configured
        without a real static one)."""
        return deg in self._require_ctx

    def restore_async(
        self,
        images: np.ndarray,
        deg: str,
        seqs: Sequence[int],
        *,
        input_kind: str = "degraded",
        ctxs: Optional[np.ndarray] = None,
        classes: Optional[Sequence[int]] = None,
    ):
        """Dispatch a group's full trajectory and return WITHOUT syncing.

        Returns a device array (B, H, W, 3) whose computation is enqueued
        but not necessarily finished — pass it to `fetch` to block and pull
        the float32 host result. Lets a caller overlap the next group's
        host work (collect/decode/dispatch) with this group's device time.
        """
        op = self._operators.get(deg)
        if op is None:
            raise KeyError(f"unknown task {deg!r}; serving {self.tasks}")
        b = int(images.shape[0])
        if not 1 <= b <= self.max_batch:
            raise ValueError(f"group size {b} not in [1, {self.max_batch}]")
        if len(seqs) != b:
            raise ValueError("one sequence number per image required")

        if classes is not None and not self.class_cond:
            raise ValueError("this service is not class-conditional")
        if ctxs is None and deg in self._require_ctx:
            raise ValueError(
                f"{deg!r} was configured without a static mask; every "
                "request must carry its own (HTTP: RGBA upload)")
        is_svd = self._is_svd[deg]
        ctx = None
        if ctxs is not None:
            if is_svd or not op.has_ctx:
                raise ValueError(
                    f"{deg!r} takes no per-request masks (no A_ctx forms)")
            ctx = jnp.asarray(ctxs, jnp.float32)
            expected_ctx = (b, self.image_size, self.image_size, 1)
            if ctx.shape != expected_ctx:
                raise ValueError(
                    f"ctxs must be {expected_ctx}, got {tuple(ctx.shape)}")

        x_in = jnp.asarray(images, jnp.float32)
        if input_kind == "gt":
            expected = (self.image_size, self.image_size, 3)
            if x_in.shape[1:] != expected:
                raise ValueError(
                    f"gt input must be {expected}, got {tuple(x_in.shape[1:])}"
                )
            xg = data_transform(x_in)
            if is_svd:
                y = op.A(_nhwc_to_vec(xg))
            else:
                y = op.A_ctx(xg, ctx) if ctx is not None else op.A(xg)
        elif input_kind == "degraded":
            if is_svd:
                spec = self._y_shapes[deg]
                if spec is None:
                    raise ValueError(
                        f"{deg!r}'s measurement is not an image; send "
                        "input=gt")
                if x_in.shape[1:] != spec:
                    raise ValueError(
                        f"degraded input for {deg!r} must be {spec}, "
                        f"got {tuple(x_in.shape[1:])}")
                yt = data_transform(x_in)
                # channel-major flat, the SVD operator layout; grayscale
                # measurements are already single-plane
                y = (yt.reshape(b, -1) if spec[-1] == 1
                     else _nhwc_to_vec(yt))
            elif ctx is not None:
                # masked upload: valid only for pure keep-mask projections,
                # where (masked image) * mask == A(x) exactly (A idempotent)
                if not self.ctx_degraded_ok(deg):
                    raise ValueError(
                        f"{deg!r} cannot take a degraded masked upload; "
                        "send input=gt with the RGBA mask instead")
                expected = (self.image_size, self.image_size, 3)
                if x_in.shape[1:] != expected:
                    raise ValueError(
                        f"masked degraded input must be {expected}, "
                        f"got {tuple(x_in.shape[1:])}")
                y = data_transform(x_in) * ctx
            else:
                if x_in.shape[1:] != self._y_shapes[deg]:
                    raise ValueError(
                        f"degraded input for {deg!r} must be "
                        f"{self._y_shapes[deg]}, got {tuple(x_in.shape[1:])}"
                    )
                y = data_transform(x_in)
        else:
            raise ValueError(f"input_kind must be 'degraded' or 'gt', got {input_kind!r}")

        # Pad to the compiled batch size. Pad lanes replicate lane 0 and get
        # dummy RNG identities; per-image key streams keep real lanes
        # bit-identical across any grouping (sampling/rng.py).
        pad = self.max_batch - b
        if pad:
            y = jnp.concatenate([y, jnp.repeat(y[:1], pad, axis=0)], axis=0)
            if ctx is not None:
                ctx = jnp.concatenate(
                    [ctx, jnp.repeat(ctx[:1], pad, axis=0)], axis=0)
        seq_arr = jnp.asarray(list(seqs) + [0] * pad, jnp.uint32)
        keys = jax.vmap(lambda s: jax.random.fold_in(self._base_key, s))(seq_arr)
        init_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        noise_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        hw = (self.image_size, self.image_size, 3)
        x_init = jax.vmap(lambda k: jax.random.normal(k, hw, jnp.float32))(init_keys)

        cls = None
        if self.class_cond:
            if classes is None:
                raise ValueError(
                    "this service is class-conditional: pass one class "
                    "label per image (HTTP: ?class=N)")
            cls = [int(c) for c in classes]
            if len(cls) != b:
                raise ValueError("one class label per image required")
            n_cls = self.num_classes
            bad = [c for c in cls if c < 0 or (n_cls and c >= n_cls)]
            if bad:
                raise ValueError(
                    f"class labels out of range [0, {n_cls}): {bad}")
            cls = jnp.asarray(cls + [0] * pad, jnp.int32)

        if self._mesh is not None:
            from ddnm_tpu.parallel import shard_batch

            x_init, y, noise_keys = shard_batch(
                self._mesh, (x_init, y, noise_keys)
            )
            if ctx is not None:
                (ctx,) = shard_batch(self._mesh, (ctx,))
            if cls is not None:
                (cls,) = shard_batch(self._mesh, (cls,))
        x = self._sample(op, deg, is_svd, x_init, y, ctx, noise_keys, cls)
        return inverse_data_transform(x[:b])

    def _sample(self, op, deg, is_svd, x_init, y, ctx, noise_keys, cls):
        """Run the padded group's trajectory; returns x_final (padded)."""
        if is_svd:
            x, _ = sample_svd(
                self._model_fn, x_init, y, op, self._sched, noise_keys,
                eta=self._eta, sigma_y=self._sigma_y, params=self._params,
                loop=self._loop,
            )
        elif self._encoder_cache > 1:
            from ddnm_tpu.sampling.accel import sample_simplified_encoder_prop

            encode_fn, decode_fn = self._split_fns
            x, _ = sample_simplified_encoder_prop(
                encode_fn, decode_fn, x_init, y, op, self._sched,
                noise_keys, eta=self._eta, sigma_y=self._sigma_y,
                interval=self._encoder_cache, key_steps=self._key_steps,
                params=self._params, op_ctx=ctx,
            )
        else:
            x, _ = sample_simplified(
                self._model_fn, x_init, y, op, self._sched, noise_keys,
                eta=self._eta, sigma_y=self._sigma_y, params=self._params,
                op_ctx=ctx, loop=self._loop,
            )
        return x

    @staticmethod
    def fetch(out) -> np.ndarray:
        """Block on a restore_async result and return it as host float32."""
        return np.asarray(jax.device_get(out), np.float32)

    def warmup(self) -> None:
        """Compile every task's executable before taking traffic —
        including the per-request-mask (ctx) variant of ctx-capable tasks,
        which is a distinct executable."""
        zero = np.zeros((1, self.image_size, self.image_size, 3), np.float32)
        ones = np.ones((1, self.image_size, self.image_size, 1), np.float32)
        cls = [0] if self.class_cond else None
        for deg in self.tasks:
            if deg in self._require_ctx:
                continue  # the maskless executable is unreachable
            self.restore(zero, deg, [0], input_kind="gt", classes=cls)
        for deg in self.ctx_tasks:
            self.restore(zero, deg, [0], input_kind="gt", ctxs=ones,
                         classes=cls)


class PosteriorRestorationService(RestorationService):
    """hq-pipeline serving: respaced posterior DDNM with time-travel.

    The online form of the reference's hq_demo face256/imagenet flow (one
    256px tile per request). model_fn(params, x, t_orig) -> (B, H, W, 2C)
    learned-range head; `tables` from `build_posterior_tables` carry the
    respacing + jump schedule + sigma_y. Functional operators only (the
    hq pipeline's task table).

    Supports the base service's per-request masks (RGBA uploads), plus —
    when `class_cond=True` — PER-REQUEST CLASS LABELS (`?class=N`): the
    label batch rides inside the traced `params` pytree
    (run_params["classes"]), so mixed-class requests coalesce into ONE
    compiled batch with no retrace. model_fn / guidance_fn must read
    p["classes"] (see serve.py --hq for the assembly).
    """

    def __init__(
        self,
        model_fn: Callable,
        params,
        tables,
        operators: Mapping[str, FunctionalOperator],
        *,
        image_size: int,
        max_batch: int = 8,
        base_seed: int = 1234,
        mesh=None,
        guidance_fn: Optional[Callable] = None,
        clip_denoised: bool = True,
        class_cond: bool = False,
        num_classes: Optional[int] = None,
        require_ctx: Sequence[str] = (),
        encoder_cache: int = 1,
        encoder_cache_policy: str = "uniform",
        split_fns=None,
        loop: str = "auto",
    ):
        super().__init__(
            model_fn, params, None, operators, image_size=image_size,
            max_batch=max_batch, base_seed=base_seed, mesh=mesh,
            require_ctx=require_ctx, encoder_cache=encoder_cache,
            encoder_cache_policy=encoder_cache_policy, split_fns=split_fns,
            loop=loop,
        )
        bad = [n for n, svd in self._is_svd.items() if svd]
        if bad:
            raise ValueError(
                f"the posterior pipeline serves functional operators only; "
                f"got SVD operators for {bad}")
        self._tables = tables
        if self._encoder_cache > 1:
            from ddnm_tpu.sampling.accel import (
                key_steps_for_policy, n_model_calls)

            self._key_steps = key_steps_for_policy(
                n_model_calls(tables.is_travel), self._encoder_cache,
                self._encoder_policy)
        self._guidance_fn = guidance_fn
        self._clip_denoised = bool(clip_denoised)
        self._class_cond = bool(class_cond)
        self._num_classes = None if num_classes is None else int(num_classes)

    @property
    def class_cond(self) -> bool:
        return self._class_cond

    @property
    def num_classes(self):
        return self._num_classes

    def _sample(self, op, deg, is_svd, x_init, y, ctx, noise_keys, cls):
        from ddnm_tpu.sampling.posterior import sample_posterior

        # the posterior loop consumes A+y (the reference passes Apy into
        # p_sample_loop, hq_demo gaussian_diffusion.py:495-530)
        apy = op.Ap_ctx(y, ctx) if ctx is not None else op.Ap(y)
        params = self._params
        if self._class_cond:
            params = dict(params)
            params["classes"] = cls
        if self._encoder_cache > 1:
            from ddnm_tpu.sampling.accel import sample_posterior_encoder_prop

            encode_fn, decode_fn = self._split_fns
            x, _ = sample_posterior_encoder_prop(
                encode_fn, decode_fn, x_init, apy, op, self._tables,
                noise_keys, interval=self._encoder_cache,
                key_steps=self._key_steps, guidance_fn=self._guidance_fn,
                clip_denoised=self._clip_denoised, op_ctx=ctx,
                params=params,
            )
        else:
            x, _ = sample_posterior(
                self._model_fn, x_init, apy, op, self._tables, noise_keys,
                guidance_fn=self._guidance_fn,
                clip_denoised=self._clip_denoised, op_ctx=ctx, params=params,
                loop=self._loop,
            )
        return x


@dataclass
class _Request:
    image: np.ndarray
    deg: str
    input_kind: str
    seq: int
    ctx: Optional[np.ndarray] = None  # per-request keep-mask (H, W, 1)
    cls: Optional[int] = None  # per-request class label (class-cond only)
    event: threading.Event = field(default_factory=threading.Event)
    # set by the handler when its client stopped waiting; the worker skips
    # cancelled requests instead of burning a device batch nobody reads
    cancelled: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[str] = None
    error_code: int = 500  # worker-side failures are server errors
    batch_size: int = 1
    t_enqueue: float = field(default_factory=time.monotonic)


class _Server(ThreadingHTTPServer):
    daemon_threads = True
    # the stdlib default listen backlog (5) drops connections under a
    # burst of simultaneous clients — size it to the worst batch burst
    request_queue_size = 128


class RestorationServer:
    """HTTP front: micro-batching queue over a RestorationService."""

    def __init__(
        self,
        service: RestorationService,
        *,
        host: str = "127.0.0.1",
        port: int = 0,
        max_wait_ms: float = 20.0,
        queue_size: int = 64,
        request_timeout_s: float = 600.0,
    ):
        self.service = service
        self.stats = ServiceStats()
        self._queue: queue.Queue[_Request] = queue.Queue(maxsize=queue_size)
        self._held: Optional[_Request] = None  # task-mismatched leftover
        self._max_wait = max_wait_ms / 1000.0
        self._request_timeout = float(request_timeout_s)
        self._seq_lock = threading.Lock()
        self._seq = 0
        self._running = False
        self._stopped = False
        handler = _make_handler(self)
        self._httpd = _Server((host, port), handler)
        self._worker: Optional[threading.Thread] = None
        self._server_thread: Optional[threading.Thread] = None

    @property
    def address(self) -> tuple:
        return self._httpd.server_address

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> None:
        self._running = True
        self._worker = threading.Thread(target=self._worker_loop, daemon=True)
        self._worker.start()
        self._server_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._server_thread.start()

    def stop(self) -> None:
        """Stop accepting work, shut the HTTP front down, and fail anything
        still pending so waiting handlers return promptly.

        The worker drains the queue itself on exit (it owns `_held`, so no
        other thread touches it while the worker may be alive). If the
        worker is mid-device-call past the join timeout, the drain happens
        when that call finishes; `submit` rejects from this point on, so no
        request can slip in after the drain."""
        self._stopped = True  # reject new submits before draining
        self._running = False
        if self._server_thread is not None:
            # shutdown() blocks on serve_forever's exit handshake, so it
            # deadlocks if the serve loop was never started — skip it then
            self._httpd.shutdown()
        self._httpd.server_close()
        if self._worker is not None:
            self._worker.join(timeout=30)
        if self._worker is None or not self._worker.is_alive():
            # worker never ran or already exited: drain here instead
            self._drain_pending()

    def _drain_pending(self) -> None:
        """Fail every un-serviced request. Called by the worker thread on
        exit, or by stop() when no worker is alive — never concurrently."""
        pending = [] if self._held is None else [self._held]
        self._held = None
        while True:
            try:
                pending.append(self._queue.get_nowait())
            except queue.Empty:
                break
        for r in pending:
            r.error = "server shutting down"
            r.error_code = 503
            r.event.set()

    # -- request path -------------------------------------------------------

    def submit(self, image: np.ndarray, deg: str, input_kind: str,
               ctx: Optional[np.ndarray] = None,
               cls: Optional[int] = None) -> _Request:
        if self._stopped:
            raise RuntimeError("server is shut down")
        with self._seq_lock:
            seq = self._seq
            self._seq += 1
        req = _Request(image=image, deg=deg, input_kind=input_kind, seq=seq,
                       ctx=ctx, cls=cls)
        self._queue.put_nowait(req)  # raises queue.Full -> 503 upstream
        if self._stopped and not req.event.is_set():
            # raced with stop(): the drains may already have run, leaving
            # this request unwatched — fail it here (event.set is
            # idempotent, so a concurrent drain doing the same is fine)
            req.error = "server shutting down"
            req.error_code = 503
            req.event.set()
        return req

    def _collect(self, first: _Request) -> list:
        """Coalesce up to max_batch same-(task, input_kind, maskedness)
        requests, waiting at most max_wait for stragglers. A mismatched
        request is held for the next group rather than reordered. Masked
        and maskless requests never share a group (their executables
        differ); different masks DO share one (the mask is a runtime
        tensor)."""
        group = [first]
        deadline = time.monotonic() + self._max_wait
        while len(group) < self.service.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if (nxt.deg == first.deg and nxt.input_kind == first.input_kind
                    and (nxt.ctx is None) == (first.ctx is None)):
                group.append(nxt)
            else:
                self._held = nxt
                break
        return group

    def _worker_loop(self) -> None:
        """Drain the queue with a ONE-DEEP dispatch/fetch pipeline.

        `in_flight` is a dispatched-but-unfetched group riding the device.
        While it computes, the loop collects and dispatches the NEXT group
        (host-only work — JAX dispatch is async), then blocks on the
        in-flight fetch. Under sustained load the device therefore never
        waits for host work between groups; when the queue is idle the
        in-flight group is fetched immediately, so single requests see no
        added latency."""
        in_flight = None  # (live_requests, device_out) awaiting fetch
        while self._running:
            first = None
            if self._held is not None:
                first, self._held = self._held, None
            else:
                try:
                    if in_flight is not None:
                        first = self._queue.get_nowait()
                    else:
                        first = self._queue.get(timeout=0.1)
                except queue.Empty:
                    pass
            if first is None:
                if in_flight is not None:
                    self._finish_group(*in_flight)
                    in_flight = None
                continue
            dispatched = self._dispatch_group(self._collect(first))
            if in_flight is not None:
                self._finish_group(*in_flight)
            in_flight = dispatched
        if in_flight is not None:
            self._finish_group(*in_flight)
        self._drain_pending()

    def _serve_group(self, group: list) -> None:
        """Run one coalesced group synchronously (dispatch + fetch)."""
        dispatched = self._dispatch_group(group)
        if dispatched is not None:
            self._finish_group(*dispatched)

    def _dispatch_group(self, group: list):
        """Enqueue one coalesced group's device work without syncing.

        Requests whose clients already gave up (handler wait timed out and
        set `cancelled`) are acknowledged without device work — otherwise
        an overloaded queue keeps computing results nobody reads. Returns
        (live_requests, device_out) for `_finish_group`, or None if nothing
        reached the device (all cancelled, or dispatch itself failed)."""
        live = [r for r in group if not r.cancelled.is_set()]
        for r in group:
            if r.cancelled.is_set():
                r.error = "cancelled: client stopped waiting"
                r.error_code = 504
                r.event.set()
        self.stats.cancelled += len(group) - len(live)
        if not live:
            return None
        try:
            images = np.stack([r.image for r in live])
            ctxs = (np.stack([r.ctx for r in live])
                    if live[0].ctx is not None else None)
            classes = ([r.cls if r.cls is not None else 0 for r in live]
                       if self.service.class_cond else None)
            out = self.service.restore_async(
                images, live[0].deg, [r.seq for r in live],
                input_kind=live[0].input_kind, ctxs=ctxs, classes=classes,
            )
        except Exception as exc:  # trace/shape-time failure: fail the group
            self._complete(live, None, exc)
            return None
        return live, out

    def _finish_group(self, live: list, out) -> None:
        """Block on a dispatched group's result and wake its handlers."""
        try:
            self._complete(live, self.service.fetch(out), None)
        except Exception as exc:  # execution-time failure surfaces here
            self._complete(live, None, exc)

    def _complete(self, live: list, results, exc) -> None:
        """Deliver results or a shared error to a group, once."""
        now = time.monotonic()
        if exc is not None:  # propagate per-request as a server error
            for r in live:
                r.error = f"{type(exc).__name__}: {exc}"
            self.stats.errors += len(live)
        else:
            for i, r in enumerate(live):
                r.result = results[i]
                r.batch_size = len(live)
        self.stats.batches += 1
        self.stats.requests += len(live)
        if len(live) > 1:
            self.stats.batched_requests += len(live)
        for r in live:
            self.stats.record_latency(now - r.t_enqueue)
            r.event.set()


def _make_handler(server: RestorationServer):
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        # quiet by default; the service is the log surface
        def log_message(self, fmt, *args):
            pass

        def _send(self, code: int, body: bytes, ctype: str, extra=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: dict):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                svc = server.service
                self._send_json(200, {
                    "status": "ok",
                    "tasks": list(svc.tasks),
                    "ctx_tasks": list(svc.ctx_tasks),
                    "svd_tasks": [t for t in svc.tasks if svc.is_svd(t)],
                    "class_cond": svc.class_cond,
                    "num_classes": svc.num_classes,
                    "mask_required": [t for t in svc.tasks
                                      if svc.requires_ctx(t)],
                    "degraded_upload": {
                        t: (list(svc.y_shape(t))
                            if svc.y_shape(t) is not None else None)
                        for t in svc.tasks},
                    "image_size": server.service.image_size,
                    "max_batch": server.service.max_batch,
                    "queue_depth": server._queue.qsize(),
                    **server.stats.as_dict(),
                })
            else:
                self._send_json(404, {"error": f"no route {path}"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/restore":
                self._send_json(404, {"error": f"no route {parsed.path}"})
                return
            q = parse_qs(parsed.query)
            deg = q.get("deg", [""])[0]
            input_kind = q.get("input", ["degraded"])[0]
            if deg not in server.service.tasks:
                self._send_json(
                    400, {"error": f"unknown deg {deg!r}",
                          "tasks": list(server.service.tasks)})
                return
            if input_kind not in ("degraded", "gt"):
                self._send_json(
                    400, {"error": f"input must be 'degraded' or 'gt', "
                                   f"got {input_kind!r}"})
                return
            cls = None
            if "class" in q:
                if not server.service.class_cond:
                    self._send_json(
                        400, {"error": "this service is not "
                                       "class-conditional"})
                    return
                n_cls = server.service.num_classes
                try:
                    cls = int(q["class"][0])
                    if cls < 0 or (n_cls is not None and cls >= n_cls):
                        raise ValueError
                except ValueError:
                    self._send_json(
                        400, {"error": f"class must be an integer in "
                                       f"[0, {n_cls}), got {q['class'][0]!r}"})
                    return
            elif server.service.class_cond:
                self._send_json(
                    400, {"error": "this service is class-conditional: "
                                   "pass ?class=N"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if not 0 < length <= _MAX_BODY:
                    self._send_json(413, {"error": "bad content length"})
                    return
                raw = self.rfile.read(length)
                img = Image.open(io.BytesIO(raw))
                has_alpha = "A" in img.getbands()
            except Exception as exc:
                self._send_json(400, {"error": f"bad image: {exc}"})
                return
            # Validate kind/shape HERE so one malformed request cannot
            # poison the coalesced batch it would have ridden in.
            size = server.service.image_size
            if not has_alpha and server.service.requires_ctx(deg):
                self._send_json(
                    400, {"error": f"{deg!r} was configured without a "
                                   "static mask; upload an RGBA PNG whose "
                                   "alpha channel is the keep-mask"})
                return
            if has_alpha:
                if deg not in server.service.ctx_tasks:
                    self._send_json(
                        400, {"error": f"{deg!r} takes no per-request mask "
                                       "(RGBA upload); tasks with mask "
                                       "support: "
                                       f"{list(server.service.ctx_tasks)}"})
                    return
                if (input_kind == "degraded"
                        and not server.service.ctx_degraded_ok(deg)):
                    self._send_json(
                        400, {"error": f"{deg!r} cannot take a degraded "
                                       "masked upload; send input=gt with "
                                       "the RGBA mask instead"})
                    return
                expected = (size, size, 3)  # masked uploads are gt-sized
            elif input_kind == "gt":
                expected = (size, size, 3)
            else:
                expected = server.service.y_shape(deg)
                if expected is None:
                    self._send_json(
                        400, {"error": f"{deg!r}'s measurement is not an "
                                       "image; send input=gt"})
                    return
            try:
                ctx = None
                if has_alpha:
                    # RGBA upload: alpha is the per-request keep-mask
                    rgba = np.asarray(img.convert("RGBA"), np.float32)
                    arr = rgba[..., :3] / 255.0
                    ctx = (rgba[..., 3:] > 127.0).astype(np.float32)
                elif expected[-1] == 1:  # grayscale measurement
                    arr = (np.asarray(img.convert("L"), np.float32)
                           / 255.0)[..., None]
                else:
                    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
            except Exception as exc:
                self._send_json(400, {"error": f"bad image: {exc}"})
                return
            if arr.shape != expected:
                self._send_json(
                    400, {"error": f"{input_kind} input for {deg!r} must be "
                                   f"{expected}, got {tuple(arr.shape)}"})
                return
            try:
                req = server.submit(arr, deg, input_kind, ctx=ctx, cls=cls)
            except queue.Full:
                self._send_json(503, {"error": "queue full"})
                return
            except RuntimeError as exc:
                self._send_json(503, {"error": str(exc)})
                return
            if not req.event.wait(timeout=server._request_timeout):
                req.cancelled.set()  # worker skips it instead of computing
                self._send_json(504, {"error": "restoration timed out"})
                return
            if req.error is not None:
                self._send_json(req.error_code, {"error": req.error})
                return
            out = np.clip(req.result * 255.0 + 0.5, 0, 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(out).save(buf, format="PNG")
            self._send(
                200, buf.getvalue(), "image/png",
                extra=[("X-Seq", str(req.seq)),
                       ("X-Batch-Size", str(req.batch_size))],
            )

    return Handler
