"""Mask-Shift tiling engine for arbitrary-size restoration.

Reproduces the reference hq_demo Mask-Shift trick
(hq_demo/guided_diffusion/gaussian_diffusion.py:344-380, 665-748): an
arbitrary HxW canvas is restored as overlapping 256x256 tiles slid in 128-px
strides; inside EVERY denoising step each tile's overlap strips (top strip if
a row above exists, left strip if a tile to the left exists) are overwritten
with the already-solved canvas content, so seams stay consistent. The last
tile of a row/column is shifted back so it ends exactly at the canvas edge,
which enlarges its overlap to 256 - (dim % 128).

TPU-native design: tile geometry (coords + paste masks) is computed host-side
by `tile_grid`; every tile then runs the SAME jitted `sample_posterior` scan
(paste as a masked blend), so the whole canvas is served by one compiled
executable regardless of tile position or canvas size.

Scheduling. Sequential mode reproduces the reference's row-major order
exactly. Parallel mode exploits the dependency structure: tile (i, j) reads
canvas content written only by (i, j-1), (i-1, j-1), (i-1, j), (i-1, j+1),
so the skewed wavefront s = 2i + j is a valid schedule — and tiles sharing
an s have pairwise-disjoint canvas reads/writes (their row ranges differ by
>=1 stride only when their column ranges are disjoint), so a whole wavefront
batches into ONE `sample_posterior` call along the batch axis. Each tile
samples from its OWN per-tile key (a key batch, sampling/rng.py), so its
noise stream is independent of how tiles are grouped: with deterministic
noise the parallel schedule is bit-identical to sequential, and with
stochastic noise every tile draws the same noise it would draw
sequentially — schedule-independent either way (both tested).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu.operators.functional import (
    FunctionalOperator,
    as_mask,
    avg_pool,
    build_functional_operator,
    color2gray,
    gray2color,
    mean_upsample,
)
from ddnm_tpu.sampling.posterior import PosteriorTables, sample_posterior

logger = logging.getLogger("ddnm_tpu")

__all__ = [
    "Tile",
    "tile_grid",
    "build_hq_operators",
    "mask_shift_sample",
    "batched_tile_sample",
]

TILE = 256
STRIDE = 128


@dataclasses.dataclass(frozen=True)
class Tile:
    """One 256x256 window on the canvas.

    (h0, w0): top-left canvas coords. (row_overlap, col_overlap): heights of
    the top/left strips that must be pasted from the already-solved canvas
    (0 when this tile is in the first row / column).
    """

    index: tuple[int, int]
    h0: int
    w0: int
    row_overlap: int
    col_overlap: int

    def paste_mask(self) -> np.ndarray:
        m = np.zeros((TILE, TILE, 1), dtype=np.float32)
        if self.row_overlap:
            m[: self.row_overlap, :, :] = 1.0
        if self.col_overlap:
            m[:, : self.col_overlap, :] = 1.0
        return m


def tile_grid(h_target: int, w_target: int) -> list[Tile]:
    """Row-major tile list matching the reference shift loops
    (gaussian_diffusion.py:665-698): shift counts ceil(dim/128)-1, last tile
    snapped to the canvas edge when dim % 128 != 0."""
    if h_target < TILE or w_target < TILE:
        raise ValueError("canvas must be at least 256x256 (use a larger scale)")

    def starts(dim: int) -> list[tuple[int, int]]:
        n = int(np.ceil(dim / STRIDE)) - 1
        out = []
        for s in range(n):
            x0 = STRIDE * s
            overlap = 0 if s == 0 else STRIDE
            if s == n - 1 and dim % STRIDE != 0:
                x0 = dim - TILE
                if s > 0:
                    overlap = TILE - dim % STRIDE
            out.append((x0, overlap))
        return out

    tiles = []
    for i, (h0, r_ov) in enumerate(starts(h_target)):
        for j, (w0, c_ov) in enumerate(starts(w_target)):
            tiles.append(Tile((i, j), h0, w0, r_ov, c_ov))
    return tiles


def build_hq_operators(
    deg: str,
    *,
    scale: int = 4,
    gt_shape: tuple[int, int],
    mask: Optional[np.ndarray] = None,
) -> tuple[FunctionalOperator, Callable]:
    """(tile-size operator, target-size A_temp) per the hq task table
    (gaussian_diffusion.py:595-643). A_temp maps the full ground truth to the
    measurement; the tile operator works on 256x256 windows.

    Mask-based tasks (inpainting / mask_color_sr): the reference only
    supports these at canvas == 256 (single tile; it gates them on
    conf.name=='face256', gaussian_diffusion.py:601-622). Here the mask is
    canvas-sized and the tile operator is CONTEXT-PARAMETERISED
    (FunctionalOperator.A_ctx): the sampler receives each tile's mask
    slice as a runtime tensor, so arbitrary-size masked restoration works
    with ONE compiled tile executable — a beyond-reference capability."""
    if deg == "sr_averagepooling":
        op = build_functional_operator(deg, image_size=TILE, deg_scale=scale)
        a_temp = lambda z: avg_pool(z, scale)
    elif deg == "colorization":
        op = build_functional_operator(deg, image_size=TILE)
        a_temp = op.A
    elif deg == "sr_color":
        op = build_functional_operator(deg, image_size=TILE, deg_scale=scale)
        a_temp = lambda z: color2gray(avg_pool(z, scale))
    elif deg in ("inpainting", "mask_color_sr"):
        if mask is None:
            raise ValueError(f"{deg} requires a mask")
        m = as_mask(mask)
        if tuple(m.shape[:2]) != tuple(gt_shape):
            raise ValueError(
                f"{deg} mask shape {tuple(m.shape[:2])} must match the "
                f"canvas {tuple(gt_shape)} (the reference's gt_keep_mask "
                "is gt-sized)"
            )
        if deg == "inpainting":
            # canvas-level closures for A_temp / Apy; per-tile ctx forms
            A_full = lambda z: z * m
            mask_ctx = lambda z, c: z * c
            op = FunctionalOperator(deg, A_full, A_full, mask_ctx, mask_ctx)
        else:  # mask_color_sr
            A_full = lambda z: avg_pool(color2gray(z * m), scale)
            Ap_full = lambda z: gray2color(mean_upsample(z, scale)) * m
            A_ctx = lambda z, c: avg_pool(color2gray(z * c), scale)
            Ap_ctx = lambda z, c: gray2color(mean_upsample(z, scale)) * c
            op = FunctionalOperator(deg, A_full, Ap_full, A_ctx, Ap_ctx)
        a_temp = op.A
    else:
        raise NotImplementedError(f"hq degradation {deg} not supported")
    return op, a_temp


def _n_model_calls(tables: PosteriorTables) -> int:
    """Model calls per trajectory (non-travel steps) — the key_steps domain."""
    from ddnm_tpu.sampling.accel import n_model_calls

    return n_model_calls(tables.is_travel)


GROUP_SIZE = 8  # wavefront chunk size (batch-8 executable, see _plan_groups)
MIN_PAD_BATCH = 4  # smallest remainder worth padding up to GROUP_SIZE


def _plan_groups(tiles, group_size: int = GROUP_SIZE,
                 min_pad_batch: int = MIN_PAD_BATCH):
    """Chunk the mask-shift tile list into wavefront execution groups.

    Tiles on the same skewed anti-diagonal (2*row + col) are mutually
    independent (each depends only on tiles above/left through the paste
    strips — reference hq_demo/guided_diffusion/gaussian_diffusion.py:
    344-380), so they may run as one batched sampler call.

    Cost-aware chunking (measured on the v5e, docs/PERFORMANCE.md):
    per-step wall cost by sampler batch is 34.5 / 80.3 / 153.7 / 126.6 ms
    for b = 1/2/4/8 — batches of 2-7 hit a sublane-padding cliff where
    they cost nearly as much as (or more than) batch 8, and the batch-8
    executable is FASTER in absolute terms than batch 4. So: take
    `group_size` (8) tiles at a time, padding >=4-tile remainders up to 8
    (126.6 device-ms beats n*34.5 from n=4 up — a near-tie in wall time
    on the dispatch-heavy dev tunnel, a clear win on direct-attached TPUs
    where one group replaces n step chains); run <=3-tile remainders as
    singles (batching 2-3 measures 16%/11% slower per tile than
    sequential).
    """
    from itertools import groupby

    skew = lambda t: 2 * t.index[0] + t.index[1]
    ordered = sorted(tiles, key=lambda t: (skew(t), t.index))
    waves = [list(g) for _, g in groupby(ordered, key=skew)]
    groups = []
    for wave in waves:
        i = 0
        while len(wave) - i >= min_pad_batch:
            groups.append(wave[i : i + group_size])
            i += group_size
        groups.extend([t] for t in wave[i:])
    return groups


def batched_tile_sample(
    model_fn,
    gts: np.ndarray,
    deg: str,
    tables: PosteriorTables,
    keys: list,
    *,
    scale: int = 4,
    resize_y: bool = False,
    masks: Optional[list] = None,
    guidance_fn=None,
    params=None,
    mesh=None,
    noise_fn=None,
    encoder_cache: int = 1,
    encoder_cache_policy: str = "uniform",
    encode_fn=None,
    decode_fn=None,
    solver: str = "ddim",
) -> dict:
    """Batch B single-tile (256x256) restorations into ONE sampler call.

    The hq dataset sweep (face256-style inpainting,
    hq_demo/conf_mgt/conf_base.py:60-106) restores many independent 256x256
    canvases — each a single Mask-Shift tile, which the per-image path runs
    at sampler batch 1, squarely on the TPU's (8, 128) sublane-padding
    cliff (docs/PERFORMANCE.md: the ADM-552M posterior step costs 34.5 ms
    at batch 1 vs 15.8 ms/image at batch 8). This routine batches B images
    into one posterior-sampler call instead.

    Bit-identical per image to B separate `mask_shift_sample` calls on
    256x256 canvases: `keys[i]` (the per-image run key, e.g.
    `fold_in(key, idx)`) is split exactly like mask_shift_sample's per-tile
    split, each image's init noise comes from its own k_init, and the
    sampler draws per-example noise from the stacked k_samp key batch
    (sampling/rng.py) — so grouping changes throughput only, never values
    (tested in tests/test_posterior_tiling.py).

    `masks[i]`: per-image (H, W[, 1]) keep-mask for the mask tasks; rides
    into the sampler as the runtime operator context (op_ctx), so every
    image in the batch can have a different mask under one executable.

    `mesh`: optional jax.sharding.Mesh — the image batch shards over the
    data axis (params must already be replicated by the caller), scaling
    the sweep linearly across chips; a 2-D ("data", "spatial") mesh
    additionally shards each image's rows (parallel/spatial.py).

    Raises ValueError when the task/geometry is not single-tile (canvas
    larger than 256, e.g. via `resize_y`): callers should fall back to
    `mask_shift_sample` per image.
    """
    gts = jnp.asarray(gts, jnp.float32)
    if gts.ndim == 3:
        gts = gts[None]
    n = int(gts.shape[0])
    if len(keys) != n:
        raise ValueError(f"need one key per image: {len(keys)} keys, {n} images")
    if TILE % scale != 0:
        raise ValueError("SR scale must divide 256")
    if resize_y:
        gts = mean_upsample(gts, scale)
    if tuple(gts.shape[1:3]) != (TILE, TILE):
        raise ValueError(
            f"batched_tile_sample needs single-tile {TILE}x{TILE} canvases, "
            f"got {tuple(gts.shape[1:3])} — use mask_shift_sample per image"
        )
    if encoder_cache > 1 and (encode_fn is None or decode_fn is None):
        raise ValueError("encoder_cache > 1 requires encode_fn and decode_fn")
    if solver != "ddim" and encoder_cache > 1:
        raise ValueError(
            "solver='multistep' does not compose with encoder_cache > 1 "
            "(the encoder-prop sampler is bound to the ddim posterior step)")

    needs_mask = deg in ("inpainting", "mask_color_sr")
    if needs_mask:
        if masks is None or len(masks) != n:
            raise ValueError(f"{deg} needs one mask per image")
        ctx_b = jnp.stack([as_mask(m) for m in masks])  # (B, H, W, 1)
        op, _ = build_hq_operators(
            deg, scale=scale, gt_shape=(TILE, TILE), mask=masks[0]
        )
        # per-image measurement through the context form (the baked A/Ap
        # closures hold image 0's mask; the ctx form is the batched truth)
        y = op.A_ctx(gts, ctx_b)
        apy = op.Ap_ctx(y, ctx_b)
    else:
        ctx_b = None
        op, a_temp = build_hq_operators(deg, scale=scale, gt_shape=(TILE, TILE))
        y = a_temp(gts)
        apy = op.Ap(y)

    # per-image RNG: EXACTLY mask_shift_sample's per-tile derivation
    # (key, k_init, k_samp = split(key, 3)), so image i's streams match its
    # sequential single-canvas run bit-for-bit
    inits, samp_keys = [], []
    for k in keys:
        _, k_init, k_samp = jax.random.split(k, 3)
        inits.append(
            jax.random.normal(k_init, (1, TILE, TILE, 3), dtype=jnp.float32)
        )
        samp_keys.append(k_samp)
    x_init_b = jnp.concatenate(inits)
    keys_b = jnp.stack(samp_keys)

    # zero paste (single tiles have no solved neighbours) — passed
    # explicitly so the executable matches mask_shift_sample's step
    paste_mask = jnp.zeros((n, TILE, TILE, 1), jnp.float32)
    paste_content = jnp.zeros_like(gts)
    if mesh is not None:
        from ddnm_tpu.parallel import shard_tiles

        x_init_b, apy, paste_mask, paste_content = shard_tiles(
            mesh, (x_init_b, apy, paste_mask, paste_content)
        )
        if ctx_b is not None:
            ctx_b = shard_tiles(mesh, ctx_b)
    noise_kw = {"noise_fn": noise_fn} if noise_fn is not None else {}
    if encoder_cache > 1:
        from ddnm_tpu.sampling.accel import (
            key_steps_for_policy,
            sample_posterior_encoder_prop,
        )

        _, x0_b = sample_posterior_encoder_prop(
            encode_fn, decode_fn, x_init_b, apy, op, tables, keys_b,
            interval=encoder_cache,
            key_steps=key_steps_for_policy(
                _n_model_calls(tables), encoder_cache, encoder_cache_policy
            ),
            paste_mask=paste_mask,
            paste_content=paste_content, guidance_fn=guidance_fn,
            params=params, op_ctx=ctx_b, **noise_kw,
        )
    else:
        _, x0_b = sample_posterior(
            model_fn, x_init_b, apy, op, tables, keys_b,
            paste_mask=paste_mask, paste_content=paste_content,
            guidance_fn=guidance_fn, params=params, op_ctx=ctx_b,
            solver=solver, **noise_kw,
        )
    return {
        "final": np.asarray(x0_b),
        "apy": np.asarray(apy),
        "y": np.asarray(y),
    }


def mask_shift_sample(
    model_fn,
    gt: np.ndarray,
    deg: str,
    tables: PosteriorTables,
    key: jax.Array,
    *,
    scale: int = 4,
    resize_y: bool = False,
    mask: Optional[np.ndarray] = None,
    guidance_fn=None,
    params=None,
    parallel: bool = False,
    mesh=None,
    noise_fn=None,
    progress_fn: Optional[Callable[[Tile, np.ndarray], None]] = None,
    tile_init: Optional[str] = None,
    init_noise: Optional[np.ndarray] = None,
    encoder_cache: int = 1,
    encoder_cache_policy: str = "uniform",
    encode_fn=None,
    decode_fn=None,
    checkpoint_dir=None,
    resume: bool = False,
    resume_salt=None,
    solver: str = "ddim",
) -> dict:
    """Restore an arbitrary-size image with Mask-Shift DDNM.

    gt: (1, H, W, 3) float32 in [-1, 1] (NHWC). Returns dict with the final
    canvas, A+y canvas and y (all NHWC numpy, [-1, 1] domain).

    `parallel=True` batches each s = 2i+j wavefront of independent tiles
    into a single sampler call (see module docstring) — a large speedup for
    big canvases on accelerators, exact for deterministic noise. With a
    `mesh` (jax.sharding.Mesh), tile batches are sharded across chips
    (params replicate): a 1-D ("data",) mesh splits the wavefront batch
    when its padded size divides the device count; a 2-D
    ("data", "spatial") mesh from `parallel.make_mesh_2d` additionally
    shards each tile's rows — spatial partitioning that scales even the
    sequential reference-parity chain (see parallel/spatial.py).

    `tile_init` selects each tile's starting state:
      - "carry" (default when sequential): REFERENCE PARITY — the reference
        initialises `image_after_step` once and never resets it between
        tiles (gaussian_diffusion.py:572-575, reused at :704-734), so every
        tile after the first starts from the previous tile's final sample.
      - "fresh" (default when parallel, required by the wavefront schedule):
        each tile starts from independent gaussian noise — the
        statistically-proper initialisation of x_{t_T}, and the only one
        compatible with running independent tiles concurrently.
    `init_noise`: optional (1, 256, 256, 3) array for the first tile's init
    (the reference's explicit `noise` argument); defaults to a draw from
    this tile's fold-in key.

    `progress_fn(tile, x0_hat)` is called after each tile completes (the
    reference saves intermediate tiles every 25 steps; we expose a hook
    instead of hard-coded PNG writes).

    `encoder_cache > 1` (with `encode_fn`/`decode_fn`, see
    sampling/accel.py) reuses UNet encoder features across that many model
    calls per tile — an APPROXIMATE opt-in acceleration.

    `checkpoint_dir`: persist the canvas + completed-tile set (and the
    carry state in "carry" mode) after every tile group, so an
    interrupted large-canvas run (2K-class jobs run for many minutes)
    restarts at tile granularity with `resume=True` instead of from
    scratch. Requires the same seed/schedule as the interrupted run
    (per-tile keys are derived deterministically from `key`); state from
    a different canvas/schedule is ignored with a warning. Costs one
    canvas fetch per group — leave unset for zero overhead.
    """
    if encoder_cache > 1 and (encode_fn is None or decode_fn is None):
        raise ValueError("encoder_cache > 1 requires encode_fn and decode_fn")
    if solver != "ddim" and encoder_cache > 1:
        raise ValueError(
            "solver='multistep' does not compose with encoder_cache > 1 "
            "(the encoder-prop sampler is bound to the ddim posterior step)")
    if tile_init is None:
        # multistep defaults to fresh per-tile inits: the deterministic ODE
        # solver requires each tile's init at the chain's top noise level,
        # while the reference's sequential carry (gaussian_diffusion.py:
        # 684,698) hands it a nearly-clean state (measured ~9 dB cost at low
        # NFE; ddim's contractive stochastic update self-corrects instead).
        tile_init = "fresh" if (parallel or solver != "ddim") else "carry"
    if tile_init not in ("carry", "fresh"):
        raise ValueError(f"tile_init must be 'carry' or 'fresh', got {tile_init!r}")
    if tile_init == "carry" and parallel:
        raise ValueError(
            "tile_init='carry' serialises the tile chain; use tile_init='fresh' "
            "with parallel=True (fresh is the parallel default)"
        )
    gt = jnp.asarray(gt, jnp.float32)
    if gt.ndim == 3:
        gt = gt[None]
    if TILE % scale != 0:
        raise ValueError("SR scale must divide 256")

    if resize_y:
        # treat the input as the measurement and upsample it to the target
        # canvas (gaussian_diffusion.py:590-592)
        gt = mean_upsample(gt, scale)

    op, a_temp = build_hq_operators(deg, scale=scale, gt_shape=gt.shape[1:3], mask=mask)
    y_temp = a_temp(gt)
    apy_temp = op.Ap(y_temp)
    h_target, w_target = int(apy_temp.shape[1]), int(apy_temp.shape[2])

    tiles = tile_grid(h_target, w_target)
    canvas = jnp.zeros((1, h_target, w_target, 3), dtype=jnp.float32)
    apy_dev = jnp.asarray(apy_temp)

    # context-parameterised operator (canvas-sized mask): upload the mask
    # canvas once; each tile's slice rides into the sampler as a runtime
    # tensor (see build_hq_operators)
    ctx_canvas = None
    if op.has_ctx:
        ctx_canvas = as_mask(mask)[None]  # (1, H, W, 1)

    # per-tile RNG assigned in row-major order, so both schedules draw the
    # same per-tile init keys
    tile_keys = {}
    for tile in tiles:
        key, k_init, k_samp = jax.random.split(key, 3)
        tile_keys[tile.index] = (k_init, k_samp)

    if parallel:
        groups = _plan_groups(tiles)
    else:
        groups = [[t] for t in tiles]

    logger.info(
        "mask-shift: canvas %dx%d, %d tiles in %d %s steps",
        h_target, w_target, len(tiles), len(groups),
        "wavefront" if parallel else "sequential",
    )

    # Device-resident canvas pipeline: every per-group tensor (apy/content
    # tile slices, paste masks, tile inits, canvas writes) is produced ON
    # device by three shared jitted helpers with *dynamic* offsets — one
    # executable each regardless of tile position — so the whole multi-tile
    # run streams through the dispatch queue with zero host<->device
    # round-trips until the final canvas fetch. (The previous host-side
    # numpy assembly cost ~2x the sampler itself on the remote-execution
    # backend: ~25 MB of uploads per 8-tile group.)
    @jax.jit
    def _take_tile(img, h0, w0):
        return jax.lax.dynamic_slice(
            img, (0, h0, w0, 0), (1, TILE, TILE, img.shape[-1])
        )

    # donate the canvas: the old buffer is dead after reassignment, and
    # without donation every per-tile write copies the full canvas in HBM
    @partial(jax.jit, donate_argnums=(0,))
    def _put_tile(img, tile, h0, w0):
        return jax.lax.dynamic_update_slice(img, tile, (0, h0, w0, 0))

    @jax.jit
    def _tile_init(key):
        return jax.random.normal(key, (1, TILE, TILE, 3), dtype=jnp.float32)

    masks_dev = jnp.asarray(
        np.stack([t.paste_mask() for t in tiles])
    )  # (n_tiles, TILE, TILE, 1), uploaded once
    tile_pos = {t.index: i for i, t in enumerate(tiles)}

    @jax.jit
    def _take_mask(masks, i):
        return jax.lax.dynamic_slice(
            masks, (i, 0, 0, 0), (1,) + masks.shape[1:]
        )

    carry_x = None
    first_init = None
    if init_noise is not None:
        first_init = jnp.asarray(init_noise, jnp.float32).reshape(1, TILE, TILE, 3)
        if tile_init == "carry":
            carry_x = first_init

    # tile-granular checkpoint/resume (opt-in; see docstring)
    done: set = set()
    ckpt_path = None
    if checkpoint_dir is not None:
        import hashlib
        from pathlib import Path as _Path

        _Path(checkpoint_dir).mkdir(parents=True, exist_ok=True)
        ckpt_path = _Path(checkpoint_dir) / "mask_shift_state.npz"
        # full run identity: geometry/schedule flags AND the input image,
        # measurement setup, RNG key and the COMPLETE timestep tables
        # (lambda/gamma encode sigma_y, travel_shift encodes
        # inpa_inj_time_shift) — a checkpoint from any other run must
        # never be replayed. `resume_salt` lets callers fold in identity
        # the tiling layer can't see (class label, classifier scale, ...).
        h = hashlib.sha256()
        h.update(repr((h_target, w_target, parallel, tile_init, deg,
                       scale, resize_y, encoder_cache, resume_salt)).encode())
        h.update(np.asarray(gt).tobytes())
        if mask is not None:
            h.update(np.asarray(as_mask(mask)).tobytes())
        kd = (jax.random.key_data(key)
              if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key)
        h.update(np.asarray(kd).tobytes())
        for leaf in jax.tree_util.tree_leaves(tables):
            h.update(np.asarray(leaf).tobytes())
        meta = np.frombuffer(h.digest(), dtype=np.uint8)
        if resume and ckpt_path.exists():
            state = np.load(ckpt_path)
            if np.array_equal(state["meta"], meta):
                canvas = jnp.asarray(state["canvas"])
                done = set(map(tuple, state["done"].tolist()))
                if tile_init == "carry" and "carry_x" in state:
                    carry_x = jnp.asarray(state["carry_x"])
                logger.info("resume: %d/%d tiles already done",
                            len(done), len(tiles))
            else:
                logger.warning(
                    "resume: checkpoint %s is from a DIFFERENT run "
                    "(input/seed/schedule mismatch) — starting fresh",
                    ckpt_path)

    def _save_state():
        arrays = dict(meta=meta, canvas=np.asarray(canvas),
                      done=np.asarray(sorted(done), dtype=np.int64))
        if tile_init == "carry" and carry_x is not None:
            arrays["carry_x"] = np.asarray(carry_x)
        tmp = ckpt_path.with_suffix(".tmp.npz")
        np.savez(tmp, **arrays)
        tmp.replace(ckpt_path)  # atomic: never a torn state file

    for group in groups:
        if done and all(t.index in done for t in group):
            continue
        n = len(group)
        # pad >1-tile batches to 8 (repeat the first tile): one compiled
        # step variant serves every wavefront width, and batch 8 is the
        # fastest executable per tile (see chunking note above)
        pad = (8 - n if n > 1 else 0) if parallel else 0
        padded = group + [group[0]] * pad
        apy_b = jnp.concatenate([_take_tile(apy_dev, t.h0, t.w0) for t in padded])
        mask_b = jnp.concatenate(
            [_take_mask(masks_dev, tile_pos[t.index]) for t in padded]
        )
        content_b = jnp.concatenate([_take_tile(canvas, t.h0, t.w0) for t in padded])
        ctx_b = None
        if ctx_canvas is not None:
            ctx_b = jnp.concatenate(
                [_take_tile(ctx_canvas, t.h0, t.w0) for t in padded]
            )
        if tile_init == "carry" and carry_x is not None:
            x_init_b = carry_x  # previous tile's final sample (or init_noise)
        else:
            x_init_b = jnp.concatenate([
                first_init if (t.index == (0, 0) and first_init is not None)
                else _tile_init(tile_keys[t.index][0])
                for t in padded
            ])
        if mesh is not None:
            from ddnm_tpu.parallel import shard_tiles

            # 1-D data mesh: shard the tile batch; 2-D (data, spatial)
            # mesh: additionally shard each tile's rows (spatial
            # partitioning — scales even the sequential batch-1 chain)
            x_init_b, apy_b, mask_b, content_b = shard_tiles(
                mesh, (x_init_b, apy_b, mask_b, content_b)
            )
            if ctx_b is not None:
                ctx_b = shard_tiles(mesh, ctx_b)
        noise_kw = {"noise_fn": noise_fn} if noise_fn is not None else {}
        # per-tile sampling keys, stacked: each tile draws from its OWN
        # stream, so a tile's noise is identical whether it runs alone
        # (sequential) or inside any wavefront batch — parallel runs are
        # schedule-independent even with stochastic noise (sampling/rng.py)
        keys_b = jnp.stack([tile_keys[t.index][1] for t in padded])
        if encoder_cache > 1:
            from ddnm_tpu.sampling.accel import (
                key_steps_for_policy,
                sample_posterior_encoder_prop,
            )

            x_b, x0_b = sample_posterior_encoder_prop(
                encode_fn, decode_fn, x_init_b, apy_b, op, tables,
                keys_b,
                interval=encoder_cache,
                key_steps=key_steps_for_policy(
                    _n_model_calls(tables), encoder_cache,
                    encoder_cache_policy,
                ),
                paste_mask=mask_b,
                paste_content=content_b, guidance_fn=guidance_fn,
                params=params, op_ctx=ctx_b, **noise_kw,
            )
        else:
            x_b, x0_b = sample_posterior(
                model_fn,
                x_init_b,
                apy_b,
                op,
                tables,
                keys_b,
                paste_mask=mask_b,
                paste_content=content_b,
                guidance_fn=guidance_fn,
                params=params,
                op_ctx=ctx_b,
                solver=solver,
                **noise_kw,
            )
        if tile_init == "carry":
            carry_x = x_b
        for i, t in enumerate(group):
            canvas = _put_tile(canvas, x0_b[i : i + 1], t.h0, t.w0)
            if progress_fn is not None:
                progress_fn(t, np.asarray(x0_b[i : i + 1]))
        if ckpt_path is not None:
            done.update(t.index for t in group)
            _save_state()

    if ckpt_path is not None and ckpt_path.exists():
        ckpt_path.unlink()  # run completed: never replay this state

    return {
        "final": np.asarray(canvas),
        "apy": np.asarray(apy_dev),
        "y": np.asarray(y_temp),
    }
