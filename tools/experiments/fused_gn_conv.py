"""Kernel v2: im2col single-dot fused GN+SiLU+conv.

See docs/PERFORMANCE.md 'Fused GN+SiLU+conv Pallas kernel: tried, measured,
XLA wins again' for the conclusions; this is an archived reproducible
experiment, not a production path.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 8, 256, 256, 128
TH = 16
GROUPS = 32
N_ITER = 50

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C), jnp.float32) * 0.05).astype(jnp.bfloat16)
gamma = jnp.ones((C,), jnp.float32)
beta = jnp.zeros((C,), jnp.float32)


def gn_stats_affine(z, gamma, beta):
    xf = z.astype(jnp.float32).reshape(B, H * W, GROUPS, C // GROUPS)
    mu = xf.mean(axis=(1, 3))
    var = ((xf - mu[:, None, :, None]) ** 2).mean(axis=(1, 3))
    inv = jax.lax.rsqrt(var + 1e-5)
    k = jnp.repeat(inv, C // GROUPS, axis=1) * gamma[None]
    bb = beta[None] - jnp.repeat(mu * inv, C // GROUPS, axis=1) * gamma[None]
    return k, bb


def _chain_raw(z, w, gamma, beta):
    xf = z.astype(jnp.float32).reshape(B, H * W, GROUPS, C // GROUPS)
    mu = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(B, H, W, C)
    xn = xn * gamma + beta
    h = (xn * jax.nn.sigmoid(xn)).astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        h, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def _kernel(x_hbm, k_ref, b_ref, w_ref, o_hbm, in_buf, out_buf, patch_buf,
            in_sems, out_sems):
    b = pl.program_id(0)
    n_tiles = H // TH
    kvec = k_ref[b, :].astype(jnp.float32)
    bvec = b_ref[b, :].astype(jnp.float32)

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * TH, TH + 2)], in_buf.at[slot], in_sems.at[slot]
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            out_buf.at[slot], o_hbm.at[b, pl.ds(i * TH, TH)], out_sems.at[slot]
        )

    in_dma(0, 0).start()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W + 8, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W + 8, 1), 1)

    def body(i, _):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < n_tiles)
        def _():
            in_dma(nxt, i + 1).start()

        in_dma(slot, i).wait()
        raw = in_buf[slot].astype(jnp.float32)
        xn = raw * kvec + bvec
        act = xn * jax.nn.sigmoid(xn)
        grow = row_ids + i * TH
        inside = (grow >= 1) & (grow <= H) & (col_ids >= 1) & (col_ids <= W)
        act = jnp.where(inside, act, 0.0).astype(jnp.bfloat16)

        for dy in range(3):
            for dx in range(3):
                patch_buf[:, (dy * 3 + dx) * C:(dy * 3 + dx + 1) * C] = (
                    act[dy:dy + TH, dx:dx + W, :].reshape(TH * W, C)
                )

        res = jnp.dot(patch_buf[:, :], w_ref[:, :],
                      preferred_element_type=jnp.float32)

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        out_buf[slot] = res.reshape(TH, W, C).astype(jnp.bfloat16)
        out_dma(slot, i).start()
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())
    out_dma((n_tiles - 1) % 2, n_tiles - 1).wait()
    out_dma(n_tiles % 2, n_tiles - 2).wait()


def _pallas_raw(z, w, gamma, beta):
    k, bb = gn_stats_affine(z, gamma, beta)
    xp = jnp.pad(z, ((0, 0), (1, 1), (1, 7), (0, 0)))
    w2 = w.reshape(9 * C, C)  # (dy, dx, Cin) -> rows, matches patch layout
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, W + 8, C), jnp.bfloat16),
            pltpu.VMEM((2, TH, W, C), jnp.bfloat16),
            pltpu.VMEM((TH * W, 9 * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(xp, k, bb, w2)


@jax.jit
def loop_xla(x, w, gamma, beta):
    return jax.lax.fori_loop(0, N_ITER, lambda i, z: _chain_raw(z, w, gamma, beta), x)


@jax.jit
def loop_pallas(x, w, gamma, beta):
    return jax.lax.fori_loop(0, N_ITER, lambda i, z: _pallas_raw(z, w, gamma, beta), x)


def bench_loop(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) / N_ITER * 1e3


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    ref = jax.jit(_chain_raw)(x, w, gamma, beta)
    out = jax.jit(_pallas_raw)(x, w, gamma, beta)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f"max |diff| vs XLA chain: {err:.5f}")
    flops = 2 * B * H * W * 9 * C * C
    t1 = bench_loop(loop_xla, x, w, gamma, beta)
    t3 = bench_loop(loop_pallas, x, w, gamma, beta)
    print(f"LOOPED XLA GN+SiLU+conv : {t1:8.3f} ms/iter ({flops/t1/1e9:.1f} TFLOP/s)")
    print(f"LOOPED Pallas im2col    : {t3:8.3f} ms/iter ({flops/t3/1e9:.1f} TFLOP/s)")
