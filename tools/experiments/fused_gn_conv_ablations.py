"""Ablations: where does the pallas path's time go?

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
import sys
sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[2]))
from ddnm_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import fused_gn_conv as E

B, H, W, C, TH, GROUPS, N_ITER = E.B, E.H, E.W, E.C, E.TH, E.GROUPS, E.N_ITER
x, w, gamma, beta = E.x, E.w, E.gamma, E.beta


def _prologue(z, gamma, beta):
    k, bb = E.gn_stats_affine(z, gamma, beta)
    xp = jnp.pad(z, ((0, 0), (1, 1), (1, 7), (0, 0)))
    # touch k/bb so nothing is DCE'd; return something x-shaped for the loop
    return xp[:, 1:H + 1, 1:W + 1, :] + k[:, None, None, :].astype(jnp.bfloat16) + bb[:, None, None, :].astype(jnp.bfloat16)


def _stats_only(z, gamma, beta):
    k, bb = E.gn_stats_affine(z, gamma, beta)
    return z + k[:, None, None, :].astype(jnp.bfloat16) + bb[:, None, None, :].astype(jnp.bfloat16)


def _kernel_noact(x_hbm, k_ref, b_ref, w_ref, o_hbm, in_buf, out_buf, patch_buf,
                  in_sems, out_sems):
    b = pl.program_id(0)
    n_tiles = H // TH

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * TH, TH + 2)], in_buf.at[slot], in_sems.at[slot])

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            out_buf.at[slot], o_hbm.at[b, pl.ds(i * TH, TH)], out_sems.at[slot])

    in_dma(0, 0).start()

    def body(i, _):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < n_tiles)
        def _():
            in_dma(nxt, i + 1).start()

        in_dma(slot, i).wait()
        act = in_buf[slot]  # raw bf16, no normalize/act/mask
        for dy in range(3):
            for dx in range(3):
                patch_buf[:, (dy * 3 + dx) * C:(dy * 3 + dx + 1) * C] = (
                    act[dy:dy + TH, dx:dx + W, :].reshape(TH * W, C))
        res = jnp.dot(patch_buf[:, :], w_ref[:, :], preferred_element_type=jnp.float32)

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        out_buf[slot] = res.reshape(TH, W, C).astype(jnp.bfloat16)
        out_dma(slot, i).start()
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())
    out_dma((n_tiles - 1) % 2, n_tiles - 1).wait()
    out_dma(n_tiles % 2, n_tiles - 2).wait()


def _kernel_nodot(x_hbm, k_ref, b_ref, w_ref, o_hbm, in_buf, out_buf, patch_buf,
                  in_sems, out_sems):
    b = pl.program_id(0)
    n_tiles = H // TH
    kvec = k_ref[b, :].astype(jnp.float32)
    bvec = b_ref[b, :].astype(jnp.float32)

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * TH, TH + 2)], in_buf.at[slot], in_sems.at[slot])

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            out_buf.at[slot], o_hbm.at[b, pl.ds(i * TH, TH)], out_sems.at[slot])

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

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        out_buf[slot] = act[1:1 + TH, 1:1 + W, :]
        out_dma(slot, i).start()
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())
    out_dma((n_tiles - 1) % 2, n_tiles - 1).wait()
    out_dma(n_tiles % 2, n_tiles - 2).wait()


def _call(kernel, z, w, gamma, beta):
    k, bb = E.gn_stats_affine(z, gamma, beta)
    xp = jnp.pad(z, ((0, 0), (1, 1), (1, 7), (0, 0)))
    w2 = w.reshape(9 * C, C)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, W + 8, C), jnp.bfloat16),
            pltpu.VMEM((2, TH, W, C), jnp.bfloat16),
            pltpu.VMEM((TH * W, 9 * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(xp, k, bb, w2)


def loop(fn):
    @jax.jit
    def f(n, x, w, gamma, beta):
        # traced n -> one executable serves every iteration count
        return jax.lax.fori_loop(0, n, lambda i, z: fn(z, w, gamma, beta), x)
    return f


def _time(fn, n, x0, *args, reps=5):
    jax.device_get(fn(n, x0, *args))
    ts = []
    for r in range(reps):
        xr = x0 + jnp.bfloat16(r * 1e-3)
        t0 = time.perf_counter()
        jax.device_get(fn(n, xr, *args))
        ts.append(time.perf_counter() - t0)
    return np.median(ts)


def bench_loop(body, x0, *args):
    """Per-iteration compute: (t_N200 - t_N40) / 160 — tunnel transfer cancels."""
    f = loop(body)
    t_hi = _time(f, 200, x0, *args)
    t_lo = _time(f, 40, x0, *args)
    return (t_hi - t_lo) / 160 * 1e3


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    t_xla = bench_loop(lambda z, w, g, b: E._chain_raw(z, w, g, b), x, w, gamma, beta)
    t_conv = bench_loop(lambda z, w, g, b: jax.lax.conv_general_dilated(
        z, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16), x, w, gamma, beta)
    t_stats = bench_loop(lambda z, w, g, b: _stats_only(z, g, b), x, w, gamma, beta)
    t_prol = bench_loop(lambda z, w, g, b: _prologue(z, g, b), x, w, gamma, beta)
    t_noact = bench_loop(lambda z, w, g, b: _call(_kernel_noact, z, w, g, b), x, w, gamma, beta)
    t_nodot = bench_loop(lambda z, w, g, b: _call(_kernel_nodot, z, w, g, b), x, w, gamma, beta)
    t_full = bench_loop(lambda z, w, g, b: _call(E._kernel, z, w, g, b), x, w, gamma, beta)
    print(f"XLA GN+SiLU+conv    : {t_xla:7.3f} ms")
    print(f"XLA conv only       : {t_conv:7.3f} ms")
    print(f"stats only          : {t_stats:7.3f} ms")
    print(f"stats + pad         : {t_prol:7.3f} ms")
    print(f"prologue + kernel(conv only, no act) : {t_noact:7.3f} ms")
    print(f"prologue + kernel(act only, no dot)  : {t_nodot:7.3f} ms")
    print(f"prologue + kernel(full)              : {t_full:7.3f} ms")
