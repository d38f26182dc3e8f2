"""Probe: does removing the decoder skip-concat kill the layout-flip copies?

Headline-trace finding (tools/experiments/headline_roofline.py): six 0.4 ms
copies per step transpose 134 MB residual outputs from the natural NHWC
{3,0,2,1} layout to {2,3,1,0} — XLA flips every operand of the decoder's
channel `concatenate` (unet_ddpm.py:232) before the up-block consumes it.
~2.4 ms of the 29.35 ms step (8%).

Hypothesis: an up-block that consumes (h, skip) as a PAIR — GroupNorm group
statistics assembled from per-half per-channel sums, conv1/nin kernels
sliced per half and the partial convs summed — is mathematically identical
(modulo conv-accumulation order) and needs no concat, hence no flips.

This probe times ONE up-block at the flagship's level-0 shapes
(8x256x256, 128+128ch) both ways on the real chip, N iterations inside one
jit (noise amortises dispatch), and counts transposing copies in each
compiled module.

  python tools/experiments/skip_concat_probe.py [--iters 30]
"""

from __future__ import annotations

import argparse
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--runs", type=int, default=3)
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddnm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B, R, C = 8, 256, 128
    G, EPS = 32, 1e-6
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    h0 = jax.random.normal(k1, (B, R, R, C), jnp.bfloat16)
    s0 = jax.random.normal(k2, (B, R, R, C), jnp.bfloat16)
    w1 = jax.random.normal(k3, (3, 3, 2 * C, C), jnp.float32) * 0.05
    wn = jax.random.normal(k4, (1, 1, 2 * C, C), jnp.float32) * 0.05
    scale = jnp.ones((2 * C,), jnp.float32)
    bias = jnp.zeros((2 * C,), jnp.float32)

    def gn_full(x):
        xf = x.astype(jnp.float32)
        xg = xf.reshape(B, R * R, G, (2 * C) // G)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = (xg * xg).mean(axis=(1, 3), keepdims=True) - mean * mean
        y = (xg - mean) * jax.lax.rsqrt(var + EPS)
        y = y.reshape(B, R, R, 2 * C) * scale + bias
        return y.astype(x.dtype)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1),
            "SAME" if w.shape[0] == 3 else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def block_concat(h, s):
        x = jnp.concatenate([h, s], axis=-1)
        y = jax.nn.silu(gn_full(x).astype(jnp.float32)).astype(h.dtype)
        out = conv(y, w1) + conv(x, wn)
        return out

    def gn_split_affine(h, s):
        """Per-(B, channel) effective affine of GN over the VIRTUAL concat,
        from per-half channel sums — no concat of the big tensors."""
        n = R * R * ((2 * C) // G)
        stats = []
        for part in (h, s):
            pf = part.astype(jnp.float32)
            stats.append((pf.sum(axis=(1, 2)), (pf * pf).sum(axis=(1, 2))))
        s1 = jnp.concatenate([stats[0][0], stats[1][0]], axis=-1)  # (B, 2C)
        s2 = jnp.concatenate([stats[0][1], stats[1][1]], axis=-1)
        g1 = s1.reshape(B, G, -1).sum(-1)
        g2 = s2.reshape(B, G, -1).sum(-1)
        mean = g1 / n
        var = jnp.maximum(g2 / n - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + EPS)
        rep = (2 * C) // G
        a = jnp.repeat(rstd, rep, axis=1) * scale[None]
        b = bias[None] - jnp.repeat(mean * rstd, rep, axis=1) * scale[None]
        return a, b

    def block_split(h, s):
        a, b = gn_split_affine(h, s)
        yh = jax.nn.silu(h.astype(jnp.float32) * a[:, None, None, :C]
                         + b[:, None, None, :C]).astype(h.dtype)
        ys = jax.nn.silu(s.astype(jnp.float32) * a[:, None, None, C:]
                         + b[:, None, None, C:]).astype(s.dtype)
        out = (conv(yh, w1[:, :, :C]) + conv(ys, w1[:, :, C:])
               + conv(h, wn[:, :, :C]) + conv(s, wn[:, :, C:]))
        return out

    def chain(block):
        def run(h, s):
            def body(carry, _):
                hh, ss = carry
                out = block(hh, ss)
                # feed outputs back (keeps shapes static, defeats CSE)
                return (out, ss + 0.001 * out.astype(ss.dtype)), ()

            (hf, sf), _ = jax.lax.scan(body, (h, s), None, length=ns.iters)
            # scalar result: fetching a 134 MB tensor through the remote
            # tunnel would dominate the timing
            return jnp.sum(hf.astype(jnp.float32))
        return jax.jit(run)

    # numerics check (same backend, same inputs; jitted — eager ops compile
    # one-by-one through the remote tunnel and take minutes)
    out_c = jax.jit(block_concat)(h0, s0)
    out_s = jax.jit(block_split)(h0, s0)
    diff = float(jnp.max(jnp.abs(out_c.astype(jnp.float32)
                                 - out_s.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(out_c.astype(jnp.float32))))
    print(f"# max |concat - split| = {diff:.3e} (max |out| {ref:.3e})")

    for name, block in (("concat", block_concat), ("split", block_split)):
        fn = chain(block)
        lowered = fn.lower(h0, s0)
        compiled = lowered.compile()
        txt = compiled.as_text()
        flips = len(re.findall(
            r"= bf16\[8,256,256,\d+\]\{(?!3,0,2,1)[\d,]+[^}]*\} copy\(", txt))
        out = fn(h0, s0)
        jax.device_get(out)  # warm
        times = []
        for _ in range(ns.runs):
            t0 = time.perf_counter()
            out = fn(h0, s0)
            jax.device_get(out)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"# {name}: {med / ns.iters * 1e3:.3f} ms/block-iter "
              f"(runs {[round(t, 3) for t in times]}; "
              f"{flips} non-natural-layout big copies in HLO)")


if __name__ == "__main__":
    main()
