"""Parity tests for the Pallas kernels (run in interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu.ops import fused_attention, fwht, hadamard_matrix


def _butterfly_fwht(a: np.ndarray, norm: float) -> np.ndarray:
    """The reference's log2(P)-pass butterfly (svd_operators.py:212-222)."""
    shape = a.shape
    p = shape[-1]
    a = a.reshape(-1, p).astype(np.float64)
    h = 1
    while h < p:
        a = a.reshape(a.shape[0], -1, 2 * h)
        x, y = a[..., :h], a[..., h:]
        a = np.concatenate([x + y, x - y], axis=-1).reshape(a.shape[0], p)
        h *= 2
    return (a / norm).reshape(shape)


def test_hadamard_matrix_orthogonal():
    for n in [2, 8, 64]:
        h = hadamard_matrix(n)
        np.testing.assert_allclose(h @ h.T, n * np.eye(n), atol=0)


def test_fwht_matches_butterfly():
    rng = np.random.default_rng(0)
    for p in [64, 256, 1024, 4096]:
        x = rng.standard_normal((2, 3, p)).astype(np.float32)
        norm = float(np.sqrt(p))
        ours = np.asarray(fwht(jnp.asarray(x), norm, force="xla"))
        ref = _butterfly_fwht(x, norm)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_fwht_pallas_interpret_matches_xla():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 1024)).astype(np.float32)
    a = np.asarray(fwht(jnp.asarray(x), 32.0, force="xla"))
    b = np.asarray(fwht(jnp.asarray(x), 32.0, force="interpret"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fwht_self_inverse():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    norm = 64.0  # sqrt(4096): self-inverse normalisation
    y = fwht(fwht(jnp.asarray(x), norm, force="xla"), norm, force="xla")
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-4, atol=1e-4)


def test_fused_attention_interpret_matches_xla():
    rng = np.random.default_rng(3)
    b, t, c = 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    scale = c ** -0.5
    a = np.asarray(fused_attention(q, k, v, scale, force="xla"))
    p = np.asarray(fused_attention(q, k, v, scale, force="interpret"))
    np.testing.assert_allclose(a, p, rtol=2e-5, atol=2e-5)


def test_group_norm_xla_matches_flax():
    """ops.group_norm's XLA path == flax nn.GroupNorm (fp32, fast variance)
    followed by swish — the exact math GroupNormF32 + swish compute."""
    import jax
    from flax import linen as nn
    from ddnm_tpu.ops import group_norm

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(64), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(64), jnp.float32)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    ref = ref * jax.nn.sigmoid(ref)
    ours = group_norm(x, scale, bias, num_groups=32, eps=1e-6, swish=True,
                      force="xla")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_group_norm_interpret_matches_xla():
    """Pallas kernel (interpret mode) == XLA path, incl. FiLM fusion."""
    from ddnm_tpu.ops import group_norm

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(128), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(128), jnp.float32)
    fs = jnp.asarray(0.1 * rng.standard_normal((2, 128)), jnp.float32)
    ft = jnp.asarray(0.1 * rng.standard_normal((2, 128)), jnp.float32)
    for kw in [dict(), dict(swish=True), dict(swish=True, film_scale=fs, film_shift=ft)]:
        a = group_norm(x, scale, bias, num_groups=32, eps=1e-5, force="xla", **kw)
        b = group_norm(x, scale, bias, num_groups=32, eps=1e-5,
                       force="interpret", **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=str(kw))
