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
