"""Concrete SVD degradation operators (TPU-native).

Each operator realises A = U diag(s) V^T matrix-free over flattened (B, N)
batches in the reference's channel-major vector layout. Construction happens
host-side in NumPy (tiny SVDs, permutation tables); runtime methods are pure
jnp and trace into the jitted sampling graph: reshapes/transposes for the
patch/needle choreography, small batched matmuls for the V/U factors (MXU),
and precomputed gathers instead of the reference's scatter assignments.

Behavioural parity targets (file:line in /root/reference):
  functions/svd_operators.py — CS :101, GeneralA :173, WalshHadamardCS :211,
  Inpainting :324, Denoising :442, SuperResolution :479, Colorization :627,
  SRConv :851, Deblurring :934, Deblurring2D :1094.

REFERENCE-QUIRK (replicated intentionally): `Deblurring.singulars()` and
`Deblurring2D.singulars()` tile the D^2 singular values 3x channel-major
(`repeat(1, 3)`, svd_operators.py:1001,1163) while their Vt output layout is
pixel-major channel-interleaved — so the effective diagonal is scrambled and
A is *not* the separable blur (verified empirically against the oracle).
The pipeline is self-consistent (y is synthesised by the same A), so parity
requires replicating the layout, not "fixing" it. `Deblurring.Lambda`, by
contrast, uses the interleave-consistent per-pixel layout (:1034) — also
replicated.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu.operators.base import (
    SVDOperator,
    ddnm_plus_lambda,
    ddnm_plus_noise_coeffs,
)

__all__ = [
    "Denoising",
    "Colorization",
    "Inpainting",
    "SuperResolution",
    "SRConv",
    "Deblurring",
    "Deblurring2D",
    "WalshHadamardCS",
    "BlockCS",
    "GeneralA",
    "bicubic_kernel",
    "build_svd_operator",
]


def _mm(a, b):
    """Matmul at fp32 MXU precision: these factors are tiny but parity-critical
    (TPU fp32 matmuls otherwise default to bf16 passes)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _interleave(x):
    """(B, C, P) -> (B, P*C) pixel-major channel-interleaved flatten."""
    return jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)


def _deinterleave(v, channels):
    """(B, P*C) -> (B, C, P)."""
    return jnp.swapaxes(v.reshape(v.shape[0], -1, channels), 1, 2)


def _np_svd(a: np.ndarray):
    """Full SVD with V returned column-major like torch.svd (A = U s V^T)."""
    u, s, vh = np.linalg.svd(a.astype(np.float64), full_matrices=True)
    return (
        u.astype(np.float32),
        s.astype(np.float32),
        vh.T.astype(np.float32),
    )


# ---------------------------------------------------------------------------
# Denoising (A = I)
# ---------------------------------------------------------------------------
class Denoising(SVDOperator):
    """Identity operator; Lambda/Lambda_noise reduce to scalar Eq.19/51
    branches (svd_operators.py:442-476)."""

    measurement_image = 'rgb'

    def __init__(self, channels: int, img_dim: int):
        self.channels = channels
        self.img_dim = img_dim
        self._singulars = jnp.ones(channels * img_dim**2, dtype=jnp.float32)

    def V(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Vt = V
    U = V
    Ut = V
    add_zeros = V
    range_project = V  # A+ A = I

    def singulars(self):
        return self._singulars

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        factor = jnp.where(
            sigma_t < a * sigma_y, sigma_t * (1 - eta**2) ** 0.5 / (a * sigma_y), 1.0
        )
        return vec * factor

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        factor = jnp.where(
            sigma_t >= a * sigma_y,
            jnp.sqrt(jnp.maximum(sigma_t**2 - a**2 * sigma_y**2, 0.0)),
            sigma_t * eta,
        )
        return vec * factor


# ---------------------------------------------------------------------------
# Colorization (per-pixel 1x3 averaging)
# ---------------------------------------------------------------------------
class Colorization(SVDOperator):
    """Per-pixel "needle" operator: SVD of [[0.3333, 0.3334, 0.3333]]
    (svd_operators.py:627-736)."""

    measurement_image = 'gray'

    def __init__(self, img_dim: int):
        self.channels = 3
        self.img_dim = img_dim
        u, s, v = _np_svd(np.array([[0.3333, 0.3334, 0.3333]]))
        self._u00 = float(u[0, 0])
        self._s_small = jnp.asarray(s)  # (1,)
        self._v_small = jnp.asarray(v)  # (3, 3)
        # spectral-component singulars padded to needle length
        self._s_needle = jnp.asarray(np.array([s[0], 0.0, 0.0], np.float32))

    def _needles(self, vec):
        return jnp.swapaxes(vec.reshape(vec.shape[0], self.channels, -1), 1, 2)

    def V(self, vec):
        needles = _mm(self._needles(vec), self._v_small.T)
        return jnp.swapaxes(needles, 1, 2).reshape(vec.shape[0], -1)

    def Vt(self, vec):
        needles = _mm(self._needles(vec), self._v_small)
        return jnp.swapaxes(needles, 1, 2).reshape(vec.shape[0], -1)

    def U(self, vec):
        return self._u00 * vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.tile(self._s_small, self.img_dim**2)

    def add_zeros(self, vec):
        out = jnp.zeros(
            (vec.shape[0], self.channels * self.img_dim**2), vec.dtype
        )
        return out.at[:, : self.img_dim**2].set(vec.reshape(vec.shape[0], -1))

    def range_project(self, vec):
        # P = per-needle projection onto the v0 direction (s0 > 0 always)
        n = self._needles(vec)
        v0 = self._v_small[:, 0]
        out = (n @ v0)[..., None] * v0
        return jnp.swapaxes(out, 1, 2).reshape(vec.shape[0], -1)

    def noisy_update(self, x0_vec, apy, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # correction is v0-component-only -> Lambda reduces to its s0 scalar;
        # Lambda_noise's two needle transforms merge into one by linearity
        corr = self.range_project(x0_vec) - apy
        lam0 = ddnm_plus_lambda(self._s_needle[:1], a, sigma_y, sigma_t, eta)[0]
        d1, d2 = ddnm_plus_noise_coeffs(self._s_needle, a, sigma_y, sigma_t, eta)
        nv = self._needles(noise_vec)
        ne = self._needles(et_vec)
        out = _mm(nv * d1.reshape(1, 1, -1) + ne * d2.reshape(1, 1, -1),
                  self._v_small.T)
        noise_term = jnp.swapaxes(out, 1, 2).reshape(x0_vec.shape[0], -1)
        return lam0 * corr, noise_term

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        needles = _mm(self._needles(vec), self._v_small)
        lam = ddnm_plus_lambda(self._s_needle, a, sigma_y, sigma_t, eta)
        needles = needles * lam.reshape(1, 1, -1)
        needles = _mm(needles, self._v_small.T)
        return jnp.swapaxes(needles, 1, 2).reshape(vec.shape[0], -1)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        nv = self._needles(vec)
        ne = self._needles(epsilon)
        d1, d2 = ddnm_plus_noise_coeffs(self._s_needle, a, sigma_y, sigma_t, eta)
        nv = _mm((nv * d1.reshape(1, 1, -1)), self._v_small.T)
        ne = _mm((ne * d2.reshape(1, 1, -1)), self._v_small.T)
        out = jnp.swapaxes(nv + ne, 1, 2)
        return out.reshape(vec.shape[0], -1)


# ---------------------------------------------------------------------------
# Inpainting (pixel-selection permutation)
# ---------------------------------------------------------------------------
class Inpainting(SVDOperator):
    """Permutation operator over channel-interleaved coordinates
    (svd_operators.py:324-439). `missing_indices` are interleaved (pixel*3+c)
    like the runner builds at diffusion.py:465-470."""

    def __init__(self, channels: int, img_dim: int, missing_indices: np.ndarray):
        self.channels = channels
        self.img_dim = img_dim
        n = channels * img_dim**2
        missing = np.asarray(missing_indices, dtype=np.int64)
        mask = np.ones(n, dtype=bool)
        mask[missing] = False
        kept = np.nonzero(mask)[0]
        self._n_kept = len(kept)
        sel = np.concatenate([kept, missing])
        self._sel = jnp.asarray(sel)  # Vt gather
        self._inv_sel = jnp.asarray(np.argsort(sel))  # V gather
        self._singulars = jnp.ones(self._n_kept, dtype=jnp.float32)
        s_full = np.zeros(n, np.float32)
        s_full[: self._n_kept] = 1.0
        self._s_full = jnp.asarray(s_full)
        # kept-coordinate indicator remapped interleaved -> C-major layout:
        # interleaved index pixel*C + c  <->  C-major index c*P + pixel
        self._kept_cmajor = jnp.asarray(
            mask.reshape(-1, channels).T.reshape(1, -1).astype(np.float32)
        )

    def V(self, vec):
        out = vec.reshape(vec.shape[0], -1)[:, self._inv_sel]
        x = out.reshape(vec.shape[0], -1, self.channels)  # (B, P, C) interleaved
        return jnp.swapaxes(x, 1, 2).reshape(vec.shape[0], -1)  # C-major

    def Vt(self, vec):
        temp = _interleave(vec.reshape(vec.shape[0], self.channels, -1))
        return temp[:, self._sel]

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        n = self.channels * self.img_dim**2
        out = jnp.zeros((vec.shape[0], n), vec.dtype)
        r = vec.reshape(vec.shape[0], -1)
        return out.at[:, : r.shape[1]].set(r)

    def range_project(self, vec):
        # V and Vt are permutations, so P collapses to the kept-pixel mask
        return vec.reshape(vec.shape[0], -1) * self._kept_cmajor

    def noisy_update(self, x0_vec, apy, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # the correction is zero on missing coords, so Lambda reduces to its
        # s=1 scalar; the noise coefficients select s=1 (kept) vs s=0
        # (missing) per coordinate — fully elementwise, no gathers
        corr = self.range_project(x0_vec) - apy
        lam1 = ddnm_plus_lambda(jnp.ones(1), a, sigma_y, sigma_t, eta)[0]
        d1, d2 = ddnm_plus_noise_coeffs(
            jnp.array([1.0, 0.0]), a, sigma_y, sigma_t, eta
        )
        m = self._kept_cmajor
        nv = noise_vec.reshape(noise_vec.shape[0], -1)
        ev = et_vec.reshape(et_vec.shape[0], -1)
        noise_term = (m * d1[0] + (1 - m) * d1[1]) * nv + (
            m * d2[0] + (1 - m) * d2[1]
        ) * ev
        return lam1 * corr, noise_term

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        t = _interleave(vec.reshape(vec.shape[0], self.channels, -1))[:, self._sel]
        lam = ddnm_plus_lambda(self._s_full, a, sigma_y, sigma_t, eta)
        t = t * lam.reshape(1, -1)
        out = t[:, self._inv_sel]
        x = out.reshape(vec.shape[0], -1, self.channels)
        return jnp.swapaxes(x, 1, 2).reshape(vec.shape[0], -1)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        tv = _interleave(vec.reshape(vec.shape[0], self.channels, -1))[:, self._sel]
        te = _interleave(epsilon.reshape(vec.shape[0], self.channels, -1))[:, self._sel]
        d1, d2 = ddnm_plus_noise_coeffs(self._s_full, a, sigma_y, sigma_t, eta)
        tv = tv * d1.reshape(1, -1)
        te = te * d2.reshape(1, -1)
        out = (tv + te)[:, self._inv_sel]
        x = out.reshape(vec.shape[0], -1, self.channels)
        return jnp.swapaxes(x, 1, 2).reshape(vec.shape[0], -1)


# ---------------------------------------------------------------------------
# SuperResolution (average-pooling, patch-based SVD)
# ---------------------------------------------------------------------------
class SuperResolution(SVDOperator):
    """SVD of the ratio^2 -> 1 averaging row, applied per non-overlapping
    patch (svd_operators.py:479-623)."""

    measurement_image = 'rgb'

    def __init__(self, channels: int, img_dim: int, ratio: int):
        assert img_dim % ratio == 0
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = ratio
        self.y_dim = img_dim // ratio
        r2 = ratio**2
        u, s, v = _np_svd(np.full((1, r2), 1.0 / r2))
        self._u00 = float(u[0, 0])
        self._s_small = jnp.asarray(s)  # (1,)
        self._v_small = jnp.asarray(v)  # (r2, r2)
        s_patch = np.zeros(r2, np.float32)
        s_patch[0] = s[0]
        self._s_patch = jnp.asarray(s_patch)

        # spectral reorder (svd_operators.py:513-517): out position -> index
        # into the (C, y^2, r^2) C-major flat patch array.
        C, y2 = channels, self.y_dim**2
        src = np.arange(C * y2 * r2).reshape(C, y2, r2)
        order = np.zeros(C * self.img_dim**2, dtype=np.int64)
        order[: C * y2] = src[:, :, 0].reshape(-1)
        for idx in range(r2 - 1):
            order[C * y2 + idx :: r2 - 1] = src[:, :, idx + 1].reshape(-1)
        self._vt_order = jnp.asarray(order)
        self._v_order = jnp.asarray(np.argsort(order))

    def _patchize(self, vec):
        B = vec.shape[0]
        r, y = self.ratio, self.y_dim
        x = vec.reshape(B, self.channels, self.img_dim, self.img_dim)
        x = x.reshape(B, self.channels, y, r, y, r)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(B, self.channels, y * y, r * r)

    def _unpatchize(self, patches):
        B = patches.shape[0]
        r, y = self.ratio, self.y_dim
        x = patches.reshape(B, self.channels, y, y, r, r)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(B, self.channels * self.img_dim**2)

    def V(self, vec):
        p = vec.reshape(vec.shape[0], -1)[:, self._v_order]
        p = p.reshape(vec.shape[0], self.channels, self.y_dim**2, self.ratio**2)
        p = _mm(p, self._v_small.T)
        return self._unpatchize(p)

    def Vt(self, vec):
        p = _mm(self._patchize(vec), self._v_small)
        return p.reshape(vec.shape[0], -1)[:, self._vt_order]

    def U(self, vec):
        return self._u00 * vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.tile(self._s_small, self.channels * self.y_dim**2)

    def add_zeros(self, vec):
        r = vec.reshape(vec.shape[0], -1)
        out = jnp.zeros((vec.shape[0], r.shape[1] * self.ratio**2), vec.dtype)
        return out.at[:, : r.shape[1]].set(r)

    def range_project(self, vec):
        # P projects every patch onto the v0 direction (for average pooling
        # v0 = 1/r * ones, i.e. broadcast the patch mean); s0 = 1/r > 0.
        p = self._patchize(vec)
        v0 = self._v_small[:, 0]
        return self._unpatchize((p @ v0)[..., None] * v0)

    def noisy_update(self, x0_vec, apy, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # the correction lives on the v0 component only, so Lambda reduces
        # to its s0 scalar; Lambda_noise's two patch transforms merge into
        # one by linearity
        corr = self.range_project(x0_vec) - apy
        lam0 = ddnm_plus_lambda(self._s_patch[:1], a, sigma_y, sigma_t, eta)[0]
        d1, d2 = ddnm_plus_noise_coeffs(self._s_patch, a, sigma_y, sigma_t, eta)
        pn = self._patchize(noise_vec)
        pe = self._patchize(et_vec)
        noise_term = self._unpatchize(
            _mm(pn * d1.reshape(1, 1, 1, -1) + pe * d2.reshape(1, 1, 1, -1),
                self._v_small.T)
        )
        return lam0 * corr, noise_term

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        p = _mm(self._patchize(vec), self._v_small)
        lam = ddnm_plus_lambda(self._s_patch, a, sigma_y, sigma_t, eta)
        p = p * lam.reshape(1, 1, 1, -1)
        p = _mm(p, self._v_small.T)
        return self._unpatchize(p)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        pv = self._patchize(vec)
        pe = self._patchize(epsilon)
        d1, d2 = ddnm_plus_noise_coeffs(self._s_patch, a, sigma_y, sigma_t, eta)
        pv = _mm((pv * d1.reshape(1, 1, 1, -1)), self._v_small.T)
        pe = _mm((pe * d2.reshape(1, 1, 1, -1)), self._v_small.T)
        return self._unpatchize(pv) + self._unpatchize(pe)


# ---------------------------------------------------------------------------
# SRConv (strided 1-D conv SR, Kronecker-factored)
# ---------------------------------------------------------------------------
def bicubic_kernel(factor: int, a: float = -0.5) -> np.ndarray:
    """The bicubic kernel built inline by the runner (diffusion.py:485-497),
    normalised to sum 1."""

    def phi(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    k = np.zeros(factor * 4)
    for i in range(factor * 4):
        x = (1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5)
        k[i] = phi(x)
    return (k / k.sum()).astype(np.float32)


def _conv_matrix(kernel: np.ndarray, img_dim: int, stride: int, reflective: bool):
    """1-D convolution matrix exactly as the reference builds it row-by-row
    (svd_operators.py:866-875 strided+reflective, :947-951 dense+zero-pad)."""
    klen = len(kernel)
    if stride > 1 or reflective:
        small_dim = img_dim // stride
        A = np.zeros((small_dim, img_dim), np.float64)
        for i in range(stride // 2, img_dim + stride // 2, stride):
            for j in range(i - klen // 2, i + klen // 2):
                j_eff = j
                if j_eff < 0:
                    j_eff = -j_eff - 1
                if j_eff >= img_dim:
                    j_eff = (img_dim - 1) - (j_eff - img_dim)
                A[i // stride, j_eff] += kernel[j - i + klen // 2]
        return A
    A = np.zeros((img_dim, img_dim), np.float64)
    for i in range(img_dim):
        for j in range(i - klen // 2, i + klen // 2):
            if j < 0 or j >= img_dim:
                continue
            A[i, j] = kernel[j - i + klen // 2]
    return A


class SRConv(SVDOperator):
    """Strided-conv SR: Kronecker SVD of the 1-D strided conv matrix
    (svd_operators.py:851-931). No Lambda hooks in the reference (noisy mode
    unsupported for this task) — kept that way for parity."""

    measurement_image = 'rgb'

    def __init__(self, kernel: np.ndarray, channels: int, img_dim: int, stride: int = 1):
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = stride
        sd = img_dim // stride
        self.small_dim = sd
        A_small = _conv_matrix(np.asarray(kernel, np.float64), img_dim, stride, True)
        u, s, v = _np_svd(A_small)
        ZERO = 3e-2
        s = np.where(s < ZERO, 0.0, s)
        self._u_small = jnp.asarray(u)  # (sd, sd)
        self._v_small = jnp.asarray(v)  # (D, D)
        s_big = np.outer(s, s).reshape(-1).astype(np.float32)  # (sd^2,)
        self._singulars_np = s_big
        # P_1 permutation (svd_operators.py:883-884), length sd*D
        perm = np.array(
            [img_dim * i + j for i in range(sd) for j in range(sd)]
            + [img_dim * i + j for i in range(sd) for j in range(sd, img_dim)],
            dtype=np.int64,
        )
        n = len(perm)
        D2 = img_dim**2
        # Vt gather: out[:n] = x[perm], out[n:] = x[n:]
        self._vt_idx = jnp.asarray(np.concatenate([perm, np.arange(n, D2)]))
        # V gather with zero-fill: simulate the two scatter assignments
        sim = np.zeros(D2, np.int64)
        src = np.arange(1, D2 + 1)
        sim[perm] = src[:n]
        sim[n:] = src[n:]
        self._v_idx = jnp.asarray(sim - 1)  # -1 => zero-fill
        self._v_zero = jnp.asarray(sim == 0)
        # natural-layout range mask: spectral position (i, j) of the
        # (V (x) V) Kronecker grid is kept iff i, j index measured rows
        # (the P_1 block) and s_i * s_j survived thresholding
        m1 = (s > 0).astype(np.float32)  # (sd,) — s is post-threshold
        mask2d = np.zeros((img_dim, img_dim), np.float32)
        mask2d[:sd, :sd] = np.outer(m1, m1)
        self._range_mask = jnp.asarray(mask2d.reshape(1, 1, -1))
        # natural-layout singular values on the (V (x) V) Kronecker grid —
        # channel-independent here (singulars are `repeat`ed, matching the
        # interleaved spectral layout; no tiled quirk unlike Deblurring)
        v2d = np.zeros((img_dim, img_dim), np.float64)
        v2d[:sd, :sd] = np.outer(s, s)
        self._s_nat = jnp.asarray(v2d.reshape(1, 1, -1).astype(np.float32))

    def _by_v(self, x, left, right, dim):
        B = x.shape[0]
        img = x.reshape(B * self.channels, dim, dim)
        out = _mm(_mm(left, img), right)
        return out.reshape(B, self.channels, -1)

    def V(self, vec):
        B = vec.shape[0]
        x = vec.reshape(B, self.img_dim**2, self.channels)
        safe = jnp.where(self._v_idx < 0, 0, self._v_idx)
        t = jnp.where(
            self._v_zero[None, :, None], 0.0, x[:, safe, :]
        )
        t = jnp.swapaxes(t, 1, 2)
        out = self._by_v(t, self._v_small, self._v_small.T, self.img_dim)
        return out.reshape(B, -1)

    def Vt(self, vec):
        B = vec.shape[0]
        t = self._by_v(vec, self._v_small.T, self._v_small, self.img_dim)
        t = t[:, :, self._vt_idx]
        return jnp.swapaxes(t, 1, 2).reshape(B, -1)

    def U(self, vec):
        B = vec.shape[0]
        t = jnp.swapaxes(vec.reshape(B, self.small_dim**2, self.channels), 1, 2)
        out = self._by_v(t, self._u_small, self._u_small.T, self.small_dim)
        return out.reshape(B, -1)

    def Ut(self, vec):
        B = vec.shape[0]
        t = self._by_v(vec, self._u_small.T, self._u_small, self.small_dim)
        return jnp.swapaxes(t, 1, 2).reshape(B, -1)

    def singulars(self):
        return jnp.asarray(np.repeat(self._singulars_np, 3))

    def add_zeros(self, vec):
        r = vec.reshape(vec.shape[0], -1)
        out = jnp.zeros((vec.shape[0], r.shape[1] * self.ratio**2), vec.dtype)
        return out.at[:, : r.shape[1]].set(r)

    def range_project(self, vec):
        # P_1 and its inverse cancel; P = (V (x) V) mask (V (x) V)^T
        t = self._by_v(vec, self._v_small.T, self._v_small, self.img_dim)
        t = t * self._range_mask
        out = self._by_v(t, self._v_small, self._v_small.T, self.img_dim)
        return out.reshape(vec.shape[0], -1)

    def prepare_measurement(self, y):
        apy = SVDOperator.prepare_measurement(self, y)
        return self._by_v(apy, self._v_small.T, self._v_small, self.img_dim)

    def range_correction(self, x_vec, spec_y):
        t = self._by_v(x_vec, self._v_small.T, self._v_small, self.img_dim)
        out = self._by_v(
            t * self._range_mask - spec_y,
            self._v_small, self._v_small.T, self.img_dim,
        )
        return out.reshape(x_vec.shape[0], -1)

    def noisy_update(self, x0_vec, spec_y, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # fused form of the base-class GENERIC Lambda/Lambda_noise (the
        # reference has no Lambda for SRConv — noisy sr_bicubic is our
        # extension); coefficients evaluated on the natural Kronecker grid
        B = x0_vec.shape[0]
        spec_x = self._by_v(x0_vec, self._v_small.T, self._v_small, self.img_dim)
        corr_spec = spec_x * self._range_mask - spec_y
        lam = ddnm_plus_lambda(self._s_nat, a, sigma_y, sigma_t, eta)
        lam_corr = self._by_v(
            corr_spec * lam, self._v_small, self._v_small.T, self.img_dim
        ).reshape(B, -1)
        d1, d2 = ddnm_plus_noise_coeffs(self._s_nat, a, sigma_y, sigma_t, eta)
        sn = self._by_v(noise_vec, self._v_small.T, self._v_small, self.img_dim)
        se = self._by_v(et_vec, self._v_small.T, self._v_small, self.img_dim)
        noise_term = self._by_v(
            sn * d1 + se * d2, self._v_small, self._v_small.T, self.img_dim
        ).reshape(B, -1)
        return lam_corr, noise_term


# ---------------------------------------------------------------------------
# Deblurring (dense 1-D conv, separable SVD)
# ---------------------------------------------------------------------------
def _quirk_natural(vals_sorted: np.ndarray, order: np.ndarray, channels: int):
    """Map a TILED per-singular table into the *natural* (pre-sort) spectral
    layout, per channel — (C, D^2) numpy.

    REFERENCE-QUIRK: the Deblurring family exposes singulars in a TILED
    channel layout while Vt's output is channel-INTERLEAVED
    (svd_operators.py:1001,:1163), so any composed per-singular table
    (A_pinv's zero mask, the generic Lambda's coefficients) addresses
    spectral slots through a shifted, channel-dependent lookup. Hoist that
    to host precomputation: the flat interleaved index of natural slot q in
    channel c is pos(q)*C + c, and the tiled table value there is
    vals_sorted[(pos(q)*C + c) mod D^2]."""
    D2 = len(vals_sorted)
    pos = np.argsort(order)  # natural slot -> sorted position
    f = pos[None, :] * channels + np.arange(channels)[:, None]  # (C, D^2)
    return vals_sorted[f % D2]


def _deblur_range_mask(s_big_nat: np.ndarray, order: np.ndarray, channels: int):
    """Effective A+ A mask for the Deblurring family in the natural layout,
    per channel — (1, C, D^2). See _quirk_natural."""
    m = _quirk_natural(
        (s_big_nat[order] > 0).astype(np.float32), order, channels
    )
    return jnp.asarray(m[None])


class Deblurring(SVDOperator):
    """Separable deblurring via SVD of the 1-D conv matrix
    (svd_operators.py:934-1091). See module REFERENCE-QUIRK note on the tiled
    singular layout."""

    measurement_image = 'rgb'

    def __init__(
        self,
        kernel: np.ndarray,
        channels: int,
        img_dim: int,
        ZERO: float = 3e-2,
        perm: np.ndarray | None = None,
    ):
        self.channels = channels
        self.img_dim = img_dim
        A_small = _conv_matrix(np.asarray(kernel, np.float64), img_dim, 1, False)
        u, s, v = _np_svd(A_small)
        s_orig = s.copy()
        s = np.where(s < ZERO, 0.0, s)
        self._u_small = jnp.asarray(u)
        self._v_small = jnp.asarray(v)
        s_big = np.outer(s, s).reshape(-1)
        s_big_orig = np.outer(s_orig, s_orig).reshape(-1)
        # Descending sort over massively tied products: any tie order yields a
        # self-consistent operator; `perm` lets tests inject the oracle's.
        order = np.argsort(-s_big, kind="stable") if perm is None else np.asarray(perm)
        self._perm = jnp.asarray(order)
        self._inv_perm = jnp.asarray(np.argsort(order))
        self._singulars_np = s_big[order].astype(np.float32)
        self._singulars_orig = jnp.asarray(s_big_orig[order].astype(np.float32))
        self._singulars_orig_nat = jnp.asarray(s_big_orig.astype(np.float32))
        self._range_mask = _deblur_range_mask(s_big, order, channels)

    def _by_mat(self, x, left, right):
        B = x.shape[0]
        img = x.reshape(B * self.channels, self.img_dim, self.img_dim)
        out = _mm(_mm(left, img), right)
        return out.reshape(B, self.channels, -1)

    def V(self, vec):
        B = vec.shape[0]
        x = vec.reshape(B, self.img_dim**2, self.channels)[:, self._inv_perm, :]
        t = jnp.swapaxes(x, 1, 2)
        return self._by_mat(t, self._v_small, self._v_small.T).reshape(B, -1)

    def Vt(self, vec):
        B = vec.shape[0]
        t = self._by_mat(vec, self._v_small.T, self._v_small)
        t = t[:, :, self._perm]
        return jnp.swapaxes(t, 1, 2).reshape(B, -1)

    def U(self, vec):
        B = vec.shape[0]
        x = vec.reshape(B, self.img_dim**2, self.channels)[:, self._inv_perm, :]
        t = jnp.swapaxes(x, 1, 2)
        return self._by_mat(t, self._u_small, self._u_small.T).reshape(B, -1)

    def Ut(self, vec):
        B = vec.shape[0]
        t = self._by_mat(vec, self._u_small.T, self._u_small)
        t = t[:, :, self._perm]
        return jnp.swapaxes(t, 1, 2).reshape(B, -1)

    def singulars(self):
        # REFERENCE-QUIRK: tiled (not interleaved) channel layout, :1001
        return jnp.asarray(np.tile(self._singulars_np, 3))

    def add_zeros(self, vec):
        return vec.reshape(vec.shape[0], -1)

    def range_project(self, vec):
        t = self._by_mat(vec, self._v_small.T, self._v_small)
        t = t * self._range_mask
        out = self._by_mat(t, self._v_small, self._v_small.T)
        return out.reshape(vec.shape[0], -1)

    def prepare_measurement(self, y):
        # natural-spectral measurement (B, C, D^2) for the fused step below
        apy = SVDOperator.prepare_measurement(self, y)
        return self._by_mat(apy, self._v_small.T, self._v_small)

    def range_correction(self, x_vec, spec_y):
        t = self._by_mat(x_vec, self._v_small.T, self._v_small)
        out = self._by_mat(
            t * self._range_mask - spec_y, self._v_small, self._v_small.T
        )
        return out.reshape(x_vec.shape[0], -1)

    def noisy_update(self, x0_vec, spec_y, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # Lambda's coefficients are channel-independent functions of the
        # PRE-threshold singulars (svd_operators.py:1021,:1051), evaluated
        # here in the natural (pre-sort) layout so the sort permutation
        # cancels; Lambda_noise's two V-legs merge into one by linearity.
        # 3 Kronecker sandwiches per step, zero gathers.
        B = x0_vec.shape[0]
        spec_x = self._by_mat(x0_vec, self._v_small.T, self._v_small)
        corr_spec = spec_x * self._range_mask - spec_y
        lam = ddnm_plus_lambda(self._singulars_orig_nat, a, sigma_y, sigma_t, eta)
        lam_corr = self._by_mat(
            corr_spec * lam.reshape(1, 1, -1), self._v_small, self._v_small.T
        ).reshape(B, -1)
        d1, d2 = ddnm_plus_noise_coeffs(
            self._singulars_orig_nat, a, sigma_y, sigma_t, eta
        )
        nv = noise_vec.reshape(B, self.channels, -1)
        ev = et_vec.reshape(B, self.channels, -1)
        noise_term = self._by_mat(
            nv * d1.reshape(1, 1, -1) + ev * d2.reshape(1, 1, -1),
            self._v_small, self._v_small.T,
        ).reshape(B, -1)
        return lam_corr, noise_term

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        B = vec.shape[0]
        t = self._by_mat(vec, self._v_small.T, self._v_small)
        t = jnp.swapaxes(t[:, :, self._perm], 1, 2)  # (B, D^2, C)
        lam = ddnm_plus_lambda(self._singulars_orig, a, sigma_y, sigma_t, eta)
        t = t * lam.reshape(1, -1, 1)
        t = jnp.swapaxes(t, 1, 2)[:, :, self._inv_perm]
        return self._by_mat(t, self._v_small, self._v_small.T).reshape(B, -1)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        B = vec.shape[0]
        d1, d2 = ddnm_plus_noise_coeffs(self._singulars_orig, a, sigma_y, sigma_t, eta)

        def side(x, d):
            t = x.reshape(B, self.channels, -1)[:, :, self._perm]
            t = jnp.swapaxes(t, 1, 2) * d.reshape(1, -1, 1)
            t = jnp.swapaxes(t, 1, 2)[:, :, self._inv_perm]
            return self._by_mat(t, self._v_small, self._v_small.T).reshape(B, -1)

        return side(vec, d1) + side(epsilon, d2)


# ---------------------------------------------------------------------------
# Deblurring2D (anisotropic)
# ---------------------------------------------------------------------------
class Deblurring2D(SVDOperator):
    """Anisotropic deblurring: separate 1-D kernels per axis
    (svd_operators.py:1094-1166). No Lambda hooks in the reference — parity."""

    measurement_image = 'rgb'

    def __init__(
        self,
        kernel1: np.ndarray,
        kernel2: np.ndarray,
        channels: int,
        img_dim: int,
        perm: np.ndarray | None = None,
    ):
        self.channels = channels
        self.img_dim = img_dim
        A1 = _conv_matrix(np.asarray(kernel1, np.float64), img_dim, 1, False)
        A2 = _conv_matrix(np.asarray(kernel2, np.float64), img_dim, 1, False)
        u1, s1, v1 = _np_svd(A1)
        u2, s2, v2 = _np_svd(A2)
        ZERO = 3e-2
        s1 = np.where(s1 < ZERO, 0.0, s1)
        s2 = np.where(s2 < ZERO, 0.0, s2)
        self._u1, self._v1 = jnp.asarray(u1), jnp.asarray(v1)
        self._u2, self._v2 = jnp.asarray(u2), jnp.asarray(v2)
        s_big = np.outer(s1, s2).reshape(-1)
        order = np.argsort(-s_big, kind="stable") if perm is None else np.asarray(perm)
        self._perm = jnp.asarray(order)
        self._inv_perm = jnp.asarray(np.argsort(order))
        self._singulars_np = s_big[order].astype(np.float32)
        self._range_mask = _deblur_range_mask(s_big, order, channels)
        # quirk-natural singular matrix (C, D^2): what the base-class
        # generic Lambda/Lambda_noise coefficients effectively see per slot
        # (this op has no reference Lambda; noisy mode is our extension)
        self._squirk_nat = jnp.asarray(
            _quirk_natural(self._singulars_np, order, channels)[None]
        )  # (1, C, D^2)

    def _by_mat(self, x, left, right):
        B = x.shape[0]
        img = x.reshape(B * self.channels, self.img_dim, self.img_dim)
        out = _mm(_mm(left, img), right)
        return out.reshape(B, self.channels, -1)

    def V(self, vec):
        B = vec.shape[0]
        x = vec.reshape(B, self.img_dim**2, self.channels)[:, self._inv_perm, :]
        t = jnp.swapaxes(x, 1, 2)
        return self._by_mat(t, self._v1, self._v2.T).reshape(B, -1)

    def Vt(self, vec):
        B = vec.shape[0]
        t = self._by_mat(vec, self._v1.T, self._v2)
        t = t[:, :, self._perm]
        return jnp.swapaxes(t, 1, 2).reshape(B, -1)

    def U(self, vec):
        B = vec.shape[0]
        x = vec.reshape(B, self.img_dim**2, self.channels)[:, self._inv_perm, :]
        t = jnp.swapaxes(x, 1, 2)
        return self._by_mat(t, self._u1, self._u2.T).reshape(B, -1)

    def Ut(self, vec):
        B = vec.shape[0]
        t = self._by_mat(vec, self._u1.T, self._u2)
        t = t[:, :, self._perm]
        return jnp.swapaxes(t, 1, 2).reshape(B, -1)

    def singulars(self):
        # REFERENCE-QUIRK: tiled channel layout, :1163
        return jnp.asarray(np.tile(self._singulars_np, 3))

    def add_zeros(self, vec):
        return vec.reshape(vec.shape[0], -1)

    def range_project(self, vec):
        t = self._by_mat(vec, self._v1.T, self._v2)
        t = t * self._range_mask
        out = self._by_mat(t, self._v1, self._v2.T)
        return out.reshape(vec.shape[0], -1)

    def prepare_measurement(self, y):
        apy = SVDOperator.prepare_measurement(self, y)
        return self._by_mat(apy, self._v1.T, self._v2)

    def range_correction(self, x_vec, spec_y):
        t = self._by_mat(x_vec, self._v1.T, self._v2)
        out = self._by_mat(
            t * self._range_mask - spec_y, self._v1, self._v2.T
        )
        return out.reshape(x_vec.shape[0], -1)

    def noisy_update(self, x0_vec, spec_y, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # fused form of the base-class GENERIC Lambda/Lambda_noise (this op
        # has no reference Lambda): coefficients evaluated on the
        # quirk-natural singular matrix so the sort permutation cancels
        B = x0_vec.shape[0]
        spec_x = self._by_mat(x0_vec, self._v1.T, self._v2)
        corr_spec = spec_x * self._range_mask - spec_y
        lam = ddnm_plus_lambda(self._squirk_nat, a, sigma_y, sigma_t, eta)
        lam_corr = self._by_mat(
            corr_spec * lam, self._v1, self._v2.T
        ).reshape(B, -1)
        d1, d2 = ddnm_plus_noise_coeffs(self._squirk_nat, a, sigma_y, sigma_t, eta)
        sn = self._by_mat(noise_vec, self._v1.T, self._v2)
        se = self._by_mat(et_vec, self._v1.T, self._v2)
        noise_term = self._by_mat(
            sn * d1 + se * d2, self._v1, self._v2.T
        ).reshape(B, -1)
        return lam_corr, noise_term


# ---------------------------------------------------------------------------
# Walsh-Hadamard compressive sensing
# ---------------------------------------------------------------------------
class WalshHadamardCS(SVDOperator):
    """Compressive sensing in the Walsh-Hadamard basis with a random pixel
    permutation (svd_operators.py:211-320). The FWHT is a log2(D^2)-pass
    butterfly, self-inverse with the 1/img_dim normalisation."""

    def __init__(self, channels: int, img_dim: int, ratio: int, perm: np.ndarray):
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = ratio
        perm = np.asarray(perm, dtype=np.int64)
        self._perm = jnp.asarray(perm)
        self._inv_perm = jnp.asarray(np.argsort(perm))
        n_kept = channels * img_dim**2 // ratio
        self._singulars = jnp.ones(n_kept, dtype=jnp.float32)
        s_full = np.zeros(channels * img_dim**2, np.float32)
        s_full[:n_kept] = 1.0
        self._s_full = jnp.asarray(s_full)
        # kept WH coefficients in the *unpermuted* transform layout: the
        # pixel permutation cancels inside P = A+ A
        wh_mask = np.zeros(img_dim**2, np.float32)
        wh_mask[perm[: img_dim**2 // ratio]] = 1.0
        self._wh_mask = jnp.asarray(wh_mask.reshape(1, 1, -1))

    def fwht(self, a):
        """(B, C, P) -> (B, C, P), normalised by 1/img_dim.

        Kronecker-factored MXU formulation (ddnm_tpu.ops.fwht) — exactly
        equal to the reference butterfly (tests/test_pallas_ops.py)."""
        from ddnm_tpu.ops import fwht as _fwht

        return _fwht(a, float(self.img_dim))

    def V(self, vec):
        B = vec.shape[0]
        x = jnp.swapaxes(vec.reshape(B, -1, self.channels), 1, 2)
        temp = x[:, :, self._inv_perm]
        return self.fwht(temp).reshape(B, -1)

    def Vt(self, vec):
        B = vec.shape[0]
        t = self.fwht(vec.reshape(B, self.channels, -1))[:, :, self._perm]
        return jnp.swapaxes(t, 1, 2).reshape(B, -1)

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        n = self.channels * self.img_dim**2
        out = jnp.zeros((vec.shape[0], n), vec.dtype)
        r = vec.reshape(vec.shape[0], -1)
        return out.at[:, : r.shape[1]].set(r)

    def range_project(self, vec):
        B = vec.shape[0]
        t = self.fwht(vec.reshape(B, self.channels, -1))
        return self.fwht(t * self._wh_mask).reshape(B, -1)

    def prepare_measurement(self, y):
        # natural-WH-layout spectral measurement (B, C, D^2); consumed by the
        # spectral range_correction / noisy_update below
        apy = SVDOperator.prepare_measurement(self, y)
        return self.fwht(apy.reshape(apy.shape[0], self.channels, -1)) * self._wh_mask

    def range_correction(self, x_vec, spec_y):
        B = x_vec.shape[0]
        spec_x = self.fwht(x_vec.reshape(B, self.channels, -1))
        return self.fwht(spec_x * self._wh_mask - spec_y).reshape(B, -1)

    def noisy_update(self, x0_vec, spec_y, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # the pixel permutation cancels; Lambda reduces to its s=1 scalar on
        # the (range-space-only) correction spectrum, and Lambda_noise's two
        # V-transforms merge into one FWHT by linearity: 3 FWHTs per step
        B = x0_vec.shape[0]
        spec_x = self.fwht(x0_vec.reshape(B, self.channels, -1))
        corr_spec = spec_x * self._wh_mask - spec_y
        lam1 = ddnm_plus_lambda(jnp.ones(1), a, sigma_y, sigma_t, eta)[0]
        lam_corr = self.fwht(lam1 * corr_spec).reshape(B, -1)
        d1, d2 = ddnm_plus_noise_coeffs(
            jnp.array([1.0, 0.0]), a, sigma_y, sigma_t, eta
        )
        m = self._wh_mask
        d1m = m * d1[0] + (1 - m) * d1[1]
        d2m = m * d2[0] + (1 - m) * d2[1]
        nv = noise_vec.reshape(B, self.channels, -1)
        ev = et_vec.reshape(B, self.channels, -1)
        noise_term = self.fwht(d1m * nv + d2m * ev).reshape(B, -1)
        return lam_corr, noise_term

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        B = vec.shape[0]
        t = self.fwht(vec.reshape(B, self.channels, -1))[:, :, self._perm]
        t = jnp.swapaxes(t, 1, 2).reshape(B, -1)
        lam = ddnm_plus_lambda(self._s_full, a, sigma_y, sigma_t, eta)
        t = t * lam.reshape(1, -1)
        x = jnp.swapaxes(t.reshape(B, -1, self.channels), 1, 2)
        out = self.fwht(x[:, :, self._inv_perm])
        return out.reshape(B, -1)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        B = vec.shape[0]
        d1, d2 = ddnm_plus_noise_coeffs(self._s_full, a, sigma_y, sigma_t, eta)

        def side(x, d):
            t = x.reshape(B, self.channels, -1)[:, :, self._perm]
            t = jnp.swapaxes(t, 1, 2).reshape(B, -1) * d.reshape(1, -1)
            y = jnp.swapaxes(t.reshape(B, -1, self.channels), 1, 2)
            return self.fwht(y[:, :, self._inv_perm]).reshape(B, -1)

        return side(vec, d1) + side(epsilon, d2)


# ---------------------------------------------------------------------------
# Block-based compressive sensing
# ---------------------------------------------------------------------------
class BlockCS(SVDOperator):
    """32x32-patch random Gaussian measurement (svd_operators.py:101-159).
    The measurement basis comes from the SVD of a random 1024x1024 matrix;
    pass `matrix` explicitly for oracle-parity tests, otherwise it is drawn
    from a seeded NumPy generator (the reference relies on the global torch
    seed — diffusion.py:107, main.py:140)."""

    def __init__(self, channels: int, img_dim: int, ratio: float, matrix: np.ndarray | None = None, seed: int = 1234):
        self.channels = channels
        self.img_dim = img_dim
        self.patch = 32
        self.y_dim = img_dim // 32
        if matrix is None:
            matrix = np.random.default_rng(seed).standard_normal((1024, 1024))
        _, _, v = _np_svd(np.asarray(matrix, np.float64))
        self._v_small = jnp.asarray(v)  # (1024, 1024)
        self.cs_size = int(32 * 32 * ratio)
        self._singulars = jnp.ones(self.cs_size, dtype=jnp.float32)

        C, y2, r2 = channels, self.y_dim**2, 1024
        src = np.arange(C * y2 * r2).reshape(C, y2, r2)
        order = np.concatenate(
            [src[:, :, : self.cs_size].reshape(-1), src[:, :, self.cs_size :].reshape(-1)]
        )
        self._vt_order = jnp.asarray(order)
        self._v_order = jnp.asarray(np.argsort(order))

    def _patchize(self, vec):
        B = vec.shape[0]
        r, y = self.patch, self.y_dim
        x = vec.reshape(B, self.channels, self.img_dim, self.img_dim)
        x = x.reshape(B, self.channels, y, r, y, r).transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(B, self.channels, y * y, r * r)

    def _unpatchize(self, patches):
        B = patches.shape[0]
        r, y = self.patch, self.y_dim
        x = patches.reshape(B, self.channels, y, y, r, r).transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(B, self.channels * self.img_dim**2)

    def V(self, vec):
        p = vec.reshape(vec.shape[0], -1)[:, self._v_order]
        p = p.reshape(vec.shape[0], self.channels, self.y_dim**2, 1024)
        p = _mm(p, self._v_small.T)
        return self._unpatchize(p)

    def Vt(self, vec):
        p = _mm(self._patchize(vec), self._v_small)
        return p.reshape(vec.shape[0], -1)[:, self._vt_order]

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.tile(self._singulars, self.channels * self.y_dim**2)

    def add_zeros(self, vec):
        n = self.channels * self.img_dim**2
        out = jnp.zeros((vec.shape[0], n), vec.dtype)
        r = vec.reshape(vec.shape[0], -1)
        return out.at[:, : r.shape[1]].set(r)

    def range_project(self, vec):
        # per-patch projection onto the first cs_size measurement directions
        p = _mm(self._patchize(vec), self._v_small[:, : self.cs_size])
        return self._unpatchize(_mm(p, self._v_small[:, : self.cs_size].T))

    def prepare_measurement(self, y):
        # kept-component patch spectrum of A_pinv(y), (B, C, y^2, cs_size)
        apy = SVDOperator.prepare_measurement(self, y)
        return _mm(self._patchize(apy), self._v_small[:, : self.cs_size])

    def range_correction(self, x_vec, spec_y):
        p = _mm(self._patchize(x_vec), self._v_small[:, : self.cs_size])
        return self._unpatchize(
            _mm(p - spec_y, self._v_small[:, : self.cs_size].T)
        )

    def noisy_update(self, x0_vec, spec_y, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # fused form of the base-class GENERIC Lambda/Lambda_noise: all
        # singulars are 1 on the kept components, 0 elsewhere, so Lambda
        # reduces to its s=1 scalar on the (kept-only) correction spectrum
        # and the noise coefficients split kept vs dropped components
        p = _mm(self._patchize(x0_vec), self._v_small[:, : self.cs_size])
        corr_spec = p - spec_y
        lam1 = ddnm_plus_lambda(jnp.ones(1), a, sigma_y, sigma_t, eta)[0]
        lam_corr = self._unpatchize(
            _mm(lam1 * corr_spec, self._v_small[:, : self.cs_size].T)
        )
        d1, d2 = ddnm_plus_noise_coeffs(
            jnp.array([1.0, 0.0]), a, sigma_y, sigma_t, eta
        )
        comp = jnp.arange(self._v_small.shape[1]) < self.cs_size
        d1v = jnp.where(comp, d1[0], d1[1])
        d2v = jnp.where(comp, d2[0], d2[1])
        sn = _mm(self._patchize(noise_vec), self._v_small)
        se = _mm(self._patchize(et_vec), self._v_small)
        noise_term = self._unpatchize(
            _mm(sn * d1v + se * d2v, self._v_small.T)
        )
        return lam_corr, noise_term


# ---------------------------------------------------------------------------
# GeneralA (dense fallback)
# ---------------------------------------------------------------------------
class GeneralA(SVDOperator):
    """Explicit dense SVD of an arbitrary A (svd_operators.py:173-208)."""

    def __init__(self, A: np.ndarray):
        u, s, v = _np_svd(np.asarray(A, np.float64))
        s = np.where(s < 1e-3, 0.0, s)
        self._u, self._v = jnp.asarray(u), jnp.asarray(v)
        self._s = jnp.asarray(s.astype(np.float32))

    def _mat_by_vec(self, M, v):
        return _mm(v.reshape(v.shape[0], -1), M.T)

    def V(self, vec):
        return self._mat_by_vec(self._v, vec)

    def Vt(self, vec):
        return self._mat_by_vec(self._v.T, vec)

    def U(self, vec):
        return self._mat_by_vec(self._u, vec)

    def Ut(self, vec):
        return self._mat_by_vec(self._u.T, vec)

    def singulars(self):
        return self._s

    def A(self, vec):
        # tall A (rows > cols): the spectral vector must be zero-padded to
        # the row count before the full-U rotation (the base class — like
        # the reference — assumes U accepts the singular count directly,
        # which only holds for wide A)
        k = self._s.shape[0]
        spec = self._s[None] * self.Vt(vec).reshape(vec.shape[0], -1)[:, :k]
        out = jnp.zeros((vec.shape[0], self._u.shape[0]), spec.dtype)
        return self.U(out.at[:, :k].set(spec))

    def add_zeros(self, vec):
        # the reference writes :U.shape[0] columns (svd_operators.py:205-207),
        # which equals the singular count only for wide A and CRASHES for
        # tall A (more rows than columns); slice to the true spectral size
        k = self._s.shape[0]
        out = jnp.zeros((vec.shape[0], self._v.shape[0]), vec.dtype)
        r = vec.reshape(vec.shape[0], -1)
        return out.at[:, :k].set(r[:, :k])

    # --- fused spectral forms (stay in V's coordinate basis per step) ------
    def _s_full(self):
        n, m = self._v.shape[0], self._s.shape[0]
        return jnp.concatenate([self._s, jnp.zeros(n - m, self._s.dtype)])

    def prepare_measurement(self, y):
        """Spectral-space pinv of y on the full V axis (zeros in null space).
        Slices Ut(y) to the singular count so tall A (rows > cols) works."""
        s = self._s
        inv = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
        uty = self.Ut(y).reshape(y.shape[0], -1)[:, : s.shape[0]]
        return self.add_zeros(inv[None] * uty)

    def range_project(self, vec):
        return self.V(jnp.where(self._s_full() == 0, 0.0, self.Vt(vec)))

    def range_correction(self, x_vec, spec_y):
        spec = jnp.where(self._s_full() == 0, 0.0, self.Vt(x_vec))
        return self.V(spec - spec_y)

    def noisy_update(self, x0_vec, spec_y, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        # single spectral round-trip per term: Lambda's and Lambda_noise's
        # V legs evaluated on the natural spectral grid; the two noise legs
        # merge into one V by linearity (5 dense matmuls vs 7 composed)
        s_full = self._s_full()
        corr_spec = jnp.where(s_full == 0, 0.0, self.Vt(x0_vec)) - spec_y
        lam = ddnm_plus_lambda(s_full, a, sigma_y, sigma_t, eta)
        lam_corr = self.V(lam[None] * corr_spec)
        d1, d2 = ddnm_plus_noise_coeffs(s_full, a, sigma_y, sigma_t, eta)
        noise_term = self.V(
            d1[None] * self.Vt(noise_vec) + d2[None] * self.Vt(et_vec)
        )
        return lam_corr, noise_term


# ---------------------------------------------------------------------------
# Factory mirroring the runner's task dispatch (diffusion.py:454-523)
# ---------------------------------------------------------------------------
def build_svd_operator(
    deg: str,
    *,
    channels: int = 3,
    image_size: int = 256,
    deg_scale: float = 4.0,
    mask: np.ndarray | None = None,
    perm: np.ndarray | None = None,
    seed: int = 1234,
) -> SVDOperator:
    """Map a task string to a configured operator.

    `mask` (H, W) binary for inpainting; `perm` pixel permutation for
    cs_walshhadamard (random if omitted).
    """
    if deg == "cs_walshhadamard":
        compress_by = round(1 / deg_scale)
        if perm is None:
            perm = np.random.default_rng(seed).permutation(image_size**2)
        return WalshHadamardCS(channels, image_size, compress_by, perm)
    if deg == "cs_blockbased":
        return BlockCS(channels, image_size, deg_scale, seed=seed)
    if deg == "inpainting":
        if mask is None:
            raise ValueError("inpainting requires a mask")
        flat = np.asarray(mask).reshape(-1)
        missing_r = np.nonzero(flat == 0)[0] * 3
        missing = np.concatenate([missing_r, missing_r + 1, missing_r + 2])
        return Inpainting(channels, image_size, missing)
    if deg == "denoising":
        return Denoising(channels, image_size)
    if deg == "colorization":
        return Colorization(image_size)
    if deg == "sr_averagepooling":
        return SuperResolution(channels, image_size, int(deg_scale))
    if deg == "sr_bicubic":
        factor = int(deg_scale)
        k = bicubic_kernel(factor)
        return SRConv(k / k.sum(), channels, image_size, stride=factor)
    if deg == "deblur_uni":
        return Deblurring(np.full(9, 1 / 9, np.float32), channels, image_size)
    if deg == "deblur_gauss":
        sigma = 10.0
        k = np.exp(-0.5 * (np.array([-2, -1, 0, 1, 2]) / sigma) ** 2)
        return Deblurring((k / k.sum()).astype(np.float32), channels, image_size)
    if deg == "deblur_aniso":
        x = np.arange(-4, 5)
        k2 = np.exp(-0.5 * (x / 20.0) ** 2)
        k1 = np.exp(-0.5 * (x / 1.0) ** 2)
        return Deblurring2D(
            (k1 / k1.sum()).astype(np.float32),
            (k2 / k2.sum()).astype(np.float32),
            channels,
            image_size,
        )
    raise ValueError(f"degradation type {deg} not supported")
