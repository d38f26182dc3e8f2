"""Matrix-free SVD operator protocol + shared DDNM+ spectral coefficients.

An operator represents A = U diag(s) V^T without materialising A. All
runtime methods take and return flattened batches (B, N) in the reference's
channel-major (NCHW-flatten) vector layout so that outputs are directly
comparable to the PyTorch oracle; constants are precomputed host-side with
NumPy at construction and live in HBM as jnp arrays baked into the jitted
sampling graph.

Semantics match /root/reference/functions/svd_operators.py:9-97 (A/At/
A_pinv/A_pinv_eta composition from V/Vt/U/Ut/singulars/add_zeros) and the
per-singular DDNM+ Eq.17/Eq.51 coefficient tables repeated in every concrete
operator there (e.g. :253-320). Here the coefficient math lives in two shared
helpers instead of being copy-pasted per operator.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "SVDOperator",
    "ddnm_plus_lambda",
    "ddnm_plus_noise_coeffs",
    "apply_perm_with_zeros",
    "invert_perm_sim",
]


def ddnm_plus_lambda(singulars, a, sigma_y, sigma_t, eta):
    """Per-singular Eq.17 range-space scaling λ_i.

    λ_i = s_i σ_t sqrt(1-η²) / (a σ_y)  where s_i > 0 and σ_t < a σ_y / s_i,
    and 1 elsewhere (including s_i == 0). `a`/`sigma_t` may be traced scalars;
    `sigma_y`/`eta` are static Python floats (per-run configuration).
    """
    s = jnp.asarray(singulars)
    inv_s = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
    change = sigma_t < a * sigma_y * inv_s  # False wherever s == 0
    scaled = s * sigma_t * (1 - eta**2) ** 0.5 / (a * sigma_y)
    return jnp.where(change, scaled, 1.0)


def ddnm_plus_noise_coeffs(singulars, a, sigma_y, sigma_t, eta):
    """Per-singular Eq.51 noise coefficients (d1 for fresh gaussian noise,
    d2 for the predicted epsilon), replicating the reference's three-case
    masking exactly (strict inequalities; the measure-zero equality case
    keeps the DDIM defaults)."""
    s = jnp.asarray(singulars)
    inv_s = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
    d1_default = jnp.full(s.shape, sigma_t * eta)
    d2_default = jnp.full(s.shape, sigma_t * (1 - eta**2) ** 0.5)

    lt = (sigma_t < a * sigma_y * inv_s) & (s > 0)
    gt = (sigma_t > a * sigma_y * inv_s) & (s > 0)
    zero = s == 0

    d1 = d1_default
    d2 = d2_default
    # sigma_t < a sigma_y / s : pure eta-noise in d1, kill epsilon term
    d1 = jnp.where(lt, sigma_t * eta, d1)
    d2 = jnp.where(lt, 0.0, d2)
    # sigma_t > a sigma_y / s : residual variance after range-space consistency
    resid = jnp.sqrt(jnp.maximum(sigma_t**2 - a**2 * sigma_y**2 * inv_s**2, 0.0))
    d1 = jnp.where(gt, resid, d1)
    d2 = jnp.where(gt, 0.0, d2)
    # s == 0 (pure null space): DDIM defaults
    d1 = jnp.where(zero, sigma_t * eta, d1)
    d2 = jnp.where(zero, sigma_t * (1 - eta**2) ** 0.5, d2)
    # the reference applies the three-case masking only under
    # `a != 0 and sigma_y != 0` (svd_operators.py:264 etc.); without the
    # gate, sigma_y=0 would collapse to d1=sigma_t, d2=0 instead of the
    # DDIM defaults
    gate = (jnp.asarray(a) != 0) & (jnp.asarray(sigma_y) != 0)
    d1 = jnp.where(gate, d1, d1_default)
    d2 = jnp.where(gate, d2, d2_default)
    return d1, d2


def invert_perm_sim(sim_out: np.ndarray) -> np.ndarray:
    """Given `sim_out = layout(arange(1, N+1))` (0 marking zero-filled slots),
    return gather indices with -1 for zero slots: out = x[idx] (idx >= 0)
    else 0. Lets us turn any reference scatter/assignment choreography into a
    single XLA gather by simulating it once on host."""
    idx = sim_out.astype(np.int64) - 1
    return idx


def apply_perm_with_zeros(x: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """out[..., i] = x[..., idx[i]] where idx[i] >= 0, else 0."""
    idx = np.asarray(idx)
    if (idx >= 0).all():
        return x[..., jnp.asarray(idx)]
    safe = jnp.asarray(np.where(idx < 0, 0, idx))
    out = x[..., safe]
    return jnp.where(jnp.asarray(idx >= 0), out, 0.0)


class SVDOperator:
    """Base class: concrete ops define V/Vt/U/Ut/singulars/add_zeros on
    flattened (B, N) batches; the DDNM compositions come for free."""

    # How the measurement y relates to an image, for surfaces that accept
    # image uploads (the serving layer): "rgb" — y is a channel-major
    # flattened RGB image; "gray" — a single-plane image; None — not an
    # image (compressed/scattered coefficients), even when its length
    # happens to factor like one. Declared per operator, not inferred.
    measurement_image: str | None = None

    # --- abstract spectral pieces -----------------------------------------
    def V(self, vec):
        raise NotImplementedError

    def Vt(self, vec):
        raise NotImplementedError

    def U(self, vec):
        raise NotImplementedError

    def Ut(self, vec):
        raise NotImplementedError

    def singulars(self) -> jnp.ndarray:
        raise NotImplementedError

    def add_zeros(self, vec):
        raise NotImplementedError

    # --- compositions ------------------------------------------------------
    def A(self, vec):
        temp = self.Vt(vec)
        s = self.singulars()
        return self.U(s * temp[:, : s.shape[0]])

    def At(self, vec):
        temp = self.Ut(vec)
        s = self.singulars()
        return self.V(self.add_zeros(s * temp[:, : s.shape[0]]))

    def A_pinv(self, vec):
        temp = self.Ut(vec)
        s = self.singulars()
        factors = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
        temp = temp.at[:, : s.shape[0]].multiply(factors)
        return self.V(self.add_zeros(temp))

    def A_pinv_eta(self, vec, eta):
        temp = self.Ut(vec)
        s = self.singulars()
        factors = s / (s * s + eta)
        temp = temp.at[:, : s.shape[0]].multiply(factors)
        return self.V(self.add_zeros(temp))

    # --- fused DDNM projection ------------------------------------------------
    # The samplers need A_pinv(A x - y) every step (svd_ddnm.py:59-61,
    # :124-126). By linearity that splits into a per-image CONSTANT and a
    # per-step range-space projection:
    #
    #     A_pinv(A x - y) = (A_pinv A) x - A_pinv y = range_project(x) - Apy
    #
    # `prepare_measurement` hoists A_pinv(y) out of the sampling loop;
    # `range_project` is the per-step remainder P = A+ A = V 1{s>0} Vt
    # (U cancels: Ut U = I). The base form costs one Vt + one V — already
    # half the composed path — and concrete ops override it where the
    # algebra collapses further (the spectral-ordering permutations inside
    # Vt/V cancel against their inverses in P, so the overrides skip the
    # 65k-element gathers that otherwise dominate the step's operator cost
    # on TPU). Exact up to fp32 round-off vs the composed form (the fused
    # form skips orthogonal-rotation round-trips, so it is the *more*
    # accurate one).

    def prepare_measurement(self, y):
        """The per-image constant A_pinv(y). Compute once, outside the loop."""
        return self.A_pinv(y)

    def range_project(self, x_vec):
        """P x = A_pinv(A x) = V(add_zeros(1{s>0} * Vt(x)[:M]))."""
        s = self.singulars()
        spec_x = self.Vt(x_vec)[:, : s.shape[0]]
        return self.V(self.add_zeros(jnp.where(s == 0, 0.0, spec_x)))

    def range_correction(self, x_vec, apy):
        """A_pinv(A x - y), given apy = prepare_measurement(y)."""
        return self.range_project(x_vec) - apy

    def noisy_update(self, x0_vec, prepared, a, sigma_y, sigma_t, eta,
                     noise_vec, et_vec):
        """The two operator-dependent pieces of the noisy DDNM+ step
        (svd_ddnm.py:124-131): returns
            (Lambda(A_pinv(A x0 - y)),  Lambda_noise(noise, ..., et)).
        `prepared` is this op's prepare_measurement(y) output (opaque to the
        sampler). Base: composed from range_correction/Lambda/Lambda_noise;
        ops override with fused natural-spectral-layout versions that skip
        the permutation gathers and redundant V·Vt round-trips (see
        range_project note above)."""
        corr = self.range_correction(x0_vec, prepared)
        lam_corr = self.Lambda(corr, a, sigma_y, sigma_t, eta)
        noise_term = self.Lambda_noise(noise_vec, a, sigma_y, sigma_t, eta, et_vec)
        return lam_corr, noise_term

    # --- DDNM+ hooks ---------------------------------------------------------
    # Generic spectral-space defaults: Eq.17/Eq.51 are diagonal in the SVD
    # basis, so V . diag(coef(s)) . Vt is exact for ANY operator in this
    # protocol. The reference implements these per-op and simply OMITS them
    # for SRConv and Deblurring2D (noisy sr_bicubic / deblur_aniso crash
    # there, SURVEY.md §2 #10/#12); with these defaults every operator here
    # is noisy-DDNM+-capable. Concrete ops still override where the
    # reference has op-specific quirks to reproduce (e.g. Deblurring's
    # pre-threshold `_singulars_orig` coefficients, or Lambda_noise's
    # skip-the-rotation treatment of isotropic noise).

    def _singulars_full(self) -> jnp.ndarray:
        """Singular values placed on the full spectral axis (zeros in the
        null space), using the op's own add_zeros layout."""
        s = self.singulars()
        return self.add_zeros(s[None])[0]

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        s_full = self._singulars_full()
        lam = ddnm_plus_lambda(s_full, a, sigma_y, sigma_t, eta)
        return self.V(lam[None] * self.Vt(vec))

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        s_full = self._singulars_full()
        d1, d2 = ddnm_plus_noise_coeffs(s_full, a, sigma_y, sigma_t, eta)
        return self.V(d1[None] * self.Vt(vec) + d2[None] * self.Vt(epsilon))
