"""SVD operator tests: internal identities + elementwise parity vs the
PyTorch oracle at /root/reference/functions/svd_operators.py.

Deblurring/Deblurring2D parity injects the oracle's sort permutation (the
descending sort has massive ties — see the REFERENCE-QUIRK note in
ddnm_tpu/operators/svd_ops.py — so tie order is a torch-internals detail)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ddnm_tpu.operators import svd_ops
from tests._reference import import_reference

D = 8  # small image dim for tests
C = 3
B = 2
RNG = np.random.RandomState(7)


def _ops_under_test():
    """(name, ours, oracle-builder) triples on matched constants."""
    torch = pytest.importorskip("torch")
    ref = import_reference("functions.svd_operators")

    cases = []

    cases.append((
        "denoising",
        svd_ops.Denoising(C, D),
        ref.Denoising(C, D, "cpu"),
    ))

    cases.append((
        "colorization",
        svd_ops.Colorization(D),
        ref.Colorization(D, "cpu"),
    ))

    mask = RNG.rand(D, D) > 0.3
    flat = mask.reshape(-1)
    missing_r = np.nonzero(flat == 0)[0] * 3
    missing = np.concatenate([missing_r, missing_r + 1, missing_r + 2])
    cases.append((
        "inpainting",
        svd_ops.Inpainting(C, D, missing),
        ref.Inpainting(C, D, torch.from_numpy(missing).long(), "cpu"),
    ))

    cases.append((
        "sr_averagepooling",
        svd_ops.SuperResolution(C, D, 2),
        ref.SuperResolution(C, D, 2, "cpu"),
    ))

    perm = np.random.RandomState(3).permutation(D * D)
    cases.append((
        "cs_walshhadamard",
        svd_ops.WalshHadamardCS(C, D, 2, perm),
        ref.WalshHadamardCS(C, D, 2, torch.from_numpy(perm).long(), "cpu"),
    ))

    k = svd_ops.bicubic_kernel(2)
    ref_srconv = ref.SRConv(torch.from_numpy(k / k.sum()).float(), C, D, "cpu", stride=2)
    cases.append((
        "sr_bicubic",
        svd_ops.SRConv(k / k.sum(), C, D, stride=2),
        ref_srconv,
    ))

    kg = np.exp(-0.5 * (np.array([-2, -1, 0, 1, 2]) / 10.0) ** 2)
    kg = (kg / kg.sum()).astype(np.float32)
    ref_deb = ref.Deblurring(torch.from_numpy(kg), C, D, "cpu")
    ours_deb = svd_ops.Deblurring(kg, C, D, perm=ref_deb._perm.numpy())
    # Pin the oracle's SVD basis: U/V column signs are a LAPACK-run detail
    # (f32 vs f64) that flips U and V together, so A/At/A_pinv/Lambda are
    # invariant — but Lambda_noise applies V to un-rotated noise and sees it.
    ours_deb._v_small = jnp.asarray(ref_deb.V_small.numpy())
    ours_deb._u_small = jnp.asarray(ref_deb.U_small.numpy())
    cases.append(("deblur_gauss", ours_deb, ref_deb))

    x = np.arange(-4, 5)
    k2 = np.exp(-0.5 * (x / 20.0) ** 2)
    k1 = np.exp(-0.5 * (x / 1.0) ** 2)
    k1 = (k1 / k1.sum()).astype(np.float32)
    k2 = (k2 / k2.sum()).astype(np.float32)
    ref_deb2 = ref.Deblurring2D(
        torch.from_numpy(k1), torch.from_numpy(k2), C, D, "cpu"
    )
    ours_deb2 = svd_ops.Deblurring2D(k1, k2, C, D, perm=ref_deb2._perm.numpy())
    cases.append(("deblur_aniso", ours_deb2, ref_deb2))

    # BlockCS: oracle draws its measurement matrix internally; share its V.
    torch.manual_seed(0)
    ref_cs = ref.CS(C, 32, 0.25, "cpu")
    ours_cs = svd_ops.BlockCS(C, 32, 0.25)
    ours_cs._v_small = jnp.asarray(ref_cs.V_small.numpy())
    cases.append(("cs_blockbased", ours_cs, ref_cs))

    A = RNG.randn(10, 20).astype(np.float32)
    cases.append(("general", svd_ops.GeneralA(A), ref.GeneralA(torch.from_numpy(A))))

    return cases


@pytest.fixture(scope="module")
def op_cases():
    return _ops_under_test()


def _full_dim(op):
    if isinstance(op, svd_ops.GeneralA):
        return op._v.shape[0]
    if isinstance(op, svd_ops.BlockCS):
        return C * 32 * 32
    return C * D * D


def test_fused_range_correction_matches_composed(op_cases):
    """The samplers' fused per-step projection (operators/base.py
    range_project / range_correction, including every per-op gather-free
    override) must equal the composed A_pinv(A x - y)."""
    for name, ours, _ in op_cases:
        n = _full_dim(ours)
        x = jnp.asarray(RNG.randn(B, n).astype(np.float32))
        y = ours.A(jnp.asarray(RNG.randn(B, n).astype(np.float32)))
        proj = ours.range_project(x)
        np.testing.assert_allclose(
            proj, ours.A_pinv(ours.A(x)), atol=2e-4,
            err_msg=f"range_project != A+ A [{name}]",
        )
        composed = ours.A_pinv(ours.A(x) - y)
        fused = ours.range_correction(x, ours.prepare_measurement(y))
        np.testing.assert_allclose(
            fused, composed, atol=2e-4,
            err_msg=f"fused range_correction != A+(Ax-y) [{name}]",
        )


def test_fused_noisy_update_matches_composed(op_cases):
    """noisy_update (the fused DDNM+ step pieces, including per-op overrides)
    must equal Lambda(A_pinv(A x - y)) / Lambda_noise(noise, et) composed."""
    a, sigma_y, sigma_t, eta = 0.7, 0.1, 0.6, 0.85
    for name, ours, _ in op_cases:
        n = _full_dim(ours)
        x = jnp.asarray(RNG.randn(B, n).astype(np.float32))
        nv = jnp.asarray(RNG.randn(B, n).astype(np.float32))
        ev = jnp.asarray(RNG.randn(B, n).astype(np.float32))
        y = ours.A(jnp.asarray(RNG.randn(B, n).astype(np.float32)))
        corr_ref = ours.A_pinv(ours.A(x) - y)
        lam_ref = ours.Lambda(corr_ref, a, sigma_y, sigma_t, eta)
        noise_ref = ours.Lambda_noise(nv, a, sigma_y, sigma_t, eta, ev)
        lam_f, noise_f = ours.noisy_update(
            x, ours.prepare_measurement(y), a, sigma_y, sigma_t, eta, nv, ev
        )
        np.testing.assert_allclose(
            lam_f, lam_ref, atol=2e-4,
            err_msg=f"fused Lambda(corr) != composed [{name}]",
        )
        np.testing.assert_allclose(
            noise_f, noise_ref, atol=2e-4,
            err_msg=f"fused Lambda_noise != composed [{name}]",
        )


def test_pinv_identities(op_cases):
    for name, ours, _ in op_cases:
        n = _full_dim(ours)
        x = jnp.asarray(RNG.randn(B, n).astype(np.float32))
        Ax = ours.A(x)
        lhs = ours.A(ours.A_pinv(Ax))
        np.testing.assert_allclose(lhs, Ax, atol=2e-4, err_msg=f"A A+ A != A [{name}]")
        Apy = ours.A_pinv(Ax)
        lhs2 = ours.A_pinv(ours.A(Apy))
        np.testing.assert_allclose(lhs2, Apy, atol=2e-4, err_msg=f"A+ A A+ != A+ [{name}]")


def test_adjointness(op_cases):
    for name, ours, _ in op_cases:
        n = _full_dim(ours)
        x = jnp.asarray(RNG.randn(B, n).astype(np.float32))
        Ax = ours.A(x)
        y = jnp.asarray(RNG.randn(*Ax.shape).astype(np.float32))
        lhs = jnp.sum(Ax * y, axis=1)
        rhs = jnp.sum(x * ours.At(y), axis=1)
        np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=1e-3,
                                   err_msg=f"<Ax,y> != <x,At y> [{name}]")


def test_v_orthogonality(op_cases):
    for name, ours, _ in op_cases:
        if isinstance(ours, svd_ops.GeneralA):
            continue
        n = _full_dim(ours)
        x = jnp.asarray(RNG.randn(B, n).astype(np.float32))
        np.testing.assert_allclose(
            ours.V(ours.Vt(x)), x, atol=2e-4, err_msg=f"V Vt != I [{name}]"
        )
        np.testing.assert_allclose(
            ours.Vt(ours.V(x)), x, atol=2e-4, err_msg=f"Vt V != I [{name}]"
        )


def _to_torch(x):
    import torch

    return torch.from_numpy(np.asarray(x))


def test_parity_A_At_pinv(op_cases):
    import torch

    for name, ours, theirs in op_cases:
        n = _full_dim(ours)
        x = RNG.randn(B, n).astype(np.float32)
        with torch.no_grad():
            ref_A = theirs.A(_to_torch(x)).numpy()
            ref_pinv = theirs.A_pinv(_to_torch(ref_A)).numpy()
            ref_At = theirs.At(_to_torch(ref_A)).numpy()
        our_A = np.asarray(ours.A(jnp.asarray(x)))
        np.testing.assert_allclose(our_A, ref_A, atol=5e-4, err_msg=f"A parity [{name}]")
        np.testing.assert_allclose(
            np.asarray(ours.A_pinv(jnp.asarray(ref_A))), ref_pinv, atol=5e-4,
            err_msg=f"A_pinv parity [{name}]",
        )
        np.testing.assert_allclose(
            np.asarray(ours.At(jnp.asarray(ref_A))), ref_At, atol=5e-4,
            err_msg=f"At parity [{name}]",
        )


def test_parity_lambda(op_cases):
    import torch

    a, sigma_y, sigma_t, eta = 0.9, 0.1, 0.3, 0.85
    for name, ours, theirs in op_cases:
        try:
            n = _full_dim(ours)
            x = RNG.randn(B, n).astype(np.float32)
            with torch.no_grad():
                ref = theirs.Lambda(
                    _to_torch(x), a, sigma_y, torch.tensor(sigma_t), eta
                ).numpy()
        except NotImplementedError:
            # the reference omits Lambda here (noisy mode crashes there);
            # our generic spectral-space default must still work
            out = np.asarray(ours.Lambda(jnp.asarray(x), a, sigma_y, sigma_t, eta))
            assert out.shape == x.shape and np.isfinite(out).all()
            continue
        mine = np.asarray(ours.Lambda(jnp.asarray(x), a, sigma_y, sigma_t, eta))
        np.testing.assert_allclose(mine, ref, atol=5e-4, err_msg=f"Lambda parity [{name}]")

        # low-noise regime exercises the other branch
        with torch.no_grad():
            ref2 = theirs.Lambda(
                _to_torch(x), a, 0.5, torch.tensor(0.01), eta
            ).numpy()
        mine2 = np.asarray(ours.Lambda(jnp.asarray(x), a, 0.5, 0.01, eta))
        np.testing.assert_allclose(mine2, ref2, atol=5e-4, err_msg=f"Lambda branch parity [{name}]")


def test_parity_lambda_noise(op_cases):
    import torch

    a, sigma_y, eta = 0.9, 0.1, 0.85
    for name, ours, theirs in op_cases:
        n = _full_dim(ours)
        x = RNG.randn(B, n).astype(np.float32)
        eps = RNG.randn(B, n).astype(np.float32)
        for sigma_t in (0.3, 0.01):
            try:
                with torch.no_grad():
                    ref = theirs.Lambda_noise(
                        _to_torch(x), a, sigma_y, torch.tensor(sigma_t), eta, _to_torch(eps)
                    ).numpy()
            except NotImplementedError:
                out = np.asarray(ours.Lambda_noise(
                    jnp.asarray(x), a, sigma_y, sigma_t, eta, jnp.asarray(eps)
                ))
                assert out.shape == x.shape and np.isfinite(out).all()
                break
            mine = np.asarray(
                ours.Lambda_noise(jnp.asarray(x), a, sigma_y, sigma_t, eta, jnp.asarray(eps))
            )
            np.testing.assert_allclose(
                mine, ref, atol=5e-4, err_msg=f"Lambda_noise parity [{name}] sigma_t={sigma_t}"
            )


def test_fwht_self_inverse():
    perm = np.random.RandomState(0).permutation(D * D)
    op = svd_ops.WalshHadamardCS(C, D, 2, perm)
    x = jnp.asarray(RNG.randn(B, C, D * D).astype(np.float32))
    np.testing.assert_allclose(op.fwht(op.fwht(x)), x, atol=1e-5)


def test_generic_lambda_matches_specific():
    """The base-class spectral-space Lambda default must reproduce the
    op-specific implementations (which mirror the reference's per-op code)
    for every operator whose reference Lambda uses its post-threshold
    singulars. Deblurring is excluded: the reference intentionally computes
    its coefficients from the PRE-threshold singulars (_singulars_orig,
    svd_operators.py:958,1021)."""
    import jax.numpy as jnp
    from ddnm_tpu.operators.base import SVDOperator
    from ddnm_tpu.operators.svd_ops import build_svd_operator

    size = 16
    rng = np.random.default_rng(0)
    vec = jnp.asarray(rng.standard_normal((2, 3 * size * size)), jnp.float32)
    a, sigma_y, sigma_t, eta = 0.8, 0.1, 0.3, 0.85

    mask = (rng.uniform(size=(size, size)) > 0.3).astype(np.float32)
    cases = [
        build_svd_operator("denoising", channels=3, image_size=size),
        build_svd_operator("colorization", channels=3, image_size=size),
        build_svd_operator("inpainting", channels=3, image_size=size, mask=mask),
        build_svd_operator("sr_averagepooling", channels=3, image_size=size, deg_scale=2),
        build_svd_operator("cs_walshhadamard", channels=3, image_size=size, deg_scale=0.25),
    ]
    for op in cases:
        specific = np.asarray(op.Lambda(vec, a, sigma_y, sigma_t, eta))
        generic = np.asarray(SVDOperator.Lambda(op, vec, a, sigma_y, sigma_t, eta))
        np.testing.assert_allclose(generic, specific, rtol=1e-4, atol=1e-5,
                                   err_msg=type(op).__name__)


def test_noisy_mode_works_for_srconv_and_aniso():
    """Noisy DDNM+ on sr_bicubic / deblur_aniso — the reference crashes here
    (no Lambda implemented); our generic default makes them first-class."""
    import jax
    import jax.numpy as jnp
    from ddnm_tpu import schedules as sch
    from ddnm_tpu.operators.svd_ops import build_svd_operator
    from ddnm_tpu.sampling import build_schedule, sample_svd

    size = 16
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)), jnp.float32)
    betas = sch.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=50
    )
    sched = build_schedule(betas=betas, t_sampling=5)
    x_init = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)

    def model(x, t):
        return 0.1 * x

    for deg in ("sr_bicubic", "deblur_aniso"):
        op = build_svd_operator(deg, channels=3, image_size=size, deg_scale=2)
        y = op.A(jnp.transpose(x0, (0, 3, 1, 2)).reshape(1, -1))
        out, _ = sample_svd(
            model, x_init, y, op, sched, jax.random.PRNGKey(0),
            eta=0.85, sigma_y=0.1,
        )
        assert np.isfinite(np.asarray(out)).all(), deg


def test_generala_tall_matrix_fused_paths():
    """GeneralA with MORE ROWS THAN COLUMNS (overdetermined A): the fused
    spectral paths must slice to the singular count (the reference's own
    add_zeros crashes here; ours generalises)."""
    from ddnm_tpu.operators.svd_ops import GeneralA

    rng = np.random.default_rng(0)
    A = rng.standard_normal((12, 8))
    op = GeneralA(A)
    x = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    y = op.A(x)
    assert y.shape == (2, 12)
    spec_y = op.prepare_measurement(y)
    # fused range path == composed pinv path
    np.testing.assert_allclose(
        np.asarray(op.V(spec_y)), np.asarray(op.A_pinv(y)), atol=1e-4)
    # range_correction(x, spec_y) == Ap(A x) - Ap(y)
    corr = op.range_correction(x, spec_y)
    ref = op.A_pinv(op.A(x)) - op.A_pinv(y)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(ref), atol=1e-4)


def test_noise_coeffs_sigma_y_zero_gate():
    """sigma_y=0 (or a=0) keeps the DDIM defaults d1=sigma_t*eta,
    d2=sigma_t*sqrt(1-eta^2) — the reference's `a != 0 and sigma_y != 0`
    gate (svd_operators.py:264)."""
    from ddnm_tpu.operators.base import ddnm_plus_noise_coeffs

    s = jnp.asarray([0.0, 0.5, 1.0, 2.0])
    sigma_t, eta = 0.3, 0.85
    for a, sy in [(0.9, 0.0), (0.0, 0.1)]:
        d1, d2 = ddnm_plus_noise_coeffs(s, a, sy, sigma_t, eta)
        np.testing.assert_allclose(np.asarray(d1), sigma_t * eta, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(d2), sigma_t * (1 - eta**2) ** 0.5, atol=1e-6)
