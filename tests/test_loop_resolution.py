"""Loop-driver resolution: the size-aware `auto` policy and its call shape.

Round-3 regression guard (VERDICT r3 item 1): `sampling/posterior.py` kept a
stale one-arg local `_resolve_loop` after the size-aware two-arg form landed
in `sampling/ddnm.py`, so every `sample_posterior` call raised TypeError and
the whole hq pipeline was dead at HEAD. These tests pin:

(a) every sampler module resolves loops through the ONE shared
    implementation (no local copies can go stale again);
(b) the `auto` policy's branches, including both sides of the 64 MB
    parameter-size threshold (remote-compile backends only — the size rule
    exists because small models are host-dispatch-bound through the axon
    tunnel, docs/PERFORMANCE.md "Scan vs host");
(c) the exact call shape that broke: each public sampler AND both service
    classes invoked with loop="auto" plus a params pytree, and explicitly
    with both drivers.

The reference has a single Python loop and no driver concept
(guided_diffusion/diffusion.py:347-396); the dual scan/host driver is
TPU-native machinery, tested here on the CPU backend.
"""

from __future__ import annotations

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddnm_tpu import schedules
from ddnm_tpu.operators import build_functional_operator
from ddnm_tpu.operators.svd_ops import build_svd_operator
from ddnm_tpu.sampling import (
    build_posterior_tables,
    build_schedule,
    sample_posterior,
    sample_simplified,
    sample_simplified_multistep,
    sample_svd,
    sample_svd_multistep,
)
from ddnm_tpu.sampling import ddnm as ddnm_mod

RES = 16


# ------------------------------------------------------- (a) one resolver


def test_single_shared_resolver():
    """posterior.py / solvers.py / accel.py must use ddnm._resolve_loop
    itself, not a local copy (the exact round-3 failure mode)."""
    from ddnm_tpu.sampling import accel, posterior, solvers

    for mod in (posterior, solvers, accel):
        local = getattr(mod, "_resolve_loop", None)
        if local is not None:
            assert local is ddnm_mod._resolve_loop, (
                f"{mod.__name__} carries its own _resolve_loop — import the "
                "shared size-aware one from sampling/ddnm.py instead"
            )


# --------------------------------------------------- (b) auto policy branches


def _fake_params(nbytes: int):
    """A pytree whose leaves report a given total nbytes without allocating."""
    return [types.SimpleNamespace(nbytes=nbytes)]


def test_auto_policy_branches(monkeypatch):
    small = _fake_params(ddnm_mod._AUTO_SCAN_PARAM_BYTES - 1)
    big = _fake_params(ddnm_mod._AUTO_SCAN_PARAM_BYTES)

    # on the CPU backend auto is always scan, any params size
    assert jax.default_backend() == "cpu"
    for p in (None, small, big):
        assert ddnm_mod._resolve_loop("auto", p) == "scan"

    # explicit drivers pass through untouched everywhere
    for p in (None, small, big):
        assert ddnm_mod._resolve_loop("host", p) == "host"
        assert ddnm_mod._resolve_loop("scan", p) == "scan"

    # non-CPU, non-remote backend (directly attached TPU): scan always
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import ddnm_tpu.utils as utils

    monkeypatch.setattr(utils, "is_remote_compile_backend", lambda: False)
    for p in (None, small, big):
        assert ddnm_mod._resolve_loop("auto", p) == "scan"

    # remote-compile backend: size-aware — scan under 64 MB of params,
    # host at/above it, host when the size is unknown (params=None)
    monkeypatch.setattr(utils, "is_remote_compile_backend", lambda: True)
    assert ddnm_mod._resolve_loop("auto", small) == "scan"
    assert ddnm_mod._resolve_loop("auto", big) == "host"
    assert ddnm_mod._resolve_loop("auto", None) == "host"


def test_params_nbytes_counts_tree_leaves():
    p = {"a": np.zeros((4, 4), np.float32), "b": [np.zeros(8, np.float32)]}
    assert ddnm_mod._params_nbytes(p) == 4 * 4 * 4 + 8 * 4
    assert ddnm_mod._params_nbytes(None) is None


# ------------------------------------- (c) call shape through every sampler

# A trivial eps model with a REAL params pytree: enough to exercise the
# (loop, params) plumbing without a UNet. Mildly contractive output.
def _eps_model(p, x, t):
    return x * p["scale"]


def _posterior_model(p, x, t):
    # learned-range ADM head: channels [eps, var_values]
    return jnp.concatenate([x * p["scale"], jnp.zeros_like(x)], axis=-1)


@pytest.fixture(scope="module")
def tiny_params():
    return {"scale": jnp.full((1,), 0.1, jnp.float32)}


@pytest.fixture(scope="module")
def sched3():
    betas = schedules.get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    return build_schedule(betas=betas, t_sampling=3)


@pytest.mark.parametrize("loop", ["auto", "host", "scan"])
def test_simplified_sampler_loop_shapes(loop, tiny_params, sched3):
    op = build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, RES, RES, 3))
    y = op.A(x)
    out, x0 = sample_simplified(
        _eps_model, x, y, op, sched3, jax.random.PRNGKey(1),
        loop=loop, params=tiny_params)
    assert out.shape == x.shape and x0.shape == x.shape

    out_ms, _ = sample_simplified_multistep(
        _eps_model, x, y, op, sched3, jax.random.PRNGKey(1),
        loop=loop, params=tiny_params)
    assert out_ms.shape == x.shape


@pytest.mark.parametrize("loop", ["auto", "host", "scan"])
def test_svd_sampler_loop_shapes(loop, tiny_params, sched3):
    op = build_svd_operator("denoising", image_size=RES)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, RES, RES, 3))
    y = op.A(x.reshape(2, -1))
    out, _ = sample_svd(
        _eps_model, x, y, op, sched3, jax.random.PRNGKey(1),
        loop=loop, params=tiny_params)
    assert out.shape == x.shape

    out_ms, _ = sample_svd_multistep(
        _eps_model, x, y, op, sched3, jax.random.PRNGKey(1),
        loop=loop, params=tiny_params)
    assert out_ms.shape == x.shape


@pytest.fixture(scope="module")
def tables3():
    return build_posterior_tables(
        betas=schedules.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="3",
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1,
                                  jump_n_sample=1))


@pytest.mark.parametrize("loop", ["auto", "host", "scan"])
def test_posterior_sampler_loop_shapes(loop, tiny_params, tables3):
    """The round-3 crash site: sample_posterior with loop='auto' + params."""
    op = build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, RES, RES, 3))
    apy = op.Ap(op.A(x))
    out, x0 = sample_posterior(
        _posterior_model, x, apy, op, tables3, jax.random.PRNGKey(1),
        loop=loop, params=tiny_params)
    assert out.shape == x.shape and x0.shape == x.shape


# ------------------------------------------------ (c) both service classes


@pytest.mark.parametrize("loop", ["auto", "host"])
def test_services_construct_and_restore_with_loop(loop, tables3, sched3):
    """Both service classes, loop='auto'/'host', params threading through
    the sampler call — the end-to-end shape MULTICHIP_r03 died on."""
    from ddnm_tpu.server import PosteriorRestorationService, RestorationService

    params = {"scale": jnp.full((1,), 0.1, jnp.float32)}
    ops = {"sr_averagepooling": build_functional_operator(
        "sr_averagepooling", image_size=RES, deg_scale=4)}
    gts = np.random.default_rng(3).uniform(
        0.2, 0.8, (2, RES, RES, 3)).astype(np.float32)

    svc = RestorationService(
        _eps_model, params, sched3, ops, image_size=RES, max_batch=2,
        loop=loop)
    out = svc.restore(gts, "sr_averagepooling", [0, 1], input_kind="gt")
    assert out.shape == gts.shape

    psvc = PosteriorRestorationService(
        _posterior_model, params, tables3, ops, image_size=RES, max_batch=2,
        loop=loop)
    pout = psvc.restore(gts, "sr_averagepooling", [0, 1], input_kind="gt")
    assert pout.shape == gts.shape
