"""Spatial partitioning (ddnm_tpu/parallel/spatial.py): sharding the image
H axis over a mesh axis must be a pure layout change — XLA SPMD inserts
conv halo exchanges and norm/attention cross-shard reductions, and results
match the unsharded run to fp tolerance. Validated on the virtual CPU mesh
(the TPU equivalent of a fake backend)."""

import numpy as np
import jax
import jax.numpy as jnp

from ddnm_tpu import schedules as sch
from ddnm_tpu.operators import build_functional_operator
from ddnm_tpu.parallel import make_mesh_2d, replicate, shard_tiles
from ddnm_tpu.sampling.posterior import build_posterior_tables, sample_posterior

RES = 32


def _tiny_unet():
    from ddnm_tpu.models.unet_ddpm import DDPMUNet

    model = DDPMUNet(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=RES)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, RES, RES, 3))
    params = model.init(rng, x, jnp.zeros((2,)))
    return model, params, x


def test_spatial_sharded_forward_matches_replicated():
    """UNet forward with H sharded over 4 chips == unsharded forward (conv
    halos + GroupNorm cross-shard reductions + attention gather are all
    handled by the partitioner)."""
    model, params, x = _tiny_unet()
    t = jnp.full((2,), 10.0)

    fwd = jax.jit(lambda p, x, t: model.apply(p, x, t))
    ref = np.asarray(fwd(params, x, t))

    mesh = make_mesh_2d(1, 4)
    xs = shard_tiles(mesh, x)
    ps = replicate(mesh, params)
    out = np.asarray(fwd(ps, xs, t))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spatial_sharded_posterior_sampling_matches():
    """Full posterior DDNM trajectory with (data x spatial) sharded tiles ==
    unsharded trajectory (deterministic noise)."""
    model, params, x = _tiny_unet()

    def model6_fn(p, xx, tt):
        eps = model.apply(p, xx, tt)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    op = build_functional_operator("sr_averagepooling", image_size=RES, deg_scale=4)
    apy = op.Ap(op.A(x))
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="3", sigma_y=0.0,
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    key = jax.random.PRNGKey(5)
    x_init = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    ref, ref0 = sample_posterior(
        model6_fn, x_init, apy, op, tables, key, noise_fn=zero_noise,
        params=params,
    )

    mesh = make_mesh_2d(2, 4)  # batch 2 over dp=2, rows over sp=4
    xs, apys = shard_tiles(mesh, (x_init, apy))
    ps = replicate(mesh, params)
    out, out0 = sample_posterior(
        model6_fn, xs, apys, op, tables, key, noise_fn=zero_noise, params=ps,
    )
    # cross-shard reduction order differs from the single-device sum, and
    # the drift compounds over the trajectory -> fp tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=1e-3)


def test_tiling_with_2d_mesh_matches_unsharded():
    """mask_shift_sample with a (data, spatial) mesh == meshless run."""
    from ddnm_tpu.tiling import mask_shift_sample

    def toy(x, t):
        del t
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    rng = np.random.default_rng(21)
    gt = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="3", sigma_y=0.0,
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    common = dict(scale=4, resize_y=True, noise_fn=zero_noise, parallel=True)

    plain = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                              jax.random.PRNGKey(0), **common)
    sharded = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                                jax.random.PRNGKey(0),
                                mesh=make_mesh_2d(2, 2), **common)
    np.testing.assert_allclose(sharded["final"], plain["final"], atol=2e-5)


def test_sequential_carry_tiling_with_spatial_mesh():
    """The reference-parity SEQUENTIAL carry chain with a pure-spatial mesh
    (dp=1, sp=4) — the case SP exists for — matches the meshless run."""
    from ddnm_tpu.tiling import mask_shift_sample

    def toy(x, t):
        del t
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    rng = np.random.default_rng(23)
    gt = rng.uniform(-1, 1, (1, 384, 384, 3)).astype(np.float32)
    tables = build_posterior_tables(
        betas=sch.named_beta_schedule("linear", 100, use_scale=True),
        timestep_respacing="3", sigma_y=0.0,
        schedule_jump_params=dict(t_T=3, n_sample=1, jump_length=1, jump_n_sample=1),
    )
    zero_noise = lambda key, shape: jnp.zeros(shape, jnp.float32)
    common = dict(scale=4, resize_y=False, noise_fn=zero_noise)

    plain = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                              jax.random.PRNGKey(0), **common)
    sharded = mask_shift_sample(toy, gt, "sr_averagepooling", tables,
                                jax.random.PRNGKey(0),
                                mesh=make_mesh_2d(1, 4), **common)
    np.testing.assert_allclose(sharded["final"], plain["final"], atol=2e-5)
