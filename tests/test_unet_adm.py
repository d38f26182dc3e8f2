"""ADM UNet / classifier parity vs the reference torch implementation with
converted random weights (small configs, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ddnm_tpu.models.convert import adm_key_map, torch_state_dict_to_flax
from ddnm_tpu.models.unet_adm import ADMClassifier, ADMUNet
from tests._reference import import_reference

RES = 32


def _wake_zero_params(torch, model, std=0.05, seed=7):
    """Randomize every exactly-zero parameter (zero_module() convs, zero
    biases). A random-init reference UNet outputs exactly 0 because the
    final conv is zero_module()'d (unet.py:539-543) — parity on the raw
    init would be vacuous; this makes the whole forward path live."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if p.detach().abs().max().item() == 0.0:
                p.copy_(torch.randn(p.shape, generator=gen) * std)


def _ref_unet(torch, ref_unet_mod, num_classes=None, new_order=False):
    torch.manual_seed(0)
    m = ref_unet_mod.UNetModel(
        image_size=RES,
        in_channels=3,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions={2, 4},
        channel_mult=(1, 2, 2),
        num_classes=num_classes,
        num_heads=4,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
        use_new_attention_order=new_order,
    )
    m.eval()
    return m


def _ours_unet(num_classes=None, new_order=False):
    return ADMUNet(
        image_size=RES,
        in_channels=3,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions=(2, 4),
        channel_mult=(1, 2, 2),
        num_classes=num_classes,
        num_heads=4,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
        use_new_attention_order=new_order,
    )


@pytest.mark.parametrize(
    "class_cond,new_order",
    [(False, False), (True, False), (False, True)],
    ids=["uncond", "class_cond", "new_order"],
)
def test_adm_unet_parity(class_cond, new_order):
    """Forward parity incl. QKVAttention's non-legacy channel split
    (unet.py:287-293,361-393) when use_new_attention_order=True."""
    torch = pytest.importorskip("torch")
    ref_unet_mod = import_reference("guided_diffusion.unet")
    num_classes = 1000 if class_cond else None
    ref = _ref_unet(torch, ref_unet_mod, num_classes, new_order)
    model = _ours_unet(num_classes, new_order)
    _wake_zero_params(torch, ref)
    params = {"params": torch_state_dict_to_flax(ref.state_dict(), adm_key_map)}

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, RES, RES).astype(np.float32)
    t = np.array([999.0, 31.0], dtype=np.float32)
    y = np.array([951, 3]) if class_cond else None

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(t),
            torch.from_numpy(y) if class_cond else None,
        ).numpy()

    out = model.apply(
        params,
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t),
        jnp.asarray(y) if class_cond else None,
    )
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref_out, atol=5e-4, rtol=1e-3)

    if new_order:
        # guard against the flag being silently ignored on both sides:
        # same weights under the legacy split must give a different output
        legacy_out = _ours_unet(num_classes, new_order=False).apply(
            params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t)
        )
        assert not np.allclose(np.asarray(legacy_out), np.asarray(out), atol=1e-3)


@pytest.mark.parametrize("pool", ["attention", "adaptive", "spatial", "spatial_v2"])
def test_adm_classifier_parity(pool):
    torch = pytest.importorskip("torch")
    ref_unet_mod = import_reference("guided_diffusion.unet")
    torch.manual_seed(1)
    ref = ref_unet_mod.EncoderUNetModel(
        image_size=RES,
        in_channels=3,
        model_channels=32,
        out_channels=100,
        num_res_blocks=1,
        attention_resolutions={2, 4},
        channel_mult=(1, 2, 2),
        num_heads=4,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
        pool=pool,
    )
    ref.eval()
    _wake_zero_params(torch, ref)
    model = ADMClassifier(
        image_size=RES,
        in_channels=3,
        model_channels=32,
        out_channels=100,
        num_res_blocks=1,
        attention_resolutions=(2, 4),
        channel_mult=(1, 2, 2),
        num_heads=4,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
        pool=pool,
    )
    params = {"params": torch_state_dict_to_flax(ref.state_dict(), adm_key_map)}

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, RES, RES).astype(np.float32)
    t = np.array([100.0, 5.0], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = model.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t)
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-4, rtol=1e-3)


def test_converter_strict_validation(tmp_path):
    """Strict load (VERDICT round-1 #1c): the converted tree must match
    model.init's structure exactly; missing / extra / wrong-shaped
    state-dict keys fail loudly instead of building a wrong tree."""
    torch = pytest.importorskip("torch")
    from ddnm_tpu.data.checkpoints import load_params
    from ddnm_tpu.models.convert import validate_converted_params

    ref_unet_mod = import_reference("guided_diffusion.unet")
    ref = _ref_unet(torch, ref_unet_mod)
    model = _ours_unet()
    sd = {k: v for k, v in ref.state_dict().items()}
    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)),
    )

    good = torch_state_dict_to_flax(sd, adm_key_map)
    validate_converted_params(good, expected["params"])  # no raise

    missing = dict(sd)
    missing.pop("out.2.weight")
    with pytest.raises(ValueError, match="missing"):
        validate_converted_params(
            torch_state_dict_to_flax(missing, adm_key_map), expected["params"])

    extra = dict(sd)
    extra["bogus_module.weight"] = torch.zeros(4, 4)
    with pytest.raises(ValueError, match="unexpected"):
        validate_converted_params(
            torch_state_dict_to_flax(extra, adm_key_map), expected["params"])

    wrong = dict(sd)
    wrong["time_embed.0.weight"] = torch.zeros(7, 7)
    with pytest.raises(ValueError, match="shape mismatch"):
        validate_converted_params(
            torch_state_dict_to_flax(wrong, adm_key_map), expected["params"])

    # end-to-end through load_params (fresh conversion AND the .npz cache)
    ckpt = tmp_path / "model.pt"
    torch.save(sd, ckpt)
    p1 = load_params(ckpt, expected=expected)
    assert "params" in p1
    p2 = load_params(ckpt, expected=expected)  # cache hit, still validated
    assert p2["params"].keys() == p1["params"].keys()
    torch.save(missing, ckpt)
    (tmp_path / "model.pt.flax.npz").unlink()
    with pytest.raises(ValueError, match="missing"):
        load_params(ckpt, expected=expected)


def test_cast_torso_keeps_groupnorm_affines_fp32():
    """cast_torso(bf16) mirrors the reference's mixed-precision split
    (fp16_util.py:15-32 + GroupNorm32): conv/dense weights go bf16-resident
    but GroupNorm scale/bias stay fp32 so the fp32 GN compute sees exact
    affine values."""
    from ddnm_tpu.models import cast_torso

    model = _ours_unet()
    x = jnp.zeros((1, RES, RES, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    cast = cast_torso(params, jnp.bfloat16)

    flat = jax.tree_util.tree_flatten_with_path(cast)[0]
    n_gn = n_cast = 0
    for path, leaf in flat:
        keys = [getattr(k, "key", None) for k in path]
        if "gn" in keys:
            assert leaf.dtype == jnp.float32, path
            n_gn += 1
        elif jnp.issubdtype(leaf.dtype, jnp.floating) or leaf.dtype == jnp.bfloat16:
            assert leaf.dtype == jnp.bfloat16, path
            n_cast += 1
    assert n_gn > 0 and n_cast > 0
    # the model still runs with mixed-resident params
    out = model.apply(cast, x, jnp.zeros((1,)))
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_groupnorm_impl_knob(monkeypatch):
    """DDNM_TPU_GN selects the GroupNorm computation path without changing
    numerics or the parameter tree (checkpoint layout)."""
    model = _ours_unet()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, RES, RES, 3), jnp.float32)
    t = jnp.asarray([5.0, 99.0])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
    base = model.apply(params, x, t)
    for impl in ("xla", "pallas"):
        monkeypatch.setenv("DDNM_TPU_GN", impl)
        if impl == "pallas":
            # pallas_call needs interpret mode on CPU; the kernel itself is
            # covered by tests/test_pallas_ops.py — here we only assert the
            # xla formulation through the knob
            continue
        params2 = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
        out = model.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)
    monkeypatch.setenv("DDNM_TPU_GN", "bogus")
    with pytest.raises(ValueError, match="DDNM_TPU_GN"):
        model.apply(params, x, t)


def test_converter_roundtrip_torch_flax_torch():
    """flax_to_torch_state_dict inverts torch_state_dict_to_flax exactly
    (basis of the trained-weights golden suite: a model trained here runs
    through the reference verbatim)."""
    torch = pytest.importorskip("torch")
    from ddnm_tpu.models.convert import flax_to_torch_state_dict

    ref_unet_mod = import_reference("guided_diffusion.unet")
    ref = _ref_unet(torch, ref_unet_mod, num_classes=1000)
    sd = {k: v for k, v in ref.state_dict().items()}
    flax_params = torch_state_dict_to_flax(sd, adm_key_map)
    back = flax_to_torch_state_dict(flax_params, sd, adm_key_map)
    assert back.keys() == sd.keys()
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)


def test_classifier_guidance_grad():
    """Guidance gradient direction matches torch autograd (diffusion.py:183-191)."""
    torch = pytest.importorskip("torch")
    ref_unet_mod = import_reference("guided_diffusion.unet")
    torch.manual_seed(1)
    ref = ref_unet_mod.EncoderUNetModel(
        image_size=RES, in_channels=3, model_channels=32, out_channels=100,
        num_res_blocks=1, attention_resolutions={2}, channel_mult=(1, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, pool="attention",
    )
    ref.eval()
    _wake_zero_params(torch, ref)
    model = ADMClassifier(
        image_size=RES, in_channels=3, model_channels=32, out_channels=100,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, pool="attention",
    )
    params = {"params": torch_state_dict_to_flax(ref.state_dict(), adm_key_map)}

    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, RES, RES).astype(np.float32)
    t = np.array([50.0], dtype=np.float32)
    classes = np.array([7])

    x_in = torch.from_numpy(x).requires_grad_(True)
    logits = ref(x_in, torch.from_numpy(t))
    selected = torch.log_softmax(logits, dim=-1)[range(1), classes]
    ref_grad = torch.autograd.grad(selected.sum(), x_in)[0].numpy() * 2.5

    from ddnm_tpu.models.unet_adm import classifier_guidance_fn

    guidance = classifier_guidance_fn(model.apply, jnp.asarray(classes), 2.5, params=params)
    g = guidance(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t))
    np.testing.assert_allclose(
        np.transpose(np.asarray(g), (0, 3, 1, 2)), ref_grad, atol=1e-4, rtol=1e-3
    )


@pytest.mark.parametrize("class_cond", [False, True])
def test_adm_encode_decode_split_matches_full(class_cond):
    """mode="encode"/"decode" (encoder-propagation accel, sampling/accel.py)
    composes to exactly the full forward, with the SAME parameter tree."""
    num_classes = 1000 if class_cond else None
    model = _ours_unet(num_classes)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, RES, RES, 3).astype(np.float32))
    t = jnp.asarray([70.0, 3.0], dtype=jnp.float32)
    y = jnp.asarray([12, 951]) if class_cond else None

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y)
    # un-zero the zero_module-initialised convs so outputs are non-trivial
    params = jax.tree.map(
        lambda a: a + 0.05 * jnp.sin(1.7 * jnp.arange(a.size, dtype=jnp.float32)
                                     ).reshape(a.shape),
        params,
    )
    full = model.apply(params, x, t, y)
    cache = model.apply(params, x, t, y, mode="encode")
    split = model.apply(params, x, t, y, mode="decode", cache=cache)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))

    # decode with a FRESH timestep: differs from full at the old t (the
    # decoder really consumes the new embedding, not a stale one)
    t2 = jnp.asarray([69.0, 2.0], dtype=jnp.float32)
    out2 = model.apply(params, x, t2, y, mode="decode", cache=cache)
    assert np.isfinite(np.asarray(out2)).all()
    assert np.abs(np.asarray(out2) - np.asarray(full)).max() > 0


def test_adm_mode_validation_and_superres_split():
    """Bad mode values raise immediately; ADMSuperResModel forwards the
    mode/cache contract (encode+decode == full, low_res concat included)."""
    from ddnm_tpu.models.unet_adm import ADMSuperResModel

    model = ADMSuperResModel(
        image_size=RES, in_channels=6, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, RES, RES, 3).astype(np.float32))
    low = jnp.asarray(rng.randn(1, RES // 4, RES // 4, 3).astype(np.float32))
    t = jnp.asarray([12.0], dtype=jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, low)

    full = model.apply(params, x, t, low)
    cache = model.apply(params, x, t, low, mode="encode")
    split = model.apply(params, x, t, low, mode="decode", cache=cache)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))

    with pytest.raises(ValueError, match="mode"):
        model.apply(params, x, t, low, mode="Encode")
    with pytest.raises(ValueError, match="cache"):
        model.apply(params, x, t, low, mode="decode")


def test_head_channels_divisibility_guard():
    """Configs the reference refuses (unet.py:279-283 assert: attended
    channels % num_head_channels != 0) must raise here too instead of
    silently flooring the head count — caught in round 5 when a 96-ch
    (1,1,2,3,4) ladder trained 7k steps at 64 head-channels, then failed
    export against the reference template (288 % 64 != 0)."""
    import pytest

    from ddnm_tpu.models.unet_adm import ADMUNet

    bad = ADMUNet(
        image_size=64, in_channels=3, model_channels=96, out_channels=6,
        num_res_blocks=1, attention_resolutions=(4,),
        channel_mult=(1, 2, 3), num_heads=4, num_head_channels=64,
    )
    with pytest.raises(ValueError, match="288.*num_head_channels"):
        jax.eval_shape(
            bad.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)),
        )
    ok = bad.copy(num_head_channels=32)
    jax.eval_shape(ok.init, jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)))
