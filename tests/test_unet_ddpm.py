"""DDPMUNet parity: run the reference torch Model with random weights,
convert its state dict, and compare per-output activations on a small config.
This is the checkpoint-conversion guarantee for the CelebA-HQ family."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ddnm_tpu.config import Config
from ddnm_tpu.models.convert import torch_state_dict_to_flax, ddpm_key_map
from ddnm_tpu.models.unet_ddpm import DDPMUNet
from tests._reference import import_reference


def _small_config():
    cfg = Config.from_dict(
        {
            "data": {"image_size": 32, "channels": 3},
            "model": {
                "type": "simple",
                "ch": 32,
                "out_ch": 3,
                "ch_mult": (1, 2, 2),
                "num_res_blocks": 2,
                "attn_resolutions": (16,),
                "dropout": 0.0,
                "in_channels": 3,
                "resamp_with_conv": True,
            },
            "diffusion": {"num_diffusion_timesteps": 1000},
        }
    )
    return cfg


class _NS:
    """Tiny attribute-namespace view over our Config for the torch oracle."""

    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _NS(v) if isinstance(v, dict) else v)


def test_ddpm_unet_parity():
    torch = pytest.importorskip("torch")
    ref_models = import_reference("guided_diffusion.models")

    cfg = _small_config()
    ref_cfg = _NS(
        {
            "model": {
                "type": "simple",
                "ch": 32,
                "out_ch": 3,
                "ch_mult": [1, 2, 2],
                "num_res_blocks": 2,
                "attn_resolutions": [16],
                "dropout": 0.0,
                "in_channels": 3,
                "resamp_with_conv": True,
            },
            "data": {"image_size": 32},
            "diffusion": {"num_diffusion_timesteps": 1000},
        }
    )
    torch.manual_seed(0)
    ref = ref_models.Model(ref_cfg)
    ref.eval()

    params = {"params": torch_state_dict_to_flax(ref.state_dict(), ddpm_key_map)}
    model = DDPMUNet.from_config(cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    t = np.array([999.0, 57.0], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = model.apply(params, x_nhwc, jnp.asarray(t))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))

    np.testing.assert_allclose(out_nchw, ref_out, atol=2e-4, rtol=1e-3)


def test_ddpm_unet_param_count_matches():
    torch = pytest.importorskip("torch")
    ref_models = import_reference("guided_diffusion.models")
    cfg = _small_config()
    ref_cfg_dict = {
        "model": {
            "type": "simple", "ch": 32, "out_ch": 3, "ch_mult": [1, 2, 2],
            "num_res_blocks": 2, "attn_resolutions": [16], "dropout": 0.0,
            "in_channels": 3, "resamp_with_conv": True,
        },
        "data": {"image_size": 32},
        "diffusion": {"num_diffusion_timesteps": 1000},
    }
    torch.manual_seed(0)
    ref = ref_models.Model(_NS(ref_cfg_dict))
    n_ref = sum(p.numel() for p in ref.parameters())

    model = DDPMUNet.from_config(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,))
    )
    n_ours = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_ours == n_ref
