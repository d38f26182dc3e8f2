"""Model zoo: JAX/flax reimplementations of the two diffusion UNet families
the reference ships, plus the ADM classifier.

  - unet_ddpm.DDPMUNet  — the "simple" SDEdit/DDIM UNet (CelebA-HQ ckpt;
    reference guided_diffusion/models.py).
  - unet_adm.ADMUNet    — the OpenAI guided-diffusion ADM UNet (ImageNet
    ckpts; reference guided_diffusion/unet.py), with EncoderUNet classifier.
  - convert              — generic PyTorch-state-dict -> flax params mapping.

All models are NHWC (TPU-native); the converter transposes conv kernels from
the checkpoints' NCHW convention.
"""

from ddnm_tpu.models.unet_ddpm import DDPMUNet
from ddnm_tpu.models.unet_adm import (
    ADMClassifier,
    ADMSuperResModel,
    ADMUNet,
    classifier_guidance_fn,
    classifier_guidance_from_params,
)
from ddnm_tpu.models.nn import cast_torso, update_ema
from ddnm_tpu.models.convert import torch_state_dict_to_flax

__all__ = [
    "DDPMUNet",
    "ADMUNet",
    "ADMSuperResModel",
    "ADMClassifier",
    "update_ema",
    "cast_torso",
    "classifier_guidance_fn",
    "classifier_guidance_from_params",
    "torch_state_dict_to_flax",
]
