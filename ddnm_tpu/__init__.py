"""ddnm_tpu — TPU-native zero-shot diffusion image restoration.

A from-scratch JAX/XLA/Pallas framework with the capabilities of wyhuai/DDNM
(ICLR 2023, "Zero-Shot Image Restoration Using Denoising Diffusion Null-Space
Model"): super-resolution, deblurring, inpainting, colorization, compressed
sensing, denoising, old-photo restoration and arbitrary-size generation via
mask-shift tiling — all driven by a pretrained diffusion UNet and the
DDNM/DDNM+ null-space sampling rule, running entirely on device (one
`lax.scan` executable, or an equivalent host-dispatched step loop on
remote-compile backends) and sharded across TPU meshes.

Layer map (ours, idiomatic JAX — see SURVEY.md for the reference's):

    cli / configs          ddnm_tpu.config, main.py
    runner                 ddnm_tpu.runner
    sampler core           ddnm_tpu.sampling  (DDNM/DDNM+ lax.scan, respacing,
                                               time-travel, mask-shift tiling)
    operators              ddnm_tpu.operators (SVD + functional degradations)
    models                 ddnm_tpu.models    (DDPM & ADM UNets, classifier)
    kernels                ddnm_tpu.ops       (Pallas attention, FWHT)
    parallel               ddnm_tpu.parallel  (mesh, batch-sharded sampling)
    data / metrics / io    ddnm_tpu.data
"""

__version__ = "0.1.0"
