"""The "simple" DDPM/SDEdit UNet (CelebA-HQ family), NHWC flax.

Architecture parity with reference guided_diffusion/models.py:192-341:
128 base channels x (1,1,2,2,4,4), 2 res blocks/level, single-head attention
at attn_resolutions, GroupNorm(32, eps=1e-6), swish, sin-first time
embedding, asymmetric-pad stride-2 downsample conv (models.py:55-74),
nearest-x2 + conv upsample.

Module/attribute names deliberately mirror the torch state-dict keys so the
generic converter (convert.py) maps checkpoints mechanically:
torch "down.0.block.1.conv1.weight" -> flax params["down_0"]["block_1"]["conv1"]["kernel"].

Structured as setup() (not @nn.compact) so the torso splits into
`encode` (down path + middle) and `decode` (up path + head): the
encoder-propagation accelerator (sampling/accel.py) reuses cached encoder
features across adjacent timesteps and runs only the decoder.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ddnm_tpu.models.nn import (
    GroupNormF32,
    attention,
    nearest_upsample,
    swish,
    timestep_embedding_ddpm,
)

__all__ = ["DDPMUNet"]


def _norm(name: str | None = None):
    return GroupNormF32(num_groups=32, epsilon=1e-6, name=name)


def _conv(features: int, kernel: int, name: str | None = None, stride: int = 1,
          dtype=jnp.float32):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding="SAME" if stride == 1 else "VALID",
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class ResnetBlock(nn.Module):
    out_channels: int
    use_conv_shortcut: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = _norm("norm1")(x)
        h = swish(h)
        h = _conv(self.out_channels, 3, "conv1", dtype=self.dtype)(h)

        temb_proj = nn.Dense(
            self.out_channels, name="temb_proj", dtype=self.dtype, param_dtype=jnp.float32
        )(swish(temb))
        h = h + temb_proj[:, None, None, :]

        h = _norm("norm2")(h)
        h = swish(h)
        h = _conv(self.out_channels, 3, "conv2", dtype=self.dtype)(h)

        if in_channels != self.out_channels:
            if self.use_conv_shortcut:
                x = _conv(self.out_channels, 3, "conv_shortcut", dtype=self.dtype)(x)
            else:
                x = _conv(self.out_channels, 1, "nin_shortcut", dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hgt, wid, c = x.shape
        h = _norm("norm")(x)
        q = _conv(c, 1, "q", dtype=self.dtype)(h)
        k = _conv(c, 1, "k", dtype=self.dtype)(h)
        v = _conv(c, 1, "v", dtype=self.dtype)(h)
        out = attention(
            q.reshape(b, hgt * wid, c),
            k.reshape(b, hgt * wid, c),
            v.reshape(b, hgt * wid, c),
            scale=int(c) ** (-0.5),
        ).reshape(b, hgt, wid, c)
        out = _conv(c, 1, "proj_out", dtype=self.dtype)(out)
        return x + out


class Downsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # torch pads (0,1,0,1): one extra row/col at bottom/right
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return _conv(x.shape[-1], 3, "conv", stride=2, dtype=self.dtype)(x)
        b, h, w, c = x.shape
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class Upsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample(x, 2)
        if self.with_conv:
            x = _conv(x.shape[-1], 3, "conv", dtype=self.dtype)(x)
        return x


class DDPMUNet(nn.Module):
    """NHWC DDPM UNet; __call__(x, t) -> epsilon prediction.

    Also exposes `time_embed(t)`, `encode(x, temb)` and `decode(h, hs, temb)`
    with __call__ == decode(encode(...)) — the split the encoder-propagation
    accelerator uses.
    """

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    resamp_with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        mult = tuple(self.ch_mult)
        temb_ch = self.ch * 4
        self.temb_dense_0 = nn.Dense(
            temb_ch, dtype=self.dtype, param_dtype=jnp.float32
        )
        self.temb_dense_1 = nn.Dense(
            temb_ch, dtype=self.dtype, param_dtype=jnp.float32
        )
        self.conv_in = _conv(self.ch, 3, dtype=self.dtype)

        # down path; attribute names match the converter's key map exactly
        curr_res = self.resolution
        attn_levels = []
        for i_level in range(len(mult)):
            block_out = self.ch * mult[i_level]
            for i_block in range(self.num_res_blocks):
                setattr(self, f"down_{i_level}_block_{i_block}",
                        ResnetBlock(block_out, dtype=self.dtype))
                if curr_res in self.attn_resolutions:
                    setattr(self, f"down_{i_level}_attn_{i_block}",
                            AttnBlock(self.dtype))
            attn_levels.append(curr_res in self.attn_resolutions)
            if i_level != len(mult) - 1:
                setattr(self, f"down_{i_level}_downsample",
                        Downsample(self.resamp_with_conv, self.dtype))
                curr_res //= 2
        self._attn_levels = tuple(attn_levels)

        block_in = self.ch * mult[-1]
        self.mid_block_1 = ResnetBlock(block_in, dtype=self.dtype)
        self.mid_attn_1 = AttnBlock(self.dtype)
        self.mid_block_2 = ResnetBlock(block_in, dtype=self.dtype)

        # up path (curr_res is now the bottleneck resolution)
        up_attn = {}
        res = curr_res
        for i_level in reversed(range(len(mult))):
            block_out = self.ch * mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                setattr(self, f"up_{i_level}_block_{i_block}",
                        ResnetBlock(block_out, dtype=self.dtype))
                if res in self.attn_resolutions:
                    setattr(self, f"up_{i_level}_attn_{i_block}",
                            AttnBlock(self.dtype))
            up_attn[i_level] = res in self.attn_resolutions
            if i_level != 0:
                setattr(self, f"up_{i_level}_upsample",
                        Upsample(self.resamp_with_conv, self.dtype))
                res *= 2
        self._up_attn = tuple(up_attn[i] for i in range(len(mult)))

        self.norm_out = _norm()
        self.conv_out = _conv(self.out_ch, 3, dtype=self.dtype)

    def time_embed(self, t):
        temb = timestep_embedding_ddpm(t, self.ch)
        return self.temb_dense_1(swish(self.temb_dense_0(temb)))

    def encode(self, x, temb):
        """Down path + middle; returns (h, skip list) — the cacheable half."""
        mult = tuple(self.ch_mult)
        x = x.astype(self.dtype)
        hs = [self.conv_in(x)]
        for i_level in range(len(mult)):
            for i_block in range(self.num_res_blocks):
                h = getattr(self, f"down_{i_level}_block_{i_block}")(hs[-1], temb)
                if self._attn_levels[i_level]:
                    h = getattr(self, f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != len(mult) - 1:
                hs.append(getattr(self, f"down_{i_level}_downsample")(hs[-1]))

        h = hs[-1]
        h = self.mid_block_1(h, temb)
        h = self.mid_attn_1(h)
        h = self.mid_block_2(h, temb)
        return h, hs

    def decode(self, h, hs, temb, orig_dtype=jnp.float32):
        """Up path + output head, consuming encoder skips."""
        mult = tuple(self.ch_mult)
        hs = list(hs)
        for i_level in reversed(range(len(mult))):
            for i_block in range(self.num_res_blocks + 1):
                h = getattr(self, f"up_{i_level}_block_{i_block}")(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb
                )
                if self._up_attn[i_level]:
                    h = getattr(self, f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = getattr(self, f"up_{i_level}_upsample")(h)

        h = h.astype(orig_dtype)
        h = swish(self.norm_out(h))
        return self.conv_out(h).astype(jnp.float32)

    def __call__(self, x, t):
        temb = self.time_embed(t)
        h, hs = self.encode(x, temb)
        return self.decode(h, hs, temb, orig_dtype=x.dtype)

    @classmethod
    def from_config(cls, config, dtype=jnp.float32) -> "DDPMUNet":
        m = config.model
        return cls(
            ch=m.ch,
            out_ch=m.out_ch,
            ch_mult=tuple(m.ch_mult),
            num_res_blocks=m.num_res_blocks,
            attn_resolutions=tuple(m.attn_resolutions),
            resolution=config.data.image_size,
            resamp_with_conv=m.resamp_with_conv,
            dtype=dtype,
        )
