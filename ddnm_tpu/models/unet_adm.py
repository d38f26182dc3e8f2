"""OpenAI guided-diffusion ("ADM") UNet + EncoderUNet classifier, NHWC flax.

Architecture parity with reference guided_diffusion/unet.py:
  - UNetModel (:396-664): FiLM scale-shift norm, resblock up/down sampling,
    multi-head attention at configured downsample rates with the "legacy"
    head-before-qkv channel split (:328-354), zero-initialised output convs,
    learn_sigma 6-channel output, class-conditional label embedding.
  - EncoderUNetModel (:684-895): classifier half-UNet with adaptive /
    attention / spatial pooling heads (AttentionPool2d :22-51).

Mixed precision: `dtype=jnp.bfloat16` runs the torso in bf16 like the
reference's fp16 conversion (fp16_util.py:15-32) while GroupNorm and the
final output stay fp32 (GroupNorm32 semantics) — bf16 is the TPU-native
choice (same exponent range as fp32, no loss-scaling needed).

Flax module names mirror the torch state-dict keys ("input_blocks.4.0" ->
"input_blocks_4_0") so convert.adm_key_map maps checkpoints mechanically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ddnm_tpu.models.nn import GroupNormF32, attention, nearest_upsample, swish, timestep_embedding_adm

__all__ = ["ADMUNet", "ADMSuperResModel", "ADMClassifier", "parse_channel_mult", "parse_attention_resolutions"]


def parse_channel_mult(channel_mult: str | Sequence[int], image_size: int) -> tuple[int, ...]:
    """Default channel multipliers by image size (script_util.py:149-161)."""
    if channel_mult:
        if isinstance(channel_mult, str):
            return tuple(int(c) for c in channel_mult.split(","))
        return tuple(channel_mult)
    if image_size == 512:
        return (0.5, 1, 1, 2, 2, 4, 4)
    if image_size == 256:
        return (1, 1, 2, 2, 4, 4)
    if image_size == 128:
        return (1, 1, 2, 3, 4)
    if image_size == 64:
        return (1, 2, 3, 4)
    raise ValueError(f"unsupported image size: {image_size}")


def parse_attention_resolutions(spec: str, image_size: int) -> tuple[int, ...]:
    """'32,16,8' -> downsample rates (script_util.py:163-165)."""
    return tuple(image_size // int(r) for r in str(spec).split(","))


def _gn(name: str):
    return GroupNormF32(num_groups=32, epsilon=1e-5, name=name)


def _conv(features: int, kernel: int, name: str, stride: int = 1, dtype=jnp.float32,
          zero_init: bool = False):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
    )


def _dense(features: int, name: str, dtype=jnp.float32, zero_init: bool = False):
    return nn.Dense(
        features,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
    )


def _avg_pool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class ResBlock(nn.Module):
    """ADM ResBlock (unet.py:143-256) incl. up/down variants."""

    out_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        channels = x.shape[-1]
        h = swish(_gn("in_layers_0")(x))
        if self.up:
            h = nearest_upsample(h, 2)
            x = nearest_upsample(x, 2)
        elif self.down:
            h = _avg_pool2(h)
            x = _avg_pool2(x)
        h = _conv(self.out_channels, 3, "in_layers_2", dtype=self.dtype)(h)

        emb_features = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = _dense(emb_features, "emb_layers_1", dtype=self.dtype)(swish(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _gn("out_layers_0")(h) * (1 + scale) + shift
            h = swish(h)
        else:
            h = h + emb_out
            h = swish(_gn("out_layers_0")(h))
        h = _conv(self.out_channels, 3, "out_layers_3", dtype=self.dtype, zero_init=True)(h)

        if self.out_channels != channels:
            x = _conv(
                self.out_channels,
                3 if self.use_conv_skip else 1,
                "skip_connection",
                dtype=self.dtype,
            )(x)
        return x + h


class AttentionBlock(nn.Module):
    """Multi-head self-attention over the spatial grid (unet.py:259-305).

    `legacy_order=True` matches QKVAttentionLegacy's head-major channel split.
    """

    num_heads: int
    legacy_order: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hgt, wid, c = x.shape
        t = hgt * wid
        heads = self.num_heads
        ch = c // heads
        h = _gn("norm")(x).reshape(b, t, c)
        qkv = _dense(3 * c, "qkv", dtype=self.dtype)(h)  # (B, T, 3C)
        if self.legacy_order:
            qkv = qkv.reshape(b, t, heads, 3, ch)
        else:
            qkv = qkv.reshape(b, t, 3, heads, ch).transpose(0, 1, 3, 2, 4)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]  # (B, T, H, ch)

        def fold(z):  # (B, T, H, ch) -> (B*H, T, ch)
            return z.transpose(0, 2, 1, 3).reshape(b * heads, t, ch)

        # scale applied to q and k separately: (q/ch^0.25)(k/ch^0.25)
        scale = ch ** -0.25
        out = attention(fold(q) * scale, fold(k) * scale, fold(v), scale=1.0)
        out = out.reshape(b, heads, t, ch).transpose(0, 2, 1, 3).reshape(b, t, c)
        out = _dense(c, "proj_out", dtype=self.dtype, zero_init=True)(out)
        return x + out.reshape(b, hgt, wid, c)


class Downsample(nn.Module):
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        if self.use_conv:
            return _conv(out_ch, 3, "op", stride=2, dtype=self.dtype)(x)
        return _avg_pool2(x)


class Upsample(nn.Module):
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample(x, 2)
        if self.use_conv:
            x = _conv(self.out_channels or x.shape[-1], 3, "conv", dtype=self.dtype)(x)
        return x


def _backbone_plan(model_channels, channel_mult, num_res_blocks, attention_resolutions):
    """Replicates the reference's input-block construction bookkeeping:
    returns (per-block specs, skip channel list, final ch, final ds)."""
    ch = int(channel_mult[0] * model_channels)
    input_block_chans = [ch]
    ds = 1
    specs = []  # (kind, ch_out, attn)
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            ch = int(mult * model_channels)
            specs.append(("res", ch, ds in attention_resolutions))
            input_block_chans.append(ch)
        if level != len(channel_mult) - 1:
            specs.append(("down", ch, False))
            input_block_chans.append(ch)
            ds *= 2
    return specs, input_block_chans, ch, ds


class _ADMBase(nn.Module):
    """Shared input-block/middle-block torso for UNet and classifier."""

    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 16, 32)
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    dtype: jnp.dtype = jnp.float32

    def _heads(self, ch: int) -> int:
        if self.num_head_channels == -1:
            return self.num_heads
        if ch % self.num_head_channels:
            # mirror the reference's constraint (unet.py:279-283) instead of
            # silently flooring — a config the reference refuses must not
            # quietly train here with different head grouping
            raise ValueError(
                f"q,k,v channels {ch} not divisible by num_head_channels "
                f"{self.num_head_channels} (guided_diffusion/unet.py:281)")
        return ch // self.num_head_channels

    def _attn(self, heads: int, name: str) -> "AttentionBlock":
        """AttentionBlock with the configured channel-split order
        (unet.py:287-293: use_new_attention_order selects QKVAttention
        over QKVAttentionLegacy)."""
        return AttentionBlock(
            heads, legacy_order=not self.use_new_attention_order,
            dtype=self.dtype, name=name,
        )

    def _torso(self, x, emb):
        """Run input blocks + middle block; returns (h, skip list)."""
        specs, _, _, _ = _backbone_plan(
            self.model_channels, self.channel_mult, self.num_res_blocks,
            self.attention_resolutions,
        )
        h = _conv(
            int(self.channel_mult[0] * self.model_channels), 3,
            "input_blocks_0_0", dtype=self.dtype,
        )(x)
        hs = [h]
        idx = 1
        for kind, ch_out, attn in specs:
            if kind == "res":
                h = ResBlock(
                    ch_out, self.use_scale_shift_norm, dtype=self.dtype,
                    name=f"input_blocks_{idx}_0",
                )(h, emb)
                if attn:
                    h = self._attn(self._heads(ch_out), f"input_blocks_{idx}_1")(h)
            else:  # downsample transition
                if self.resblock_updown:
                    h = ResBlock(
                        ch_out, self.use_scale_shift_norm, down=True,
                        dtype=self.dtype, name=f"input_blocks_{idx}_0",
                    )(h, emb)
                else:
                    h = Downsample(
                        self.conv_resample, ch_out, dtype=self.dtype,
                        name=f"input_blocks_{idx}_0",
                    )(h)
            hs.append(h)
            idx += 1

        ch = h.shape[-1]
        h = ResBlock(ch, self.use_scale_shift_norm, dtype=self.dtype, name="middle_block_0")(h, emb)
        h = self._attn(self._heads(ch), "middle_block_1")(h)
        h = ResBlock(ch, self.use_scale_shift_norm, dtype=self.dtype, name="middle_block_2")(h, emb)
        return h, hs


class ADMUNet(_ADMBase):
    """Full ADM UNet; __call__(x_nhwc, t, y=None) -> (B,H,W,out_channels).

    `mode` splits the forward for encoder-propagation acceleration
    (sampling/accel.py): "encode" returns the cacheable (h, skips) pair
    after the down path + middle block; "decode" consumes such a `cache`
    with a FRESH time embedding (x is used for its dtype only). Every
    submodule carries an explicit name, so the parameter tree is identical
    across modes."""

    out_channels: int = 6  # learn_sigma default for the ImageNet ckpts
    num_classes: Optional[int] = None

    @nn.compact
    def __call__(self, x, timesteps, y=None, *, mode="full", cache=None):
        if mode not in ("full", "encode", "decode"):
            raise ValueError(
                f"mode must be 'full', 'encode' or 'decode', got {mode!r}"
            )
        if mode == "decode" and cache is None:
            raise ValueError("mode='decode' requires cache=(h, skips)")
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding_adm(timesteps, self.model_channels)
        emb = _dense(time_embed_dim, "time_embed_0", dtype=self.dtype)(emb)
        emb = _dense(time_embed_dim, "time_embed_2", dtype=self.dtype)(swish(emb))
        if self.num_classes is not None:
            assert y is not None, "class-conditional model needs labels"
            emb = emb + nn.Embed(
                self.num_classes, time_embed_dim, name="label_emb",
                param_dtype=jnp.float32,
            )(y)

        orig_dtype = x.dtype
        if mode == "decode":
            h, hs = cache[0], list(cache[1])
        else:
            h, hs = self._torso(x.astype(self.dtype), emb)
            if mode == "encode":
                return h, tuple(hs)

        # output blocks mirror unet.py:567-611
        _, input_block_chans, ch, ds = _backbone_plan(
            self.model_channels, self.channel_mult, self.num_res_blocks,
            self.attention_resolutions,
        )
        num_heads_up = (
            self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample
        )
        idx = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                input_block_chans.pop()
                ch = int(self.model_channels * mult)
                h = ResBlock(
                    ch, self.use_scale_shift_norm, dtype=self.dtype,
                    name=f"output_blocks_{idx}_0",
                )(jnp.concatenate([h, hs.pop().astype(h.dtype)], axis=-1), emb)
                layer_i = 1
                if ds in self.attention_resolutions:
                    heads = (
                        num_heads_up if self.num_head_channels == -1
                        else self._heads(ch)
                    )
                    h = self._attn(heads, f"output_blocks_{idx}_{layer_i}")(h)
                    layer_i += 1
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = ResBlock(
                            ch, self.use_scale_shift_norm, up=True, dtype=self.dtype,
                            name=f"output_blocks_{idx}_{layer_i}",
                        )(h, emb)
                    else:
                        h = Upsample(
                            self.conv_resample, ch, dtype=self.dtype,
                            name=f"output_blocks_{idx}_{layer_i}",
                        )(h)
                    ds //= 2
                idx += 1

        h = h.astype(orig_dtype)
        h = swish(_gn("out_0")(h))
        h = _conv(self.out_channels, 3, "out_2", zero_init=True)(h)
        return h.astype(jnp.float32)

    @classmethod
    def from_config(cls, config, dtype=jnp.float32) -> "ADMUNet":
        m = config.model
        return cls(
            image_size=config.data.image_size,
            in_channels=3,
            model_channels=m.num_channels,
            out_channels=6 if m.learn_sigma else 3,
            num_res_blocks=m.num_res_blocks,
            attention_resolutions=parse_attention_resolutions(
                m.attention_resolutions, config.data.image_size
            ),
            channel_mult=parse_channel_mult(m.channel_mult, config.data.image_size),
            num_heads=m.num_heads,
            num_head_channels=m.num_head_channels,
            num_heads_upsample=m.num_heads_upsample,
            use_scale_shift_norm=m.use_scale_shift_norm,
            resblock_updown=m.resblock_updown,
            use_new_attention_order=m.use_new_attention_order,
            num_classes=1000 if m.class_cond else None,
            dtype=dtype,
        )


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling head (unet.py:22-51)."""

    num_head_channels: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hgt, wid, c = x.shape
        t = hgt * wid
        tokens = x.reshape(b, t, c)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / c**0.5,
            (c, t + 1),
        )
        tokens = tokens + pos.T[None].astype(tokens.dtype)
        qkv = _dense(3 * c, "qkv_proj", dtype=self.dtype)(tokens)  # (B, T+1, 3C)
        heads = c // self.num_head_channels
        ch = c // heads
        # QKVAttention (new order): split qkv before heads
        qkv = qkv.reshape(b, t + 1, 3, heads, ch)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T+1, H, ch)

        def fold(z):
            return z.transpose(0, 2, 1, 3).reshape(b * heads, t + 1, ch)

        scale = ch ** -0.25
        out = attention(fold(q) * scale, fold(k) * scale, fold(v), scale=1.0)
        out = out.reshape(b, heads, t + 1, ch).transpose(0, 2, 1, 3).reshape(b, t + 1, c)
        out = _dense(self.output_dim, "c_proj", dtype=self.dtype)(out)
        return out[:, 0]


class ADMSuperResModel(ADMUNet):
    """ADM SuperResModel (unet.py:667-681): conditions the UNet on a
    bilinear-upsampled low-resolution image via channel concatenation.
    Unused in the reference's main DDNM flow but part of its model zoo;
    set in_channels=6 to load the upstream SR checkpoints."""

    def __call__(self, x, timesteps, low_res=None, y=None, *, mode="full",
                 cache=None):
        # mode="decode" ignores x's content (dtype only), so the low_res
        # concat is skipped there; encode/full condition on the upsample
        if low_res is not None and mode != "decode":
            b, h, w, _ = x.shape
            up = jax.image.resize(
                low_res, (b, h, w, low_res.shape[-1]), method="bilinear"
            )
            x = jnp.concatenate([x, up.astype(x.dtype)], axis=-1)
        return ADMUNet.__call__(self, x, timesteps, y, mode=mode, cache=cache)


class ADMClassifier(_ADMBase):
    """EncoderUNetModel: half-UNet classifier for guidance (unet.py:684-895)."""

    out_channels: int = 1000
    pool: str = "attention"

    @nn.compact
    def __call__(self, x, timesteps):
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding_adm(timesteps, self.model_channels)
        emb = _dense(time_embed_dim, "time_embed_0", dtype=self.dtype)(emb)
        emb = _dense(time_embed_dim, "time_embed_2", dtype=self.dtype)(swish(emb))

        orig_dtype = x.dtype
        if self.pool.startswith("spatial"):
            results = []
            specs, _, _, _ = _backbone_plan(
                self.model_channels, self.channel_mult, self.num_res_blocks,
                self.attention_resolutions,
            )
            # re-run torso manually to collect spatial means per input block
            h = _conv(
                int(self.channel_mult[0] * self.model_channels), 3,
                "input_blocks_0_0", dtype=self.dtype,
            )(x.astype(self.dtype))
            results.append(h.astype(orig_dtype).mean(axis=(1, 2)))
            idx = 1
            for kind, ch_out, attn in specs:
                if kind == "res":
                    h = ResBlock(
                        ch_out, self.use_scale_shift_norm, dtype=self.dtype,
                        name=f"input_blocks_{idx}_0",
                    )(h, emb)
                    if attn:
                        h = self._attn(self._heads(ch_out), f"input_blocks_{idx}_1")(h)
                elif self.resblock_updown:
                    h = ResBlock(
                        ch_out, self.use_scale_shift_norm, down=True,
                        dtype=self.dtype, name=f"input_blocks_{idx}_0",
                    )(h, emb)
                else:
                    h = Downsample(
                        self.conv_resample, ch_out, dtype=self.dtype,
                        name=f"input_blocks_{idx}_0",
                    )(h)
                results.append(h.astype(orig_dtype).mean(axis=(1, 2)))
                idx += 1
            ch = h.shape[-1]
            h = ResBlock(ch, self.use_scale_shift_norm, dtype=self.dtype, name="middle_block_0")(h, emb)
            h = self._attn(self._heads(ch), "middle_block_1")(h)
            h = ResBlock(ch, self.use_scale_shift_norm, dtype=self.dtype, name="middle_block_2")(h, emb)
            results.append(h.astype(orig_dtype).mean(axis=(1, 2)))
            feats = jnp.concatenate(results, axis=-1)
            if self.pool == "spatial_v2":
                # Linear + GroupNorm + SiLU + Linear (unet.py:848-854);
                # torch Sequential indices 0/1/3 -> out_0/out_1/out_3
                feats = _dense(2048, "out_0")(feats)
                feats = swish(_gn("out_1")(feats[:, None, None, :])[:, 0, 0, :])
                return _dense(self.out_channels, "out_3")(feats)
            feats = nn.relu(_dense(2048, "out_0")(feats))
            return _dense(self.out_channels, "out_2")(feats)

        h, _ = self._torso(x.astype(self.dtype), emb)
        h = h.astype(orig_dtype)
        if self.pool == "adaptive":
            h = swish(_gn("out_0")(h))
            h = h.mean(axis=(1, 2), keepdims=True)
            h = _conv(self.out_channels, 1, "out_3", zero_init=True)(h)
            return h.reshape(h.shape[0], -1)
        if self.pool == "attention":
            h = swish(_gn("out_0")(h))
            return AttentionPool2d(
                self.num_head_channels, self.out_channels, dtype=self.dtype,
                name="out_2",
            )(h)
        raise NotImplementedError(f"pool {self.pool}")

    @classmethod
    def from_config(cls, classifier_config, image_size: int, dtype=jnp.float32) -> "ADMClassifier":
        c = classifier_config
        return cls(
            image_size=image_size,
            in_channels=3,
            model_channels=c.classifier_width,
            num_res_blocks=c.classifier_depth,
            attention_resolutions=parse_attention_resolutions(
                c.classifier_attention_resolutions, image_size
            ),
            channel_mult=parse_channel_mult("", image_size),
            num_heads=4,
            num_head_channels=64,
            use_scale_shift_norm=c.classifier_use_scale_shift_norm,
            resblock_updown=c.classifier_resblock_updown,
            pool=c.classifier_pool,
            out_channels=1000,
            dtype=dtype,
        )


def classifier_guidance_fn(classifier_apply, classes, scale: float,
                           params=None):
    """Build grad_x log p(y|x) * scale (reference diffusion.py:183-191),
    for use as the samplers' guidance hook (et <- et - sqrt(1-at) * grad).

    Two calling conventions, matching the samplers' `params` modes:
      - params given here (closure style): guidance(x, t, at=None);
      - params=None here (traced style): guidance(run_params, x, t, at=None)
        where run_params["classifier"] holds the classifier variables —
        weights then travel as jit arguments, not HLO constants."""

    def log_prob(cparams, x, t):
        logits = classifier_apply(cparams, x, t)
        logp = jax.nn.log_softmax(logits, axis=-1)
        cls = jnp.broadcast_to(jnp.asarray(classes), logits.shape[:1])
        return jnp.take_along_axis(logp, cls[:, None], axis=-1).sum()

    grad_fn = jax.grad(log_prob, argnums=1)

    if params is not None:

        def guidance(x, t, at=None):
            return grad_fn(params, x, t) * scale

        return guidance

    def guidance(run_params, x, t, at=None):
        return grad_fn(run_params["classifier"], x, t) * scale

    return guidance


def classifier_guidance_from_params(classifier_apply, scale: float):
    """classifier_guidance_fn variant with PER-EXAMPLE class labels read
    from the traced run_params pytree (run_params["classes"], shape (B,)).

    Labels ride as data instead of closure constants, so one compiled
    executable serves any class mix — what the online server needs to
    coalesce mixed-class requests into one batch (server.py)."""

    def log_prob(cparams, x, t, cls):
        logits = classifier_apply(cparams, x, t)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(logp, cls[:, None], axis=-1).sum()

    grad_fn = jax.grad(log_prob, argnums=1)

    def guidance(run_params, x, t, at=None):
        return grad_fn(
            run_params["classifier"], x, t, run_params["classes"]
        ) * scale

    return guidance
