"""Würstchen v2 / Stable Cascade prior stage in flax.

The prior is a ConvNeXt-style residual net over 16-channel EfficientNet
latents (image/42.67 spatial scale: ×0.75 resize then /32 backbone stride),
conditioned on CLIP text states, trained with continuous-time epsilon
prediction under a warped cosine ᾱ schedule
(reference: modules/model/WuerstchenModel.py,
modules/modelSetup/BaseWuerstchenSetup.py:158-270; architecture re-derived
from the diffusers WuerstchenPrior contract so pretrained safetensors load
via the mechanical key transform in io/torch_flax.py).

TPU notes: NHWC layout; depthwise convs map to feature_group_count; the
attention blocks run through ops/attention (flash-eligible at large grids);
remat per (res, timestep, attn) triple when gradient checkpointing is on.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
from onetrainer_tpu.models.convpad import conv_padding
import jax.numpy as jnp

from onetrainer_tpu.ops.attention import attention
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class WuerstchenPriorConfig:
    c_in: int = 16
    c: int = 1536
    c_cond: int = 1024
    c_r: int = 64
    depth: int = 32
    nhead: int = 24
    gradient_checkpointing: bool = False
    dtype: jnp.dtype = jnp.bfloat16


def wuerstchen_prior_config(**overrides) -> WuerstchenPriorConfig:
    return WuerstchenPriorConfig(**overrides)


class GlobalResponseNorm(nn.Module):
    """ConvNeXt-v2 GRN over channels-last input (torch params gamma/beta)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        agg = jnp.linalg.norm(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        stand = agg / (agg.mean(axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x.astype(jnp.float32) * stand) + beta + x).astype(x.dtype)


def _layer_norm_no_affine(x, eps=1e-6):
    """WuerstchenLayerNorm: channels-last LN, elementwise_affine=False."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


class WResBlock(nn.Module):
    """depthwise 3×3 → LN(no affine) → Linear 4c → GELU → GRN → Linear c,
    residual (diffusers WuerstchenPrior ResBlock key layout)."""
    c: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        res = x
        h = LoraConv(self.c, (3, 3), padding=conv_padding(1), feature_group_count=self.c,
                     dtype=self.dtype, name="depthwise")(x)
        h = _layer_norm_no_affine(h)
        h = LoraDense(self.c * 4, dtype=self.dtype, name="channelwise_0")(h)
        h = nn.gelu(h)
        h = GlobalResponseNorm(self.c * 4, name="channelwise_2")(h)
        h = LoraDense(self.c, dtype=self.dtype, name="channelwise_4")(h)
        return h + res


class WTimestepBlock(nn.Module):
    """x * (1+a) + b from a linear map of the timestep embedding."""
    c: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, r_embed):
        ab = LoraDense(self.c * 2, dtype=self.dtype, name="mapper")(r_embed)
        a, b = jnp.split(ab, 2, axis=-1)
        return x * (1 + a[:, None, None, :]) + b[:, None, None, :]


class _WAttention(nn.Module):
    """diffusers `Attention` subset: to_q/to_k/to_v (+bias) and to_out.0."""
    c: int
    nhead: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q_in, kv_in):
        q = LoraDense(self.c, use_bias=True, dtype=self.dtype, name="to_q")(q_in)
        k = LoraDense(self.c, use_bias=True, dtype=self.dtype, name="to_k")(kv_in)
        v = LoraDense(self.c, use_bias=True, dtype=self.dtype, name="to_v")(kv_in)
        out = attention(q, k, v, self.nhead)
        return LoraDense(self.c, dtype=self.dtype, name="to_out_0")(out)


class WAttnBlock(nn.Module):
    """Self+cross attention: kv = [spatial tokens, mapped text tokens]."""
    c: int
    c_cond: int
    nhead: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, c_embed):
        b, h, w, c = x.shape
        norm_x = _layer_norm_no_affine(x)
        q = norm_x.reshape(b, h * w, c)
        kv_text = LoraDense(self.c, dtype=self.dtype, name="kv_mapper_1")(
            nn.silu(c_embed))
        kv = jnp.concatenate([q, kv_text], axis=1)
        out = _WAttention(self.c, self.nhead, dtype=self.dtype,
                          name="attention")(q, kv)
        return x + out.reshape(b, h, w, c)


def gen_r_embedding(r: jnp.ndarray, c_r: int,
                    max_positions: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding of the continuous timestep r∈[0,1]
    (diffusers WuerstchenPrior.gen_r_embedding semantics)."""
    import math
    r = r.astype(jnp.float32) * max_positions
    half = c_r // 2
    emb = math.log(max_positions) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = r[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if c_r % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class WuerstchenPrior(nn.Module):
    cfg: WuerstchenPriorConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, r: jnp.ndarray,
                 c: jnp.ndarray) -> jnp.ndarray:
        """x: [B,H,W,16] noisy effnet latent (NHWC), r: [B] continuous
        timestep, c: [B,S,c_cond] text states. Returns the eps prediction
        via the (x_in - a)/(|1-b|+eps) parameterization."""
        cfg = self.cfg
        x_in = x.astype(jnp.float32)
        x = LoraConv(cfg.c, (1, 1), dtype=cfg.dtype, name="projection")(
            x.astype(cfg.dtype))
        ce = LoraDense(cfg.c, dtype=cfg.dtype, name="cond_mapper_0")(
            c.astype(cfg.dtype))
        ce = nn.leaky_relu(ce, 0.2)
        ce = LoraDense(cfg.c, dtype=cfg.dtype, name="cond_mapper_2")(ce)
        r_embed = gen_r_embedding(r, cfg.c_r).astype(cfg.dtype)

        res_cls, ts_cls, attn_cls = WResBlock, WTimestepBlock, WAttnBlock
        if cfg.gradient_checkpointing:
            res_cls = nn.remat(WResBlock)
            ts_cls = nn.remat(WTimestepBlock)
            attn_cls = nn.remat(WAttnBlock)
        for i in range(cfg.depth):
            x = res_cls(cfg.c, dtype=cfg.dtype, name=f"blocks_{3 * i}")(x)
            x = ts_cls(cfg.c, dtype=cfg.dtype,
                       name=f"blocks_{3 * i + 1}")(x, r_embed)
            x = attn_cls(cfg.c, cfg.c_cond, cfg.nhead, dtype=cfg.dtype,
                         name=f"blocks_{3 * i + 2}")(x, ce)

        x = _layer_norm_no_affine(x)
        x = LoraConv(cfg.c_in * 2, (1, 1), dtype=jnp.float32, name="out_1")(x)
        a, b = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        return (x_in - a) / (jnp.abs(1.0 - b) + 1e-5)


# -- EfficientNetV2-S encoder (the Würstchen "VAE") ---------------------------------

# (expand_ratio, kernel, stride, in_ch, out_ch, layers, use_se)
_EFFNET_V2_S = (
    (1, 3, 1, 24, 24, 2, False),
    (4, 3, 2, 24, 48, 4, False),
    (4, 3, 2, 48, 64, 4, False),
    (4, 3, 2, 64, 128, 6, True),
    (6, 3, 1, 128, 160, 9, True),
    (6, 3, 2, 160, 256, 15, True),
)
_EFFNET_V2_L = (
    (1, 3, 1, 32, 32, 4, False),
    (4, 3, 2, 32, 64, 7, False),
    (4, 3, 2, 64, 96, 7, False),
    (4, 3, 2, 96, 192, 10, True),
    (6, 3, 1, 192, 224, 19, True),
    (6, 3, 2, 224, 384, 25, True),
    (6, 3, 1, 384, 640, 7, True),
)


@dataclass(frozen=True)
class EffnetConfig:
    variant: str = "efficientnet_v2_s"   # reference default
    c_latent: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def stages(self):
        return _EFFNET_V2_L if self.variant == "efficientnet_v2_l" else _EFFNET_V2_S

    @property
    def stem_channels(self):
        return self.stages[0][3]

    @property
    def head_channels(self):
        return 1280


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm with running stats as params (the encoder
    is always frozen; torch keys weight/bias/running_mean/running_var)."""
    features: int
    eps: float = 1e-3
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y.astype(x.dtype)


class ConvNormAct(nn.Module):
    """torchvision Conv2dNormActivation: conv (no bias) + BN [+ SiLU]."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = LoraConv(self.features, (self.kernel, self.kernel),
                     strides=self.stride, padding=conv_padding(pad), use_bias=False,
                     feature_group_count=self.groups, dtype=self.dtype,
                     name="conv")(x)
        x = FrozenBatchNorm(self.features, name="norm")(x)
        return nn.silu(x) if self.act else x


class SqueezeExcitation(nn.Module):
    squeeze: int
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = LoraConv(self.squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = LoraConv(self.features, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    expand: int
    kernel: int
    stride: int
    in_ch: int
    out_ch: int
    fused: bool
    use_se: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        res = x
        mid = self.in_ch * self.expand
        idx = 0
        h = x
        if self.fused:
            if self.expand != 1:
                h = ConvNormAct(mid, self.kernel, self.stride,
                                dtype=self.dtype, name=f"block{idx}")(h)
                idx += 1
                h = ConvNormAct(self.out_ch, 1, 1, act=False,
                                dtype=self.dtype, name=f"block{idx}")(h)
            else:
                h = ConvNormAct(self.out_ch, self.kernel, self.stride,
                                dtype=self.dtype, name=f"block{idx}")(h)
        else:
            if self.expand != 1:
                h = ConvNormAct(mid, 1, 1, dtype=self.dtype,
                                name=f"block{idx}")(h)
                idx += 1
            h = ConvNormAct(mid, self.kernel, self.stride, groups=mid,
                            dtype=self.dtype, name=f"block{idx}")(h)
            idx += 1
            if self.use_se:
                h = SqueezeExcitation(max(self.in_ch // 4, 1), mid,
                                      dtype=self.dtype, name="se")(h)
                idx += 1
            h = ConvNormAct(self.out_ch, 1, 1, act=False, dtype=self.dtype,
                            name=f"block{idx}")(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + res
        return h


class WuerstchenEffnetEncoder(nn.Module):
    """torchvision efficientnet_v2 features + 1×1 mapper conv + BatchNorm
    (reference: WuerstchenModel.WuerstchenEfficientNetEncoder).
    Input: imagenet-normalized image (NHWC). Output: [B,H/32,W/32,16]."""
    cfg: EffnetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.dtype
        x = x.astype(dt)
        x = ConvNormAct(cfg.stem_channels, 3, 2, dtype=dt, name="stem")(x)
        stage = 1
        for (expand, kernel, stride, in_ch, out_ch, layers, use_se) \
                in cfg.stages:
            fused = not use_se
            for i in range(layers):
                blk_stride = stride if i == 0 else 1
                blk_in = in_ch if i == 0 else out_ch
                x = MBConv(expand, kernel, blk_stride, blk_in, out_ch,
                           fused, use_se, dtype=dt,
                           name=f"stage{stage}_{i}")(x)
            stage += 1
        x = ConvNormAct(cfg.head_channels, 1, 1, dtype=dt, name="head")(x)
        x = LoraConv(cfg.c_latent, (1, 1), use_bias=False, dtype=dt,
                     name="mapper_conv")(x)
        x = FrozenBatchNorm(cfg.c_latent, eps=1e-5, name="mapper_norm")(x)
        return x
