"""Deep-Compression Autoencoder (DC-AE) in flax — Sana's 32× VAE
(reference: modules/model/SanaModel.py imports diffusers AutoencoderDC;
weight contract follows the diffusers module tree: encoder/decoder
conv_in, down_blocks/up_blocks of ResBlock + EfficientViTBlock (LiteMLA
linear attention + GLUMBConv), pixel-unshuffle down / pixel-shuffle up).

Deterministic latents (no KL): encode() returns the latent directly.
NHWC throughout.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
from onetrainer_tpu.models.convpad import conv_padding
import jax
import jax.numpy as jnp

from onetrainer_tpu.peft.layers import LoraConv


@dataclass(frozen=True)
class DCAEConfig:
    in_channels: int = 3
    latent_channels: int = 32
    # per stage: (channels, layers, is_vit)
    encoder_block_out_channels: tuple[int, ...] = (128, 256, 512, 512, 1024, 1024)
    decoder_block_out_channels: tuple[int, ...] = (128, 256, 512, 512, 1024, 1024)
    encoder_layers_per_block: tuple[int, ...] = (2, 2, 2, 3, 3, 3)
    decoder_layers_per_block: tuple[int, ...] = (3, 3, 3, 3, 3, 3)
    vit_stages: tuple[bool, ...] = (False, False, False, True, True, True)
    attention_head_dim: int = 32
    scaling_factor: float = 0.41407
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.encoder_block_out_channels) - 1)


def dcae_f32c32_config(**overrides) -> DCAEConfig:
    return DCAEConfig(**overrides)


class RMSNorm2d(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (y * weight + bias).astype(x.dtype)


class DCAEResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        res = x
        h = LoraConv(self.out_channels, (3, 3), padding=conv_padding(1), dtype=self.dtype,
                     name="conv1")(x)
        h = nn.silu(h)
        h = LoraConv(self.out_channels, (3, 3), padding=conv_padding(1), use_bias=False,
                     dtype=self.dtype, name="conv2")(h)
        h = RMSNorm2d(self.out_channels, name="norm")(h)
        return h + res


class GLUMBConvDC(nn.Module):
    """GLUMBConv: 1×1 expand ×2, depthwise 3×3, SiLU gate, 1×1 project."""
    out_channels: int
    expand: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        res = x
        mid = int(x.shape[-1] * self.expand)
        h = LoraConv(mid * 2, (1, 1), dtype=self.dtype,
                     name="conv_inverted")(x)
        h = nn.silu(h)
        h = LoraConv(mid * 2, (3, 3), padding=conv_padding(1), feature_group_count=mid * 2,
                     dtype=self.dtype, name="conv_depth")(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        h = LoraConv(self.out_channels, (1, 1), use_bias=False,
                     dtype=self.dtype, name="conv_point")(h)
        h = RMSNorm2d(self.out_channels, name="norm")(h)
        return h + res


class LiteMLA(nn.Module):
    """Lightweight multiscale linear attention (relu kernel)."""
    out_channels: int
    head_dim: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        res = x
        b, h, w, c = x.shape
        qkv = LoraConv(3 * c, (1, 1), use_bias=False, dtype=self.dtype,
                       name="qkv")(x)
        # multiscale branch: 5x5 depthwise aggregation of qkv
        ms = LoraConv(3 * c, (5, 5), padding=conv_padding(2), feature_group_count=3 * c,
                      use_bias=False, dtype=self.dtype, name="aggreg_0")(qkv)
        outs = []
        for branch in (qkv, ms):
            q, k, v = jnp.split(branch.reshape(b, h * w, 3 * c), 3, axis=-1)
            heads = c // self.head_dim
            q = nn.relu(q.reshape(b, h * w, heads, self.head_dim))
            k = nn.relu(k.reshape(b, h * w, heads, self.head_dim))
            v = v.reshape(b, h * w, heads, self.head_dim)
            qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
            kv = jnp.einsum("bnhd,bnhe->bhde", kf, vf)
            ksum = kf.sum(axis=1)                      # [b, h, d]
            num = jnp.einsum("bnhd,bhde->bnhe", qf, kv)
            den = jnp.einsum("bnhd,bhd->bnh", qf, ksum)[..., None] + 1e-15
            outs.append((num / den).reshape(b, h, w, c).astype(self.dtype))
        out = jnp.concatenate(outs, axis=-1)
        out = LoraConv(self.out_channels, (1, 1), use_bias=False,
                       dtype=self.dtype, name="proj_out")(out)
        out = RMSNorm2d(self.out_channels, name="norm_out")(out)
        return out + res


class EfficientViTBlock(nn.Module):
    channels: int
    head_dim: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = LiteMLA(self.channels, self.head_dim, dtype=self.dtype,
                    name="attn")(x)
        return GLUMBConvDC(self.channels, dtype=self.dtype,
                           name="conv_out")(x)


class DCDown(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return LoraConv(self.out_channels, (3, 3), strides=2, padding=conv_padding(1),
                        dtype=self.dtype, name="conv")(x)


class DCUp(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return LoraConv(self.out_channels, (3, 3), padding=conv_padding(1),
                        dtype=self.dtype, name="conv")(x)


class DCAEEncoder(nn.Module):
    cfg: DCAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        chans = c.encoder_block_out_channels
        x = LoraConv(chans[0], (3, 3), padding=conv_padding(1), dtype=c.dtype,
                     name="conv_in")(x.astype(c.dtype))
        for s, ch in enumerate(chans):
            for i in range(c.encoder_layers_per_block[s]):
                if c.vit_stages[s]:
                    x = EfficientViTBlock(ch, c.attention_head_dim,
                                          dtype=c.dtype,
                                          name=f"down_blocks_{s}_{i}")(x)
                else:
                    x = DCAEResBlock(ch, dtype=c.dtype,
                                     name=f"down_blocks_{s}_{i}")(x)
            if s + 1 < len(chans):
                x = DCDown(chans[s + 1], dtype=c.dtype,
                           name=f"downsamplers_{s}")(x)
        return LoraConv(c.latent_channels, (3, 3), padding=conv_padding(1), dtype=c.dtype,
                        name="conv_out")(x)


class DCAEDecoder(nn.Module):
    cfg: DCAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        chans = c.decoder_block_out_channels
        x = LoraConv(chans[-1], (3, 3), padding=conv_padding(1), dtype=c.dtype,
                     name="conv_in")(z.astype(c.dtype))
        for s in reversed(range(len(chans))):
            for i in range(c.decoder_layers_per_block[s]):
                if c.vit_stages[s]:
                    x = EfficientViTBlock(chans[s], c.attention_head_dim,
                                          dtype=c.dtype,
                                          name=f"up_blocks_{s}_{i}")(x)
                else:
                    x = DCAEResBlock(chans[s], dtype=c.dtype,
                                     name=f"up_blocks_{s}_{i}")(x)
            if s > 0:
                x = DCUp(chans[s - 1], dtype=c.dtype,
                         name=f"upsamplers_{s}")(x)
        x = RMSNorm2d(chans[0], name="norm_out")(x)
        x = nn.silu(x)
        return LoraConv(c.in_channels, (3, 3), padding=conv_padding(1), dtype=jnp.float32,
                        name="conv_out")(x)


class AutoencoderDC(nn.Module):
    cfg: DCAEConfig

    def setup(self):
        self.encoder = DCAEEncoder(self.cfg, name="encoder")
        self.decoder = DCAEDecoder(self.cfg, name="decoder")

    def __call__(self, x):
        return self.decode(self.encode(x))

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)
