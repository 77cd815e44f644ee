"""Causal 3D video VAE in flax (HunyuanVideo's AutoencoderKLHunyuanVideo
contract: 4× temporal / 8× spatial compression into 16 latent channels;
reference: modules/model/HunyuanVideoModel.py vae usage,
HunyuanVideoBaseDataLoader encode path).

Causality: every temporal conv pads only on the left (past), so the first
frame's latent depends on the first frame alone — single images encode as
1-frame videos identically to an image VAE
(reference: BaseHunyuanVideoSetup.py:232-234 unsqueezes images to 1 frame).
NDHWC layout throughout.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VideoVAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    # stage s downsamples spatially; temporal downsample on the first
    # len-1 stages up to temporal_compression (4 => two temporal halvings)
    temporal_compression: int = 4
    spatial_compression: int = 8
    scaling_factor: float = 0.476986
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def spatial_scale(self) -> int:
        return self.spatial_compression


def hunyuan_video_vae_config(**overrides) -> VideoVAEConfig:
    return VideoVAEConfig(**overrides)


class CausalConv3d(nn.Module):
    """Conv3d with causal (left-only) temporal padding."""
    features: int
    kernel: tuple[int, int, int] = (3, 3, 3)
    strides: tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        pad_t = (kt - 1, 0)                       # causal
        pad_h = ((kh - 1) // 2, kh // 2)
        pad_w = ((kw - 1) // 2, kw // 2)
        y = jax.lax.conv_general_dilated(
            x.astype(kernel.dtype), kernel,
            window_strides=self.strides,
            padding=(pad_t, pad_h, pad_w),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return (y + bias).astype(x.dtype)


class VideoResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(32 if x.shape[-1] % 32 == 0 else x.shape[-1],
                         epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(self.out_channels, name="conv1")(h)
        h = nn.GroupNorm(32 if self.out_channels % 32 == 0 else self.out_channels,
                         epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.out_channels, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = CausalConv3d(self.out_channels, kernel=(1, 1, 1),
                             name="conv_shortcut")(x)
        return x + h


class VideoDown(nn.Module):
    out_channels: int
    temporal: bool

    @nn.compact
    def __call__(self, x):
        st = 2 if temporal_ok(x, self.temporal) else 1
        return CausalConv3d(self.out_channels, strides=(st, 2, 2),
                            name="conv")(x)


def temporal_ok(x, want: bool) -> bool:
    return want and x.shape[1] > 1


class VideoUp(nn.Module):
    out_channels: int
    temporal: bool

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        if self.temporal and t > 1:
            x = jnp.repeat(x, 2, axis=1)
            # causal: the first frame is not duplicated into the past
            x = x[:, 1:]
        return CausalConv3d(self.out_channels, name="conv")(x)


class VideoEncoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        chans = c.block_out_channels
        n_temporal = {4: 2, 2: 1, 1: 0}[c.temporal_compression]
        x = CausalConv3d(chans[0], name="conv_in")(x.astype(c.dtype))
        for s, ch in enumerate(chans):
            for i in range(c.layers_per_block):
                x = VideoResBlock(ch, dtype=c.dtype,
                                  name=f"down_blocks_{s}_{i}")(x)
            if s + 1 < len(chans):
                x = VideoDown(chans[s + 1], temporal=s < n_temporal,
                              name=f"downsamplers_{s}")(x)
        x = VideoResBlock(chans[-1], dtype=c.dtype, name="mid_block")(x)
        x = nn.GroupNorm(32 if chans[-1] % 32 == 0 else chans[-1],
                         epsilon=1e-6, dtype=c.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return CausalConv3d(2 * c.latent_channels, name="conv_out")(x)


class VideoDecoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        chans = c.block_out_channels
        n_temporal = {4: 2, 2: 1, 1: 0}[c.temporal_compression]
        x = CausalConv3d(chans[-1], name="conv_in")(z.astype(c.dtype))
        x = VideoResBlock(chans[-1], dtype=c.dtype, name="mid_block")(x)
        for s in reversed(range(len(chans))):
            for i in range(c.layers_per_block):
                x = VideoResBlock(chans[s], dtype=c.dtype,
                                  name=f"up_blocks_{s}_{i}")(x)
            if s > 0:
                x = VideoUp(chans[s - 1], temporal=(s - 1) < n_temporal,
                            name=f"upsamplers_{s}")(x)
        x = nn.GroupNorm(32 if chans[0] % 32 == 0 else chans[0],
                         epsilon=1e-6, dtype=c.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return CausalConv3d(c.in_channels, name="conv_out")(x).astype(jnp.float32)


class AutoencoderKLVideo(nn.Module):
    cfg: VideoVAEConfig

    def setup(self):
        self.encoder = VideoEncoder(self.cfg, name="encoder")
        self.decoder = VideoDecoder(self.cfg, name="decoder")

    def __call__(self, x, rng):
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return self.decode(z), mean, logvar

    def encode(self, x):
        """x [B, T, H, W, 3] -> (mean, logvar) [B, T', H/8, W/8, 16]."""
        moments = self.encoder(x)
        return jnp.split(moments, 2, axis=-1)

    def decode(self, z):
        return self.decoder(z)
