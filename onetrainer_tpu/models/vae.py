"""AutoencoderKL (SD-family VAE) in flax, NHWC.

Weight-parity contract with `diffusers.AutoencoderKL` (sd-vae-ft-mse /
sdxl-vae). Used for latent caching (encode) and sampling (decode); also
trainable for the FINE_TUNE_VAE method
(reference: modules/modelSetup/StableDiffusionFineTuneVaeSetup.py:68-101).
Module names mirror diffusers paths (one torch module level = one flax
dict level) so safetensors conversion is a mechanical key transform.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
from onetrainer_tpu.models.convpad import conv_padding
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def spatial_scale(self) -> int:
        """pixels per latent cell (8 for the SD VAE: 3 downsamples)."""
        return 2 ** (len(self.block_out_channels) - 1)


def sd15_vae_config(**overrides) -> VAEConfig:
    return VAEConfig(**overrides)


def sdxl_vae_config(**overrides) -> VAEConfig:
    return VAEConfig(scaling_factor=0.13025, **overrides)


def flux_vae_config(**overrides) -> VAEConfig:
    """FLUX / SD3 / HiDream 16-channel VAE."""
    return VAEConfig(latent_channels=16, scaling_factor=0.3611,
                     shift_factor=0.1159, **overrides)


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=conv_padding(1), dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=conv_padding(1), dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self attention over spatial positions (diffusers Attention
    with one head inside the VAE mid block)."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual


class VAEMidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = VAEResnetBlock(self.channels, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(dtype=self.dtype, name="attentions_0")(x)
        x = VAEResnetBlock(self.channels, dtype=self.dtype, name="resnets_1")(x)
        return x


class VAEDownsampler(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # torch: asymmetric pad (0,1,0,1) then stride-2 valid conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding='VALID',
                       dtype=self.dtype, name="conv")(x)


class VAEUpsampler(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=conv_padding(1), dtype=self.dtype, name="conv")(x)


class DownEncoderBlock(nn.Module):
    channels: int
    layers: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for j in range(self.layers):
            x = VAEResnetBlock(self.channels, dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_downsample:
            x = VAEDownsampler(self.channels, dtype=self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock(nn.Module):
    channels: int
    layers: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for j in range(self.layers):
            x = VAEResnetBlock(self.channels, dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_upsample:
            x = VAEUpsampler(self.channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=conv_padding(1),
                    dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            x = DownEncoderBlock(ch, cfg.layers_per_block, add_downsample=i != n - 1,
                                 dtype=cfg.dtype, name=f"down_blocks_{i}")(x)
        x = VAEMidBlock(cfg.block_out_channels[-1], dtype=cfg.dtype, name="mid_block")(x)
        x = nn.GroupNorm(32, epsilon=1e-6, dtype=cfg.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=conv_padding(1),
                    dtype=jnp.float32, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=conv_padding(1), dtype=cfg.dtype,
                    name="conv_in")(z.astype(cfg.dtype))
        x = VAEMidBlock(rev[0], dtype=cfg.dtype, name="mid_block")(x)
        for i, ch in enumerate(rev):
            x = UpDecoderBlock(ch, cfg.layers_per_block + 1,
                               add_upsample=i != len(rev) - 1,
                               dtype=cfg.dtype, name=f"up_blocks_{i}")(x)
        x = nn.GroupNorm(32, epsilon=1e-6, dtype=cfg.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=conv_padding(1), dtype=jnp.float32, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=jnp.float32, name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """image NHWC in [-1,1] -> (mean, logvar) of the latent distribution."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return self.decode(z), mean, logvar


def sample_latent(mean, logvar, rng):
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
