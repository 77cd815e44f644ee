"""Paella VQGAN (Würstchen stage A) in flax, NHWC — decode path.

Re-derived from the diffusers `PaellaVQModel` the reference decodes
samples through (reference: modules/model/WuerstchenModel.py:69
`decoder_vqgan: PaellaVQModel`, used at
modules/modelSampler/WuerstchenSampler.py:335-338:
`vqgan.decode(scale_factor * latents).sample.clamp(0, 1)` — decode does
NOT vector-quantize). Decoder structure: 1×1 conv latent→embed_dim, 12
MixingResidualBlocks at embed_dim, ConvTranspose ×2 up, one
MixingResidualBlock at embed_dim/2, 1×1 conv to out*4 + PixelShuffle(2).

The encode path (PixelUnshuffle stem → down blocks → 1×1 conv +
batch-norm to latent channels) is included for completeness; the
reference never trains or encodes through the VQGAN.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
from onetrainer_tpu.models.convpad import circular_padding_enabled, conv_padding
import jax.numpy as jnp

from onetrainer_tpu.models.diffnext import pixel_shuffle, pixel_unshuffle
from onetrainer_tpu.models.wuerstchen import (
    GlobalResponseNorm, _layer_norm_no_affine,
)


@dataclass(frozen=True)
class PaellaVQConfig:
    in_channels: int = 3
    out_channels: int = 3
    up_down_scale_factor: int = 2
    levels: int = 2
    bottleneck_blocks: int = 12
    embed_dim: int = 384
    latent_channels: int = 4
    scale_factor: float = 0.3764
    dtype: jnp.dtype = jnp.float32

    @property
    def c_levels(self) -> tuple:
        return tuple(self.embed_dim // (2 ** (self.levels - 1 - i))
                     for i in range(self.levels))


class MixingResidualBlock(nn.Module):
    """Gated depthwise + channelwise mixing block (diffusers
    MixingResidualBlock): six scalar gammas modulate two LN(no-affine)
    branches; depthwise conv uses replication (edge) padding."""
    c: int
    embed: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("gammas", nn.initializers.zeros, (6,))
        g = g.astype(jnp.float32)

        h = _layer_norm_no_affine(x) * (1 + g[0]) + g[1]
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    mode="wrap" if circular_padding_enabled() else "edge")
        h = nn.Conv(self.c, (3, 3), padding="VALID",
                    feature_group_count=self.c, dtype=self.dtype,
                    name="depthwise_1")(h)
        x = x + h * g[2]

        h = _layer_norm_no_affine(x) * (1 + g[3]) + g[4]
        h = nn.Dense(self.embed, dtype=self.dtype, name="channelwise_0")(h)
        h = nn.gelu(h)
        h = GlobalResponseNorm(self.embed, name="channelwise_2")(h)
        h = nn.Dense(self.c, dtype=self.dtype, name="channelwise_4")(h)
        return x + h * g[5]


class PaellaVQDecoder(nn.Module):
    """up_blocks + out_block of PaellaVQModel (torch key layout:
    up_blocks.0.0 = 1×1 conv, up_blocks.1..12 = bottleneck mixing blocks,
    up_blocks.13 = ConvTranspose, up_blocks.14 = mixing block,
    out_block.0 = 1×1 conv)."""
    cfg: PaellaVQConfig

    @nn.compact
    def __call__(self, latents: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        c_levels = cfg.c_levels
        x = nn.Conv(c_levels[-1], (1, 1), dtype=cfg.dtype,
                    name="up_blocks_0_0")(latents.astype(cfg.dtype))
        j = 1
        for i in range(cfg.levels):
            c = c_levels[cfg.levels - 1 - i]
            n_blocks = cfg.bottleneck_blocks if i == 0 else 1
            for _ in range(n_blocks):
                x = MixingResidualBlock(c, c * 4, dtype=cfg.dtype,
                                        name=f"up_blocks_{j}")(x)
                j += 1
            if i < cfg.levels - 1:
                # transpose_kernel=True + SAME matches torch
                # ConvTranspose2d(k=4, s=2, p=1), kernel permuted (2,3,1,0)
                x = nn.ConvTranspose(
                    c_levels[cfg.levels - 2 - i], (4, 4), strides=(2, 2),
                    padding="SAME", transpose_kernel=True, dtype=cfg.dtype,
                    name=f"up_blocks_{j}")(x)
                j += 1
        x = nn.Conv(cfg.out_channels * cfg.up_down_scale_factor ** 2,
                    (1, 1), dtype=cfg.dtype, name="out_block_0")(x)
        return pixel_shuffle(x, cfg.up_down_scale_factor)


class PaellaVQEncoder(nn.Module):
    """in_block + down_blocks of PaellaVQModel (continuous latents,
    pre-quantizer)."""
    cfg: PaellaVQConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        c_levels = cfg.c_levels
        x = pixel_unshuffle(pixels.astype(cfg.dtype),
                            cfg.up_down_scale_factor)
        x = nn.Conv(c_levels[0], (1, 1), dtype=cfg.dtype,
                    name="in_block_1")(x)
        j = 0
        for i in range(cfg.levels):
            if i > 0:
                x = nn.Conv(c_levels[i], (4, 4), strides=(2, 2),
                            padding=conv_padding(((1, 1), (1, 1))),
                            dtype=cfg.dtype,
                            name=f"down_blocks_{j}")(x)
                j += 1
            x = MixingResidualBlock(c_levels[i], c_levels[i] * 4,
                                    dtype=cfg.dtype,
                                    name=f"down_blocks_{j}")(x)
            j += 1
        # 1×1 conv (no bias) + frozen batch-norm to latent channels
        from onetrainer_tpu.models.wuerstchen import FrozenBatchNorm
        x = nn.Conv(cfg.latent_channels, (1, 1), use_bias=False,
                    dtype=cfg.dtype, name=f"down_blocks_{j}_0")(x)
        return FrozenBatchNorm(cfg.latent_channels, eps=1e-5,
                               name=f"down_blocks_{j}_1")(x)
