"""Würstchen v2 stage-B decoder (DiffNeXt) in flax, NHWC.

Architecture re-derived from the diffusers `WuerstchenDiffNeXt` the
reference samples through (reference: modules/model/WuerstchenModel.py:68
`decoder_decoder: WuerstchenDiffNeXt`, used at
modules/modelSampler/WuerstchenSampler.py:231-247 with kwargs
`effnet=image_embedding, clip=prompt_embedding`). A ConvNeXt-style UNet
over a 4-channel pixel-shuffled latent: per level `blocks[i]` repeats of
the level_config pattern (C=ResBlockStageB, T=TimestepBlock,
A=AttnBlock), effnet conditioning injected as a bicubic-resized 1×1-conv
skip into every ResBlock of injected levels, and an (a, b) output head —
`noise = (x_in - a) / (sigmoid(b)·(1-2e)+e)`.

TPU notes: channels-last throughout so convs hit the MXU without
transposes; the effnet conditioning resize uses jax.image 'bicubic'
(half-pixel centers) instead of torch's align_corners=True — a sub-pixel
sampling difference on a smooth 16-channel conditioning map.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
from onetrainer_tpu.models.convpad import conv_padding
import jax
import jax.numpy as jnp

from onetrainer_tpu.models.wuerstchen import (
    GlobalResponseNorm, WAttnBlock, WTimestepBlock, _layer_norm_no_affine,
    gen_r_embedding,
)
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class DiffNeXtConfig:
    c_in: int = 4
    c_out: int = 4
    c_r: int = 64
    patch_size: int = 2
    c_cond: int = 1024
    c_hidden: tuple = (320, 640, 1280, 1280)
    nhead: tuple = (-1, 10, 20, 20)
    blocks: tuple = (4, 4, 14, 4)
    level_config: tuple = ("CT", "CTA", "CTA", "CTA")
    inject_effnet: tuple = (False, True, True, True)
    effnet_embd: int = 16
    clip_embd: int = 1024
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.bfloat16


def pixel_unshuffle(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """NHWC pixel-unshuffle with torch channel ordering (c, ph, pw)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // p, w // p, c * p * p)


def pixel_shuffle(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """NHWC pixel-shuffle; input channels ordered (c, ph, pw) like torch."""
    b, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, h, w, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * p, w * p, c)


class WResBlockStageB(nn.Module):
    """depthwise k×k → LN(no affine) → [concat skip] → Linear 4c → GELU →
    GRN → Linear c, residual (diffusers ResBlockStageB key layout:
    depthwise / channelwise.0 / channelwise.2 / channelwise.4)."""
    c: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        k = self.kernel_size
        res = x
        h = LoraConv(self.c, (k, k), padding=conv_padding(k // 2),
                     feature_group_count=self.c, dtype=self.dtype,
                     name="depthwise")(x)
        h = _layer_norm_no_affine(h)
        if skip is not None:
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
        h = LoraDense(self.c * 4, dtype=self.dtype, name="channelwise_0")(h)
        h = nn.gelu(h)
        h = GlobalResponseNorm(self.c * 4, name="channelwise_2")(h)
        h = LoraDense(self.c, dtype=self.dtype, name="channelwise_4")(h)
        return h + res


class WuerstchenDiffNeXt(nn.Module):
    cfg: DiffNeXtConfig

    def _effnet_skip(self, effnet, spatial, mapper_index, features):
        """Bicubic-resize the effnet conditioning to the current feature
        map and project to the level width (effnet_mappers.{i})."""
        c = self.cfg
        b = effnet.shape[0]
        resized = jax.image.resize(
            effnet.astype(jnp.float32),
            (b, spatial[0], spatial[1], effnet.shape[-1]), "bicubic")
        return LoraConv(features, (1, 1), dtype=c.dtype,
                        name=f"effnet_mappers_{mapper_index}")(
            resized.astype(c.dtype))

    @nn.compact
    def __call__(self, x: jnp.ndarray, r: jnp.ndarray, effnet: jnp.ndarray,
                 clip: jnp.ndarray | None = None,
                 eps: float = 1e-3) -> jnp.ndarray:
        """x: [B,H,W,4] noisy stage-B latent, r: [B] continuous timestep,
        effnet: [B,h,w,16] prior output, clip: [B,S,clip_embd]."""
        cfg = self.cfg
        n_levels = len(cfg.c_hidden)
        x_in = x.astype(jnp.float32)

        r_embed = gen_r_embedding(r, cfg.c_r).astype(cfg.dtype)
        if clip is not None:
            clip = LoraDense(cfg.c_cond, dtype=cfg.dtype,
                             name="clip_mapper")(clip.astype(cfg.dtype))
            clip = _layer_norm_no_affine(clip)

        h = pixel_unshuffle(x.astype(cfg.dtype), cfg.patch_size)
        h = LoraConv(cfg.c_hidden[0], (1, 1), dtype=cfg.dtype,
                     name="embedding_1")(h)
        h = _layer_norm_no_affine(h)

        def run_level(h, i, name_of, first_block_skip=None,
                      mapper_index=None):
            effnet_c = None
            j_holder = [0]

            def next_name():
                n = name_of(j_holder[0])
                j_holder[0] += 1
                return n

            for b_idx in range(cfg.blocks[i]):
                for k_idx, t in enumerate(cfg.level_config[i]):
                    name = next_name()
                    if t == "C":
                        skip = None
                        if mapper_index is not None and cfg.inject_effnet[i]:
                            if effnet_c is None:
                                effnet_c = self._effnet_skip(
                                    effnet, h.shape[1:3], mapper_index,
                                    cfg.c_hidden[i])
                            skip = effnet_c
                        if b_idx == 0 and k_idx == 0 and \
                                first_block_skip is not None:
                            skip = first_block_skip if skip is None else \
                                jnp.concatenate(
                                    [first_block_skip.astype(skip.dtype),
                                     skip], axis=-1)
                        h = WResBlockStageB(
                            cfg.c_hidden[i], cfg.kernel_size,
                            dtype=cfg.dtype, name=name)(h, skip)
                    elif t == "T":
                        h = WTimestepBlock(cfg.c_hidden[i], dtype=cfg.dtype,
                                           name=name)(h, r_embed)
                    elif t == "A":
                        h = WAttnBlock(cfg.c_hidden[i], cfg.c_cond,
                                       cfg.nhead[i], dtype=cfg.dtype,
                                       name=name)(h, clip)
            return h

        # -- down path ------------------------------------------------------------
        level_outputs = []
        for i in range(n_levels):
            offset = 0
            if i > 0:
                h = _layer_norm_no_affine(h)
                h = LoraConv(cfg.c_hidden[i], (2, 2), strides=2,
                             dtype=cfg.dtype,
                             name=f"down_blocks_{i}_0_1")(h)
                offset = 1
            h = run_level(
                h, i,
                name_of=lambda j, i=i, o=offset: f"down_blocks_{i}_{j + o}",
                mapper_index=i)
            level_outputs.insert(0, h)

        # -- up path --------------------------------------------------------------
        h = level_outputs[0]
        for ui, i in enumerate(reversed(range(n_levels))):
            h = run_level(
                h, i,
                name_of=lambda j, ui=ui: f"up_blocks_{ui}_{j}",
                first_block_skip=level_outputs[ui] if ui > 0 else None,
                mapper_index=n_levels + ui)
            if i > 0:
                j_up = cfg.blocks[i] * len(cfg.level_config[i])
                h = _layer_norm_no_affine(h)
                # transpose_kernel=True + SAME matches torch
                # ConvTranspose2d(k=2, s=2) with kernel permuted (2,3,1,0)
                h = nn.ConvTranspose(
                    cfg.c_hidden[i - 1], (2, 2), strides=(2, 2),
                    padding="SAME", transpose_kernel=True,
                    dtype=cfg.dtype, name=f"up_blocks_{ui}_{j_up}_1")(h)

        # -- output head ----------------------------------------------------------
        h = _layer_norm_no_affine(h)
        h = LoraConv(2 * cfg.c_out * cfg.patch_size ** 2, (1, 1),
                     dtype=jnp.float32, name="clf_1")(h.astype(jnp.float32))
        h = pixel_shuffle(h, cfg.patch_size)
        a, b = jnp.split(h, 2, axis=-1)
        b = jax.nn.sigmoid(b) * (1.0 - 2.0 * eps) + eps
        return (x_in - a) / b
