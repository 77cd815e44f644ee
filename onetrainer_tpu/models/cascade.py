"""Stable Cascade stage-C prior in flax
(reference: modules/model/WuerstchenModel.py prior_prior =
StableCascadeUNet for STABLE_CASCADE_1; conditioning contract from
BaseWuerstchenSetup.py:244-258 — clip_text + clip_text_pooled + zero
clip_img kwargs, continuous timestep warped by +0.001).

Macro structure per the diffusers StableCascadeUNet (prior config):
patchified 16-ch latents, two levels of
[ResBlock → TimestepBlock → AttnBlock] stacks with a stride-2 conv
between, conditioning tokens = [pooled-text tokens | text tokens |
image tokens] mapped to c_cond. Blocks reuse the Würstchen modules
(same ConvNeXt/GRN/attention layout)."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from onetrainer_tpu.models.wuerstchen import (
    WAttnBlock, WResBlock, WTimestepBlock, _layer_norm_no_affine,
    gen_r_embedding,
)
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class CascadePriorConfig:
    c_in: int = 16
    c_hidden: tuple[int, ...] = (2048, 2048)
    nhead: tuple[int, ...] = (32, 32)
    blocks: tuple[int, ...] = (8, 24)          # per level (down); up mirrors
    c_cond: int = 2048
    c_r: int = 64
    clip_text_in: int = 1280
    clip_text_pooled_in: int = 1280
    clip_image_in: int = 768
    clip_seq: int = 4                          # pooled -> N cond tokens
    patch_size: int = 1
    gradient_checkpointing: bool = False
    dtype: jnp.dtype = jnp.bfloat16


def cascade_prior_config(**overrides) -> CascadePriorConfig:
    return CascadePriorConfig(**overrides)


class _CascadeLevel(nn.Module):
    cfg: CascadePriorConfig
    level: int
    n_blocks: int
    prefix: str

    @nn.compact
    def __call__(self, x, r_embed, clip):
        c = self.cfg
        ch = c.c_hidden[self.level]
        nhead = c.nhead[self.level]
        res_cls, ts_cls, attn_cls = WResBlock, WTimestepBlock, WAttnBlock
        if c.gradient_checkpointing:
            res_cls = nn.remat(WResBlock)
            ts_cls = nn.remat(WTimestepBlock)
            attn_cls = nn.remat(WAttnBlock)
        for i in range(self.n_blocks):
            x = res_cls(ch, dtype=c.dtype,
                        name=f"{self.prefix}_res_{i}")(x)
            x = ts_cls(ch, dtype=c.dtype,
                       name=f"{self.prefix}_ts_{i}")(x, r_embed)
            x = attn_cls(ch, c.c_cond, nhead, dtype=c.dtype,
                         name=f"{self.prefix}_attn_{i}")(x, clip)
        return x


class StableCascadePrior(nn.Module):
    cfg: CascadePriorConfig

    @nn.compact
    def __call__(self, x, r, clip_text, clip_text_pooled=None, clip_img=None):
        """x [B,H,W,16], r [B] continuous timestep, clip_text [B,S,1280],
        clip_text_pooled [B,1280], clip_img [B,S_img,768] (zeros in
        training — reference: BaseWuerstchenSetup.py:246-252)."""
        c = self.cfg
        b = x.shape[0]
        x_in = x.astype(jnp.float32)

        if clip_text_pooled is None:
            clip_text_pooled = jnp.zeros((b, c.clip_text_pooled_in), x.dtype)
        if clip_img is None:
            clip_img = jnp.zeros((b, 1, c.clip_image_in), x.dtype)

        # conditioning tokens (diffusers clip_txt_pooled_mapper expands the
        # pooled vector into clip_seq tokens)
        txt_pooled = LoraDense(c.c_cond * c.clip_seq, dtype=c.dtype,
                               name="clip_txt_pooled_mapper")(
            clip_text_pooled.astype(c.dtype))
        txt_pooled = txt_pooled.reshape(b, c.clip_seq, c.c_cond)
        txt = LoraDense(c.c_cond, dtype=c.dtype, name="clip_txt_mapper")(
            clip_text.astype(c.dtype))
        img = LoraDense(c.c_cond, dtype=c.dtype, name="clip_img_mapper")(
            clip_img.astype(c.dtype))
        clip = jnp.concatenate([txt_pooled, txt, img], axis=1)
        clip = _layer_norm_no_affine(clip)

        r_embed = gen_r_embedding(r, c.c_r).astype(c.dtype)

        p = c.patch_size
        h = x.astype(c.dtype)
        if p > 1:
            bb, hh, ww, cc = h.shape
            h = h.reshape(bb, hh // p, p, ww // p, p, cc)
            h = h.transpose(0, 1, 3, 5, 2, 4).reshape(
                bb, hh // p, ww // p, cc * p * p)
        h = LoraConv(c.c_hidden[0], (1, 1), dtype=c.dtype, name="embedding")(h)
        h = _layer_norm_no_affine(h)

        # down path
        skips = []
        h = _CascadeLevel(c, 0, c.blocks[0], "down_0", name="down_blocks_0")(
            h, r_embed, clip)
        skips.append(h)
        h = LoraConv(c.c_hidden[1], (2, 2), strides=2, padding="VALID",
                     dtype=c.dtype, name="downsample_1")(h)
        h = _CascadeLevel(c, 1, c.blocks[1], "down_1", name="down_blocks_1")(
            h, r_embed, clip)

        # up path
        h = _CascadeLevel(c, 1, c.blocks[1], "up_1", name="up_blocks_1")(
            h, r_embed, clip)
        bu, hu, wu, cu = h.shape
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        h = LoraConv(c.c_hidden[0], (1, 1), dtype=c.dtype,
                     name="upsample_1")(h)
        h = h + skips.pop()
        h = _CascadeLevel(c, 0, c.blocks[0], "up_0", name="up_blocks_0")(
            h, r_embed, clip)

        h = _layer_norm_no_affine(h)
        out = LoraConv(c.c_in * p * p * 2, (1, 1), dtype=jnp.float32,
                       name="clf")(h)
        if p > 1:
            bb, hh, ww, cc = out.shape
            out = out.reshape(bb, hh, ww, cc // (p * p), p, p)
            out = out.transpose(0, 1, 4, 2, 5, 3).reshape(
                bb, hh * p, ww * p, cc // (p * p))
        a, bpred = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        return (x_in - a) / (jnp.abs(1.0 - bpred) + 1e-5)
