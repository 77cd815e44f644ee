"""Stable Cascade stage-C prior in flax, key-exact with diffusers'
StableCascadeUNet prior layout
(reference: modules/model/WuerstchenModel.py prior_prior =
StableCascadeUNet for STABLE_CASCADE_1; conditioning contract from
BaseWuerstchenSetup.py:244-258 — clip_text + clip_text_pooled + zero
clip_img kwargs, continuous timestep warped by +0.001; the exact key
inventory comes from the reference's own converter,
modules/util/convert/convert_stable_cascade_diffusers_to_ckpt.py:1-83).

Structure (prior config: c_hidden=(2048,2048), blocks=(8,24),
switch_level=(False,)):
- embedding.1: 1×1 conv 16→2048 (patch_size=1) + LN(no affine)
- conditioning tokens = [pooled→4 tokens | text | image] each mapped to
  c_hidden, LN(no affine)
- two levels of flattened [ResBlock, TimestepBlock, AttnBlock] triplets
  (down_blocks.{L}.{3j+k}); the level transition is
  LN + UpDownBlock2d (a 1×1 conv; bilinear ×0.5/×2 only when
  switch_level — False for the released prior, so it runs isotropic at
  the 24×24 latent grid)
- TimestepBlock conditions on (timestep, sca, crp) sinusoidal embeddings
  via mapper / mapper_sca / mapper_crp
- up path mirrors down; the last level's first ResBlock concatenates the
  down-path skip
- clf.1: 1×1 conv → (a, b); eps = (x_in − a)/(|1−b|+1e−5)
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
from onetrainer_tpu.models.convpad import conv_padding
import jax
import jax.numpy as jnp

from onetrainer_tpu.models.wuerstchen import (
    GlobalResponseNorm, WAttnBlock, _layer_norm_no_affine, gen_r_embedding,
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
    switch_level: tuple[bool, ...] = (False,)  # bilinear resize at transition
    timestep_conditioning: tuple[str, ...] = ("sca", "crp")
    gradient_checkpointing: bool = False
    dtype: jnp.dtype = jnp.bfloat16


def cascade_prior_config(**overrides) -> CascadePriorConfig:
    return CascadePriorConfig(**overrides)


class CascadeResBlock(nn.Module):
    """SDCascadeResBlock: depthwise 3×3 → LN(no affine) → [concat skip] →
    Linear 4c → GELU → GRN → Linear c, residual."""
    c: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        res = x
        h = LoraConv(self.c, (3, 3), padding=conv_padding(1), feature_group_count=self.c,
                     dtype=self.dtype, name="depthwise")(x)
        h = _layer_norm_no_affine(h)
        if skip is not None:
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
        h = LoraDense(self.c * 4, dtype=self.dtype, name="channelwise_0")(h)
        h = nn.gelu(h)
        h = GlobalResponseNorm(self.c * 4, name="channelwise_2")(h)
        h = LoraDense(self.c, dtype=self.dtype, name="channelwise_4")(h)
        return h + res


class CascadeTimestepBlock(nn.Module):
    """SDCascadeTimestepBlock: x·(1+a)+b where (a,b) sums the base mapper
    and one mapper per extra conditioning (sca, crp)."""
    c: int
    conds: tuple[str, ...] = ("sca", "crp")
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_embeds):
        ab = LoraDense(self.c * 2, dtype=self.dtype, name="mapper")(
            t_embeds[0])
        for i, cond in enumerate(self.conds):
            ab = ab + LoraDense(self.c * 2, dtype=self.dtype,
                                name=f"mapper_{cond}")(t_embeds[i + 1])
        a, b = jnp.split(ab, 2, axis=-1)
        return x * (1 + a[:, None, None, :]) + b[:, None, None, :]


class _UpDownBlock(nn.Module):
    """UpDownBlock2d: optional bilinear resize + 1×1 conv; the conv is
    child `blocks.{idx}` (idx 0 for down — conv first; 1 for up)."""
    features: int
    conv_index: int
    resize: bool
    up: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h):
        def conv(h):
            return LoraConv(self.features, (1, 1), dtype=self.dtype,
                            name=f"blocks_{self.conv_index}")(h)

        def interp(h):
            if not self.resize:
                return h
            bb, hh, ww, cc = h.shape
            factor = 2 if self.up else 0.5
            return jax.image.resize(
                h.astype(jnp.float32),
                (bb, int(hh * factor), int(ww * factor), cc),
                "bilinear").astype(h.dtype)

        # torch order: down = [conv, interp], up = [interp, conv]
        return conv(interp(h)) if self.up else interp(conv(h))


class StableCascadePrior(nn.Module):
    cfg: CascadePriorConfig

    def _level(self, h, level, t_embeds, clip, prefix, first_skip=None):
        c = self.cfg
        ch = c.c_hidden[level]
        res_cls, ts_cls, attn_cls = (CascadeResBlock, CascadeTimestepBlock,
                                     WAttnBlock)
        if c.gradient_checkpointing:
            res_cls = nn.remat(CascadeResBlock)
            ts_cls = nn.remat(CascadeTimestepBlock)
            attn_cls = nn.remat(WAttnBlock)
        for j in range(c.blocks[level]):
            skip = first_skip if j == 0 else None
            h = res_cls(ch, dtype=c.dtype,
                        name=f"{prefix}_{3 * j}")(h, skip)
            h = ts_cls(ch, c.timestep_conditioning, dtype=c.dtype,
                       name=f"{prefix}_{3 * j + 1}")(h, t_embeds)
            h = attn_cls(ch, c.c_cond, c.nhead[level], dtype=c.dtype,
                         name=f"{prefix}_{3 * j + 2}")(h, clip)
        return h

    @nn.compact
    def __call__(self, x, r, clip_text, clip_text_pooled=None, clip_img=None,
                 sca=None, crp=None):
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
        if clip_text_pooled.ndim == 2:
            clip_text_pooled = clip_text_pooled[:, None]

        # conditioning tokens (clip_txt_pooled_mapper expands the pooled
        # vector into clip_seq tokens)
        txt_pooled = LoraDense(c.c_cond * c.clip_seq, dtype=c.dtype,
                               name="clip_txt_pooled_mapper")(
            clip_text_pooled.astype(c.dtype))
        txt_pooled = txt_pooled.reshape(
            b, clip_text_pooled.shape[1] * c.clip_seq, c.c_cond)
        txt = LoraDense(c.c_cond, dtype=c.dtype, name="clip_txt_mapper")(
            clip_text.astype(c.dtype))
        img = LoraDense(c.c_cond, dtype=c.dtype, name="clip_img_mapper")(
            clip_img.astype(c.dtype))
        clip = jnp.concatenate([txt_pooled, txt, img], axis=1)
        clip = _layer_norm_no_affine(clip)

        # timestep embeddings: base + one per extra conditioning
        t_embeds = [gen_r_embedding(r, c.c_r).astype(c.dtype)]
        for name, value in zip(c.timestep_conditioning, (sca, crp)):
            cond_r = value if value is not None else jnp.zeros_like(r)
            t_embeds.append(gen_r_embedding(cond_r, c.c_r).astype(c.dtype))

        p = c.patch_size
        h = x.astype(c.dtype)
        if p > 1:
            bb, hh, ww, cc = h.shape
            h = h.reshape(bb, hh // p, p, ww // p, p, cc)
            h = h.transpose(0, 1, 3, 5, 2, 4).reshape(
                bb, hh // p, ww // p, cc * p * p)
        h = LoraConv(c.c_hidden[0], (1, 1), dtype=c.dtype,
                     name="embedding_1")(h)
        h = _layer_norm_no_affine(h)

        # down path
        h = self._level(h, 0, t_embeds, clip, "down_blocks_0")
        skip0 = h
        h = _UpDownBlock(c.c_hidden[1], conv_index=0,
                         resize=c.switch_level[0], up=False, dtype=c.dtype,
                         name="down_downscalers_1_1")(
            _layer_norm_no_affine(h))
        h = self._level(h, 1, t_embeds, clip, "down_blocks_1")

        # up path (up_blocks.0 = deepest level)
        h = self._level(h, 1, t_embeds, clip, "up_blocks_0")
        h = _UpDownBlock(c.c_hidden[0], conv_index=1,
                         resize=c.switch_level[0], up=True, dtype=c.dtype,
                         name="up_upscalers_0_1")(
            _layer_norm_no_affine(h))
        h = self._level(h, 0, t_embeds, clip, "up_blocks_1",
                        first_skip=skip0)

        h = _layer_norm_no_affine(h)
        out = LoraConv(c.c_in * p * p * 2, (1, 1), dtype=jnp.float32,
                       name="clf_1")(h)
        if p > 1:
            bb, hh, ww, cc = out.shape
            out = out.reshape(bb, hh, ww, cc // (p * p), p, p)
            out = out.transpose(0, 1, 4, 2, 5, 3).reshape(
                bb, hh * p, ww * p, cc // (p * p))
        a, bpred = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        return (x_in - a) / (jnp.abs(1.0 - bpred) + 1e-5)
