"""Stable Diffusion 3 / 3.5 MMDiT in flax.

Weight-parity contract with `diffusers.SD3Transformer2DModel`:
patchified 16ch latents, joint (context+image) attention blocks with
AdaLN-Zero, final context-pre-only block, learned position embeddings.
SD3.5 variants add RMS qk norms and (3.5-medium) dual attention — both
behind config flags.
(reference: modules/model/StableDiffusion3Model.py,
modules/modelSetup/BaseStableDiffusion3Setup.py:238-281 conditioning)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp

from onetrainer_tpu.models.flux import (
    AdaLayerNormZero, AdaNormContinuous, GELUProj, MLPEmbedder, RMSNorm,
)
from onetrainer_tpu.models.unet import timestep_embedding
from onetrainer_tpu.ops.attention import dot_product_attention
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class SD3Config:
    sample_size: int = 128           # latent grid (128 = 1024px)
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    num_heads: int = 24
    head_dim: int = 64
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: bool = False            # SD3.5
    gradient_checkpointing: bool = False
    # scan-over-layers (models/flux.py pattern): the first N-1 joint
    # blocks are homogeneous and scan; the final context-pre-only block
    # stays a separate module (different param set)
    scan_layers: bool = False
    # remat flavor for the joint blocks: "full" recomputes everything,
    # "dots_nb" saves weight-matmul outputs (less recompute, more HBM —
    # see models/unet.py _remat for the SDXL measurements)
    remat_policy: str = "full"
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim


def sd3_medium_config(**overrides) -> SD3Config:
    return SD3Config(**overrides)


def sd35_medium_config(**overrides) -> SD3Config:
    kwargs = dict(qk_norm=True, pos_embed_max_size=384)
    kwargs.update(overrides)
    return SD3Config(**kwargs)


def sd35_large_config(**overrides) -> SD3Config:
    kwargs = dict(num_layers=38, num_heads=38, qk_norm=True)
    kwargs.update(overrides)
    return SD3Config(**kwargs)


class PatchEmbed(nn.Module):
    """diffusers PatchEmbed: conv patchify + cropped learned pos embed."""
    cfg: SD3Config

    @nn.compact
    def __call__(self, latents):  # [B, H, W, C] NHWC
        c = self.cfg
        p = c.patch_size
        x = LoraConv(c.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    dtype=c.dtype, name="proj")(latents.astype(c.dtype))
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.hidden_size)
        pos_table = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, c.pos_embed_max_size * c.pos_embed_max_size, c.hidden_size))
        # center-crop the pos grid to the current latent grid
        m = c.pos_embed_max_size
        top = (m - gh) // 2
        left = (m - gw) // 2
        pos = pos_table.reshape(1, m, m, c.hidden_size)[
            :, top:top + gh, left:left + gw].reshape(1, gh * gw, c.hidden_size)
        return (x + pos.astype(c.dtype)), (gh, gw)


class SD3JointAttention(nn.Module):
    cfg: SD3Config
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, img_n, txt_n):
        c = self.cfg
        h, d = c.num_heads, c.head_dim
        inner = h * d
        s_txt = txt_n.shape[1]

        def heads(x):
            return x.reshape(x.shape[0], x.shape[1], h, d)

        q_i = heads(LoraDense(inner, dtype=c.dtype, name="to_q")(img_n))
        k_i = heads(LoraDense(inner, dtype=c.dtype, name="to_k")(img_n))
        v_i = heads(LoraDense(inner, dtype=c.dtype, name="to_v")(img_n))
        q_t = heads(LoraDense(inner, dtype=c.dtype, name="add_q_proj")(txt_n))
        k_t = heads(LoraDense(inner, dtype=c.dtype, name="add_k_proj")(txt_n))
        v_t = heads(LoraDense(inner, dtype=c.dtype, name="add_v_proj")(txt_n))

        if c.qk_norm:
            q_i = RMSNorm(d, c.dtype, name="norm_q")(q_i)
            k_i = RMSNorm(d, c.dtype, name="norm_k")(k_i)
            q_t = RMSNorm(d, c.dtype, name="norm_added_q")(q_t)
            k_t = RMSNorm(d, c.dtype, name="norm_added_k")(k_t)

        q = jnp.concatenate([q_t, q_i], axis=1)
        k = jnp.concatenate([k_t, k_i], axis=1)
        v = jnp.concatenate([v_t, v_i], axis=1)
        attn = dot_product_attention(q, k, v)
        attn = attn.reshape(attn.shape[0], attn.shape[1], inner)
        attn_txt, attn_img = attn[:, :s_txt], attn[:, s_txt:]

        out_img = LoraDense(c.hidden_size, dtype=c.dtype, name="to_out_0")(attn_img)
        out_txt = None
        if not self.context_pre_only:
            out_txt = LoraDense(c.hidden_size, dtype=c.dtype,
                               name="to_add_out")(attn_txt)
        return out_img, out_txt


class JointTransformerBlock(nn.Module):
    cfg: SD3Config
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, img, txt, temb):
        c = self.cfg
        img_n, img_gate, img_shift_mlp, img_scale_mlp, img_gate_mlp = \
            AdaLayerNormZero(c.hidden_size, c.dtype, name="norm1")(img, temb)

        if self.context_pre_only:
            txt_n = AdaNormContinuous(c.hidden_size, c.dtype,
                                      name="norm1_context")(txt, temb)
            txt_gate = txt_shift_mlp = txt_scale_mlp = txt_gate_mlp = None
        else:
            txt_n, txt_gate, txt_shift_mlp, txt_scale_mlp, txt_gate_mlp = \
                AdaLayerNormZero(c.hidden_size, c.dtype,
                                 name="norm1_context")(txt, temb)

        out_img, out_txt = SD3JointAttention(
            c, self.context_pre_only, name="attn")(img_n, txt_n)
        img = img + img_gate[:, None] * out_img

        def pre_norm(x, shift, scale):
            n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=c.dtype)(x)
            return n * (1 + scale[:, None]) + shift[:, None]

        img = img + img_gate_mlp[:, None] * SD3FF(c, name="ff")(
            pre_norm(img, img_shift_mlp, img_scale_mlp))

        if not self.context_pre_only:
            txt = txt + txt_gate[:, None] * out_txt
            txt = txt + txt_gate_mlp[:, None] * SD3FF(c, name="ff_context")(
                pre_norm(txt, txt_shift_mlp, txt_scale_mlp))
        return img, txt


class SD3FF(nn.Module):
    cfg: SD3Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = GELUProj(c.hidden_size, c.dtype, name="net_0")(x)
        return LoraDense(c.hidden_size, dtype=c.dtype, name="net_2")(x)


class TimeTextEmbedSD3(nn.Module):
    cfg: SD3Config

    @nn.compact
    def __call__(self, timestep, pooled):
        c = self.cfg
        t_emb = timestep_embedding(timestep, 256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        emb = MLPEmbedder(c.hidden_size, c.dtype, name="timestep_embedder")(t_emb)
        emb = emb + MLPEmbedder(c.hidden_size, c.dtype,
                                name="text_embedder")(pooled.astype(jnp.float32))
        return emb


def _sd3_remat(cfg):
    from onetrainer_tpu.models.remat import remat
    return remat(JointTransformerBlock, cfg.remat_policy)


class _SD3ScanBody(nn.Module):
    cfg: SD3Config

    @nn.compact
    def __call__(self, carry, temb):
        img, txt = carry
        blk = _sd3_remat(self.cfg) \
            if self.cfg.gradient_checkpointing else JointTransformerBlock
        img, txt = blk(self.cfg, context_pre_only=False,
                       name="block")(img, txt, temb)
        return (img, txt), None


def _sd3_scan(length: int):
    return nn.scan(
        _SD3ScanBody,
        variable_axes={"params": 0, "lora": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast,),
        length=length)


class SD3Transformer2D(nn.Module):
    cfg: SD3Config

    @nn.compact
    def __call__(
            self,
            latents: jnp.ndarray,       # [B, H, W, 16] NHWC
            timestep: jnp.ndarray,      # [B] in [0, 1000)
            pooled: jnp.ndarray,        # [B, 2048] (clip_l ++ clip_g pooled)
            context: jnp.ndarray,       # [B, S, 4096] (clip padded ++ t5)
    ) -> jnp.ndarray:
        c = self.cfg
        b, height, width, _ = latents.shape
        img, (gh, gw) = PatchEmbed(c, name="pos_embed")(latents)
        temb = TimeTextEmbedSD3(c, name="time_text_embed")(
            timestep.astype(jnp.float32), pooled)
        txt = LoraDense(c.caption_projection_dim, dtype=c.dtype,
                       name="context_embedder")(context.astype(c.dtype))

        block_cls = JointTransformerBlock
        if c.gradient_checkpointing:
            block_cls = _sd3_remat(c)

        if c.scan_layers:
            (img, txt), _ = _sd3_scan(c.num_layers - 1)(
                c, name="transformer_blocks")((img, txt), temb)
            img, txt = block_cls(
                c, context_pre_only=True,
                name=f"transformer_blocks_{c.num_layers - 1}")(img, txt, temb)
        else:
            for i in range(c.num_layers):
                img, txt = block_cls(
                    c, context_pre_only=(i == c.num_layers - 1),
                    name=f"transformer_blocks_{i}")(img, txt, temb)

        img = AdaNormContinuous(c.hidden_size, c.dtype, name="norm_out")(img, temb)
        img = LoraDense(c.patch_size ** 2 * c.out_channels, dtype=jnp.float32,
                       name="proj_out")(img)
        # unpatchify
        p = c.patch_size
        img = img.reshape(b, gh, gw, p, p, c.out_channels)
        img = img.transpose(0, 1, 3, 2, 4, 5)
        return img.reshape(b, gh * p, gw * p, c.out_channels)


def sd3_text_context(clip_l_hidden, clip_g_hidden, t5_states,
                     clip_l_pooled, clip_g_pooled):
    """SD3 conditioning assembly (reference: BaseStableDiffusion3Setup.py:
    238-281): channel-concat the CLIP hidden states, zero-pad to the T5
    width, sequence-concat with T5; pooled = concat of both CLIP pooled."""
    clip = jnp.concatenate([clip_l_hidden, clip_g_hidden], axis=-1)
    pad = t5_states.shape[-1] - clip.shape[-1]
    clip = jnp.pad(clip, ((0, 0), (0, 0), (0, pad)))
    context = jnp.concatenate([clip, t5_states], axis=1)
    pooled = jnp.concatenate([clip_l_pooled, clip_g_pooled], axis=-1)
    return context, pooled
