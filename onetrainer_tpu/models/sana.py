"""Sana transformer (linear-attention DiT) in flax
(reference: modules/model/SanaModel.py imports diffusers
SanaTransformer2DModel; weight contract follows the diffusers module tree:
patch_embed.proj, time_embed.emb.timestep_embedder + time_embed.linear,
caption_projection.linear_1/2, caption_norm, transformer_blocks.{i}.
{attn1,attn2,ff.conv_*,scale_shift_table}, norm_out-less proj_out +
top-level scale_shift_table).

TPU notes: ReLU linear attention is two einsum contractions (O(N·d²)) —
no S×S matrix, MXU-friendly at any resolution; the GLUMBConv feedforward
reshapes tokens to the 2D grid for its depthwise conv (NHWC).
Flow-matching target: flow = noise − x0 (reference: BaseSanaSetup.predict).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
from onetrainer_tpu.models.convpad import conv_padding
import jax
import jax.numpy as jnp

from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class SanaConfig:
    in_channels: int = 32
    out_channels: int = 32
    num_layers: int = 20
    num_attention_heads: int = 70
    attention_head_dim: int = 32
    num_cross_attention_heads: int = 20
    cross_attention_head_dim: int = 112
    caption_channels: int = 2304
    mlp_ratio: float = 2.5
    patch_size: int = 1
    qkv_bias: bool = False               # attn1 (detected from checkpoint)
    cross_qkv_bias: bool = True          # attn2
    gradient_checkpointing: bool = False
    # scan-over-layers (models/flux.py pattern): homogeneous blocks under
    # lax.scan with stacked [L, ...] params
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


def sana_config(**overrides) -> SanaConfig:
    return SanaConfig(**overrides)


class SanaRMSNorm(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("scale", nn.initializers.ones, (self.features,))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.eps) * weight).astype(x.dtype)


class SanaLinearAttention(nn.Module):
    """ReLU-kernel linear attention (diffusers SanaLinearAttnProcessor2_0):
    out_i = (Σ_j k_jᵀ v_j) q_i / (Σ_j k_j · q_i + eps), fp32 accumulation."""
    cfg: SanaConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dim = c.hidden_size
        b, n, _ = x.shape
        q = LoraDense(dim, use_bias=c.qkv_bias, dtype=c.dtype, name="to_q")(x)
        k = LoraDense(dim, use_bias=c.qkv_bias, dtype=c.dtype, name="to_k")(x)
        v = LoraDense(dim, use_bias=c.qkv_bias, dtype=c.dtype, name="to_v")(x)
        h, d = c.num_attention_heads, c.attention_head_dim
        q = nn.relu(q.reshape(b, n, h, d)).astype(jnp.float32)
        k = nn.relu(k.reshape(b, n, h, d)).astype(jnp.float32)
        v = v.reshape(b, n, h, d).astype(jnp.float32)
        kv = jnp.einsum("bnhd,bnhe->bhde", k, v)
        ksum = k.sum(axis=1)
        num = jnp.einsum("bnhd,bhde->bnhe", q, kv)
        den = jnp.einsum("bnhd,bhd->bnh", q, ksum)[..., None] + 1e-15
        out = (num / den).reshape(b, n, dim).astype(c.dtype)
        return LoraDense(dim, use_bias=True, dtype=c.dtype, name="to_out_0")(out)


class SanaCrossAttention(nn.Module):
    cfg: SanaConfig

    @nn.compact
    def __call__(self, x, context, context_mask=None):
        from onetrainer_tpu.ops.attention import dot_product_attention
        c = self.cfg
        h, d = c.num_cross_attention_heads, c.cross_attention_head_dim
        inner = h * d
        b, n, _ = x.shape
        q = LoraDense(inner, use_bias=c.cross_qkv_bias, dtype=c.dtype,
                      name="to_q")(x)
        k = LoraDense(inner, use_bias=c.cross_qkv_bias, dtype=c.dtype,
                      name="to_k")(context)
        v = LoraDense(inner, use_bias=c.cross_qkv_bias, dtype=c.dtype,
                      name="to_v")(context)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, context.shape[1], h, d)
        v = v.reshape(b, context.shape[1], h, d)
        mask = None
        if context_mask is not None:
            mask = context_mask[:, None, None, :].astype(bool)
        out = dot_product_attention(q, k, v, mask=mask)
        out = out.reshape(b, n, inner)
        return LoraDense(c.hidden_size, use_bias=True, dtype=c.dtype,
                         name="to_out_0")(out)


class GLUMBConv(nn.Module):
    """1×1 expand ×2 → SiLU → depthwise 3×3 → SiLU gate → 1×1 project
    (diffusers GLUMBConv; operates on the 2D token grid)."""
    cfg: SanaConfig

    @nn.compact
    def __call__(self, x, gh: int, gw: int):
        c = self.cfg
        b, n, dim = x.shape
        mid = int(dim * c.mlp_ratio)
        h = x.reshape(b, gh, gw, dim)
        h = LoraConv(mid * 2, (1, 1), dtype=c.dtype, name="conv_inverted")(h)
        h = nn.silu(h)
        h = LoraConv(mid * 2, (3, 3), padding=conv_padding(1), feature_group_count=mid * 2,
                     dtype=c.dtype, name="conv_depth")(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        h = LoraConv(dim, (1, 1), use_bias=False, dtype=c.dtype,
                     name="conv_point")(h)
        return h.reshape(b, n, dim)


class SanaBlock(nn.Module):
    cfg: SanaConfig

    @nn.compact
    def __call__(self, x, context, context_mask, t6, gh, gw):
        c = self.cfg
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (6, c.hidden_size))
        mods = table[None] + t6.reshape(-1, 6, c.hidden_size)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            [mods[:, i] for i in range(6)]

        n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=c.dtype, name="norm1")(x)
        n = n * (1 + scale_msa[:, None]) + shift_msa[:, None]
        x = x + gate_msa[:, None] * SanaLinearAttention(c, name="attn1")(n)

        # cross attention applies on the raw hidden state (no pre-norm,
        # like PixArt — diffusers SanaTransformerBlock)
        x = x + SanaCrossAttention(c, name="attn2")(x, context, context_mask)

        n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=c.dtype, name="norm2")(x)
        n = n * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * GLUMBConv(c, name="ff")(n, gh, gw)
        return x


class _SanaTimestep(nn.Module):
    cfg: SanaConfig

    @nn.compact
    def __call__(self, timestep):
        from onetrainer_tpu.models.unet import timestep_embedding
        c = self.cfg
        t_emb = timestep_embedding(timestep, 256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        x = LoraDense(c.hidden_size, dtype=c.dtype, name="linear_1")(
            t_emb.astype(c.dtype))
        x = nn.silu(x)
        return LoraDense(c.hidden_size, dtype=c.dtype, name="linear_2")(x)


class _SanaScanBody(nn.Module):
    cfg: "SanaConfig"
    gh: int
    gw: int

    @nn.compact
    def __call__(self, x, ctx, context_mask, t6):
        blk = nn.remat(SanaBlock, static_argnums=(5, 6)) \
            if self.cfg.gradient_checkpointing else SanaBlock
        x = blk(self.cfg, name="block")(
            x, ctx, context_mask, t6, self.gh, self.gw)
        return x, None


def _sana_scan(cfg, gh, gw):
    return nn.scan(
        _SanaScanBody,
        variable_axes={"params": 0, "lora": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
        length=cfg.num_layers)


class SanaTransformer2D(nn.Module):
    cfg: SanaConfig

    @nn.compact
    def __call__(
            self,
            latents: jnp.ndarray,        # [B, H, W, 32] NHWC
            timestep: jnp.ndarray,       # [B]
            context: jnp.ndarray,        # [B, S, caption_channels]
            context_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        c = self.cfg
        b, height, width, _ = latents.shape
        p = c.patch_size

        x = LoraConv(c.hidden_size, (p, p), strides=(p, p), padding="VALID",
                     dtype=c.dtype, name="patch_embed_proj")(
            latents.astype(c.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, c.hidden_size)

        emb = _SanaTimestep(c, name="time_embed_emb_timestep_embedder")(
            timestep.astype(jnp.float32))
        t6 = LoraDense(6 * c.hidden_size, dtype=c.dtype,
                       name="time_embed_linear")(nn.silu(emb))

        ctx = LoraDense(c.hidden_size, dtype=c.dtype,
                        name="caption_projection_linear_1")(
            context.astype(c.dtype))
        ctx = nn.gelu(ctx, approximate=True)
        ctx = LoraDense(c.hidden_size, dtype=c.dtype,
                        name="caption_projection_linear_2")(ctx)
        ctx = SanaRMSNorm(c.hidden_size, name="caption_norm")(ctx)

        if c.scan_layers:
            x, _ = _sana_scan(c, gh, gw)(
                c, gh, gw, name="transformer_blocks")(
                x, ctx, context_mask, t6)
        else:
            block_cls = SanaBlock
            if c.gradient_checkpointing:
                # argnum 0 is the module instance; gh/gw are args 5 and 6
                block_cls = nn.remat(SanaBlock, static_argnums=(5, 6))
            for i in range(c.num_layers):
                x = block_cls(c, name=f"transformer_blocks_{i}")(
                    x, ctx, context_mask, t6, gh, gw)

        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (2, c.hidden_size))
        mods = table[None] + emb.reshape(-1, 1, c.hidden_size)
        shift, scale = mods[:, 0], mods[:, 1]
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=c.dtype, name="norm_out")(x)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = LoraDense(p * p * c.out_channels, dtype=jnp.float32,
                      name="proj_out")(x)

        x = x.reshape(b, gh, gw, p, p, c.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, gh * p, gw * p, c.out_channels)
