"""PixArt-α/σ DiT in flax.

Weight-parity contract with `diffusers.PixArtTransformer2DModel`:
patchified 4ch latents, self+cross attention blocks, AdaLN-single (one
conditioning MLP shared across layers + per-block learned
scale_shift_table), T5 conditioning, learned variance output (eps ++ var
on channels — feeds the IDDPM VB loss;
reference: modules/modelSetup/BasePixArtAlphaSetup.py:226-233).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.models.flux import MLPEmbedder
from onetrainer_tpu.models.unet import timestep_embedding
from onetrainer_tpu.ops.attention import attention
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class PixArtConfig:
    sample_size: int = 64            # latent grid (64 = 512px)
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8            # 4 eps + 4 learned-variance
    num_layers: int = 28
    num_heads: int = 16
    head_dim: int = 72
    cross_attention_dim: int = 4096  # T5
    caption_channels: int = 4096
    # PixArt-alpha 1024 (sample_size 128) micro-conditions: resolution +
    # aspect-ratio sinusoidal embeddings added to the timestep embedding
    # (diffusers PixArtAlphaCombinedTimestepSizeEmbeddings; reference
    # feeds them from the latent shape, BasePixArtAlphaSetup.py:209-216)
    use_additional_conditions: bool = False
    gradient_checkpointing: bool = False
    # scan-over-layers (models/flux.py pattern)
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim


def pixart_alpha_config(**overrides) -> PixArtConfig:
    return PixArtConfig(**overrides)


def pixart_sigma_config(**overrides) -> PixArtConfig:
    return PixArtConfig(**overrides)


def _sincos_pos_embed(dim: int, gh: int, gw: int, base_size: int = 64) -> np.ndarray:
    """2D sincos position embedding (diffusers get_2d_sincos_pos_embed)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(gh, dtype=np.float64) / (gh / base_size)
    grid_w = np.arange(gw, dtype=np.float64) / (gw / base_size)
    grid = np.meshgrid(grid_w, grid_h)  # w first
    grid = np.stack(grid, axis=0).reshape(2, 1, gh, gw)
    emb_h = _1d(dim // 2, grid[1])
    emb_w = _1d(dim // 2, grid[0])
    return np.concatenate([emb_h, emb_w], axis=1)  # [gh*gw, dim]


class PixArtAttention(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x, context=None):
        c = self.cfg
        inner = c.hidden_size
        kv = x if context is None else context
        q = LoraDense(inner, dtype=c.dtype, name="to_q")(x)
        k = LoraDense(inner, dtype=c.dtype, name="to_k")(kv)
        v = LoraDense(inner, dtype=c.dtype, name="to_v")(kv)
        out = attention(q, k, v, c.num_heads)
        return LoraDense(inner, dtype=c.dtype, name="to_out_0")(out)


class PixArtFF(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x):
        from onetrainer_tpu.models.flux import GELUProj
        c = self.cfg
        x = GELUProj(c.hidden_size, c.dtype, name="net_0")(x)
        return LoraDense(c.hidden_size, dtype=c.dtype, name="net_2")(x)


class PixArtBlock(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x, context, t6):
        c = self.cfg
        # per-block learned table + shared conditioning (AdaLN-single)
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (6, c.hidden_size))
        mods = table[None] + t6.reshape(-1, 6, c.hidden_size)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            [mods[:, i] for i in range(6)]

        n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=c.dtype, name="norm1")(x)
        n = n * (1 + scale_msa[:, None]) + shift_msa[:, None]
        x = x + gate_msa[:, None] * PixArtAttention(c, name="attn1")(n)

        x = x + PixArtAttention(c, name="attn2")(x, context)

        n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=c.dtype, name="norm2")(x)
        n = n * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * PixArtFF(c, name="ff")(n)
        return x


class AdaLNSingle(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, timestep, resolution=None, aspect_ratio=None):
        """Returns (6*hidden modulation, embedded timestep) like diffusers
        AdaLayerNormSingle -- the final norm needs the pre-linear emb."""
        c = self.cfg
        t_emb = timestep_embedding(timestep, 256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        emb = _TimestepInner(c, name="emb")(t_emb, resolution, aspect_ratio)
        t6 = LoraDense(6 * c.hidden_size, dtype=c.dtype, name="linear")(
            nn.silu(emb))
        return t6, emb


class _TimestepInner(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, t_emb, resolution=None, aspect_ratio=None):
        c = self.cfg
        emb = MLPEmbedder(c.hidden_size, c.dtype,
                          name="timestep_embedder")(t_emb)
        if c.use_additional_conditions:
            # size_emb_dim = hidden//3: [B,2] resolution -> 2 chunks,
            # [B,1] aspect ratio -> 1 chunk, concatenated to hidden
            b = t_emb.shape[0]
            size_dim = c.hidden_size // 3
            res_proj = timestep_embedding(
                resolution.reshape(-1).astype(jnp.float32), 256,
                flip_sin_to_cos=True, downscale_freq_shift=0)
            res_emb = MLPEmbedder(size_dim, c.dtype,
                                  name="resolution_embedder")(res_proj)
            ar_proj = timestep_embedding(
                aspect_ratio.reshape(-1).astype(jnp.float32), 256,
                flip_sin_to_cos=True, downscale_freq_shift=0)
            ar_emb = MLPEmbedder(size_dim, c.dtype,
                                 name="aspect_ratio_embedder")(ar_proj)
            emb = emb + jnp.concatenate(
                [res_emb.reshape(b, -1), ar_emb.reshape(b, -1)], axis=1)
        return emb


class CaptionProjection(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, caption):
        c = self.cfg
        x = LoraDense(c.hidden_size, dtype=c.dtype, name="linear_1")(
            caption.astype(c.dtype))
        x = nn.gelu(x, approximate=True)
        return LoraDense(c.hidden_size, dtype=c.dtype, name="linear_2")(x)


class _PatchProj(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, latents):
        c = self.cfg
        p = c.patch_size
        return LoraConv(c.hidden_size, (p, p), strides=(p, p), padding="VALID",
                       dtype=c.dtype, name="proj")(latents.astype(c.dtype))


class _PixArtScanBody(nn.Module):
    cfg: "PixArtConfig"

    @nn.compact
    def __call__(self, x, ctx, t6):
        blk = nn.remat(PixArtBlock) \
            if self.cfg.gradient_checkpointing else PixArtBlock
        return blk(self.cfg, name="block")(x, ctx, t6), None


def _pixart_scan(cfg):
    return nn.scan(
        _PixArtScanBody,
        variable_axes={"params": 0, "lora": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast, nn.broadcast),
        length=cfg.num_layers)


class PixArtTransformer2D(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(
            self,
            latents: jnp.ndarray,    # [B, H, W, 4]
            timestep: jnp.ndarray,   # [B] int in [0,1000)
            context: jnp.ndarray,    # [B, S, caption_channels] (T5)
            resolution: jnp.ndarray | None = None,    # [B, 2] (h, w) px
            aspect_ratio: jnp.ndarray | None = None,  # [B, 1] h/w
    ) -> jnp.ndarray:
        c = self.cfg
        b, height, width, _ = latents.shape
        p = c.patch_size
        x = _PatchProj(c, name="pos_embed")(latents)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, c.hidden_size)
        pos = _sincos_pos_embed(c.hidden_size, gh, gw,
                                base_size=c.sample_size // p)
        x = x + jnp.asarray(pos, c.dtype)[None]

        t6, embedded_t = AdaLNSingle(c, name="adaln_single")(
            timestep.astype(jnp.float32), resolution, aspect_ratio)
        ctx = CaptionProjection(c, name="caption_projection")(context)

        if c.scan_layers:
            x, _ = _pixart_scan(c)(c, name="transformer_blocks")(x, ctx, t6)
        else:
            block_cls = PixArtBlock
            if c.gradient_checkpointing:
                block_cls = nn.remat(PixArtBlock)
            for i in range(c.num_layers):
                x = block_cls(c, name=f"transformer_blocks_{i}")(x, ctx, t6)

        # final AdaLN (2-entry table + embedded timestep) + projection
        # (diffusers: scale_shift_table[None] + embedded_timestep[:, None])
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (2, c.hidden_size))
        mods = table[None] + embedded_t.astype(jnp.float32)[:, None]
        shift, scale = mods[:, 0], mods[:, 1]
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=c.dtype, name="norm_out")(x)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = LoraDense(p * p * c.out_channels, dtype=jnp.float32, name="proj_out")(x)

        x = x.reshape(b, gh, gw, p, p, c.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, gh * p, gw * p, c.out_channels)
