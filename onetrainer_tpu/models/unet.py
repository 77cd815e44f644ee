"""UNet2DCondition in flax — one implementation covering SD 1.5/2.x and SDXL
(incl. inpainting variants via in_channels=9, depth via in_channels=5).

TPU-native design notes:
- NHWC (channels-last) layout throughout: XLA's TPU conv emitter tiles
  NHWC onto the MXU without layout transposes.
- compute dtype bf16, params fp32 (cast per-op); no autocast machinery.
- gradient checkpointing = `nn.remat` on transformer/resnet blocks,
  replacing the reference's reentrant-checkpoint + offload conductor
  (reference: modules/util/checkpointing_util.py:67-424,
  modules/util/LayerOffloadConductor.py — deleted mechanism class, see
  SURVEY.md §7).
- module names mirror diffusers' (`down_blocks_0.attentions_1...`) so
  safetensors round-trip is a mechanical key transform
  (reference weight contract: modules/util/convert/convert_sd_diffusers_to_ckpt.py).

Weight-parity contract is with `diffusers.UNet2DConditionModel` configs for
runwayml/sd-v1-5, stabilityai/sd-2-1, and sdxl-base-1.0.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
from onetrainer_tpu.models.convpad import conv_padding
import jax.numpy as jnp

from onetrainer_tpu.ops.attention import attention
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    # True = block has cross-attention transformers
    cross_attn_blocks: tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    transformer_layers_per_block: tuple[int, ...] = (1, 1, 1, 1)
    num_heads: tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    addition_embed_dim: int | None = None        # SDXL: 256
    addition_pooled_dim: int | None = None       # SDXL: 1280 (TE2 pooled)
    addition_time_ids: int = 6                   # SDXL micro-conditioning ids
    gradient_checkpointing: bool = False
    # remat policy when checkpointing: "full" recomputes everything,
    # "dots" saves matmul outputs and recomputes only elementwise ops
    # (less recompute FLOPs, more HBM)
    remat_policy: str = "full"
    dtype: jnp.dtype = jnp.bfloat16


def _block_policy(cfg, depth_index: int) -> str:
    """Depth-dependent remat ("depth" policy): the deepest blocks hold
    most of the FLOPs but the smallest activations (32x32 tokens for
    SDXL @1024), so they save matmul outputs ("dots") while the
    high-resolution blocks recompute everything ("full")."""
    if cfg.remat_policy == "depth":
        n = len(cfg.block_out_channels)
        return "dots" if depth_index >= n - 1 else "full"
    return cfg.remat_policy


def _remat(cls, policy: str = "full"):
    import jax
    if policy == "tx_only":
        # transformer blocks full-remat, resnets saved (see _resnet_remat)
        return nn.remat(cls)
    if policy == "tx_attn":
        # tx_only + saved flash-attention outputs: the backward pass reuses
        # the (tiny, [B,S,inner]) attention outputs instead of re-running
        # the kernel — trades ~10 MB/attn of HBM for the recompute slice
        # of the attention traffic (ops/attention.py checkpoint_name)
        return nn.remat(
            cls,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"))
    # "dots" / "dots_nb" / "dots_nb_attn" / "attn" / "full": shared map
    # (models/remat.py). "dots_nb" is the middle ground between "full"
    # (recompute everything) and "dots" (OOM at SDXL@1024): weight-matmul
    # outputs saved, the big seq x seq attention buffers still recompute.
    from onetrainer_tpu.models.remat import remat as _shared_remat
    return _shared_remat(cls, policy)


def sd15_unet_config(**overrides) -> UNetConfig:
    return UNetConfig(**overrides)


def sd15_inpaint_unet_config(**overrides) -> UNetConfig:
    return UNetConfig(in_channels=9, **overrides)


def sd20_depth_unet_config(**overrides) -> UNetConfig:
    return sd21_unet_config(in_channels=5, **overrides)


def sd21_unet_config(**overrides) -> UNetConfig:
    kwargs = dict(
        num_heads=(5, 10, 20, 20),
        cross_attention_dim=1024,
        use_linear_projection=True,
    )
    kwargs.update(overrides)
    return UNetConfig(**kwargs)


def sd21_inpaint_unet_config(**overrides) -> UNetConfig:
    return sd21_unet_config(in_channels=9, **overrides)


def sdxl_unet_config(**overrides) -> UNetConfig:
    kwargs = dict(
        block_out_channels=(320, 640, 1280),
        cross_attn_blocks=(False, True, True),
        transformer_layers_per_block=(1, 2, 10),
        num_heads=(5, 10, 20),
        cross_attention_dim=2048,
        use_linear_projection=True,
        addition_embed_dim=256,
        addition_pooled_dim=1280,
    )
    kwargs.update(overrides)
    return UNetConfig(**kwargs)


def sdxl_inpaint_unet_config(**overrides) -> UNetConfig:
    return sdxl_unet_config(in_channels=9, **overrides)


# -- building blocks -----------------------------------------------------------


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal timestep features (diffusers Timesteps semantics)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = LoraDense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = LoraDense(self.out_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = LoraConv(self.out_channels, (3, 3), padding=conv_padding(1), dtype=self.dtype, name="conv1")(h)
        t = LoraDense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = LoraConv(self.out_channels, (3, 3), padding=conv_padding(1), dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = LoraConv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = x.shape[-1]
        q = LoraDense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = LoraDense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = LoraDense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        out = attention(q, k, v, self.num_heads)
        return LoraDense(inner, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = LoraDense(self.out_dim * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = GEGLU(dim * 4, dtype=self.dtype, name="net_0")(x)
        return LoraDense(dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.num_heads, dtype=self.dtype, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, dtype=self.dtype, name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    num_heads: int
    num_layers: int
    use_linear_projection: bool
    gradient_checkpointing: bool = False
    remat_policy: str = "full"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = LoraDense(c, dtype=self.dtype, name="proj_in")(x)
        else:
            x = LoraConv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)

        block_cls = BasicTransformerBlock
        if self.gradient_checkpointing:
            block_cls = _remat(BasicTransformerBlock, self.remat_policy)
        for i in range(self.num_layers):
            x = block_cls(self.num_heads, dtype=self.dtype,
                          name=f"transformer_blocks_{i}")(x, context)

        if self.use_linear_projection:
            x = LoraDense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = LoraConv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # torch Conv2d stride-2 with padding=1 pads both sides; replicate exactly
        return LoraConv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=conv_padding(((1, 1), (1, 1))), dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return LoraConv(self.out_channels, (3, 3), padding=conv_padding(1), dtype=self.dtype, name="conv")(x)


# -- down / mid / up blocks ------------------------------------------------------


class DownBlock(nn.Module):
    cfg: UNetConfig
    block_index: int

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.cfg
        out_ch = cfg.block_out_channels[self.block_index]
        has_attn = cfg.cross_attn_blocks[self.block_index]
        is_final = self.block_index == len(cfg.block_out_channels) - 1
        policy = _block_policy(cfg, self.block_index)

        resnet_cls = ResnetBlock
        if cfg.gradient_checkpointing and policy not in ("tx_only", "tx_attn"):
            resnet_cls = _remat(ResnetBlock, policy)

        hidden_states = []
        for i in range(cfg.layers_per_block):
            x = resnet_cls(out_ch, dtype=cfg.dtype, name=f"resnets_{i}")(x, temb)
            if has_attn:
                x = Transformer2D(
                    cfg.num_heads[self.block_index],
                    cfg.transformer_layers_per_block[self.block_index],
                    cfg.use_linear_projection,
                    cfg.gradient_checkpointing,
                    remat_policy=policy,
                    dtype=cfg.dtype,
                    name=f"attentions_{i}",
                )(x, context)
            hidden_states.append(x)
        if not is_final:
            x = Downsample(out_ch, dtype=cfg.dtype, name="downsamplers_0")(x)
            hidden_states.append(x)
        return x, hidden_states


class MidBlock(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.cfg
        out_ch = cfg.block_out_channels[-1]
        policy = _block_policy(cfg, len(cfg.block_out_channels) - 1)
        resnet_cls = ResnetBlock
        if cfg.gradient_checkpointing and policy not in ("tx_only", "tx_attn"):
            resnet_cls = _remat(ResnetBlock, policy)
        x = resnet_cls(out_ch, dtype=cfg.dtype, name="resnets_0")(x, temb)
        x = Transformer2D(
            cfg.num_heads[-1],
            cfg.transformer_layers_per_block[-1],
            cfg.use_linear_projection,
            cfg.gradient_checkpointing,
            remat_policy=policy,
            dtype=cfg.dtype,
            name="attentions_0",
        )(x, context)
        x = resnet_cls(out_ch, dtype=cfg.dtype, name="resnets_1")(x, temb)
        return x


class UpBlock(nn.Module):
    cfg: UNetConfig
    block_index: int  # in up-block order (0 = deepest)

    @nn.compact
    def __call__(self, x, skips, temb, context):
        cfg = self.cfg
        n = len(cfg.block_out_channels)
        rev = list(reversed(cfg.block_out_channels))
        out_ch = rev[self.block_index]
        # up block i has cross-attn if the mirrored down block has it
        has_attn = list(reversed(cfg.cross_attn_blocks))[self.block_index]
        transformer_layers = list(reversed(cfg.transformer_layers_per_block))[self.block_index]
        num_heads = list(reversed(cfg.num_heads))[self.block_index]
        is_final = self.block_index == n - 1
        policy = _block_policy(cfg, n - 1 - self.block_index)

        resnet_cls = ResnetBlock
        if cfg.gradient_checkpointing and policy not in ("tx_only", "tx_attn"):
            resnet_cls = _remat(ResnetBlock, policy)

        for i in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = resnet_cls(out_ch, dtype=cfg.dtype, name=f"resnets_{i}")(x, temb)
            if has_attn:
                x = Transformer2D(
                    num_heads,
                    transformer_layers,
                    cfg.use_linear_projection,
                    cfg.gradient_checkpointing,
                    remat_policy=policy,
                    dtype=cfg.dtype,
                    name=f"attentions_{i}",
                )(x, context)
        if not is_final:
            x = Upsample(out_ch, dtype=cfg.dtype, name="upsamplers_0")(x)
        return x


# -- the UNet --------------------------------------------------------------------


class UNet2DCondition(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(
            self,
            sample: jnp.ndarray,                 # [B, H, W, C_in] NHWC
            timesteps: jnp.ndarray,              # [B] int or float
            encoder_hidden_states: jnp.ndarray,  # [B, S, cross_dim]
            added_text_embeds: jnp.ndarray | None = None,  # SDXL pooled TE2 [B, 1280]
            added_time_ids: jnp.ndarray | None = None,     # SDXL [B, 6]
    ) -> jnp.ndarray:
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        time_dim = ch0 * 4

        temb = timestep_embedding(timesteps, ch0)
        temb = TimestepEmbedding(time_dim, dtype=cfg.dtype, name="time_embedding")(temb)

        if cfg.addition_embed_dim is not None:
            # SDXL text_time addition embedding: pooled text + Fourier(time_ids)
            time_ids_emb = timestep_embedding(
                added_time_ids.reshape(-1), cfg.addition_embed_dim)
            time_ids_emb = time_ids_emb.reshape(
                added_time_ids.shape[0], cfg.addition_time_ids * cfg.addition_embed_dim)
            add_emb = jnp.concatenate(
                [added_text_embeds.astype(jnp.float32), time_ids_emb], axis=-1)
            temb = temb + TimestepEmbedding(
                time_dim, dtype=cfg.dtype, name="add_embedding")(add_emb)

        context = encoder_hidden_states.astype(cfg.dtype)

        x = LoraConv(ch0, (3, 3), padding=conv_padding(1), dtype=cfg.dtype, name="conv_in")(
            sample.astype(cfg.dtype))

        skips = [x]
        for i in range(len(cfg.block_out_channels)):
            x, hidden = DownBlock(cfg, i, name=f"down_blocks_{i}")(x, temb, context)
            skips.extend(hidden)

        x = MidBlock(cfg, name="mid_block")(x, temb, context)

        for i in range(len(cfg.block_out_channels)):
            x = UpBlock(cfg, i, name=f"up_blocks_{i}")(x, skips, temb, context)

        x = nn.GroupNorm(32, epsilon=1e-5, dtype=cfg.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = LoraConv(cfg.out_channels, (3, 3), padding=conv_padding(1), dtype=jnp.float32, name="conv_out")(x)
        return x
