"""FLUX.1 rectified-flow DiT in flax.

Weight-parity contract with `diffusers.FluxTransformer2DModel` (dev/fill):
double-stream blocks (img+txt joint attention, AdaLN-Zero) followed by
single-stream blocks, 3-axis RoPE, guidance embedding, 2x2 latent packing
(reference: modules/model/FluxModel.py:300-340 pack/unpack/img-ids,
modules/modelSetup/BaseFluxSetup.py predict/flow).

TPU notes: all sequence work happens at 128-aligned packed lengths; RoPE
tables are computed in fp32 at trace time from static shapes; joint
attention runs as one fused pass over [txt, img] so the MXU sees a single
large matmul per block.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from onetrainer_tpu.models.remat import remat
from onetrainer_tpu.models.unet import timestep_embedding
from onetrainer_tpu.ops.attention import dot_product_attention
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64            # packed: 16 latent ch x 2x2
    out_channels: int = 64
    num_layers: int = 19             # double-stream blocks
    num_single_layers: int = 38
    hidden_size: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    joint_attention_dim: int = 4096  # T5 width
    pooled_projection_dim: int = 768 # CLIP-L pooled
    guidance_embeds: bool = True
    axes_dims_rope: tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    gradient_checkpointing: bool = False
    remat_policy: str = "full"       # see models/remat.py
    # scan-over-layers: the 19+38 homogeneous blocks run under lax.scan
    # with stacked [L, ...] params — the block body is traced/compiled
    # once instead of L times (the canonical TPU DiT layout; throughput
    # is unchanged, compile time and HLO size drop by ~L). Checkpoints
    # stay per-layer on disk; io/torch_flax.stack_scanned_blocks converts.
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.bfloat16


def flux_dev_config(**overrides) -> FluxConfig:
    return FluxConfig(**overrides)


def flux_fill_config(**overrides) -> FluxConfig:
    # fill: 16 latent + 16 masked-latent + 32 mask channels, packed x4
    return FluxConfig(in_channels=384, **overrides)


# -- latent packing (reference: FluxModel.pack_latents:319 / unpack:333) ---------------

def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] NHWC -> [B, H/2*W/2, C*4] (2x2 patches)."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h2, w2, c, 2, 2
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(packed: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[B, H/2*W/2, C*4] -> [B, H, W, C]."""
    b, _, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, height // 2, width // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, height, width, c)


def prepare_latent_image_ids(height: int, width: int) -> jnp.ndarray:
    """[H/2*W/2, 3] (0, y, x) position ids
    (reference: FluxModel.prepare_latent_image_ids:300)."""
    h2, w2 = height // 2, width // 2
    ids = jnp.zeros((h2, w2, 3), jnp.float32)
    ids = ids.at[..., 1].set(jnp.arange(h2, dtype=jnp.float32)[:, None])
    ids = ids.at[..., 2].set(jnp.arange(w2, dtype=jnp.float32)[None, :])
    return ids.reshape(h2 * w2, 3)


def rope_tables(ids: jnp.ndarray, axes_dims: tuple[int, ...],
                theta: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ids [S, 3] -> (cos, sin) [S, head_dim] with interleaved pair layout."""
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        angles = ids[:, axis:axis + 1] * freqs[None, :]     # [S, dim/2]
        cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)
        sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
        cos_parts.append(cos)
        sin_parts.append(sin)
    return jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, D] with interleaved real/imag pairs on D."""
    x32 = x.astype(jnp.float32)
    x_rot = jnp.stack([-x32[..., 1::2], x32[..., ::2]], axis=-1).reshape(x32.shape)
    out = x32 * cos[None, :, None, :] + x_rot * sin[None, :, None, :]
    return out.astype(x.dtype)


# -- modules --------------------------------------------------------------------------

class RMSNorm(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # param named 'scale' so the generic rank-1 weight->scale key rule
        # (io.torch_flax) round-trips diffusers RMSNorm weights
        weight = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        x = x.astype(jnp.float32) / jnp.sqrt(var + 1e-6)
        return (x * weight).astype(self.dtype)


class MLPEmbedder(nn.Module):
    """diffusers TimestepEmbedding / PixArtAlphaTextProjection shape."""
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = LoraDense(self.hidden, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return LoraDense(self.hidden, dtype=self.dtype, name="linear_2")(x)


class TimeTextEmbed(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, timestep, guidance, pooled):
        c = self.cfg
        t_emb = timestep_embedding(timestep * 1000.0, 256,
                                   flip_sin_to_cos=True, downscale_freq_shift=0)
        emb = MLPEmbedder(c.hidden_size, c.dtype, name="timestep_embedder")(t_emb)
        if c.guidance_embeds:
            g_emb = timestep_embedding(guidance * 1000.0, 256,
                                       flip_sin_to_cos=True, downscale_freq_shift=0)
            emb = emb + MLPEmbedder(c.hidden_size, c.dtype,
                                    name="guidance_embedder")(g_emb)
        emb = emb + MLPEmbedder(c.hidden_size, c.dtype,
                                name="text_embedder")(pooled.astype(jnp.float32))
        return emb


class AdaLayerNormZero(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        emb = LoraDense(6 * self.hidden, dtype=self.dtype, name="linear")(nn.silu(temb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(emb, 6, axis=-1)
        normed = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                              dtype=self.dtype, name="norm")(x)
        out = normed * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return out, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        emb = LoraDense(3 * self.hidden, dtype=self.dtype, name="linear")(nn.silu(temb))
        shift_msa, scale_msa, gate_msa = jnp.split(emb, 3, axis=-1)
        normed = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                              dtype=self.dtype, name="norm")(x)
        return normed * (1 + scale_msa[:, None]) + shift_msa[:, None], gate_msa


class JointAttention(nn.Module):
    """Double-stream joint attention (diffusers FluxAttnProcessor layout:
    to_q/k/v for the image stream, add_*_proj for text, RMS q/k norms)."""
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img_n, txt_n, rope):
        c = self.cfg
        h, d = c.num_heads, c.head_dim
        inner = h * d
        cos, sin = rope
        s_txt = txt_n.shape[1]

        def heads(x):
            return x.reshape(x.shape[0], x.shape[1], h, d)

        q_i = heads(LoraDense(inner, dtype=c.dtype, name="to_q")(img_n))
        k_i = heads(LoraDense(inner, dtype=c.dtype, name="to_k")(img_n))
        v_i = heads(LoraDense(inner, dtype=c.dtype, name="to_v")(img_n))
        q_t = heads(LoraDense(inner, dtype=c.dtype, name="add_q_proj")(txt_n))
        k_t = heads(LoraDense(inner, dtype=c.dtype, name="add_k_proj")(txt_n))
        v_t = heads(LoraDense(inner, dtype=c.dtype, name="add_v_proj")(txt_n))

        q_i = RMSNorm(d, c.dtype, name="norm_q")(q_i)
        k_i = RMSNorm(d, c.dtype, name="norm_k")(k_i)
        q_t = RMSNorm(d, c.dtype, name="norm_added_q")(q_t)
        k_t = RMSNorm(d, c.dtype, name="norm_added_k")(k_t)

        q = apply_rope(jnp.concatenate([q_t, q_i], axis=1), cos, sin)
        k = apply_rope(jnp.concatenate([k_t, k_i], axis=1), cos, sin)
        v = jnp.concatenate([v_t, v_i], axis=1)

        attn = dot_product_attention(q, k, v)
        attn = attn.reshape(attn.shape[0], attn.shape[1], inner)
        attn_txt, attn_img = attn[:, :s_txt], attn[:, s_txt:]
        out_img = LoraDense(c.hidden_size, dtype=c.dtype, name="to_out_0")(attn_img)
        out_txt = LoraDense(c.hidden_size, dtype=c.dtype, name="to_add_out")(attn_txt)
        return out_img, out_txt


class SingleAttention(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, normed, rope):
        c = self.cfg
        h, d = c.num_heads, c.head_dim
        inner = h * d
        cos, sin = rope
        q = LoraDense(inner, dtype=c.dtype, name="to_q")(normed)
        k = LoraDense(inner, dtype=c.dtype, name="to_k")(normed)
        v = LoraDense(inner, dtype=c.dtype, name="to_v")(normed)
        q = q.reshape(q.shape[0], q.shape[1], h, d)
        k = k.reshape(k.shape[0], k.shape[1], h, d)
        v = v.reshape(v.shape[0], v.shape[1], h, d)
        q = apply_rope(RMSNorm(d, c.dtype, name="norm_q")(q), cos, sin)
        k = apply_rope(RMSNorm(d, c.dtype, name="norm_k")(k), cos, sin)
        attn = dot_product_attention(q, k, v)
        return attn.reshape(attn.shape[0], attn.shape[1], inner)


class GeluMLP(nn.Module):
    """diffusers FeedForward(activation='gelu-approximate'): net.0.proj, net.2."""
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = LoraDense(4 * self.hidden, dtype=self.dtype, name="net_0")(x) \
            if False else GELUProj(self.hidden, self.dtype, name="net_0")(x)
        return LoraDense(self.hidden, dtype=self.dtype, name="net_2")(x)


class GELUProj(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = LoraDense(4 * self.hidden, dtype=self.dtype, name="proj")(x)
        return nn.gelu(x, approximate=True)


class FluxDoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, temb, rope):
        c = self.cfg
        img_n, img_gate, img_shift_mlp, img_scale_mlp, img_gate_mlp = \
            AdaLayerNormZero(c.hidden_size, c.dtype, name="norm1")(img, temb)
        txt_n, txt_gate, txt_shift_mlp, txt_scale_mlp, txt_gate_mlp = \
            AdaLayerNormZero(c.hidden_size, c.dtype, name="norm1_context")(txt, temb)

        out_img, out_txt = JointAttention(c, name="attn")(img_n, txt_n, rope)
        img = img + img_gate[:, None] * out_img
        txt = txt + txt_gate[:, None] * out_txt

        def pre_norm(x, shift, scale):
            n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=c.dtype)(x)
            return n * (1 + scale[:, None]) + shift[:, None]

        img = img + img_gate_mlp[:, None] * GeluMLP(
            c.hidden_size, c.dtype, name="ff")(
            pre_norm(img, img_shift_mlp, img_scale_mlp))
        txt = txt + txt_gate_mlp[:, None] * GeluMLP(
            c.hidden_size, c.dtype, name="ff_context")(
            pre_norm(txt, txt_shift_mlp, txt_scale_mlp))
        return img, txt


class FluxSingleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, temb, rope):
        c = self.cfg
        normed, gate = AdaLayerNormZeroSingle(c.hidden_size, c.dtype,
                                              name="norm")(x, temb)
        attn = SingleAttention(c, name="attn")(normed, rope)
        mlp = LoraDense(4 * c.hidden_size, dtype=c.dtype, name="proj_mlp")(normed)
        mlp = nn.gelu(mlp, approximate=True)
        out = LoraDense(c.hidden_size, dtype=c.dtype, name="proj_out")(
            jnp.concatenate([attn, mlp], axis=-1))
        return x + gate[:, None] * out


class AdaNormContinuous(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        emb = LoraDense(2 * self.hidden, dtype=self.dtype,
                       name="linear")(nn.silu(temb))
        scale, shift = jnp.split(emb, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=self.dtype)(x)
        return x * (1 + scale[:, None]) + shift[:, None]


class _ScanDoubleBody(nn.Module):
    """nn.scan body for the double-stream stack: carry = (img, txt);
    temb/rope broadcast. Params live under <name>/block with a leading
    layer axis (variable_axes={"params": 0, "lora": 0})."""
    cfg: FluxConfig

    @nn.compact
    def __call__(self, carry, temb, rope):
        img, txt = carry
        blk = remat(FluxDoubleBlock, self.cfg.remat_policy) \
            if self.cfg.gradient_checkpointing else FluxDoubleBlock
        img, txt = blk(self.cfg, name="block")(img, txt, temb, rope)
        return (img, txt), None


class _ScanSingleBody(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, temb, rope):
        blk = remat(FluxSingleBlock, self.cfg.remat_policy) \
            if self.cfg.gradient_checkpointing else FluxSingleBlock
        return blk(self.cfg, name="block")(x, temb, rope), None


def _scan(body_cls, length: int):
    return nn.scan(
        body_cls,
        variable_axes={"params": 0, "lora": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast, nn.broadcast),
        length=length)


class FluxTransformer2D(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(
            self,
            packed_latents: jnp.ndarray,     # [B, S_img, in_channels]
            timestep: jnp.ndarray,           # [B] in [0, 1]
            pooled: jnp.ndarray,             # [B, 768] CLIP pooled
            t5_states: jnp.ndarray,          # [B, S_txt, 4096]
            img_ids: jnp.ndarray,            # [S_img, 3]
            txt_ids: jnp.ndarray | None = None,  # [S_txt, 3] (zeros)
            guidance: jnp.ndarray | None = None,  # [B]
    ) -> jnp.ndarray:
        c = self.cfg
        if txt_ids is None:
            txt_ids = jnp.zeros((t5_states.shape[1], 3), jnp.float32)
        if guidance is None:
            guidance = jnp.ones_like(timestep)

        img = LoraDense(c.hidden_size, dtype=c.dtype, name="x_embedder")(
            packed_latents.astype(c.dtype))
        txt = LoraDense(c.hidden_size, dtype=c.dtype, name="context_embedder")(
            t5_states.astype(c.dtype))
        temb = TimeTextEmbed(c, name="time_text_embed")(
            timestep.astype(jnp.float32), guidance.astype(jnp.float32), pooled)

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope = rope_tables(ids, c.axes_dims_rope, c.rope_theta)

        if c.scan_layers:
            (img, txt), _ = _scan(_ScanDoubleBody, c.num_layers)(
                c, name="transformer_blocks")((img, txt), temb, rope)
            x = jnp.concatenate([txt, img], axis=1)
            x, _ = _scan(_ScanSingleBody, c.num_single_layers)(
                c, name="single_transformer_blocks")(x, temb, rope)
            img = x[:, txt.shape[1]:]
        else:
            double_cls = FluxDoubleBlock
            single_cls = FluxSingleBlock
            if c.gradient_checkpointing:
                double_cls = remat(FluxDoubleBlock, c.remat_policy)
                single_cls = remat(FluxSingleBlock, c.remat_policy)

            for i in range(c.num_layers):
                img, txt = double_cls(c, name=f"transformer_blocks_{i}")(
                    img, txt, temb, rope)

            x = jnp.concatenate([txt, img], axis=1)
            for i in range(c.num_single_layers):
                x = single_cls(c, name=f"single_transformer_blocks_{i}")(
                    x, temb, rope)
            img = x[:, txt.shape[1]:]

        img = AdaNormContinuous(c.hidden_size, c.dtype, name="norm_out")(img, temb)
        return LoraDense(c.out_channels, dtype=jnp.float32, name="proj_out")(img)
