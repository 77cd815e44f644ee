"""HunyuanVideo transformer (3D dual/single-stream DiT) in flax
(reference: modules/model/HunyuanVideoModel.py imports diffusers
HunyuanVideoTransformer3DModel; weight contract follows the diffusers
module tree, which shares FLUX's block naming: transformer_blocks /
single_transformer_blocks / time_text_embed / norm_out / proj_out, plus
x_embedder.proj (conv3d patchify) and the llama token refiner under
context_embedder.*).

TPU notes: video latents [B, T, H, W, 16] patchify to tokens with
patch (1, 2, 2) — a Dense over 2×2-packed channels (the conv3d kernel is
1 in time, so it reshapes losslessly to a [64, dim] matrix at load).
3D RoPE over (t, y, x) with axes (16, 56, 56) on image tokens only; text
tokens ride behind the image tokens (reference order: img then txt).
Flow-matching target: flow = noise − x0
(reference: BaseHunyuanVideoSetup.py:232-277).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from onetrainer_tpu.models.flux import (
    AdaLayerNormZero, AdaLayerNormZeroSingle, AdaNormContinuous, MLPEmbedder,
    RMSNorm, TimeTextEmbed, apply_rope, rope_tables,
)
from onetrainer_tpu.models.remat import remat
from onetrainer_tpu.models.unet import timestep_embedding
from onetrainer_tpu.parallel.sp import (
    maybe_ring_attention, shard_heads, shard_seq,
)
from onetrainer_tpu.peft.layers import LoraDense

# the llama prompt template crop (reference: HunyuanVideoModel.py
# DEFAULT_PROMPT_TEMPLATE_CROP_START)
PROMPT_TEMPLATE_CROP_START = 95
DEFAULT_PROMPT_TEMPLATE = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: 1. The main content and theme of the "
    "video.2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects.3. Actions, events, behaviors temporal "
    "relationships, physical movement changes of the objects.4. background "
    "environment, light, style and atmosphere.5. camera angles, movements, "
    "and transitions used in the video:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
)


@dataclass(frozen=True)
class HunyuanVideoConfig:
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 20
    num_single_layers: int = 40
    num_refiner_layers: int = 2
    hidden_size: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    text_embed_dim: int = 4096        # llama
    pooled_projection_dim: int = 768  # CLIP-L pooled
    guidance_embeds: bool = True
    axes_dims_rope: tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 256.0
    patch_size: int = 2
    patch_size_t: int = 1
    gradient_checkpointing: bool = False
    remat_policy: str = "full"        # see models/remat.py
    # scan-over-layers (same pattern as models/flux.py scan_layers):
    # 20 double + 40 single blocks under lax.scan with stacked params
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.bfloat16


def hunyuan_video_config(**overrides) -> HunyuanVideoConfig:
    return HunyuanVideoConfig(**overrides)


def pack_video_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, T*(H/2)*(W/2), C*4] (patch 1×2×2)."""
    b, t, h, w, c = latents.shape
    x = latents.reshape(b, t, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 6, 3, 5)
    return x.reshape(b, t * (h // 2) * (w // 2), c * 4)


def unpack_video_latents(packed: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
    b, _, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, t, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 1, 2, 5, 3, 6, 4)
    return x.reshape(b, t, h, w, c)


def prepare_video_ids(t: int, height: int, width: int) -> jnp.ndarray:
    """[T*(H/2)*(W/2), 3] (t, y, x) position ids."""
    h2, w2 = height // 2, width // 2
    ids = jnp.zeros((t, h2, w2, 3), jnp.float32)
    ids = ids.at[..., 0].set(jnp.arange(t, dtype=jnp.float32)[:, None, None])
    ids = ids.at[..., 1].set(jnp.arange(h2, dtype=jnp.float32)[None, :, None])
    ids = ids.at[..., 2].set(jnp.arange(w2, dtype=jnp.float32)[None, None, :])
    return ids.reshape(t * h2 * w2, 3)


class _RefinerAttention(nn.Module):
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, h, mask):
        from onetrainer_tpu.ops.attention import dot_product_attention
        c = self.cfg
        b, s, _ = h.shape
        q = LoraDense(c.hidden_size, dtype=c.dtype, name="to_q")(h)
        k = LoraDense(c.hidden_size, dtype=c.dtype, name="to_k")(h)
        v = LoraDense(c.hidden_size, dtype=c.dtype, name="to_v")(h)
        attn_mask = mask[:, None, None, :].astype(bool) \
            if mask is not None else None
        nh = c.num_heads
        out = dot_product_attention(
            q.reshape(b, s, nh, -1), k.reshape(b, s, nh, -1),
            v.reshape(b, s, nh, -1), mask=attn_mask).reshape(b, s, -1)
        return LoraDense(c.hidden_size, dtype=c.dtype, name="to_out_0")(out)


class _SiluProj(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = LoraDense(4 * self.hidden, dtype=self.dtype, name="proj")(x)
        return nn.silu(x)


class _RefinerFF(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = _SiluProj(self.hidden, self.dtype, name="net_0")(x)
        return LoraDense(self.hidden, dtype=self.dtype, name="net_2")(x)


class _GateLinear(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, temb):
        return LoraDense(2 * self.hidden, dtype=self.dtype,
                         name="linear")(nn.silu(temb))


class TokenRefinerBlock(nn.Module):
    """Self-attention + MLP with timestep/pooled gating over the llama
    states (diffusers HunyuanVideoIndividualTokenRefinerBlock)."""
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, x, temb, mask):
        c = self.cfg
        gates = _GateLinear(c.hidden_size, c.dtype, name="norm_out")(temb)
        gate_msa, gate_mlp = jnp.split(gates, 2, axis=-1)

        h = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="norm1")(x)
        x = x + gate_msa * _RefinerAttention(c, name="attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="norm2")(x)
        return x + gate_mlp * _RefinerFF(c.hidden_size, c.dtype,
                                         name="ff")(h)


class _RefinerTimeText(nn.Module):
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, timestep, pooled):
        c = self.cfg
        t_emb = timestep_embedding(timestep, 256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        temb = MLPEmbedder(c.hidden_size, c.dtype,
                           name="timestep_embedder")(t_emb.astype(c.dtype))
        return temb + MLPEmbedder(c.hidden_size, c.dtype,
                                  name="text_embedder")(pooled.astype(c.dtype))


class _RefinerStack(nn.Module):
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, x, temb, mask):
        for i in range(self.cfg.num_refiner_layers):
            x = TokenRefinerBlock(self.cfg, name=f"refiner_blocks_{i}")(
                x, temb, mask)
        return x


class TokenRefiner(nn.Module):
    """Llama-context refiner conditioned on timestep + mask-mean-pooled
    text states (diffusers HunyuanVideoTokenRefiner)."""
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, text_states, timestep, mask):
        c = self.cfg
        if mask is None:
            pooled = text_states.mean(axis=1)
        else:
            m = mask.astype(jnp.float32)[..., None]
            pooled = (text_states.astype(jnp.float32) * m).sum(axis=1) \
                / jnp.maximum(m.sum(axis=1), 1.0)
        temb = _RefinerTimeText(c, name="time_text_embed")(timestep, pooled)
        x = LoraDense(c.hidden_size, dtype=c.dtype, name="proj_in")(
            text_states.astype(c.dtype))
        return _RefinerStack(c, name="token_refiner")(
            x, temb[:, None, :], mask)


class HunyuanJointAttention(nn.Module):
    """Joint attention over [img tokens | txt tokens]; rope on img only,
    padded txt tokens masked (diffusers HunyuanVideoAttnProcessor2_0)."""
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, img_n, txt_n, rope, txt_mask):
        from onetrainer_tpu.ops.attention import dot_product_attention
        c = self.cfg
        b, s_img, _ = img_n.shape
        s_txt = txt_n.shape[1]
        cos, sin = rope

        def heads(x):
            return x.reshape(b, x.shape[1], c.num_heads, c.head_dim)

        q_i = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_q")(img_n))
        k_i = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_k")(img_n))
        v_i = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_v")(img_n))
        q_i = RMSNorm(c.head_dim, c.dtype, name="norm_q")(q_i)
        k_i = RMSNorm(c.head_dim, c.dtype, name="norm_k")(k_i)
        q_i = apply_rope(q_i, cos, sin)
        k_i = apply_rope(k_i, cos, sin)

        q_t = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="add_q_proj")(txt_n))
        k_t = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="add_k_proj")(txt_n))
        v_t = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="add_v_proj")(txt_n))
        q_t = RMSNorm(c.head_dim, c.dtype, name="norm_added_q")(q_t)
        k_t = RMSNorm(c.head_dim, c.dtype, name="norm_added_k")(k_t)

        q = jnp.concatenate([q_i, q_t], axis=1)
        k = jnp.concatenate([k_i, k_t], axis=1)
        v = jnp.concatenate([v_i, v_t], axis=1)
        keep = None
        if txt_mask is not None:
            keep = jnp.concatenate(
                [jnp.ones((b, s_img), bool), txt_mask.astype(bool)], axis=1)
        # context parallelism: ring attention when heads can't split over
        # "sp" (or OT_RING_ATTENTION=1); otherwise the Ulysses reshard —
        # [B,S,H,Dh] seq- to head-parallel (XLA all-to-all), every head
        # attends over the full sequence
        out = maybe_ring_attention(q, k, v, kv_mask=keep)
        if out is None:
            q, k, v = shard_heads(q), shard_heads(k), shard_heads(v)
            mask = keep[:, None, None, :] if keep is not None else None
            out = dot_product_attention(q, k, v, mask=mask)
        out = shard_seq(out.reshape(b, s_img + s_txt, c.hidden_size))
        out_img = LoraDense(c.hidden_size, dtype=c.dtype,
                            name="to_out_0")(out[:, :s_img])
        out_txt = LoraDense(c.hidden_size, dtype=c.dtype,
                            name="to_add_out")(out[:, s_img:])
        return out_img, out_txt


class HunyuanDoubleBlock(nn.Module):
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, img, txt, temb, rope, txt_mask):
        c = self.cfg
        img_n, img_gate, img_shift_mlp, img_scale_mlp, img_gate_mlp = \
            AdaLayerNormZero(c.hidden_size, c.dtype, name="norm1")(img, temb)
        txt_n, txt_gate, txt_shift_mlp, txt_scale_mlp, txt_gate_mlp = \
            AdaLayerNormZero(c.hidden_size, c.dtype, name="norm1_context")(txt, temb)

        out_img, out_txt = HunyuanJointAttention(c, name="attn")(
            img_n, txt_n, rope, txt_mask)
        img = img + img_gate[:, None] * out_img
        txt = txt + txt_gate[:, None] * out_txt

        def pre_norm(x, shift, scale):
            n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=c.dtype)(x)
            return n * (1 + scale[:, None]) + shift[:, None]

        from onetrainer_tpu.models.flux import GeluMLP
        img = img + img_gate_mlp[:, None] * GeluMLP(
            c.hidden_size, c.dtype, name="ff")(
            pre_norm(img, img_shift_mlp, img_scale_mlp))
        txt = txt + txt_gate_mlp[:, None] * GeluMLP(
            c.hidden_size, c.dtype, name="ff_context")(
            pre_norm(txt, txt_shift_mlp, txt_scale_mlp))
        return img, txt


class _HunyuanSingleAttention(nn.Module):
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, normed, rope, keep_mask, s_img: int):
        from onetrainer_tpu.ops.attention import dot_product_attention
        c = self.cfg
        b, s, _ = normed.shape
        cos, sin = rope

        def heads(t):
            return t.reshape(b, s, c.num_heads, c.head_dim)

        q = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_q")(normed))
        k = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_k")(normed))
        v = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_v")(normed))
        q = RMSNorm(c.head_dim, c.dtype, name="norm_q")(q)
        k = RMSNorm(c.head_dim, c.dtype, name="norm_k")(k)
        # rope on the image prefix only
        q = jnp.concatenate([apply_rope(q[:, :s_img], cos, sin), q[:, s_img:]], 1)
        k = jnp.concatenate([apply_rope(k[:, :s_img], cos, sin), k[:, s_img:]], 1)
        # ring attention (CP) when heads can't split over "sp"; else the
        # Ulysses head-parallel reshard
        out = maybe_ring_attention(q, k, v, kv_mask=keep_mask)
        if out is None:
            q, k, v = shard_heads(q), shard_heads(k), shard_heads(v)
            mask = keep_mask[:, None, None, :] \
                if keep_mask is not None else None
            out = dot_product_attention(q, k, v, mask=mask)
        return shard_seq(out.reshape(b, s, -1))


class HunyuanSingleBlock(nn.Module):
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, x, temb, rope, keep_mask, s_img: int):
        c = self.cfg
        normed, gate = AdaLayerNormZeroSingle(c.hidden_size, c.dtype,
                                              name="norm")(x, temb)
        attn = _HunyuanSingleAttention(c, name="attn")(
            normed, rope, keep_mask, s_img)

        mlp = LoraDense(4 * c.hidden_size, dtype=c.dtype, name="proj_mlp")(normed)
        mlp = nn.gelu(mlp, approximate=True)
        out = LoraDense(c.hidden_size, dtype=c.dtype, name="proj_out")(
            jnp.concatenate([attn, mlp], axis=-1))
        return x + gate[:, None] * out


class _XEmbedder(nn.Module):
    """Patchify projection; the diffusers conv3d (1,2,2) kernel reshapes
    losslessly to this Dense at load (io/hunyuan_checkpoints)."""
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, packed):
        return LoraDense(self.cfg.hidden_size, dtype=self.cfg.dtype,
                         name="proj")(packed.astype(self.cfg.dtype))


class _HunyuanDoubleScanBody(nn.Module):
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, carry, temb, rope, txt_mask):
        img, txt = carry
        blk = remat(HunyuanDoubleBlock, self.cfg.remat_policy) \
            if self.cfg.gradient_checkpointing else HunyuanDoubleBlock
        img, txt = blk(self.cfg, name="block")(img, txt, temb, rope, txt_mask)
        img = shard_seq(img)
        return (img, txt), None


class _HunyuanSingleScanBody(nn.Module):
    cfg: HunyuanVideoConfig
    s_img: int

    @nn.compact
    def __call__(self, x, temb, rope, keep_mask):
        blk = remat(HunyuanSingleBlock, self.cfg.remat_policy,
                    static_argnums=(5,)) \
            if self.cfg.gradient_checkpointing else HunyuanSingleBlock
        x = blk(self.cfg, name="block")(x, temb, rope, keep_mask, self.s_img)
        return shard_seq(x), None


def _hv_scan(body_cls, length: int, n_broadcast: int):
    return nn.scan(
        body_cls,
        variable_axes={"params": 0, "lora": 0},
        split_rngs={"params": True},
        in_axes=tuple([nn.broadcast] * n_broadcast),
        length=length)


class HunyuanVideoTransformer3D(nn.Module):
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(
            self,
            latents: jnp.ndarray,            # [B, T, H, W, 16]
            timestep: jnp.ndarray,           # [B] in [0, 1000)
            text_states: jnp.ndarray,        # [B, S_txt, 4096] llama (cropped)
            text_mask: jnp.ndarray | None,   # [B, S_txt]
            pooled: jnp.ndarray,             # [B, 768] CLIP pooled
            guidance: jnp.ndarray | None = None,  # [B] (×1000 upstream)
    ) -> jnp.ndarray:
        c = self.cfg
        b, t, h, w, _ = latents.shape
        packed = pack_video_latents(latents)

        img = _XEmbedder(c, name="x_embedder")(packed)
        # sequence parallelism: img tokens shard over the "sp" mesh axis
        # from here on; txt tokens are short and stay replicated
        img = shard_seq(img)
        txt = TokenRefiner(c, name="context_embedder")(
            text_states, timestep.astype(jnp.float32), text_mask)

        if guidance is None:
            guidance = jnp.full((b,), 1000.0, jnp.float32)
        # flux TimeTextEmbed shares the diffusers layout exactly
        # (timestep_embedder + guidance_embedder + text_embedder)
        temb = TimeTextEmbed(c, name="time_text_embed")(
            timestep.astype(jnp.float32), guidance.astype(jnp.float32), pooled)

        ids = prepare_video_ids(t, h, w)
        rope = rope_tables(ids, c.axes_dims_rope, c.rope_theta)
        s_img = img.shape[1]
        keep_mask = None
        if text_mask is not None:
            keep_mask = jnp.concatenate(
                [jnp.ones((b, s_img), bool), text_mask.astype(bool)], axis=1)

        if c.scan_layers:
            (img, txt), _ = _hv_scan(_HunyuanDoubleScanBody, c.num_layers, 3)(
                c, name="transformer_blocks")((img, txt), temb, rope,
                                              text_mask)
            x = shard_seq(jnp.concatenate([img, txt], axis=1))
            x, _ = _hv_scan(_HunyuanSingleScanBody, c.num_single_layers, 3)(
                c, s_img, name="single_transformer_blocks")(
                x, temb, rope, keep_mask)
        else:
            double_cls, single_cls = HunyuanDoubleBlock, HunyuanSingleBlock
            if c.gradient_checkpointing:
                double_cls = remat(HunyuanDoubleBlock, c.remat_policy)
                single_cls = remat(HunyuanSingleBlock, c.remat_policy,
                                   static_argnums=(5,))

            for i in range(c.num_layers):
                img, txt = double_cls(c, name=f"transformer_blocks_{i}")(
                    img, txt, temb, rope, text_mask)
                img = shard_seq(img)

            x = jnp.concatenate([img, txt], axis=1)   # img first
            x = shard_seq(x)
            for i in range(c.num_single_layers):
                x = single_cls(c, name=f"single_transformer_blocks_{i}")(
                    x, temb, rope, keep_mask, s_img)
                x = shard_seq(x)
        img = x[:, :s_img]

        img = AdaNormContinuous(c.hidden_size, c.dtype, name="norm_out")(img, temb)
        out = LoraDense(c.patch_size * c.patch_size * c.patch_size_t
                        * c.out_channels, dtype=jnp.float32, name="proj_out")(img)
        return unpack_video_latents(out, t, h, w)
