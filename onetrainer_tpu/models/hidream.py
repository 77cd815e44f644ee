"""HiDream-I1 transformer (MoE dual/single-stream DiT) in flax
(reference: modules/model/HiDreamModel.py imports the HiDream
transformer; conditioning contract from BaseHiDreamSetup.py:281-400 —
packed 2×2 latents, T5 states + per-layer llama states + concat CLIP-L/G
pooled, flow matching with a negated prediction).

Macro structure per the HiDream-I1 release: double-stream blocks attend
image and text jointly (text = [T5 tokens | llama layer-i tokens]), then
single-stream blocks run on the fused sequence; feed-forwards are
mixture-of-experts (shared expert + top-k routed experts) on the image
stream. Each block consumes a different llama layer (layer i for block i,
cycling), which is why the setup caches ALL llama hidden states.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from onetrainer_tpu.models.flux import RMSNorm, apply_rope, rope_tables
from onetrainer_tpu.models.unet import timestep_embedding
from onetrainer_tpu.peft.layers import LoraDense


@dataclass(frozen=True)
class HiDreamConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_layers: int = 16            # double-stream
    num_single_layers: int = 32
    hidden_size: int = 2560
    num_heads: int = 20
    head_dim: int = 128
    t5_dim: int = 4096
    llama_dim: int = 4096
    pooled_dim: int = 2048          # CLIP-L (768) + CLIP-G (1280)
    num_routed_experts: int = 4
    num_activated_experts: int = 2
    axes_dims_rope: tuple[int, ...] = (64, 32, 32)
    rope_theta: float = 10000.0
    gradient_checkpointing: bool = False
    # scan-over-layers (models/flux.py pattern): per-block caption
    # projections stay per-layer params outside the scan; their outputs
    # stack into a per-iteration xs input
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.bfloat16


def hidream_config(**overrides) -> HiDreamConfig:
    return HiDreamConfig(**overrides)


class _Expert(nn.Module):
    """SwiGLU expert (w1/w3 gate pair + w2 out; HiDream FF layout)."""
    hidden: int
    mult: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = int(self.hidden * self.mult * 2 / 3)
        gate = LoraDense(inner, use_bias=False, dtype=self.dtype, name="w1")(x)
        up = LoraDense(inner, use_bias=False, dtype=self.dtype, name="w3")(x)
        return LoraDense(self.hidden, use_bias=False, dtype=self.dtype,
                         name="w2")(nn.silu(gate) * up)


class MoEFeedForward(nn.Module):
    """Shared expert + top-k routed experts
    (HiDream MOEFeedForwardSwiGLU: shared_experts, experts.{i}, gate)."""
    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        shared = _Expert(c.hidden_size, dtype=c.dtype, name="shared_experts")(x)
        logits = LoraDense(c.num_routed_experts, use_bias=False,
                           dtype=jnp.float32, name="gate")(
            x.astype(jnp.float32))
        k = min(c.num_activated_experts, c.num_routed_experts)
        weights, idx = jax.lax.top_k(jax.nn.softmax(logits, axis=-1), k)
        weights = weights / jnp.maximum(
            weights.sum(axis=-1, keepdims=True), 1e-9)
        out = shared
        # dense mixture: every expert computes, routing masks combine —
        # MXU-friendly (no gather/scatter), exact same math as sparse routing
        for e in range(c.num_routed_experts):
            expert_out = _Expert(c.hidden_size, dtype=c.dtype,
                                 name=f"experts_{e}")(x)
            w = (weights * (idx == e)).sum(axis=-1)[..., None]
            out = out + expert_out * w.astype(expert_out.dtype)
        return out


class _HiDreamAttention(nn.Module):
    """Joint image/text attention with RMS q/k norms; text side uses the
    *_t projections (HiDream attn layout)."""
    cfg: HiDreamConfig
    joint: bool = True

    @nn.compact
    def __call__(self, img_n, txt_n, rope):
        from onetrainer_tpu.ops.attention import dot_product_attention
        c = self.cfg
        b = img_n.shape[0]
        cos, sin = rope

        def heads(x):
            return x.reshape(b, x.shape[1], c.num_heads, c.head_dim)

        q = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_q")(img_n))
        k = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_k")(img_n))
        v = heads(LoraDense(c.hidden_size, dtype=c.dtype, name="to_v")(img_n))
        q = RMSNorm(c.head_dim, c.dtype, name="q_rms_norm")(q)
        k = RMSNorm(c.head_dim, c.dtype, name="k_rms_norm")(k)
        s_img = img_n.shape[1]

        if self.joint and txt_n is not None:
            q_t = heads(LoraDense(c.hidden_size, dtype=c.dtype,
                                  name="to_q_t")(txt_n))
            k_t = heads(LoraDense(c.hidden_size, dtype=c.dtype,
                                  name="to_k_t")(txt_n))
            v_t = heads(LoraDense(c.hidden_size, dtype=c.dtype,
                                  name="to_v_t")(txt_n))
            q_t = RMSNorm(c.head_dim, c.dtype, name="q_rms_norm_t")(q_t)
            k_t = RMSNorm(c.head_dim, c.dtype, name="k_rms_norm_t")(k_t)
            q = jnp.concatenate([q, q_t], axis=1)
            k = jnp.concatenate([k, k_t], axis=1)
            v = jnp.concatenate([v, v_t], axis=1)

        # rope covers the full sequence ids (img 3D ids + zero text ids)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = dot_product_attention(q, k, v)
        out = out.reshape(b, out.shape[1], c.hidden_size)
        out_img = LoraDense(c.hidden_size, dtype=c.dtype,
                            name="to_out")(out[:, :s_img])
        if self.joint and txt_n is not None:
            out_txt = LoraDense(c.hidden_size, dtype=c.dtype,
                                name="to_out_t")(out[:, s_img:])
            return out_img, out_txt
        return out_img, None


class HiDreamDoubleBlock(nn.Module):
    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, img, txt, temb, rope):
        c = self.cfg
        mods = LoraDense(12 * c.hidden_size, dtype=c.dtype,
                         name="adaLN_modulation_1")(nn.silu(temb))
        (i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2,
         t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2) = \
            jnp.split(mods, 12, axis=-1)

        def norm(x, shift, scale):
            n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=c.dtype)(x)
            return n * (1 + scale[:, None]) + shift[:, None]

        img_n = norm(img, i_shift1, i_scale1)
        txt_n = norm(txt, t_shift1, t_scale1)
        a_img, a_txt = _HiDreamAttention(c, name="attn1")(img_n, txt_n, rope)
        img = img + i_gate1[:, None] * a_img
        txt = txt + t_gate1[:, None] * a_txt

        img = img + i_gate2[:, None] * MoEFeedForward(c, name="ff_i")(
            norm(img, i_shift2, i_scale2))
        txt = txt + t_gate2[:, None] * _Expert(
            c.hidden_size, dtype=c.dtype, name="ff_t")(
            norm(txt, t_shift2, t_scale2))
        return img, txt


class HiDreamSingleBlock(nn.Module):
    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, x, temb, rope):
        c = self.cfg
        mods = LoraDense(6 * c.hidden_size, dtype=c.dtype,
                         name="adaLN_modulation_1")(nn.silu(temb))
        shift1, scale1, gate1, shift2, scale2, gate2 = \
            jnp.split(mods, 6, axis=-1)

        def norm(v, shift, scale):
            n = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=c.dtype)(v)
            return n * (1 + scale[:, None]) + shift[:, None]

        a, _ = _HiDreamAttention(c, joint=False, name="attn1")(
            norm(x, shift1, scale1), None, rope)
        x = x + gate1[:, None] * a
        x = x + gate2[:, None] * MoEFeedForward(c, name="ff_i")(
            norm(x, shift2, scale2))
        return x


class _HiDreamDoubleScanBody(nn.Module):
    cfg: "HiDreamConfig"

    @nn.compact
    def __call__(self, img, txt, temb, rope):
        blk = nn.remat(HiDreamDoubleBlock) \
            if self.cfg.gradient_checkpointing else HiDreamDoubleBlock
        img, _ = blk(self.cfg, name="block")(img, txt, temb, rope)
        return img, None


class _HiDreamSingleScanBody(nn.Module):
    cfg: "HiDreamConfig"
    s_img: int

    @nn.compact
    def __call__(self, img, txt, temb, rope):
        blk = nn.remat(HiDreamSingleBlock) \
            if self.cfg.gradient_checkpointing else HiDreamSingleBlock
        x = jnp.concatenate([img, txt], axis=1)
        x = blk(self.cfg, name="block")(x, temb, rope)
        return x[:, :self.s_img], None


def _hidream_scan(body_cls, length):
    return nn.scan(
        body_cls,
        variable_axes={"params": 0, "lora": 0},
        split_rngs={"params": True},
        in_axes=(0, nn.broadcast, nn.broadcast),
        length=length)


class HiDreamTransformer2D(nn.Module):
    cfg: HiDreamConfig

    @nn.compact
    def __call__(
            self,
            packed_latents: jnp.ndarray,   # [B, S_img, in*p*p]
            timestep: jnp.ndarray,         # [B] in [0, 1000)
            t5_states: jnp.ndarray,        # [B, S_t5, 4096]
            llama_states: jnp.ndarray,     # [L, B, S_ll, 4096] (all layers)
            pooled: jnp.ndarray,           # [B, 2048]
            img_ids: jnp.ndarray,          # [S_img, 3]
    ) -> jnp.ndarray:
        c = self.cfg
        b, s_img, _ = packed_latents.shape

        img = LoraDense(c.hidden_size, dtype=c.dtype, name="x_embedder")(
            packed_latents.astype(c.dtype))
        t_emb = timestep_embedding(timestep.astype(jnp.float32), 256,
                                   flip_sin_to_cos=True, downscale_freq_shift=0)
        from onetrainer_tpu.models.flux import MLPEmbedder
        temb = MLPEmbedder(c.hidden_size, c.dtype, name="t_embedder")(
            t_emb.astype(c.dtype))
        temb = temb + LoraDense(c.hidden_size, dtype=c.dtype,
                                name="p_embedder")(pooled.astype(c.dtype))

        n_layers = llama_states.shape[0]
        total_blocks = c.num_layers + c.num_single_layers
        # per-block caption projections: one per block (llama layer i,
        # cycling) + the final one for T5
        t5_tokens = LoraDense(c.hidden_size, dtype=c.dtype,
                              name=f"caption_projection_{total_blocks}")(
            t5_states.astype(c.dtype))

        def llama_tokens(i):
            layer = llama_states[i % n_layers]
            return LoraDense(c.hidden_size, dtype=c.dtype,
                             name=f"caption_projection_{i}")(
                layer.astype(c.dtype))

        s_txt = t5_states.shape[1] + llama_states.shape[2]
        ids = jnp.concatenate(
            [img_ids, jnp.zeros((s_txt, 3), jnp.float32)], axis=0)
        rope = rope_tables(ids, c.axes_dims_rope, c.rope_theta)

        double_cls, single_cls = HiDreamDoubleBlock, HiDreamSingleBlock
        if c.gradient_checkpointing:
            double_cls = nn.remat(HiDreamDoubleBlock)
            single_cls = nn.remat(HiDreamSingleBlock)

        if c.scan_layers:
            # per-block txt streams precomputed (tiny matmuls; the block
            # bodies compile once under scan)
            txts_double = jnp.stack(
                [jnp.concatenate([t5_tokens, llama_tokens(i)], axis=1)
                 for i in range(c.num_layers)], axis=0)
            img, _ = _hidream_scan(_HiDreamDoubleScanBody, c.num_layers)(
                c, name="double_stream_blocks")(img, txts_double, temb, rope)
            txts_single = jnp.stack(
                [jnp.concatenate(
                    [t5_tokens, llama_tokens(c.num_layers + i)], axis=1)
                 for i in range(c.num_single_layers)], axis=0)
            img, _ = _hidream_scan(
                _HiDreamSingleScanBody, c.num_single_layers)(
                c, s_img, name="single_stream_blocks")(
                img, txts_single, temb, rope)
        else:
            for i in range(c.num_layers):
                txt = jnp.concatenate([t5_tokens, llama_tokens(i)], axis=1)
                img, _ = double_cls(c, name=f"double_stream_blocks_{i}")(
                    img, txt, temb, rope)

            for i in range(c.num_single_layers):
                block_index = c.num_layers + i
                txt = jnp.concatenate(
                    [t5_tokens, llama_tokens(block_index)], axis=1)
                x = jnp.concatenate([img, txt], axis=1)
                x = single_cls(c, name=f"single_stream_blocks_{i}")(
                    x, temb, rope)
                img = x[:, :s_img]

        # final adaLN + projection (HiDream final_layer)
        mods = LoraDense(2 * c.hidden_size, dtype=c.dtype,
                         name="final_layer_adaLN_modulation_1")(nn.silu(temb))
        shift, scale = jnp.split(mods, 2, axis=-1)
        img = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                           dtype=c.dtype)(img)
        img = img * (1 + scale[:, None]) + shift[:, None]
        return LoraDense(c.patch_size * c.patch_size * c.out_channels,
                         dtype=jnp.float32, name="final_layer_linear")(img)
