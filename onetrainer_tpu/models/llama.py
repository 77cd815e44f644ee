"""Llama text encoder in flax (HunyuanVideo's primary conditioning model,
HiDream's fourth text encoder).

Standard Llama-3 decoder stack used as an encoder: GQA + RoPE, RMSNorm,
SiLU-gated MLP (reference: modules/model/util/llama_util.py — the
reference imports transformers LlamaModel; weight contract:
layers.{i}.self_attn.{q,k,v,o}_proj, mlp.{gate,up,down}_proj,
{input,post_attention}_layernorm, norm, embed_tokens).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from onetrainer_tpu.peft.layers import LoraDense


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    max_length: int = 256
    dtype: jnp.dtype = jnp.bfloat16


def llama3_8b_config(**overrides) -> LlamaConfig:
    return LlamaConfig(**overrides)


def _rms_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


class LlamaRMSNorm(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("scale", nn.initializers.ones, (self.features,))
        return _rms_norm(x, weight, self.eps)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, mask):
        from onetrainer_tpu.models.gemma import _rope
        c = self.cfg
        b, s, _ = x.shape
        q = LoraDense(c.num_heads * c.head_dim, use_bias=False, dtype=c.dtype,
                      name="q_proj")(x)
        k = LoraDense(c.num_kv_heads * c.head_dim, use_bias=False,
                      dtype=c.dtype, name="k_proj")(x)
        v = LoraDense(c.num_kv_heads * c.head_dim, use_bias=False,
                      dtype=c.dtype, name="v_proj")(x)
        q = q.reshape(b, s, c.num_heads, c.head_dim)
        k = k.reshape(b, s, c.num_kv_heads, c.head_dim)
        v = v.reshape(b, s, c.num_kv_heads, c.head_dim)
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        q = _rope(q, positions, c.rope_theta)
        k = _rope(k, positions, c.rope_theta)
        groups = c.num_heads // c.num_kv_heads
        k = jnp.repeat(k, groups, axis=2)
        v = jnp.repeat(v, groups, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (c.head_dim ** -0.5)
        logits = jnp.where(mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
        out = out.reshape(b, s, c.num_heads * c.head_dim).astype(c.dtype)
        return LoraDense(c.hidden_size, use_bias=False, dtype=c.dtype,
                         name="o_proj")(out)


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate = LoraDense(c.intermediate_size, use_bias=False, dtype=c.dtype,
                         name="gate_proj")(x)
        up = LoraDense(c.intermediate_size, use_bias=False, dtype=c.dtype,
                       name="up_proj")(x)
        return LoraDense(c.hidden_size, use_bias=False, dtype=c.dtype,
                         name="down_proj")(nn.silu(gate) * up)


class LlamaLayer(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = LlamaRMSNorm(c.hidden_size, c.rms_norm_eps,
                         name="input_layernorm")(x)
        x = x + LlamaAttention(c, name="self_attn")(h, mask)
        h = LlamaRMSNorm(c.hidden_size, c.rms_norm_eps,
                         name="post_attention_layernorm")(x)
        return x + LlamaMLP(c, name="mlp")(h)


class LlamaEncoder(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 extra_embeddings=None):
        c = self.cfg
        b, s = input_ids.shape
        table = self.param("embed_tokens", nn.initializers.normal(0.02),
                           (c.vocab_size, c.hidden_size))
        if extra_embeddings is not None:
            table = jnp.concatenate(
                [table, extra_embeddings.astype(table.dtype)], axis=0)
        x = table[input_ids].astype(c.dtype)

        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
        if attention_mask is not None:
            pad = attention_mask[:, None, None, :].astype(bool)
            mask = jnp.logical_and(causal, pad)
        else:
            mask = causal

        # transformers convention: states collected BEFORE each layer,
        # the final entry is the post-norm output — the pre-norm last-layer
        # output never appears (verified against torch in
        # tests/test_torch_parity.py)
        hidden_states = []
        for i in range(c.num_layers):
            hidden_states.append(x)
            x = LlamaLayer(c, name=f"layers_{i}")(x, mask)
        final = LlamaRMSNorm(c.hidden_size, c.rms_norm_eps, name="norm")(x)
        hidden_states.append(final)
        return {"hidden_states": hidden_states, "last_hidden_state": final}


def encode_llama_text(outputs: dict, layer_skip: int = 0,
                      default_layer: int = -3,
                      crop_start: int | None = None) -> jnp.ndarray:
    """hidden_states[default_layer - layer_skip], cropped past the prompt
    template (reference: llama_util.encode_llama:6-32; HunyuanVideo uses
    default_layer=-3 and crop_start=95)."""
    states = outputs["hidden_states"]
    picked = states[len(states) + default_layer - layer_skip]
    if crop_start is not None:
        picked = picked[:, crop_start:]
    return picked
