"""Gemma2 text encoder in flax (Sana's conditioning model).

Decoder-only transformer used as an encoder: GQA with RoPE, attention
logit soft-capping, sandwich RMSNorms, GeGLU MLP
(reference: modules/model/util/gemma_util.py — the reference imports
transformers Gemma2Model; architecture re-derived to the same weight
contract: layers.{i}.self_attn.{q,k,v,o}_proj, mlp.{gate,up,down}_proj,
{input,post_attention,pre_feedforward,post_feedforward}_layernorm, norm).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from onetrainer_tpu.peft.layers import LoraDense


@dataclass(frozen=True)
class Gemma2Config:
    vocab_size: int = 256000
    hidden_size: int = 2304
    intermediate_size: int = 9216
    num_layers: int = 26
    num_heads: int = 8
    num_kv_heads: int = 4
    head_dim: int = 256
    rope_theta: float = 10000.0
    attn_logit_softcapping: float = 50.0
    query_pre_attn_scalar: float = 256.0
    rms_norm_eps: float = 1e-6
    max_length: int = 300
    dtype: jnp.dtype = jnp.bfloat16


def gemma2_2b_config(**overrides) -> Gemma2Config:
    return Gemma2Config(**overrides)


def _rms_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    # gemma convention: scale by (1 + weight)
    return (y * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


class GemmaRMSNorm(nn.Module):
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("scale", nn.initializers.zeros, (self.features,))
        return _rms_norm(x, weight, self.eps)


def _rope(x, positions, theta):
    # x: [B, S, H, D]
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions.astype(jnp.float32)[:, :, None] * freqs[None, None]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class Gemma2Attention(nn.Module):
    cfg: Gemma2Config

    @nn.compact
    def __call__(self, x, mask):
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

        scale = c.query_pre_attn_scalar ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * scale
        if c.attn_logit_softcapping:
            cap = c.attn_logit_softcapping
            logits = cap * jnp.tanh(logits / cap)
        logits = jnp.where(mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
        out = out.reshape(b, s, c.num_heads * c.head_dim).astype(c.dtype)
        return LoraDense(c.hidden_size, use_bias=False, dtype=c.dtype,
                         name="o_proj")(out)


class Gemma2MLP(nn.Module):
    cfg: Gemma2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate = LoraDense(c.intermediate_size, use_bias=False, dtype=c.dtype,
                         name="gate_proj")(x)
        up = LoraDense(c.intermediate_size, use_bias=False, dtype=c.dtype,
                       name="up_proj")(x)
        h = nn.gelu(gate, approximate=True) * up
        return LoraDense(c.hidden_size, use_bias=False, dtype=c.dtype,
                         name="down_proj")(h)


class Gemma2Layer(nn.Module):
    cfg: Gemma2Config

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = GemmaRMSNorm(c.hidden_size, c.rms_norm_eps,
                         name="input_layernorm")(x)
        h = Gemma2Attention(c, name="self_attn")(h, mask)
        h = GemmaRMSNorm(c.hidden_size, c.rms_norm_eps,
                         name="post_attention_layernorm")(h)
        x = x + h
        h = GemmaRMSNorm(c.hidden_size, c.rms_norm_eps,
                         name="pre_feedforward_layernorm")(x)
        h = Gemma2MLP(c, name="mlp")(h)
        h = GemmaRMSNorm(c.hidden_size, c.rms_norm_eps,
                         name="post_feedforward_layernorm")(h)
        return x + h


class Gemma2Encoder(nn.Module):
    cfg: Gemma2Config

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
        x = table[input_ids].astype(c.dtype) * jnp.asarray(
            c.hidden_size ** 0.5, c.dtype)

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
            x = Gemma2Layer(c, name=f"layers_{i}")(x, mask)

        final = GemmaRMSNorm(c.hidden_size, c.rms_norm_eps, name="norm")(x)
        hidden_states.append(final)
        return {"hidden_states": hidden_states, "last_hidden_state": final}


def encode_gemma_text(outputs: dict, layer_skip: int = 0) -> jnp.ndarray:
    """hidden_states[-1 - layer_skip]; [-1] is post final norm
    (reference: gemma_util.encode_gemma — earlier layers get the final norm
    applied there; callers use apply_gemma_final_norm for that)."""
    states = outputs["hidden_states"]
    return states[len(states) - 1 - layer_skip]


def apply_gemma_final_norm(te_params: dict, x: jnp.ndarray,
                           eps: float = 1e-6) -> jnp.ndarray:
    """Apply the encoder's final RMSNorm to a layer-skipped hidden state
    (reference: gemma_util.encode_gemma:26-28)."""
    params = te_params.get("params", te_params)
    return _rms_norm(x, params["norm"]["scale"], eps)
