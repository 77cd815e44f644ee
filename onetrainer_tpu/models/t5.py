"""T5 (v1.1) encoder stack in flax — the FLUX/SD3 text encoder.

Weight-parity contract with `transformers.T5EncoderModel`
(google/t5-v1_1-xxl): RMS layer norms, relative position bias on the
first block, gated-gelu MLP, no biases anywhere.
(reference usage: modules/model/util/t5_util.py encode_t5)
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from onetrainer_tpu.ops.attention import attention
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16


def t5_xxl_config(**overrides) -> T5Config:
    return T5Config(**overrides)


class T5LayerNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        x = x.astype(jnp.float32) / jnp.sqrt(var + self.epsilon)
        return (scale * x).astype(self.dtype)


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    # encoder (bidirectional): half the buckets for negative positions
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        q = LoraDense(inner, use_bias=False, dtype=c.dtype, name="q")(x)
        k = LoraDense(inner, use_bias=False, dtype=c.dtype, name="k")(x)
        v = LoraDense(inner, use_bias=False, dtype=c.dtype, name="v")(x)

        if self.has_relative_bias:
            s = x.shape[1]
            bias_table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (c.relative_attention_num_buckets, c.num_heads))
            ctx_pos = jnp.arange(s)[:, None]
            mem_pos = jnp.arange(s)[None, :]
            buckets = _relative_position_bucket(
                mem_pos - ctx_pos, c.relative_attention_num_buckets,
                c.relative_attention_max_distance)
            position_bias = bias_table[buckets].transpose(2, 0, 1)[None]  # [1,H,S,S]

        b, s, _ = q.shape
        qh = q.reshape(b, s, c.num_heads, c.d_kv)
        kh = k.reshape(b, s, c.num_heads, c.d_kv)
        vh = v.reshape(b, s, c.num_heads, c.d_kv)
        # T5 does NOT scale by 1/sqrt(d); fold bias in via the bias arg
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                            kh.astype(jnp.float32))
        if position_bias is not None:
            logits = logits + position_bias.astype(jnp.float32)
        weights = jnp.exp(logits - logits.max(-1, keepdims=True))
        weights = weights / weights.sum(-1, keepdims=True)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(c.dtype), vh)
        out = out.reshape(b, s, inner)
        out = LoraDense(c.d_model, use_bias=False, dtype=c.dtype, name="o")(out)
        return out, position_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        c = self.cfg
        # layer.0: self attention
        h = T5LayerNorm(c.layer_norm_epsilon, c.dtype, name="ln_attn")(x)
        attn_out, position_bias = T5Attention(
            c, self.has_relative_bias, name="attention")(h, position_bias)
        x = x + attn_out
        # layer.1: gated-gelu MLP
        h = T5LayerNorm(c.layer_norm_epsilon, c.dtype, name="ln_mlp")(x)
        wi0 = LoraDense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_0")(h)
        wi1 = LoraDense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + LoraDense(c.d_model, use_bias=False, dtype=c.dtype, name="wo")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, extra_embeddings=None,
                 layer_skip: int = 0):
        """layer_skip > 0 returns the output of block (num_layers-1-skip)
        with the final layer norm re-applied — the reference's encode_t5
        semantics (modules/model/util/t5_util.py:6-29: hidden_states
        [-1-skip] + add_layer_norm). The skipped blocks are simply not
        run, which XLA turns into a smaller program (the torch reference
        must run them all and discard)."""
        c = self.cfg
        table = self.param("shared", nn.initializers.normal(1.0),
                           (c.vocab_size, c.d_model))
        if extra_embeddings is not None:
            # trained textual-inversion rows appended past the vocab
            table = jnp.concatenate(
                [table, extra_embeddings.astype(table.dtype)], axis=0)
        x = table[input_ids].astype(c.dtype)
        position_bias = None
        run_blocks = max(c.num_layers - max(int(layer_skip), 0), 1)
        for i in range(run_blocks):
            x, position_bias = T5Block(
                c, has_relative_bias=(i == 0), name=f"block_{i}")(x, position_bias)
        x = T5LayerNorm(c.layer_norm_epsilon, c.dtype, name="final_layer_norm")(x)
        return x
