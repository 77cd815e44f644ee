"""CLIP / OpenCLIP text encoders in flax.

Covers SD1.5 (CLIP ViT-L text, quick-gelu), SD2.x (OpenCLIP ViT-H, gelu,
penultimate layer), SDXL TE2 (OpenCLIP ViT-bigG with text projection).
Weight-parity contract with `transformers.CLIPTextModel(WithProjection)`.

Supports hidden-state layer-skip and optional final layer norm like the
reference's encode path (reference: modules/model/util/clip_util.py:6-44),
plus additional trained embedding vectors appended to the token table
(reference: modules/module/AdditionalEmbeddingWrapper.py:12-75 — here a
pure concat, no monkey patching).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from onetrainer_tpu.ops.attention import attention
from onetrainer_tpu.peft.layers import LoraConv, LoraDense


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"      # SD2/SDXL-G: "gelu"
    projection_dim: int | None = None   # SDXL TE2: 1280
    eos_token_id: int = 49407
    dtype: jnp.dtype = jnp.bfloat16


def clip_vit_l_config(**overrides) -> CLIPTextConfig:
    """SD1.5 / SDXL TE1 / SD3 clip_l."""
    return CLIPTextConfig(**overrides)


def open_clip_vit_h_config(**overrides) -> CLIPTextConfig:
    """SD2.x."""
    kwargs = dict(hidden_size=1024, intermediate_size=4096, num_layers=23,
                  num_heads=16, hidden_act="gelu")
    kwargs.update(overrides)
    return CLIPTextConfig(**kwargs)


def clip_h_text_config(**overrides) -> CLIPTextConfig:
    """Würstchen v2 prior text encoder (CLIP-H/14 text tower, 24 layers)."""
    kwargs = dict(hidden_size=1024, intermediate_size=4096, num_layers=24,
                  num_heads=16, hidden_act="gelu")
    kwargs.update(overrides)
    return CLIPTextConfig(**kwargs)


def open_clip_vit_bigg_config(**overrides) -> CLIPTextConfig:
    """SDXL TE2 / SD3 clip_g (with projection)."""
    kwargs = dict(hidden_size=1280, intermediate_size=5120, num_layers=32,
                  num_heads=20, hidden_act="gelu", projection_dim=1280)
    kwargs.update(overrides)
    return CLIPTextConfig(**kwargs)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        q = LoraDense(c.hidden_size, dtype=c.dtype, name="q_proj")(x)
        k = LoraDense(c.hidden_size, dtype=c.dtype, name="k_proj")(x)
        v = LoraDense(c.hidden_size, dtype=c.dtype, name="v_proj")(x)
        out = attention(q, k, v, c.num_heads, mask=mask)
        return LoraDense(c.hidden_size, dtype=c.dtype, name="out_proj")(out)


class CLIPMLP(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = LoraDense(c.intermediate_size, dtype=c.dtype, name="fc1")(x)
        x = _act(c.hidden_act)(x)
        return LoraDense(c.hidden_size, dtype=c.dtype, name="fc2")(x)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="layer_norm2")(x)
        x = x + CLIPMLP(c, name="mlp")(h)
        return x


class CLIPTextModel(nn.Module):
    """Returns all hidden states so callers can layer-skip.

    `extra_embeddings` — optional [N, hidden] trained vectors appended to
    the token embedding table (textual inversion); token ids >= vocab_size
    index into it.
    """
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(
            self,
            input_ids: jnp.ndarray,           # [B, S] int32
            attention_mask: jnp.ndarray | None = None,  # [B, S] 1=keep
            extra_embeddings: jnp.ndarray | None = None,
    ):
        c = self.cfg
        b, s = input_ids.shape

        token_table = self.param(
            "token_embedding",
            nn.initializers.normal(0.02), (c.vocab_size, c.hidden_size))
        if extra_embeddings is not None:
            table = jnp.concatenate(
                [token_table, extra_embeddings.astype(token_table.dtype)], axis=0)
        else:
            table = token_table
        x = table[input_ids]

        pos_table = self.param(
            "position_embedding",
            nn.initializers.normal(0.02), (c.max_position_embeddings, c.hidden_size))
        x = (x + pos_table[None, :s]).astype(c.dtype)

        # causal mask (CLIP text is causal); combine with padding mask
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
        if attention_mask is not None:
            pad = attention_mask[:, None, None, :].astype(bool)
            mask = jnp.logical_and(causal, pad)
        else:
            mask = causal

        hidden_states = [x]
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, name=f"layers_{i}")(x, mask)
            hidden_states.append(x)

        final = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="final_layer_norm")(x)

        # pooled output: hidden state at the eos token (highest id per row
        # in HF; for trained extra tokens we use argmax of ==eos instead)
        eos_positions = jnp.argmax((input_ids == c.eos_token_id).astype(jnp.int32), axis=1)
        pooled = final[jnp.arange(b), eos_positions]
        if c.projection_dim is not None:
            pooled = LoraDense(c.projection_dim, use_bias=False,
                              dtype=jnp.float32, name="text_projection")(
                pooled.astype(jnp.float32))

        return {
            "hidden_states": hidden_states,  # embeddings + every layer output
            "last_hidden_state": final,
            "pooled_output": pooled,
        }


def encode_clip_text(
        outputs: dict,
        layer_skip: int = 0,
        add_layer_norm: bool = False,
        norm_fn=None,
) -> jnp.ndarray:
    """Pick the hidden state `layer_skip` layers before the end
    (reference: modules/model/util/clip_util.py:6-44). layer_skip=0 uses the
    final (pre-final-norm) layer output; SD2.x uses layer_skip=1
    (penultimate). `add_layer_norm` applies the final layer norm on the
    picked state like HF does when output_hidden_states is used."""
    states = outputs["hidden_states"]
    picked = states[len(states) - 1 - layer_skip]
    if add_layer_norm and norm_fn is not None:
        picked = norm_fn(picked)
    return picked


def apply_final_layer_norm(te_params: dict, x: jnp.ndarray,
                           eps: float = 1e-5) -> jnp.ndarray:
    """Apply the text encoder's final layer norm to a picked hidden state
    (reference: clip_util.encode_clip applies text_model.final_layer_norm
    when layer-skipping; Würstchen encode_text:243-248). Accepts either a
    raw params tree or a variables dict."""
    params = te_params.get("params", te_params) if isinstance(te_params, dict) \
        else te_params
    ln = params["final_layer_norm"]
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    return (y * ln["scale"] + ln["bias"]).astype(x.dtype)
