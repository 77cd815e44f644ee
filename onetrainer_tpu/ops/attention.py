"""Attention dispatch: Pallas TPU flash attention for the hot path, XLA
`jax.nn.dot_product_attention` fallback everywhere else.

Replaces what torch SDP / flash-attn wheels provide in the reference
(reference: modules/modelSetup relies on torch sdp via diffusers).
Inputs are [batch, seq, heads*dim] packed; head split/merge happens here so
models stay layout-agnostic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _can_use_flash(q_len: int, kv_len: int, head_dim: int) -> bool:
    # Pallas flash kernel wants lane-aligned shapes; fall back for the tiny
    # text-encoder sequences where the XLA path is already optimal.
    return (
        jax.default_backend() == "tpu"
        and q_len >= 256 and q_len % 128 == 0
        and kv_len >= 256 and kv_len % 128 == 0
        and head_dim in (64, 128)
    )


@functools.lru_cache(maxsize=1)
def _flash_fn():
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
    return flash_attention


def dot_product_attention(
        q: jnp.ndarray,  # [B, Sq, H, D]
        k: jnp.ndarray,  # [B, Skv, H, D]
        v: jnp.ndarray,  # [B, Skv, H, D]
        mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-head attention over [B, S, H, D] tensors."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if mask is None and _can_use_flash(sq, skv, d):
        try:
            out = _flash_fn()(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                causal=False,
                sm_scale=1.0 / (d ** 0.5),
            )
            return out.transpose(0, 2, 1, 3)
        except Exception:
            pass
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


def attention(
        q: jnp.ndarray,  # [B, Sq, H*D]
        k: jnp.ndarray,  # [B, Skv, H*D_kv] (same inner dim)
        v: jnp.ndarray,
        num_heads: int,
        mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Packed multi-head attention: split heads, attend, merge heads."""
    b, sq, inner = q.shape
    head_dim = inner // num_heads
    q = q.reshape(b, sq, num_heads, head_dim)
    k = k.reshape(b, k.shape[1], num_heads, head_dim)
    v = v.reshape(b, v.shape[1], num_heads, head_dim)
    out = dot_product_attention(q, k, v, mask=mask)
    return out.reshape(b, sq, inner)
