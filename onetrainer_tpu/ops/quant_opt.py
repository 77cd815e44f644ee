"""Block-wise int8 optimizer-state quantization — the TPU equivalent of
bitsandbytes' 8-bit optimizers (reference: modules/util/create.py *_8BIT
branches use bnb.optim.*8bit).

An optax wrapper: state leaves big enough to matter persist as int8 values
with per-block fp32 absmax scales (block 2048, like bnb); each update
dequantizes transiently, runs the inner optimizer, and requantizes. The
persistent HBM for Adam moments drops 4×; the transient fp32 copies live
only inside the fused update program."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

BLOCK = 2048


@jax.tree_util.register_pytree_node_class
class Q8State:
    """Quantized leaf: int8 values + per-block fp32 scales."""

    def __init__(self, values, scales, shape):
        self.values = values          # [n_blocks, BLOCK] int8
        self.scales = scales          # [n_blocks, 1] fp32
        self.shape = tuple(shape)     # original shape (static)

    def tree_flatten(self):
        return (self.values, self.scales), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        values, scales = children
        return cls(values, scales, shape)


def quantize_leaf(leaf: jnp.ndarray) -> Q8State:
    """Signed-sqrt block quantization: codes are spaced quadratically so
    tiny second-moment entries keep relative resolution (the role bnb's
    dynamic 8-bit map plays; linear absmax int8 zeroes them and Adam
    diverges)."""
    flat = leaf.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    padded = jnp.pad(flat, (0, pad))
    blocks = padded.reshape(-1, BLOCK)
    scales = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    normed = blocks / jnp.maximum(scales, 1e-30)
    codes = jnp.sign(normed) * jnp.sqrt(jnp.abs(normed)) * 127.0
    q = jnp.clip(jnp.round(codes), -127, 127).astype(jnp.int8)
    return Q8State(q, scales.astype(jnp.float32), leaf.shape)


def dequantize_leaf(q: Q8State) -> jnp.ndarray:
    codes = q.values.astype(jnp.float32) / 127.0
    blocks = jnp.sign(codes) * (codes * codes) * q.scales
    flat = blocks.reshape(-1)
    size = 1
    for dim in q.shape:
        size *= dim
    return flat[:size].reshape(q.shape)


def _is_q8(x) -> bool:
    return isinstance(x, Q8State)


def int8_optimizer_state(inner: optax.GradientTransformation,
                         min_size: int = 16384) -> optax.GradientTransformation:
    """Wrap `inner` so its large fp32 state leaves persist as int8."""

    def eligible(leaf) -> bool:
        return (hasattr(leaf, "dtype") and leaf.dtype == jnp.float32
                and leaf.size >= min_size)

    def compress(state):
        return jax.tree.map(
            lambda x: quantize_leaf(x) if eligible(x) else x, state)

    def decompress(state):
        return jax.tree.map(
            lambda x: dequantize_leaf(x) if _is_q8(x) else x, state,
            is_leaf=_is_q8)

    def init_fn(params):
        return compress(inner.init(params))

    def update_fn(updates, state, params=None):
        new_updates, new_state = inner.update(updates, decompress(state), params)
        return new_updates, compress(new_state)

    return optax.GradientTransformation(init_fn, update_fn)
