"""Weight quantization for frozen base models.

Replaces bitsandbytes NF4/INT8 and the custom FP8 linear in the reference
(reference: modules/util/quantization_util.py, modules/module/quantized/
LinearFp8.py:36-61 — absmax scale, dequantize per use). On TPU the
quantized tree halves (fp8/int8) the HBM for the frozen base during LoRA
training; dequantization happens inside the jitted step where XLA fuses
it into the adapter merge.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedArray(NamedTuple):
    """Per-tensor absmax-scaled quantized array."""
    q: jnp.ndarray        # fp8 / int8 storage
    scale: jnp.ndarray    # f32 scalar


def is_quantized(x) -> bool:
    return isinstance(x, QuantizedArray)


_FP8_MAX = 448.0   # e4m3 max normal
_INT8_MAX = 127.0


def quantize_array(x: jnp.ndarray, dtype=jnp.float8_e4m3fn) -> QuantizedArray:
    x32 = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12)
    qmax = _INT8_MAX if dtype == jnp.int8 else _FP8_MAX
    scale = absmax / qmax
    scaled = x32 / scale
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
    else:
        q = scaled.astype(dtype)
    return QuantizedArray(q=q, scale=scale.astype(jnp.float32))


def dequantize_array(x: QuantizedArray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (x.q.astype(jnp.float32) * x.scale).astype(dtype)


def maybe_dequantize(x, dtype=jnp.bfloat16):
    if is_quantized(x):
        return dequantize_array(x, dtype)
    return x


def quantize_tree(tree, dtype=jnp.float8_e4m3fn, min_size: int = 4096,
                  keep_dtype=jnp.bfloat16):
    """Quantize all float leaves with >= min_size elements; smaller leaves
    (norms, biases) are kept in keep_dtype — the same layer-selection
    policy as the reference's replace-linears pass."""
    def visit(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.size >= min_size and jnp.issubdtype(leaf.dtype, jnp.floating):
            return quantize_array(leaf, dtype)
        return leaf.astype(keep_dtype) if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf

    return jax.tree.map(visit, tree)


def dequantize_tree(tree, dtype=jnp.bfloat16):
    return jax.tree.map(
        lambda x: maybe_dequantize(x, dtype), tree,
        is_leaf=is_quantized)
