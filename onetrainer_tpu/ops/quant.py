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
    return isinstance(x, (QuantizedArray, NF4Array))


def logical_shape(x) -> tuple:
    """The unquantized tensor shape of a (possibly quantized) leaf.

    QuantizedArray storage keeps the original shape; NF4Array packs codes
    flat, so the shape lives in its aux data — for the scan-stacked form
    (vmap'd quantize_nf4: q [L, packed], per-slice aux shape) the leading
    layer axis is prepended."""
    if isinstance(x, NF4Array):
        if x.q.ndim == 2:
            return (x.q.shape[0],) + tuple(x.shape)
        return tuple(x.shape)
    if isinstance(x, QuantizedArray):
        return tuple(x.q.shape)
    return tuple(x.shape)


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
    # scale is a scalar per tensor, or [L] for scan-stacked trees (one
    # absmax per layer) — broadcast it against the leading axes of q
    scale = x.scale
    if scale.ndim and scale.ndim < x.q.ndim:
        scale = scale.reshape(scale.shape + (1,) * (x.q.ndim - scale.ndim))
    return (x.q.astype(jnp.float32) * scale).astype(dtype)


def maybe_dequantize(x, dtype=jnp.bfloat16):
    if isinstance(x, NF4Array):
        return dequantize_nf4(x, dtype)
    if isinstance(x, QuantizedArray):
        return dequantize_array(x, dtype)
    return x


def _is_scan_stacked_subtree(v) -> bool:
    """The OT_SCAN_LAYERS stacked layout is `{prefix: {"block": tree}}` with
    a leading layer axis on every leaf (io/torch_flax.stack_scanned_blocks).
    nn.scan(variable_axes={"params": 0}) slices those leaves per layer, so
    their quantization must be per-layer too (scale [L], codes [L, ...]) —
    a scalar scale cannot be sliced along the layer axis."""
    return isinstance(v, dict) and set(v.keys()) == {"block"}


def quantize_tree(tree, dtype=jnp.float8_e4m3fn, min_size: int = 4096,
                  keep_dtype=jnp.bfloat16):
    """Quantize float weight leaves (ndim >= 2) with >= min_size
    elements; 1-D leaves (biases, norm scales) and small tensors are kept
    in keep_dtype — the same layer-selection policy as the reference's
    replace-linears pass (weights only, bitsandbytes semantics).

    Only leaves named `kernel` (flax Dense/Conv weights, all consumed
    through peft/layers.py's dequant hook) are quantized — exactly the
    reference's bitsandbytes replace-LINEARS semantics. Embedding/pos
    tables are ndim>=2 but consumed raw (e.g. SD3's pos_embed reshape),
    so quantizing them breaks the model (found at SD3 scale, r3).

    Scan-stacked subtrees (`{prefix: {"block": ...}}`, see
    _is_scan_stacked_subtree) are quantized per layer along axis 0 via
    vmap so nn.scan can slice the quantized leaves layer by layer."""
    def visit(leaf, stacked=False, key=None):
        leaf = jnp.asarray(leaf)
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        min_ndim = 3 if stacked else 2
        per_item = leaf.size // leaf.shape[0] if stacked and leaf.ndim else leaf.size
        if key == "kernel" and leaf.ndim >= min_ndim and per_item >= min_size:
            if stacked:
                if dtype == "nf4":
                    return jax.vmap(quantize_nf4)(leaf)
                return jax.vmap(lambda x: quantize_array(x, dtype))(leaf)
            if dtype == "nf4":
                return quantize_nf4(leaf)
            return quantize_array(leaf, dtype)
        return leaf.astype(keep_dtype)

    def visit_tree(tree, stacked=False):
        out = {}
        for k, v in tree.items():
            if _is_scan_stacked_subtree(v):
                out[k] = {"block": visit_tree(v["block"], stacked=True)}
            elif isinstance(v, dict):
                out[k] = visit_tree(v, stacked=stacked)
            else:
                out[k] = visit(v, stacked=stacked, key=k)
        return out

    if isinstance(tree, dict):
        return visit_tree(tree)
    # the kernel-name gate needs dict keys; a keyless jax.tree.map would
    # silently quantize NOTHING (every leaf just cast to keep_dtype)
    raise TypeError(
        f"quantize_tree expects a plain-dict param tree, got {type(tree)}; "
        "convert FrozenDict/other containers with dict(...) first")


def dequantize_tree(tree, dtype=jnp.bfloat16):
    return jax.tree.map(
        lambda x: maybe_dequantize(x, dtype), tree,
        is_leaf=is_quantized)


# -- NF4 (4-bit NormalFloat, bitsandbytes QLoRA) --------------------------------------

# the 16-level NF4 codebook (Dettmers et al., QLoRA arXiv:2305.14314 —
# quantiles of N(0,1) normalized to [-1, 1]; identical to bitsandbytes)
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)
NF4_BLOCK = 64   # bnb default blocksize


@jax.tree_util.register_pytree_node_class
class NF4Array:
    """Block-wise NF4: packed 4-bit codes (two per uint8) + per-block
    absmax scales. 4x smaller than bf16 for the frozen base."""

    def __init__(self, q, scales, shape, block: int = NF4_BLOCK):
        self.q = q              # uint8 [ceil(n/2)]  (or [L, ...] stacked)
        self.scales = scales    # f32 [n_blocks]     (or [L, n_blocks])
        self.shape = tuple(shape)
        self.block = int(block)

    def tree_flatten(self):
        return (self.q, self.scales), (self.shape, self.block)

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, block = aux
        return cls(children[0], children[1], shape, block)


def quantize_nf4(x: jnp.ndarray, block: int = NF4_BLOCK) -> NF4Array:
    """Half-split packed layout: byte j carries element j (high nibble)
    and element j + n/2 (low nibble), with n padded so both halves tile
    the Pallas dequant kernel cleanly (ops/nf4_pallas.py). Scales stay
    block-`block` absmax over the original element order — bitwise the
    same quantization as bitsandbytes NF4, only the in-memory code order
    differs (we never serialize this form)."""
    from onetrainer_tpu.ops.nf4_pallas import nf4_pad_len
    x32 = jnp.ravel(x.astype(jnp.float32))
    n = x32.size
    total = nf4_pad_len(n) if block == NF4_BLOCK else n + ((-n) % (2 * block))
    x32 = jnp.pad(x32, (0, total - n)).reshape(-1, block)
    scales = jnp.maximum(jnp.max(jnp.abs(x32), axis=1), 1e-12)   # [nb]
    normed = x32 / scales[:, None]                               # [-1, 1]
    code = jnp.asarray(NF4_CODE, jnp.float32)
    # nearest codebook entry via the midpoint boundaries
    mids = (code[1:] + code[:-1]) / 2.0
    idx = jnp.searchsorted(mids, normed).astype(jnp.uint8)       # [nb, block]
    flat = idx.reshape(-1)
    half = total // 2
    packed = (flat[:half] << 4) | flat[half:]
    return NF4Array(q=packed, scales=scales.astype(jnp.float32),
                    shape=x.shape, block=block)


def dequantize_nf4(x: NF4Array, dtype=jnp.bfloat16) -> jnp.ndarray:
    if x.q.ndim == 2:
        # scan-stacked [L, packed] / [L, nb]: per-layer dequant, one layer
        # per leading-axis slice (quantize_tree's vmap(quantize_nf4) layout)
        return jax.vmap(
            lambda q, s: dequantize_nf4(NF4Array(q, s, x.shape, x.block),
                                        dtype))(x.q, x.scales)
    n = 1
    for d in x.shape:
        n *= d
    if x.block == NF4_BLOCK and jax.default_backend() == "tpu":
        # gather-free Pallas kernel (16 selects instead of per-weight
        # gathers — the gathers were the >30 min compile at SDXL scale)
        from onetrainer_tpu.ops.nf4_pallas import nf4_dequant_flat
        vals = nf4_dequant_flat(x.q, x.scales, out_dtype=dtype)
        return vals[:n].reshape(x.shape)
    code = jnp.asarray(NF4_CODE, jnp.float32)
    hi = (x.q >> 4).astype(jnp.int32)
    lo = (x.q & 0xF).astype(jnp.int32)
    idx = jnp.concatenate([hi, lo])            # half-split layout
    vals = code[idx].reshape(-1, x.block) * x.scales[:, None]
    return vals.reshape(-1)[:n].reshape(x.shape).astype(dtype)
