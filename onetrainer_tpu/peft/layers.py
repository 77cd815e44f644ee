"""LoRA-aware Dense/Conv flax modules.

The round-1 design merged adapters into a full copy of the base weights
(`apply_peft`) inside the step. Correct, but costly on big models: the
merged tree doubles weight HBM (SDXL bf16: +5.2 GB) and the backward pass
materializes a dense dW for every adapted layer before contracting it to
rank r. These modules instead apply the low-rank term *functionally inside
the layer*:

    y = x @ W  +  ((x @ downᵀ) @ upᵀ) · (α/r)

so the only extra state is the rank-r factors and the only extra backward
work is two rank-r contractions (dL/d_up = gᵀ(x @ downᵀ),
dL/d_down = (g @ up)ᵀ x). DoRA/LoHa still build their per-layer delta, but
transiently inside the (remat'd) layer instead of as a second full tree.

Adapters arrive through a separate flax variable collection "lora", nested
like the params tree, so the model code stays checkpoint-key compatible:
`module.apply({"params": base, "lora": col}, ...)`. Without the collection
these modules behave exactly like nn.Dense / nn.Conv.

(reference: modules/module/LoRAModule.py applies LoRA via forward hooks —
same math, different mechanism; see peft/lora.py for the layout contract.)
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import initializers
from flax.linen.dtypes import promote_dtype

default_kernel_init = initializers.lecun_normal()


def _get_kernel(module: nn.Module, init_fn, shape, param_dtype, dtype):
    """The base kernel, dequantized when the frozen tree carries a
    quantized form (fp8/int8/NF4 — ops/quant.py). Dequantization happens
    transiently inside the layer; under remat the bf16 copy is recomputed
    in the backward pass, so HBM holds only the packed form. Quantized
    values bypass `self.param` (flax's leaf-shape validation rejects
    NF4's packed layout) via direct variable access."""
    from onetrainer_tpu.ops.quant import is_quantized, maybe_dequantize
    if module.has_variable("params", "kernel"):
        value = module.get_variable("params", "kernel")
        if is_quantized(value):
            return maybe_dequantize(value, dtype or jnp.bfloat16)
    return module.param("kernel", init_fn, shape, param_dtype)


def _lora_entry(module: nn.Module) -> dict | None:
    """The adapter entry for this module from the 'lora' collection."""
    for leaf in ("lora_down", "hada_w1_a"):
        if module.has_variable("lora", leaf):
            break
    else:
        return None
    entry = {}
    for name in ("lora_down", "lora_up", "dora_scale", "dora_eps",
                 "hada_w1_a", "hada_w1_b", "hada_w2_a", "hada_w2_b"):
        if module.has_variable("lora", name):
            entry[name] = module.get_variable("lora", name)
    return entry


def _delta_2d(entry: dict) -> jnp.ndarray:
    """Dense delta in torch layout [out, fan_in], fp32. `lora_down` /
    `hada_w1_b` arrive pre-scaled by α/r (see adapters_to_lora_collection)."""
    if "hada_w1_a" in entry:
        w1b = entry["hada_w1_b"].astype(jnp.float32)
        w2b = entry["hada_w2_b"].astype(jnp.float32)
        w1b = w1b.reshape(w1b.shape[0], -1)
        w2b = w2b.reshape(w2b.shape[0], -1)
        w1 = entry["hada_w1_a"].astype(jnp.float32) @ w1b
        w2 = entry["hada_w2_a"].astype(jnp.float32) @ w2b
        return w1 * w2
    down = entry["lora_down"].astype(jnp.float32)
    down = down.reshape(down.shape[0], -1)
    return entry["lora_up"].astype(jnp.float32) @ down


def _adapter_y(entry: dict | None, xp: jnp.ndarray, dtype) -> jnp.ndarray | None:
    """The additive adapter term for a dense layer (LoRA low-rank or LoHa
    delta), or None. DoRA is handled by its merged-weight path instead."""
    if entry is None:
        return None
    if "hada_w1_a" in entry:
        delta = _delta_2d(entry)         # [out, in] fp32, transient
        (delta,) = promote_dtype(delta, dtype=dtype)
        return xp @ delta.T
    down, up = promote_dtype(
        entry["lora_down"], entry["lora_up"], dtype=dtype)
    return (xp @ down.T) @ up.T


def _fp8_acts_kernel(module: nn.Module, entry: dict | None):
    """The frozen fp8 base kernel when the OT_FP8_ACTS path applies
    (ops/fp8_acts.py: activation operand quantized to e4m3 so the
    producer→matmul HBM edge is 1 byte/elem), else None. DoRA needs the
    merged bf16 weight, so it never takes this path."""
    from onetrainer_tpu.ops import fp8_acts
    if not fp8_acts.mode():
        return None
    if entry is not None and "dora_scale" in entry:
        return None
    if not module.has_variable("params", "kernel"):
        return None
    from onetrainer_tpu.ops.quant import QuantizedArray
    value = module.get_variable("params", "kernel")
    if not isinstance(value, QuantizedArray):
        return None
    if value.q.dtype != jnp.float8_e4m3fn or value.q.ndim != 2 \
            or value.scale.ndim != 0:
        return None
    fp8_acts.STATS["fp8_dot"] += 1
    return value


def _dora_weight(kernel_2d: jnp.ndarray, entry: dict,
                 conv_geom: tuple[int, int, int] | None = None) -> jnp.ndarray:
    """DoRA: m · (W + ΔW)/‖W + ΔW‖ in torch layout [out, fan_in]
    (reference: LoRAModule.py:334-419, norm detached from the graph).

    For conv layers (conv_geom = (cin, kh, kw)) the reference norms per
    out channel over (in,kh,kw) or per in channel over (out,kh,kw)
    (LoRAModule.py:399-411), so the 2-D column norm is wrong there; the
    dora_scale tensor keeps the reference's own shape ([out,1,1,1] /
    [1,in,1,1] for conv, [out,1] / [1,in] for linear)."""
    wp = kernel_2d + _delta_2d(entry)
    scale = entry["dora_scale"].astype(jnp.float32)
    output_axis = scale.shape[0] != 1
    eps = entry.get("dora_eps", jnp.float32(0.0))
    if conv_geom is not None:
        cin, kh, kw = conv_geom
        wp4 = wp.reshape(wp.shape[0], cin, kh, kw)              # OIHW
        axes = (1, 2, 3) if output_axis else (0, 2, 3)
        norm = jax.lax.stop_gradient(jnp.sqrt(
            (wp4 * wp4).sum(axis=axes, keepdims=True))) + eps
        wp4 = scale.reshape(norm.shape) * wp4 / norm
        return wp4.reshape(wp.shape[0], -1)
    axis = 1 if output_axis else 0
    norm = jax.lax.stop_gradient(
        jnp.linalg.norm(wp, axis=axis, keepdims=True)) + eps
    return scale.reshape(norm.shape) * wp / norm


class LoraDense(nn.Module):
    """nn.Dense drop-in ('kernel'/'bias' param names preserved) that adds
    the adapter term when a 'lora' collection entry exists at its path."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: object = default_kernel_init
    bias_init: object = initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        entry = _lora_entry(self)
        fp8_kernel = _fp8_acts_kernel(self, entry)
        if fp8_kernel is not None:
            from onetrainer_tpu.ops import fp8_acts
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype) if self.use_bias else None
            xp, bias = promote_dtype(x, bias, dtype=self.dtype)
            y = fp8_acts.fp8_dot(xp, fp8_kernel.q, fp8_kernel.scale,
                                 fp8_acts.mode() == "dynamic")
            dy = _adapter_y(entry, xp, self.dtype)
            if dy is not None:
                y = y + dy
            return y + bias if bias is not None else y

        kernel = _get_kernel(self, self.kernel_init,
                             (x.shape[-1], self.features), self.param_dtype,
                             self.dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype) if self.use_bias else None

        if entry is not None and "dora_scale" in entry:
            # transient merged weight (per layer, freed after use; remat
            # recomputes it in the backward pass)
            w = _dora_weight(kernel.astype(jnp.float32).T, entry).T
            x, w, bias = promote_dtype(x, w, bias, dtype=self.dtype)
            y = x @ w
            return y + bias if bias is not None else y

        xp, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = xp @ kernel
        dy = _adapter_y(entry, xp, self.dtype)
        if dy is not None:
            y = y + dy
        return y + bias if bias is not None else y


def _canon_padding(padding, kernel_size: Sequence[int]):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return tuple((padding, padding) for _ in kernel_size)
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(out)


class LoraConv(nn.Module):
    """nn.Conv drop-in (NHWC, 'kernel'/'bias' names preserved) that adds a
    conv-LoRA term: rank-r conv with the base geometry + 1×1 up-projection
    (reference conv-LoRA contract: LoRAModule.create_layer, down conv
    [r, in, kh, kw], up 1×1 [out, r])."""
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: int | Sequence[int] = 1
    padding: object = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: object = default_kernel_init
    bias_init: object = initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        strides = (self.strides, self.strides) \
            if isinstance(self.strides, int) else tuple(self.strides)
        padding = _canon_padding(self.padding, self.kernel_size)
        if padding == "CIRCULAR":
            # torch circular padding_mode: wrap-pad the input by the
            # call site's zero-pad amount ((k-1)//2 for every conv in
            # this codebase: 3→1, 4→1, 5→2), then convolve VALID
            ph, pw = (kh - 1) // 2, (kw - 1) // 2
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                        mode="wrap")
            padding = "VALID"
        kernel = _get_kernel(
            self, self.kernel_init,
            (kh, kw, x.shape[-1] // self.feature_group_count, self.features),
            self.param_dtype, self.dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype) if self.use_bias else None
        entry = _lora_entry(self) if self.feature_group_count == 1 else None

        def conv(inp, ker):
            return jax.lax.conv_general_dilated(
                inp, ker, window_strides=strides, padding=padding,
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        if entry is not None and "dora_scale" in entry:
            k2d = kernel.astype(jnp.float32).transpose(3, 2, 0, 1)
            k2d = k2d.reshape(k2d.shape[0], -1)                 # [out, in*kh*kw]
            w2d = _dora_weight(k2d, entry, conv_geom=(x.shape[-1], kh, kw))
            w = w2d.reshape(self.features, x.shape[-1], kh, kw)
            w = w.transpose(2, 3, 1, 0)                         # HWIO
            xp, w, bias = promote_dtype(x, w, bias, dtype=self.dtype)
            y = conv(xp, w)
            return y + bias if bias is not None else y

        xp, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = conv(xp, kernel)
        if entry is not None:
            if "hada_w1_a" in entry:
                delta2d = _delta_2d(entry)                      # [out, in*kh*kw]
                dk = delta2d.reshape(self.features, x.shape[-1], kh, kw)
                dk = dk.transpose(2, 3, 1, 0)
                (dk,) = promote_dtype(dk, dtype=self.dtype)
                y = y + conv(xp, dk)
            else:
                down = entry["lora_down"]                       # [r, in, kh, kw]
                up = entry["lora_up"]                           # [out, r]
                down_hwio = down.transpose(2, 3, 1, 0)          # HWIO [kh,kw,in,r]
                down_hwio, up = promote_dtype(down_hwio, up, dtype=self.dtype)
                h = conv(xp, down_hwio)                         # [B,H',W',r]
                y = y + h @ up.T
        return y + bias if bias is not None else y
