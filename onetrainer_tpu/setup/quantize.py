"""Quantized frozen-base wiring shared by every family setup.

The reference swaps nn.Linear modules for LinearNf4/LinearW8A8/LinearFp8
inside whichever component has a quantized weight_dtype, after the torch
load (reference: modules/util/quantization_util.py:72-160
__replace_linear_layers, called from each modelLoader via
model_spec/quantize_layers:187). Here the same policy is a tree
transform: a frozen part whose configured weight dtype is
FLOAT_8/INT_8/NFLOAT_4 becomes a QuantizedArray tree (ops/quant.py,
kernel leaves only — the replace-LINEARS selection), dequantized
in-layer by peft/layers.py (or fed fp8 activations under OT_FP8_ACTS,
ops/fp8_acts.py).

Only FROZEN parts quantize. The reference never trains through a
quantized linear either (quantized presets are LoRA/embedding runs);
trainable parts keep full-precision weights so optimizer math and the
fine-tune save path are untouched.
"""

from __future__ import annotations

from onetrainer_tpu.util.enums import DataType


def quant_storage_dtype(dt: DataType):
    """ops/quant.py quantize_tree dtype selector for a quantized
    DataType ('nf4' sentinel or a jnp storage dtype)."""
    import jax.numpy as jnp
    if dt == DataType.NFLOAT_4:
        return "nf4"
    if dt == DataType.INT_8:
        return jnp.int8
    return jnp.float8_e4m3fn


def quantize_frozen_parts(frozen: dict, weight_dtypes, part_map: dict,
                          model=None) -> dict:
    """Quantize (in place) the frozen parts whose configured weight dtype
    is a quantized type.

    part_map: frozen-dict key -> ModelWeightDtypes attribute name, e.g.
    {"unet": "unet", "text_encoder": "text_encoder"} for SD or
    {"transformer": "prior", "text_encoder_2": "text_encoder_2"} for FLUX.
    Keys absent from `frozen` (trainable in this run) are skipped.

    When `model` is given, any model attribute holding the SAME tree
    object is re-pointed at the quantized tree. Without this the
    unquantized copy stays alive (device-resident once used) for the
    whole run — an SDXL fp8 base wastes 5.2 GB that way, which is what
    OOMed the first e2e scripts/train.py run on a 16 GB v5e. Aliasing is
    behavior-preserving: every consumer (samplers, savers, encode fns)
    reads setup.frozen or dequantizes in-layer (peft/layers._get_kernel),
    exactly like the train step.
    """
    import jax

    from onetrainer_tpu.ops.quant import is_quantized, quantize_tree

    def already_quantized(tree) -> bool:
        # idempotence: create_setup runs twice (the second pass rebuilds
        # schedules with the real epoch length) and, with model aliasing,
        # hands the quantized tree back in — re-quantizing fp8 leaves
        # would TypePromotionError (and double-quantize int8)
        return any(is_quantized(leaf) for leaf in
                   jax.tree.leaves(tree, is_leaf=is_quantized))

    for key, attr in part_map.items():
        dt = getattr(weight_dtypes, attr)
        if dt.is_quantized() and frozen.get(key) is not None \
                and not already_quantized(frozen[key]):
            original = frozen[key]
            frozen[key] = quantize_tree(original, quant_storage_dtype(dt))
            if model is not None:
                for name, val in list(vars(model).items()):
                    if val is original:
                        setattr(model, name, frozen[key])
    return frozen
