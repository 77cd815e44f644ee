"""Functional PEFT: LoRA / DoRA / LoHa as weight-space pytree transforms.

TPU-first redesign of the reference's forward-hook PEFT
(reference: modules/module/LoRAModule.py:17-587). Instead of monkey-
patching module forwards, adapters live in their own pytree keyed by the
base-module path; `apply_peft` produces merged weights

    W_eff = W + BA · α/r          (LoRA; reference :294-331)
    W_eff = m · (W + BA·α/r)/‖·‖  (DoRA, norm detached; reference :334-419)
    W_eff = W + (B1A1 ⊙ B2A2)·α/r (LoHa; reference :209-280)

inside the jitted step — XLA fuses the tiny rank-r matmuls into the
consumer, gradients flow to adapter params only, and merge-to-base /
extract are trivial pytree ops.

Adapter tensors are stored in torch layout (down [r, in], up [out, r])
so kohya-format safetensors save/load is layout-identity.

Dropout: the reference applies activation dropout between down and up.
A weight-space merge cannot express per-sample activation dropout, so we
implement rank dropout (drop columns of `down` per step), a standard
LoRA-dropout variant with the same regularization intent.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from onetrainer_tpu.util.enums import PeftType

SEP = "/"


@dataclass(frozen=True)
class PeftConfig:
    peft_type: PeftType = PeftType.LORA
    rank: int = 16
    alpha: float = 1.0
    dropout: float = 0.0
    decompose: bool = False               # DoRA
    decompose_output_axis: bool = False
    decompose_norm_epsilon: bool = True
    layer_filter: tuple[str, ...] = ()    # substrings; empty = all layers
    weight_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_train_config(config) -> "PeftConfig":
        layer_filter = tuple(
            t.strip() for t in (config.lora_layers or "").split(",") if t.strip())
        return PeftConfig(
            peft_type=config.peft_type,
            rank=config.lora_rank,
            alpha=config.lora_alpha,
            dropout=config.dropout_probability,
            decompose=config.lora_decompose,
            decompose_output_axis=config.lora_decompose_output_axis,
            decompose_norm_epsilon=config.lora_decompose_norm_epsilon,
            layer_filter=layer_filter,
            weight_dtype=config.weight_dtypes().lora.to_jnp_dtype() or jnp.float32,
        )


def _flatten(tree: dict, prefix: tuple[str, ...] = ()):
    for key, value in tree.items():
        path = prefix + (key,)
        if isinstance(value, dict):
            yield from _flatten(value, path)
        else:
            yield path, value


def _kernel_paths(params: dict, layer_filter: tuple[str, ...]):
    """All (module path, kernel) pairs eligible for adaptation.

    Quantized kernels (QuantizedArray/NF4Array frozen base — the QLoRA
    configuration, and the trainer's second create_setup pass after
    quantize_frozen_parts re-pointed the model tree) are selected by
    their LOGICAL shape; a quantized leaf has no `.ndim` of its own, and
    silently skipping it would initialize an empty adapter tree — the
    forward then never consumes the adapters and XLA prunes the entire
    backward (observed as a forward-only 'training' run, r5)."""
    from onetrainer_tpu.ops.quant import is_quantized, logical_shape
    for path, value in _flatten(params):
        if path[-1] != "kernel":
            continue
        shape = tuple(logical_shape(value)) if is_quantized(value) else (
            tuple(value.shape) if hasattr(value, "shape") else None)
        if shape is None or len(shape) not in (2, 3, 4):
            continue
        # ndim 3 = scan-stacked Dense [L, in, out] (models/flux.py
        # scan_layers); the leading layer axis carries through the
        # adapter tensors and nn.scan's variable_axes={"lora": 0}
        if len(shape) == 3 and "block" not in path:
            continue  # a genuine 3-D kernel, not a scan stack
        if len(shape) == 4 and shape[2] == 1 and shape[3] > 1 \
                and shape[0] * shape[1] > 1:
            # grouped/depthwise conv (in-per-group == 1): rank-r adaptation
            # is degenerate there; skip (e.g. Würstchen prior depthwise)
            continue
        module_path = path[:-1]
        key = SEP.join(module_path)
        if layer_filter and not any(f in key for f in layer_filter):
            continue
        yield module_path, value


def _fans(kernel: jnp.ndarray) -> tuple[int, int, tuple[int, ...]]:
    """(fan_in, fan_out, spatial) for a flax kernel."""
    if kernel.ndim == 2:          # [in, out]
        return kernel.shape[0], kernel.shape[1], ()
    if kernel.ndim == 3:          # scan-stacked dense [L, in, out]
        return kernel.shape[1], kernel.shape[2], ()
    kh, kw, cin, cout = kernel.shape
    return cin * kh * kw, cout, (kh, kw)


def peft_module_keys(base_params: dict, cfg: PeftConfig) -> list[str]:
    """Module keys that init_peft_params would adapt for this model."""
    return [SEP.join(p) for p, _ in _kernel_paths(base_params, cfg.layer_filter)]


def init_peft_params(
        rng: jax.Array,
        base_params: dict,
        cfg: PeftConfig,
) -> dict:
    """Create the adapter pytree: {module_key: {tensor_name: array}}."""
    adapters: dict[str, dict[str, jnp.ndarray]] = {}
    keys = list(_kernel_paths(base_params, cfg.layer_filter))
    rngs = jax.random.split(rng, max(len(keys), 1))
    from onetrainer_tpu.ops.quant import (
        is_quantized, logical_shape, maybe_dequantize,
    )
    for (module_path, kernel), krng in zip(keys, rngs):
        if is_quantized(kernel):
            # QLoRA over a quantized frozen base: shapes suffice for the
            # LoRA/LoHa tensors; DoRA's magnitude column needs the actual
            # weights, so dequantize transiently only in that case
            if cfg.decompose:
                kernel = maybe_dequantize(kernel, jnp.bfloat16)
            else:
                kernel = jax.ShapeDtypeStruct(
                    logical_shape(kernel), jnp.bfloat16)
        fan_in, fan_out, spatial = _fans(kernel)
        r = cfg.rank
        dt = cfg.weight_dtype
        # scan-stacked dense [L, in, out]: every adapter tensor carries
        # the leading layer axis; nn.scan slices it per layer
        stack = (kernel.shape[0],) if kernel.ndim == 3 else ()
        if spatial:
            kh, kw = spatial
            down_shape = (r, kernel.shape[2], kh, kw)   # torch conv layout [r,in,kh,kw]
        else:
            down_shape = (r, fan_in)
        entry: dict[str, jnp.ndarray] = {}
        if cfg.peft_type == PeftType.LORA:
            # kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            bound = 1.0 / math.sqrt(fan_in)
            entry["lora_down"] = jax.random.uniform(
                krng, stack + down_shape, dtype=dt,
                minval=-bound, maxval=bound)
            entry["lora_up"] = jnp.zeros(stack + (fan_out, r), dtype=dt)
            if cfg.decompose:
                if stack:
                    w2d = jnp.swapaxes(kernel.astype(jnp.float32), 1, 2)
                    axis = 2 if cfg.decompose_output_axis else 1
                    entry["dora_scale"] = jnp.linalg.norm(
                        w2d, axis=axis, keepdims=True).astype(dt)
                else:
                    # stored in the reference's exact tensor shape
                    # (LoRAModule.py:352-377): linear [out,1] / [1,in],
                    # conv [out,1,1,1] / [1,in,1,1] — for conv the
                    # per-channel norm runs over the OTHER channel axis
                    # AND the kh×kw spatial taps
                    w2d = _kernel_to_2d(kernel)  # [out, fan_in] torch-style
                    if cfg.decompose_output_axis:
                        scale = jnp.linalg.norm(w2d, axis=1, keepdims=True)
                        if spatial:
                            scale = scale.reshape(-1, 1, 1, 1)
                    elif spatial:
                        oihw = kernel.astype(jnp.float32).transpose(3, 2, 0, 1)
                        scale = jnp.sqrt((oihw * oihw).sum(
                            axis=(0, 2, 3), keepdims=True))   # [1, in, 1, 1]
                    else:
                        scale = jnp.linalg.norm(w2d, axis=0, keepdims=True)
                    entry["dora_scale"] = scale.astype(dt)
        elif cfg.peft_type == PeftType.LOHA:
            k1, k2, k3 = jax.random.split(krng, 3)
            entry["hada_w1_a"] = 0.1 * jax.random.normal(
                k1, stack + (fan_out, r), dtype=dt)
            entry["hada_w1_b"] = jax.random.normal(
                k2, stack + down_shape, dtype=dt)
            entry["hada_w2_a"] = jnp.zeros(stack + (fan_out, r), dtype=dt)
            entry["hada_w2_b"] = jax.random.normal(
                k3, stack + down_shape, dtype=dt)
        else:
            raise ValueError(cfg.peft_type)
        adapters[SEP.join(module_path)] = entry
    return adapters


def _kernel_to_2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """flax kernel -> torch-style 2D [out, fan_in]."""
    if kernel.ndim == 2:
        return kernel.T
    # HWIO -> OIHW -> [out, in*kh*kw]
    oihw = kernel.transpose(3, 2, 0, 1)
    return oihw.reshape(oihw.shape[0], -1)


def _delta_2d(entry: dict, cfg: PeftConfig, rng: jax.Array | None) -> jnp.ndarray:
    """Adapter delta in torch-style 2D [out, fan_in], fp32."""
    scale = cfg.alpha / cfg.rank
    if cfg.peft_type == PeftType.LOHA:
        w1 = entry["hada_w1_a"].astype(jnp.float32) @ _down_2d(entry["hada_w1_b"])
        w2 = entry["hada_w2_a"].astype(jnp.float32) @ _down_2d(entry["hada_w2_b"])
        return (w1 * w2) * scale
    down = _down_2d(entry["lora_down"])      # [r, fan_in]
    up = entry["lora_up"].astype(jnp.float32)  # [out, r]
    if cfg.dropout > 0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, (down.shape[0], 1))
        down = down * keep / (1.0 - cfg.dropout)
    return (up @ down) * scale


def _down_2d(down: jnp.ndarray) -> jnp.ndarray:
    if down.ndim == 2:
        return down.astype(jnp.float32)
    return down.astype(jnp.float32).reshape(down.shape[0], -1)


def _merged_kernel(kernel, entry: dict, cfg: PeftConfig,
                   rng: jax.Array | None) -> jnp.ndarray:
    from onetrainer_tpu.ops.quant import is_quantized, maybe_dequantize
    if is_quantized(kernel):
        kernel = maybe_dequantize(kernel, jnp.bfloat16)
    if kernel.ndim == 3:
        # scan-stacked dense [L, in, out]: batched per-layer merge
        w = jnp.swapaxes(kernel.astype(jnp.float32), 1, 2)   # [L, out, in]
        scale = cfg.alpha / cfg.rank
        if "hada_w1_a" in entry:                             # LoHa
            w1 = jnp.einsum("lor,lri->loi",
                            entry["hada_w1_a"].astype(jnp.float32),
                            entry["hada_w1_b"].astype(jnp.float32))
            w2 = jnp.einsum("lor,lri->loi",
                            entry["hada_w2_a"].astype(jnp.float32),
                            entry["hada_w2_b"].astype(jnp.float32))
            delta = (w1 * w2) * scale
        else:
            down = entry["lora_down"].astype(jnp.float32)    # [L, r, in]
            up = entry["lora_up"].astype(jnp.float32)        # [L, out, r]
            if cfg.dropout > 0 and rng is not None:
                # same rank dropout as the 2-D path (_delta_2d), one mask
                # per (layer, rank) row of the stacked down tensor
                keep = jax.random.bernoulli(
                    rng, 1.0 - cfg.dropout, (down.shape[0], down.shape[1], 1))
                down = down * keep / (1.0 - cfg.dropout)
            delta = jnp.einsum("lor,lri->loi", up, down) * scale
        wp = w + delta
        if cfg.decompose and "dora_scale" in entry:
            eps = jnp.finfo(jnp.float32).eps \
                if cfg.decompose_norm_epsilon else 0.0
            axis = 2 if cfg.decompose_output_axis else 1
            norm = jax.lax.stop_gradient(
                jnp.linalg.norm(wp, axis=axis, keepdims=True)) + eps
            wp = entry["dora_scale"].astype(jnp.float32) * wp / norm
        return jnp.swapaxes(wp, 1, 2).astype(kernel.dtype)
    w2d = _kernel_to_2d(kernel).astype(jnp.float32)
    wp = w2d + _delta_2d(entry, cfg, rng)
    if cfg.decompose and "dora_scale" in entry:
        eps = jnp.finfo(jnp.float32).eps if cfg.decompose_norm_epsilon else 0.0
        scale = entry["dora_scale"].astype(jnp.float32)
        if kernel.ndim == 4:
            # conv: the reference norms per out channel over (in,kh,kw) or
            # per in channel over (out,kh,kw) (LoRAModule.py:399-411) —
            # NOT per [out, in*kh*kw] column
            kh, kw, cin = kernel.shape[0], kernel.shape[1], kernel.shape[2]
            wp4 = wp.reshape(wp.shape[0], cin, kh, kw)          # OIHW
            axes = (1, 2, 3) if cfg.decompose_output_axis else (0, 2, 3)
            norm = jax.lax.stop_gradient(jnp.sqrt(
                (wp4 * wp4).sum(axis=axes, keepdims=True))) + eps
            wp4 = scale.reshape(norm.shape) * wp4 / norm
            wp = wp4.reshape(wp.shape[0], -1)
        else:
            axis = 1 if cfg.decompose_output_axis else 0
            norm = jax.lax.stop_gradient(
                jnp.linalg.norm(wp, axis=axis, keepdims=True)) + eps
            wp = scale * wp / norm
    # back to flax layout
    if kernel.ndim == 2:
        return wp.T.astype(kernel.dtype)
    out_ch, fan_in = wp.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    oihw = wp.reshape(out_ch, kernel.shape[2], kh, kw)
    return oihw.transpose(2, 3, 1, 0).astype(kernel.dtype)


def apply_peft(
        base_params: dict,
        adapters: dict,
        cfg: PeftConfig,
        rng: jax.Array | None = None,
) -> dict:
    """Merge adapters into a copy of the base param tree (pure function,
    differentiable w.r.t. the adapter pytree)."""
    from onetrainer_tpu.ops.quant import is_quantized, maybe_dequantize

    def visit(tree: dict, prefix: tuple[str, ...]) -> dict:
        out = {}
        for key, value in tree.items():
            path = prefix + (key,)
            if isinstance(value, dict):
                out[key] = visit(value, path)
            elif key == "kernel" and SEP.join(prefix) in adapters:
                out[key] = _merged_kernel(value, adapters[SEP.join(prefix)], cfg, rng)
            elif is_quantized(value):
                out[key] = maybe_dequantize(value, jnp.bfloat16)
            else:
                out[key] = value
        return out

    return visit(base_params, ())


def merge_peft_into_base(base_params: dict, adapters: dict, cfg: PeftConfig) -> dict:
    """Permanently bake adapters into base weights (for merged export)."""
    return apply_peft(base_params, adapters, cfg, rng=None)


# -- functional (in-layer) application ----------------------------------------------

def adapters_to_lora_collection(
        adapters: dict,
        cfg: PeftConfig,
        rng: jax.Array | None = None,
) -> dict:
    """Flat adapter pytree -> nested flax 'lora' collection for
    `module.apply({'params': base, 'lora': col}, ...)` with the
    LoraDense/LoraConv layers (peft/layers.py).

    α/r is folded into `lora_down` / `hada_w1_b` (differentiable scaling),
    rank dropout is applied here, and DoRA's norm epsilon travels as a
    numeric leaf so the layer stays config-free."""
    scale = cfg.alpha / cfg.rank
    col: dict = {}
    keys = list(adapters.keys())
    for i, module_key in enumerate(keys):
        entry = adapters[module_key]
        e: dict = {}
        if "lora_down" in entry:
            down = entry["lora_down"] * scale
            if cfg.dropout > 0 and rng is not None:
                # rank dropout: mask rows of the rank axis (leading axis,
                # or axis 1 under a scan stack [L, r, in])
                up_ndim = entry["lora_up"].ndim
                if up_ndim == 3:   # scan-stacked dense
                    keep_shape = (down.shape[0], down.shape[1]) \
                        + (1,) * (down.ndim - 2)
                else:
                    keep_shape = (down.shape[0],) + (1,) * (down.ndim - 1)
                keep = jax.random.bernoulli(
                    jax.random.fold_in(rng, i), 1.0 - cfg.dropout, keep_shape)
                down = down * keep / (1.0 - cfg.dropout)
            e["lora_down"] = down
            e["lora_up"] = entry["lora_up"]
            if cfg.decompose and "dora_scale" in entry:
                e["dora_scale"] = entry["dora_scale"]
                eps = jnp.finfo(jnp.float32).eps \
                    if cfg.decompose_norm_epsilon else 0.0
                e["dora_eps"] = jnp.float32(eps)
        elif "hada_w1_a" in entry:
            e = dict(entry)
            e["hada_w1_b"] = entry["hada_w1_b"] * scale
        node = col
        parts = module_key.split(SEP)
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = e
    return col


def lora_variables(
        base_params: dict,
        adapters: dict | None,
        cfg: PeftConfig | None,
        rng: jax.Array | None = None,
) -> dict:
    """Variables dict for apply(): {'params': base[, 'lora': collection]}."""
    variables = {"params": base_params}
    if adapters and cfg is not None:
        variables["lora"] = adapters_to_lora_collection(adapters, cfg, rng)
    return variables


def as_variables(params_or_variables: dict) -> dict:
    """Accept either a raw params tree or a full variables dict (with
    'params' / 'lora' keys) and return a variables dict. Param trees never
    have a top-level 'params' key (their keys are module names)."""
    if "params" in params_or_variables:
        return params_or_variables
    return {"params": params_or_variables}


# -- kohya-format safetensors interop ---------------------------------------------

# CLIP text-encoder adapter groups: the kohya ecosystem names TE modules
# through the HF module tree ('lora_te_text_model_encoder_layers_0_mlp_fc1');
# our flax CLIP tree drops the text_model/encoder nesting, so re-insert it.
_CLIP_TE_PREFIXES = frozenset({"lora_te", "lora_te1", "lora_te2",
                               "lora_prior_te"})


def _module_key_to_kohya(prefix: str, module_key: str) -> str:
    # 'down_blocks_0/attentions_0/.../to_q' -> prefix + '_down_blocks_0_...'
    key = module_key
    if prefix in _CLIP_TE_PREFIXES and key.startswith("layers_"):
        key = "text_model_encoder_" + key
    return prefix + "_" + key.replace(SEP, "_")


def _is_scan_key(module_key: str, entry: dict | None = None) -> bool:
    """True for nn.scan-stacked adapter keys: a 'block' segment *below*
    the stack name ('transformer_blocks/block/...'), and — when the entry
    is available — tensors that actually carry the leading layer axis
    (a module literally named 'block' at the tree root is not a stack)."""
    parts = module_key.split(SEP)
    if "block" not in parts[:-1] or parts.index("block") < 1:
        return False
    if entry is not None:
        probe = entry.get("lora_up", entry.get("hada_w1_a"))
        if probe is not None:
            return getattr(probe, "ndim", 2) == 3
    return True


def _unstack_scan_adapters(adapters: dict) -> dict:
    """{prefix/block/rest: [L,...]} -> {prefix_i/rest: [...]} per layer."""
    import numpy as np
    out: dict = {}
    for module_key, entry in adapters.items():
        if not _is_scan_key(module_key, entry):
            out[module_key] = entry
            continue
        parts = module_key.split(SEP)
        j = parts.index("block")
        leaves = list(entry.values())
        n = int(np.asarray(leaves[0]).shape[0])
        for i in range(n):
            per = {k: np.asarray(v)[i] for k, v in entry.items()}
            key = SEP.join(parts[:j - 1] + [f"{parts[j - 1]}_{i}"]
                           + parts[j + 1:])
            out[key] = per
    return out


def stack_scan_adapters(adapters: dict, stacked_keys: set[str]) -> dict:
    """Inverse of _unstack_scan_adapters: group per-layer adapter entries
    back into the scan layout described by `stacked_keys` (the module
    keys init_peft_params produced for the scan-stacked base)."""
    import numpy as np
    out: dict = {}
    groups: dict[str, dict[int, dict]] = {}
    for module_key, entry in adapters.items():
        placed = False
        # map prefix_{i}/rest -> prefix/block/rest
        for skey in stacked_keys:
            sparts = skey.split(SEP)
            if "block" not in sparts:
                continue
            j = sparts.index("block")
            mparts = module_key.split(SEP)
            if len(mparts) != len(sparts) - 1:
                continue
            head = sparts[j - 1]
            if not mparts[j - 1].startswith(head + "_"):
                continue
            suffix = mparts[j - 1][len(head) + 1:]
            if not suffix.isdigit():
                continue
            if mparts[:j - 1] == sparts[:j - 1] \
                    and mparts[j:] == sparts[j + 1:]:
                groups.setdefault(skey, {})[int(suffix)] = entry
                placed = True
                break
        if not placed:
            out[module_key] = entry
    for skey, per_layer in groups.items():
        n = max(per_layer) + 1
        names = per_layer[0].keys()
        out[skey] = {
            name: np.stack([np.asarray(per_layer[i][name])
                            for i in range(n)], axis=0)
            for name in names}
    return out


def peft_to_kohya_state_dict(
        adapters: dict,
        cfg: PeftConfig,
        prefix: str,
        conv_shapes: dict[str, tuple[int, ...]] | None = None,
) -> dict:
    """Adapter pytree -> kohya-style flat tensors.

    lora_down.weight [r, in(,kh,kw)], lora_up.weight [out, r(,1,1)], alpha.
    (reference output contract: modules/modelSaver/mixin/LoRASaverMixin
    via omi/kohya key sets)
    """
    import numpy as np
    # scan-stacked adapters export as the per-layer keys the kohya
    # ecosystem expects: 'transformer_blocks/block/...' with [L, ...]
    # leaves becomes 'transformer_blocks_{i}/...' per layer
    adapters = _unstack_scan_adapters(adapters)
    out: dict[str, "np.ndarray"] = {}
    for module_key, entry in adapters.items():
        kkey = _module_key_to_kohya(prefix, module_key)
        is_conv = entry.get("lora_down", entry.get("hada_w1_b")).ndim == 4
        if cfg.peft_type == PeftType.LOHA:
            out[f"{kkey}.hada_w1_a"] = np.asarray(entry["hada_w1_a"])
            out[f"{kkey}.hada_w1_b"] = np.asarray(entry["hada_w1_b"])
            out[f"{kkey}.hada_w2_a"] = np.asarray(entry["hada_w2_a"])
            out[f"{kkey}.hada_w2_b"] = np.asarray(entry["hada_w2_b"])
        else:
            down = np.asarray(entry["lora_down"])
            up = np.asarray(entry["lora_up"])
            if is_conv:
                up = up.reshape(up.shape[0], up.shape[1], 1, 1)
            out[f"{kkey}.lora_down.weight"] = down
            out[f"{kkey}.lora_up.weight"] = up
            if "dora_scale" in entry:
                out[f"{kkey}.dora_scale"] = np.asarray(entry["dora_scale"])
        out[f"{kkey}.alpha"] = np.asarray(cfg.alpha, dtype=np.float32)
    return out


def apply_lora_checkpoint(
        path: str,
        trainable: dict,
        lora_prefixes: dict[str, str],
        peft_cfg: PeftConfig,
) -> PeftConfig:
    """Continue training from an existing kohya-format LoRA file: overwrite
    the freshly-initialized adapter groups in `trainable` with the file's
    tensors and adopt the file's rank/alpha
    (reference: modules/modelLoader/mixin/LoRALoaderMixin.py:14-90).

    Modules present in the model but missing from the file keep their fresh
    initialization (up=0 ⇒ identity), matching the reference's behavior of
    creating-then-loading the wrapper state dict."""
    from dataclasses import replace as _replace

    from onetrainer_tpu.io.safetensors_io import load_safetensors

    state_dict = load_safetensors(path)
    alpha = None
    rank = None
    loaded_any = False
    for group, prefix in lora_prefixes.items():
        adapters = trainable.get(group)
        if adapters is None:
            continue
        scan_keys = {k for k in adapters
                     if _is_scan_key(k, adapters[k])}
        if scan_keys:
            # kohya files are per-layer; expand the scan keys for
            # matching, then restack into the scan layout
            expanded = _unstack_scan_adapters(
                {k: adapters[k] for k in scan_keys})
            expected = [k for k in adapters if k not in scan_keys] \
                + list(expanded.keys())
        else:
            expected = list(adapters.keys())
        loaded, group_alpha = kohya_state_dict_to_peft(
            state_dict, prefix, expected)
        if scan_keys and loaded:
            # layers missing from the file keep their fresh init so the
            # restack is always complete
            from_file = {k: v for k, v in loaded.items() if k in expanded}
            plain = {k: v for k, v in loaded.items() if k not in expanded}
            if from_file:
                missing = set(expanded) - set(from_file)
                if missing:
                    fresh_shape = next(iter(expanded.values()))[
                        "lora_down"].shape \
                        if "lora_down" in next(iter(expanded.values())) \
                        else None
                    file_shape = next(iter(from_file.values())).get(
                        "lora_down", next(iter(
                            from_file.values())).get("hada_w1_b")).shape
                    if fresh_shape is not None \
                            and tuple(fresh_shape) != tuple(file_shape):
                        raise ValueError(
                            f"LoRA file {path} covers only some scanned "
                            f"layers and its rank {file_shape[0]} differs "
                            f"from the configured rank {fresh_shape[0]}; "
                            f"with OT_SCAN_LAYERS either match lora_rank "
                            f"to the file or use a file covering every "
                            f"layer")
                merged = {**expanded, **from_file}
                plain.update(stack_scan_adapters(merged, scan_keys))
            loaded = plain
        for key, entry in loaded.items():
            adapters[key] = {
                name: jnp.asarray(value, jnp.float32)
                for name, value in {**adapters[key], **entry}.items()
            }
            if "lora_down" in entry:
                down = entry["lora_down"]
                rank = int(down.shape[1] if down.ndim == 3
                           else down.shape[0])
            elif "hada_w1_b" in entry:
                w1b = entry["hada_w1_b"]
                rank = int(w1b.shape[1] if w1b.ndim == 3
                           else w1b.shape[0])
            loaded_any = True
        if group_alpha is not None:
            alpha = group_alpha
    if not loaded_any:
        raise ValueError(
            f"LoRA file {path} contains no tensors matching prefixes "
            f"{sorted(lora_prefixes.values())}")
    return _replace(peft_cfg,
                    rank=rank if rank is not None else peft_cfg.rank,
                    alpha=alpha if alpha is not None else peft_cfg.alpha)


def kohya_state_dict_to_peft(
        state_dict: dict,
        prefix: str,
        module_keys: list[str],
) -> tuple[dict, float | None]:
    """kohya tensors (one prefix) -> adapter pytree (+alpha if present).

    The kohya flattening ('down_blocks_0_..._to_q') is ambiguous to invert
    textually, so `module_keys` (the adapter keys valid for the target
    model, e.g. from init_peft_params) provides the reverse lookup."""
    reverse = {_module_key_to_kohya(prefix, mk): mk for mk in module_keys}
    adapters: dict[str, dict] = {}
    alpha = None
    for key, tensor in state_dict.items():
        if not key.startswith(prefix + "_"):
            continue
        module_part, _, leaf = key.partition(".")
        if module_part not in reverse:
            continue
        module_key = reverse[module_part]
        entry = adapters.setdefault(module_key, {})
        if leaf == "lora_down.weight":
            entry["lora_down"] = jnp.asarray(tensor)
        elif leaf == "lora_up.weight":
            t = jnp.asarray(tensor)
            if t.ndim == 4:
                t = t.reshape(t.shape[0], t.shape[1])
            entry["lora_up"] = t
        elif leaf == "dora_scale":
            entry["dora_scale"] = jnp.asarray(tensor)
        elif leaf in ("hada_w1_a", "hada_w1_b", "hada_w2_a", "hada_w2_b"):
            entry[leaf] = jnp.asarray(tensor)
        elif leaf == "alpha":
            import numpy as _np
            alpha = float(_np.asarray(tensor).reshape(-1)[0])
    return adapters, alpha
