"""Load / save SD-family checkpoints in diffusers directory layout.

(reference: modules/modelLoader/stableDiffusion/StableDiffusionModelLoader.py,
modules/modelSaver/stableDiffusion/StableDiffusionModelSaver.py)

A diffusers checkpoint directory looks like:
  unet/diffusion_pytorch_model.safetensors + config.json
  vae/diffusion_pytorch_model.safetensors + config.json
  text_encoder/model.safetensors + config.json
  tokenizer/{vocab.json, merges.txt, ...}
  scheduler/scheduler_config.json

Weights convert through io.torch_flax (mechanical); model configs read
from the json files so non-default layouts (SD2.x etc.) resolve correctly.
"""

from __future__ import annotations

import json
import os
import shutil

import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, clip_state_dict_to_flax, unet_flax_to_state_dict,
    unet_state_dict_to_flax, vae_flax_to_state_dict, vae_state_dict_to_flax,
)
from onetrainer_tpu.models.clip import CLIPTextConfig
from onetrainer_tpu.models.remat import default_policy as _remat_default
from onetrainer_tpu.models.unet import UNetConfig
from onetrainer_tpu.models.vae import VAEConfig


def _read_json(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _find_weights(component_dir: str) -> str | None:
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors"):
        p = os.path.join(component_dir, name)
        if os.path.exists(p):
            return p
    # sharded checkpoints: *.safetensors.index.json
    for name in os.listdir(component_dir) if os.path.isdir(component_dir) else []:
        if name.endswith(".safetensors.index.json"):
            return os.path.join(component_dir, name)
    return None


def _load_weights(path: str) -> dict[str, np.ndarray]:
    """Load a safetensors file or a sharded index."""
    if path.endswith(".index.json"):
        index = _read_json(path)
        base = os.path.dirname(path)
        out: dict[str, np.ndarray] = {}
        for shard in sorted(set(index["weight_map"].values())):
            out.update(load_safetensors(os.path.join(base, shard)))
        return out
    return load_safetensors(path)


def unet_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                               gradient_checkpointing=False) -> UNetConfig:
    down_types = config.get("down_block_types",
                            ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"])
    block_out = tuple(config.get("block_out_channels", [320, 640, 1280, 1280]))
    heads = config.get("attention_head_dim", 8)
    if isinstance(heads, int):
        heads = [heads] * len(block_out)
    transformer_layers = config.get("transformer_layers_per_block", 1)
    if isinstance(transformer_layers, int):
        transformer_layers = [transformer_layers] * len(block_out)
    addition_embed = config.get("addition_time_embed_dim")
    return UNetConfig(
        in_channels=config.get("in_channels", 4),
        out_channels=config.get("out_channels", 4),
        block_out_channels=block_out,
        cross_attn_blocks=tuple(t == "CrossAttnDownBlock2D" for t in down_types),
        layers_per_block=config.get("layers_per_block", 2),
        transformer_layers_per_block=tuple(transformer_layers),
        num_heads=tuple(heads),
        cross_attention_dim=config.get("cross_attention_dim", 768),
        use_linear_projection=config.get("use_linear_projection", False),
        addition_embed_dim=addition_embed,
        addition_pooled_dim=1280 if addition_embed else None,
        gradient_checkpointing=gradient_checkpointing,
        remat_policy=_remat_default("unet"),
        dtype=dtype,
    )


def vae_config_from_diffusers(config: dict, dtype=jnp.bfloat16) -> VAEConfig:
    return VAEConfig(
        in_channels=config.get("in_channels", 3),
        out_channels=config.get("out_channels", 3),
        latent_channels=config.get("latent_channels", 4),
        block_out_channels=tuple(config.get("block_out_channels",
                                            [128, 256, 512, 512])),
        layers_per_block=config.get("layers_per_block", 2),
        scaling_factor=config.get("scaling_factor", 0.18215),
        shift_factor=config.get("shift_factor", 0.0) or 0.0,
        dtype=dtype,
    )


def clip_config_from_transformers(config: dict, dtype=jnp.bfloat16) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=config.get("vocab_size", 49408),
        hidden_size=config.get("hidden_size", 768),
        intermediate_size=config.get("intermediate_size", 3072),
        num_layers=config.get("num_hidden_layers", 12),
        num_heads=config.get("num_attention_heads", 12),
        max_position_embeddings=config.get("max_position_embeddings", 77),
        hidden_act=config.get("hidden_act", "quick_gelu"),
        projection_dim=config.get("projection_dim")
        if "WithProjection" in str(config.get("architectures", "")) else None,
        eos_token_id=config.get("eos_token_id", 49407),
        dtype=dtype,
    )


def load_component(base_dir: str, name: str, converter, dtype=None,
                   device: bool = True):
    """Load one component subdir -> (config dict, flax params).

    device=True puts leaves on the default device (required before use in
    jitted fns — numpy leaves can't be indexed by tracers); format-only
    conversions pass device=False to stay off-device."""
    component_dir = os.path.join(base_dir, name)
    weights = _find_weights(component_dir)
    if weights is None:
        return None, None
    config = {}
    config_path = os.path.join(component_dir, "config.json")
    if os.path.exists(config_path):
        config = _read_json(config_path)
    sd = _load_weights(weights)
    if dtype is not None:
        sd = {k: v.astype(dtype) if np.issubdtype(v.dtype, np.floating) or
              v.dtype == jnp.bfloat16 else v for k, v in sd.items()}
    params = converter(sd)
    if device:
        import jax
        params = jax.tree.map(jnp.asarray, params)
    return config, params


def load_sd_diffusers(base_dir: str, weight_dtype=np.float32,
                      compute_dtype=jnp.bfloat16,
                      gradient_checkpointing=False,
                      device: bool = True):
    """Load a diffusers SD checkpoint directory. Returns a dict with
    configs, params, scheduler info, tokenizer path."""
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)

    unet_cfg_json, unet_params = load_component(
        base_dir, "unet", unet_state_dict_to_flax, np_dtype, device)
    vae_cfg_json, vae_params = load_component(
        base_dir, "vae", vae_state_dict_to_flax, np_dtype, device)
    te_cfg_json, te_params = load_component(
        base_dir, "text_encoder", clip_state_dict_to_flax, np_dtype, device)

    scheduler_cfg = {}
    sched_path = os.path.join(base_dir, "scheduler", "scheduler_config.json")
    if os.path.exists(sched_path):
        scheduler_cfg = _read_json(sched_path)

    return {
        "unet_config": unet_config_from_diffusers(
            unet_cfg_json or {}, compute_dtype, gradient_checkpointing),
        "vae_config": vae_config_from_diffusers(vae_cfg_json or {}, compute_dtype),
        "te_config": clip_config_from_transformers(te_cfg_json or {}, compute_dtype),
        "unet_params": unet_params,
        "vae_params": vae_params,
        "te_params": te_params,
        "scheduler_config": scheduler_cfg,
        "tokenizer_dir": os.path.join(base_dir, "tokenizer"),
        "prediction_type": scheduler_cfg.get("prediction_type", "epsilon"),
    }


def _read_single_file(path: str) -> dict[str, np.ndarray]:
    """Read a single-file checkpoint: .safetensors via our reader, .ckpt
    via torch pickle (reference loaders accept both)."""
    if path.endswith((".ckpt", ".pt", ".bin")):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return load_safetensors(path)


def _cast_tree(sd: dict, np_dtype) -> dict:
    import ml_dtypes
    out = {}
    for k, v in sd.items():
        if np.issubdtype(v.dtype, np.floating) or v.dtype == ml_dtypes.bfloat16 \
                or v.dtype == np.float16:
            out[k] = v.astype(np_dtype)
        else:
            out[k] = v
    return out


def load_sd_single_file(path: str, model_type, weight_dtype=np.float32,
                        compute_dtype=jnp.bfloat16,
                        gradient_checkpointing=False,
                        device: bool = True):
    """Load an SD1.5/2.x LDM single-file checkpoint
    (reference: StableDiffusionModelLoader.py single-file fallback path)."""
    import jax
    import ml_dtypes
    from onetrainer_tpu.io import ldm
    from onetrainer_tpu.models import sd as sd_models

    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)
    tensors = _read_single_file(path)
    split = ldm.split_sd15_single_file(tensors)

    template = sd_models.create_sd_model(
        model_type, dtype=compute_dtype,
        gradient_checkpointing=gradient_checkpointing)
    # in_channels from the checkpoint (inpaint/depth variants)
    conv_in = split["unet"].get("conv_in.weight")
    unet_cfg = template.unet_config
    if conv_in is not None and conv_in.shape[1] != unet_cfg.in_channels:
        from dataclasses import replace
        unet_cfg = replace(unet_cfg, in_channels=int(conv_in.shape[1]))

    to_jnp = (lambda tree: jax.tree.map(jnp.asarray, tree)) if device else (lambda t: t)
    prediction_type = "v_prediction" if model_type.value in (
        "STABLE_DIFFUSION_20", "STABLE_DIFFUSION_21") else "epsilon"
    return {
        "unet_config": unet_cfg,
        "vae_config": template.vae_config,
        "te_config": template.te_config,
        "unet_params": to_jnp(unet_state_dict_to_flax(_cast_tree(split["unet"], np_dtype))),
        "vae_params": to_jnp(vae_state_dict_to_flax(_cast_tree(split["vae"], np_dtype))),
        "te_params": to_jnp(clip_state_dict_to_flax(_cast_tree(split["text_encoder"], np_dtype))),
        "scheduler_config": {},
        "tokenizer_dir": None,
        "prediction_type": prediction_type,
    }


def load_sdxl_diffusers(base_dir: str, weight_dtype=np.float32,
                        compute_dtype=jnp.bfloat16,
                        gradient_checkpointing=False,
                        device: bool = True):
    """Load a diffusers SDXL checkpoint directory (adds text_encoder_2 /
    tokenizer_2)."""
    out = load_sd_diffusers(base_dir, weight_dtype, compute_dtype,
                            gradient_checkpointing, device)
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)
    te2_cfg_json, te2_params = load_component(
        base_dir, "text_encoder_2", clip_state_dict_to_flax, np_dtype, device)
    te2_cfg = clip_config_from_transformers(te2_cfg_json or {}, compute_dtype)
    if te2_cfg_json and te2_cfg.projection_dim is None:
        # SDXL TE2 always projects; some config.jsons omit architectures
        from dataclasses import replace
        te2_cfg = replace(te2_cfg,
                          projection_dim=te2_cfg_json.get("projection_dim", 1280))
    out["te2_config"] = te2_cfg
    out["te2_params"] = te2_params
    out["tokenizer_2_dir"] = os.path.join(base_dir, "tokenizer_2")
    return out


# -- saving ----------------------------------------------------------------------

def _to_numpy_tree(params, dtype=None):
    """Device arrays -> contiguous numpy; float leaves cast to `dtype`
    (None keeps each leaf's own dtype — the single-file export paths in
    setup/families.py rely on that default)."""
    import jax
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16,
                np.float16: np.float16}.get(dtype, dtype)

    from onetrainer_tpu.ops.quant import is_quantized, maybe_dequantize

    def conv(x):
        if is_quantized(x):
            # quantized frozen parts (setup/quantize.py) export at the
            # save dtype (bf16 when unspecified, mirroring to_load_dtype)
            # — np.asarray on the quantized container raises, which used
            # to silently kill fine-tune/embedding saves
            x = maybe_dequantize(
                x, jnp.float32 if np_dtype is not None else jnp.bfloat16)
        arr = np.asarray(jax.device_get(x))
        if np.issubdtype(arr.dtype, np.floating) or arr.dtype == ml_dtypes.bfloat16:
            return np.ascontiguousarray(
                arr if np_dtype is None else arr.astype(np_dtype))
        return arr
    return jax.tree.map(conv, params,
                        is_leaf=lambda v: is_quantized(v))


def save_sd_diffusers(
        base_dir: str,
        model,                 # StableDiffusionModel
        unet_params, vae_params, te_params,
        save_dtype=np.float32,
        metadata: dict | None = None,
        source_dir: str | None = None,
):
    """Write a diffusers-layout checkpoint. Config jsons and tokenizer are
    copied from source_dir when available (keeps the exact ecosystem
    metadata); weights are freshly converted."""
    os.makedirs(base_dir, exist_ok=True)

    def copy_aux(name: str, files=("config.json",)):
        if source_dir is None:
            return
        src = os.path.join(source_dir, name)
        dst = os.path.join(base_dir, name)
        if os.path.isdir(src):
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(src):
                if f.endswith(".safetensors") or f.endswith(".bin"):
                    continue
                s = os.path.join(src, f)
                if os.path.isfile(s):
                    shutil.copy2(s, os.path.join(dst, f))

    for name in ("unet", "vae", "text_encoder", "tokenizer", "scheduler"):
        copy_aux(name)
    if source_dir and os.path.exists(os.path.join(source_dir, "model_index.json")):
        shutil.copy2(os.path.join(source_dir, "model_index.json"),
                     os.path.join(base_dir, "model_index.json"))

    meta = {"format": "pt"}
    if metadata:
        meta.update(metadata)

    save_safetensors(
        os.path.join(base_dir, "unet", "diffusion_pytorch_model.safetensors"),
        unet_flax_to_state_dict(_to_numpy_tree(unet_params, save_dtype)), meta)
    save_safetensors(
        os.path.join(base_dir, "vae", "diffusion_pytorch_model.safetensors"),
        vae_flax_to_state_dict(_to_numpy_tree(vae_params, save_dtype)), meta)
    save_safetensors(
        os.path.join(base_dir, "text_encoder", "model.safetensors"),
        clip_flax_to_state_dict(_to_numpy_tree(te_params, save_dtype)), meta)


def save_sd_single_file(path, model, unet_params, vae_params, te_params,
                        save_dtype=np.float32, metadata=None):
    """Write an LDM single-file .safetensors (reference:
    StableDiffusionModelSaver SAFETENSORS format path)."""
    from onetrainer_tpu.io import ldm
    unet_sd = unet_flax_to_state_dict(_to_numpy_tree(unet_params, save_dtype))
    vae_sd = vae_flax_to_state_dict(_to_numpy_tree(vae_params, save_dtype))
    te_sd = clip_flax_to_state_dict(_to_numpy_tree(te_params, save_dtype))
    merged = ldm.merge_sd15_single_file(
        unet_sd, vae_sd, te_sd,
        sd2_openclip=model.model_type.is_sd_v2())
    meta = {"format": "pt"}
    if metadata:
        meta.update(metadata)
    save_safetensors(path, merged, meta)


def save_sdxl_single_file(path, model, unet_params, vae_params, te_params,
                          te2_params, save_dtype=np.float32, metadata=None):
    from onetrainer_tpu.io import ldm
    merged = ldm.merge_sdxl_single_file(
        unet_flax_to_state_dict(_to_numpy_tree(unet_params, save_dtype)),
        vae_flax_to_state_dict(_to_numpy_tree(vae_params, save_dtype)),
        clip_flax_to_state_dict(_to_numpy_tree(te_params, save_dtype)),
        clip_flax_to_state_dict(_to_numpy_tree(te2_params, save_dtype)))
    meta = {"format": "pt"}
    if metadata:
        meta.update(metadata)
    save_safetensors(path, merged, meta)


def load_sdxl_single_file(path: str, model_type, weight_dtype=np.float32,
                          compute_dtype=jnp.bfloat16,
                          gradient_checkpointing=False,
                          device: bool = True):
    import jax
    import ml_dtypes
    from onetrainer_tpu.io import ldm
    from onetrainer_tpu.models import sdxl as sdxl_models

    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)
    tensors = _read_single_file(path)
    split = ldm.split_sdxl_single_file(tensors)
    template = sdxl_models.create_sdxl_model(
        model_type, dtype=compute_dtype,
        gradient_checkpointing=gradient_checkpointing)
    to_jnp = (lambda tree: jax.tree.map(jnp.asarray, tree)) if device else (lambda t: t)
    return {
        "unet_config": template.unet_config,
        "vae_config": template.vae_config,
        "te_config": template.te_config,
        "te2_config": template.te2_config,
        "unet_params": to_jnp(unet_state_dict_to_flax(_cast_tree(split["unet"], np_dtype))),
        "vae_params": to_jnp(vae_state_dict_to_flax(_cast_tree(split["vae"], np_dtype))),
        "te_params": to_jnp(clip_state_dict_to_flax(_cast_tree(split["text_encoder"], np_dtype))),
        "te2_params": to_jnp(clip_state_dict_to_flax(_cast_tree(split["text_encoder_2"], np_dtype))),
        "scheduler_config": {},
        "tokenizer_dir": None,
        "tokenizer_2_dir": None,
        "prediction_type": "epsilon",
    }


def save_sdxl_diffusers(base_dir, model, unet_params, vae_params, te_params,
                        te2_params, save_dtype=np.float32,
                        metadata: dict | None = None, source_dir: str | None = None):
    save_sd_diffusers(base_dir, model, unet_params, vae_params, te_params,
                      save_dtype, metadata, source_dir)
    if source_dir:
        for name in ("text_encoder_2", "tokenizer_2"):
            src = os.path.join(source_dir, name)
            dst = os.path.join(base_dir, name)
            if os.path.isdir(src):
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(src):
                    s = os.path.join(src, f)
                    if os.path.isfile(s) and not f.endswith((".safetensors", ".bin")):
                        shutil.copy2(s, os.path.join(dst, f))
    meta = {"format": "pt"}
    if metadata:
        meta.update(metadata)
    save_safetensors(
        os.path.join(base_dir, "text_encoder_2", "model.safetensors"),
        clip_flax_to_state_dict(_to_numpy_tree(te2_params, save_dtype)), meta)
