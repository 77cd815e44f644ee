"""Load / save PixArt checkpoints in diffusers directory layout
(reference: modules/modelLoader/pixartAlpha/PixArtAlphaModelLoader.py):
transformer/, vae/, text_encoder/ (T5), tokenizer/."""

from __future__ import annotations

import os
from dataclasses import replace

import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.flux_checkpoints import t5_config_from_transformers
from onetrainer_tpu.io.safetensors_io import save_safetensors
from onetrainer_tpu.io.sd_checkpoints import (
    _to_numpy_tree, load_component, vae_config_from_diffusers,
)
from onetrainer_tpu.io.torch_flax import (
    t5_flax_to_state_dict, t5_state_dict_to_flax, unet_flax_to_state_dict,
    unet_state_dict_to_flax, vae_state_dict_to_flax,
)
from onetrainer_tpu.models.pixart import PixArtConfig


def pixart_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                                 gradient_checkpointing=False) -> PixArtConfig:
    return PixArtConfig(
        sample_size=config.get("sample_size", 64),
        patch_size=config.get("patch_size", 2),
        in_channels=config.get("in_channels", 4),
        out_channels=config.get("out_channels", 8),
        num_layers=config.get("num_layers", 28),
        num_heads=config.get("num_attention_heads", 16),
        head_dim=config.get("attention_head_dim", 72),
        cross_attention_dim=config.get("cross_attention_dim", 4096),
        caption_channels=config.get("caption_channels", 4096),
        # diffusers: use_additional_conditions defaults to sample_size==128
        # (alpha-1024 micro-conditions); sigma configs set it False
        use_additional_conditions=(
            config["use_additional_conditions"]
            if config.get("use_additional_conditions") is not None
            else config.get("sample_size", 64) == 128),
        gradient_checkpointing=gradient_checkpointing,
        dtype=dtype,
    )


def load_pixart_diffusers(base_dir: str, weight_dtype=np.float32,
                          compute_dtype=jnp.bfloat16,
                          gradient_checkpointing=False,
                          device: bool = True):
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)

    tcfg_json, transformer_params = load_component(
        base_dir, "transformer", unet_state_dict_to_flax, np_dtype, device)
    vae_cfg_json, vae_params = load_component(
        base_dir, "vae", vae_state_dict_to_flax, np_dtype, device)
    te_cfg_json, te_params = load_component(
        base_dir, "text_encoder", t5_state_dict_to_flax, np_dtype, device)

    return {
        "transformer_config": pixart_config_from_diffusers(
            tcfg_json or {}, compute_dtype, gradient_checkpointing),
        "vae_config": vae_config_from_diffusers(vae_cfg_json or {}, compute_dtype),
        "te_config": t5_config_from_transformers(te_cfg_json or {}, compute_dtype),
        "transformer_params": transformer_params,
        "vae_params": vae_params,
        "te_params": te_params,
        "tokenizer_dir": os.path.join(base_dir, "tokenizer"),
        "prediction_type": "epsilon",
    }


def save_pixart_diffusers(base_dir, model, transformer_params, vae_params,
                          te_params, save_dtype=np.float32,
                          metadata: dict | None = None,
                          source_dir: str | None = None):
    import shutil
    os.makedirs(base_dir, exist_ok=True)
    if source_dir:
        for name in ("transformer", "vae", "text_encoder", "tokenizer",
                     "scheduler"):
            src = os.path.join(source_dir, name)
            dst = os.path.join(base_dir, name)
            if os.path.isdir(src):
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(src):
                    s = os.path.join(src, f)
                    if os.path.isfile(s) and not f.endswith(
                            (".safetensors", ".bin", ".index.json")):
                        shutil.copy2(s, os.path.join(dst, f))
    meta = {"format": "pt"}
    if metadata:
        meta.update(metadata)
    save_safetensors(
        os.path.join(base_dir, "transformer", "diffusion_pytorch_model.safetensors"),
        unet_flax_to_state_dict(_to_numpy_tree(transformer_params, save_dtype)), meta)
    save_safetensors(
        os.path.join(base_dir, "vae", "diffusion_pytorch_model.safetensors"),
        unet_flax_to_state_dict(_to_numpy_tree(vae_params, save_dtype)), meta)
    save_safetensors(
        os.path.join(base_dir, "text_encoder", "model.safetensors"),
        t5_flax_to_state_dict(_to_numpy_tree(te_params, save_dtype)), meta)
