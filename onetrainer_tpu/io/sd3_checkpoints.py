"""Load / save SD3 checkpoints in diffusers directory layout
(reference: modules/modelLoader/stableDiffusion3/StableDiffusion3ModelLoader.py,
modules/modelSaver/stableDiffusion3/*): transformer/, vae/, text_encoder/
(CLIP-L proj), text_encoder_2/ (CLIP-G proj), text_encoder_3/ (T5)."""

from __future__ import annotations

import os
from dataclasses import replace

import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.flux_checkpoints import t5_config_from_transformers
from onetrainer_tpu.io.safetensors_io import save_safetensors
from onetrainer_tpu.io.sd_checkpoints import (
    _to_numpy_tree, clip_config_from_transformers, load_component,
    vae_config_from_diffusers,
)
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, clip_state_dict_to_flax, t5_flax_to_state_dict,
    t5_state_dict_to_flax, unet_flax_to_state_dict, unet_state_dict_to_flax,
    vae_state_dict_to_flax,
)
from onetrainer_tpu.models.remat import default_policy as _remat_default
from onetrainer_tpu.models.sd3 import SD3Config


def sd3_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                              gradient_checkpointing=False) -> SD3Config:
    return SD3Config(
        sample_size=config.get("sample_size", 128),
        patch_size=config.get("patch_size", 2),
        in_channels=config.get("in_channels", 16),
        out_channels=config.get("out_channels", 16),
        num_layers=config.get("num_layers", 24),
        num_heads=config.get("num_attention_heads", 24),
        head_dim=config.get("attention_head_dim", 64),
        joint_attention_dim=config.get("joint_attention_dim", 4096),
        caption_projection_dim=config.get("caption_projection_dim", 1536),
        pooled_projection_dim=config.get("pooled_projection_dim", 2048),
        pos_embed_max_size=config.get("pos_embed_max_size", 192),
        qk_norm=config.get("qk_norm") == "rms_norm",
        gradient_checkpointing=gradient_checkpointing,
        remat_policy=_remat_default("sd3"),
        dtype=dtype,
    )


def load_sd3_diffusers(base_dir: str, weight_dtype=np.float32,
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
        base_dir, "text_encoder", clip_state_dict_to_flax, np_dtype, device)
    te2_cfg_json, te2_params = load_component(
        base_dir, "text_encoder_2", clip_state_dict_to_flax, np_dtype, device)
    te3_cfg_json, te3_params = load_component(
        base_dir, "text_encoder_3", t5_state_dict_to_flax, np_dtype, device)

    def with_projection(cfg_json, default_dim):
        cfg = clip_config_from_transformers(cfg_json or {}, compute_dtype)
        if cfg.projection_dim is None:
            cfg = replace(cfg, projection_dim=(cfg_json or {}).get(
                "projection_dim", default_dim))
        return cfg

    vae_cfg = vae_config_from_diffusers(vae_cfg_json or {}, compute_dtype)
    if vae_cfg_json is None:
        vae_cfg = replace(vae_cfg, latent_channels=16,
                          scaling_factor=1.5305, shift_factor=0.0609)

    return {
        "transformer_config": sd3_config_from_diffusers(
            tcfg_json or {}, compute_dtype, gradient_checkpointing),
        "vae_config": vae_cfg,
        "te_config": with_projection(te_cfg_json, 768),
        "te2_config": with_projection(te2_cfg_json, 1280),
        "te3_config": t5_config_from_transformers(te3_cfg_json or {}, compute_dtype),
        "transformer_params": transformer_params,
        "vae_params": vae_params,
        "te_params": te_params,
        "te2_params": te2_params,
        "te3_params": te3_params,
        "tokenizer_dir": os.path.join(base_dir, "tokenizer"),
        "tokenizer_2_dir": os.path.join(base_dir, "tokenizer_2"),
        "tokenizer_3_dir": os.path.join(base_dir, "tokenizer_3"),
        "prediction_type": "flow",
    }


def save_sd3_diffusers(base_dir, model, transformer_params, vae_params,
                       te_params, te2_params, te3_params,
                       save_dtype=np.float32, metadata: dict | None = None,
                       source_dir: str | None = None):
    import shutil
    os.makedirs(base_dir, exist_ok=True)
    if source_dir:
        for name in ("transformer", "vae", "text_encoder", "text_encoder_2",
                     "text_encoder_3", "tokenizer", "tokenizer_2",
                     "tokenizer_3", "scheduler"):
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
        clip_flax_to_state_dict(_to_numpy_tree(te_params, save_dtype)), meta)
    save_safetensors(
        os.path.join(base_dir, "text_encoder_2", "model.safetensors"),
        clip_flax_to_state_dict(_to_numpy_tree(te2_params, save_dtype)), meta)
    if te3_params is not None:
        save_safetensors(
            os.path.join(base_dir, "text_encoder_3", "model.safetensors"),
            t5_flax_to_state_dict(_to_numpy_tree(te3_params, save_dtype)), meta)
