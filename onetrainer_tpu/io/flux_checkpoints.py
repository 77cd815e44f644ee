"""Load / save FLUX checkpoints in diffusers directory layout
(reference: modules/modelLoader/flux/FluxModelLoader.py,
modules/modelSaver/flux/FluxModelSaver.py).

Layout: transformer/ (FluxTransformer2DModel, possibly sharded), vae/
(16ch AutoencoderKL), text_encoder/ (CLIP-L), text_encoder_2/ (T5-XXL,
possibly sharded), tokenizer/, tokenizer_2/, scheduler/.
"""

from __future__ import annotations

import os
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.safetensors_io import save_safetensors
from onetrainer_tpu.io.sd_checkpoints import (
    _read_json, _to_numpy_tree, clip_config_from_transformers, load_component,
    vae_config_from_diffusers,
)
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, clip_state_dict_to_flax, t5_state_dict_to_flax,
    unet_flax_to_state_dict, unet_state_dict_to_flax, vae_state_dict_to_flax,
)
from onetrainer_tpu.models.flux import FluxConfig
from onetrainer_tpu.models.remat import default_policy as _remat_default
from onetrainer_tpu.models.t5 import T5Config


def flux_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                               gradient_checkpointing=False) -> FluxConfig:
    return FluxConfig(
        in_channels=config.get("in_channels", 64),
        out_channels=config.get("out_channels") or config.get("in_channels", 64),
        num_layers=config.get("num_layers", 19),
        num_single_layers=config.get("num_single_layers", 38),
        hidden_size=config.get("num_attention_heads", 24)
        * config.get("attention_head_dim", 128),
        num_heads=config.get("num_attention_heads", 24),
        head_dim=config.get("attention_head_dim", 128),
        joint_attention_dim=config.get("joint_attention_dim", 4096),
        pooled_projection_dim=config.get("pooled_projection_dim", 768),
        guidance_embeds=config.get("guidance_embeds", True),
        axes_dims_rope=tuple(config.get("axes_dims_rope", (16, 56, 56))),
        gradient_checkpointing=gradient_checkpointing,
        remat_policy=_remat_default("flux"),
        dtype=dtype,
    )


def t5_config_from_transformers(config: dict, dtype=jnp.bfloat16) -> T5Config:
    return T5Config(
        vocab_size=config.get("vocab_size", 32128),
        d_model=config.get("d_model", 4096),
        d_kv=config.get("d_kv", 64),
        d_ff=config.get("d_ff", 10240),
        num_layers=config.get("num_layers", 24),
        num_heads=config.get("num_heads", 64),
        relative_attention_num_buckets=config.get(
            "relative_attention_num_buckets", 32),
        relative_attention_max_distance=config.get(
            "relative_attention_max_distance", 128),
        dtype=dtype,
    )


def load_flux_diffusers(base_dir: str, weight_dtype=np.float32,
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
        base_dir, "text_encoder_2", t5_state_dict_to_flax, np_dtype, device)

    vae_cfg = vae_config_from_diffusers(vae_cfg_json or {}, compute_dtype)
    if vae_cfg_json is None:
        vae_cfg = replace(vae_cfg, latent_channels=16,
                          scaling_factor=0.3611, shift_factor=0.1159)

    return {
        "transformer_config": flux_config_from_diffusers(
            tcfg_json or {}, compute_dtype, gradient_checkpointing),
        "vae_config": vae_cfg,
        "te_config": clip_config_from_transformers(te_cfg_json or {}, compute_dtype),
        "te2_config": t5_config_from_transformers(te2_cfg_json or {}, compute_dtype),
        "transformer_params": transformer_params,
        "vae_params": vae_params,
        "te_params": te_params,
        "te2_params": te2_params,
        "tokenizer_dir": os.path.join(base_dir, "tokenizer"),
        "tokenizer_2_dir": os.path.join(base_dir, "tokenizer_2"),
        "prediction_type": "flow",
    }


def save_flux_diffusers(base_dir, model, transformer_params, vae_params,
                        te_params, te2_params, save_dtype=np.float32,
                        metadata: dict | None = None,
                        source_dir: str | None = None):
    import shutil
    from onetrainer_tpu.io.torch_flax import t5_flax_to_state_dict

    os.makedirs(base_dir, exist_ok=True)
    if source_dir:
        for name in ("transformer", "vae", "text_encoder", "text_encoder_2",
                     "tokenizer", "tokenizer_2", "scheduler"):
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
        t5_flax_to_state_dict(_to_numpy_tree(te2_params, save_dtype)), meta)
