"""Load / save HiDream checkpoints in diffusers directory layout
(reference: modules/modelLoader/hiDream/HiDreamModelLoader.py):
transformer/, vae/ (FLUX 16ch), text_encoder/ (CLIP-L),
text_encoder_2/ (CLIP-G), text_encoder_3/ (T5), text_encoder_4/ (Llama),
tokenizer{,_2,_3,_4}/.

The transformer key map is mechanical over this framework's module tree
(adaLN_modulation_1 ↔ adaLN_modulation.1, final_layer_* ↔ final_layer.*,
caption_projection_{i} ↔ caption_projection.{i}); MoE expert tensors ride
the generic rules."""

from __future__ import annotations

import os
import re

import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.flux_checkpoints import t5_config_from_transformers
from onetrainer_tpu.io.hunyuan_checkpoints import (
    llama_config_from_transformers, llama_flax_to_state_dict,
    llama_state_dict_to_flax,
)
from onetrainer_tpu.io.safetensors_io import save_safetensors
from onetrainer_tpu.io.sd_checkpoints import (
    _to_numpy_tree, clip_config_from_transformers, load_component,
    vae_config_from_diffusers,
)
from onetrainer_tpu.io.torch_flax import (
    clip_state_dict_to_flax, flax_params_to_torch, t5_state_dict_to_flax,
    torch_state_dict_to_flax, vae_state_dict_to_flax,
)
from onetrainer_tpu.models.hidream import HiDreamConfig

_HIDREAM_RULES = [
    (re.compile(r"\.adaLN_modulation\.1\."), ".adaLN_modulation_1."),
    (re.compile(r"^final_layer\.adaLN_modulation\.1\."),
     "final_layer_adaLN_modulation_1."),
    (re.compile(r"^final_layer\.linear\."), "final_layer_linear."),
    (re.compile(r"^caption_projection\.(\d+)\."), r"caption_projection_\1."),
]
_HIDREAM_INVERSE = [
    (re.compile(r"\.adaLN_modulation_1\."), ".adaLN_modulation.1."),
    (re.compile(r"^final_layer_adaLN_modulation_1\."),
     "final_layer.adaLN_modulation.1."),
    (re.compile(r"^final_layer_linear\."), "final_layer.linear."),
    (re.compile(r"^caption_projection\.(\d+)\."), r"caption_projection.\1."),
]


def hidream_torch_key_map(key: str) -> str:
    for pattern, repl in _HIDREAM_RULES:
        key = pattern.sub(repl, key)
    return key


def hidream_flax_key_map(key: str) -> str:
    for pattern, repl in _HIDREAM_INVERSE:
        key = pattern.sub(repl, key)
    return key


def hidream_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    return torch_state_dict_to_flax(state_dict, key_map=hidream_torch_key_map)


def hidream_flax_to_state_dict(params: dict) -> dict[str, np.ndarray]:
    return flax_params_to_torch(params, key_map=hidream_flax_key_map)


def hidream_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                                  gradient_checkpointing=False) -> HiDreamConfig:
    return HiDreamConfig(
        in_channels=config.get("in_channels", 16),
        out_channels=config.get("out_channels", 16),
        patch_size=config.get("patch_size", 2),
        num_layers=config.get("num_layers", 16),
        num_single_layers=config.get("num_single_layers", 32),
        hidden_size=config.get("num_attention_heads", 20)
        * config.get("attention_head_dim", 128),
        num_heads=config.get("num_attention_heads", 20),
        head_dim=config.get("attention_head_dim", 128),
        t5_dim=config.get("caption_channels", [4096, 4096])[0]
        if isinstance(config.get("caption_channels"), list) else 4096,
        pooled_dim=config.get("text_emb_dim", 2048),
        num_routed_experts=config.get("num_routed_experts", 4),
        num_activated_experts=config.get("num_activated_experts", 2),
        axes_dims_rope=tuple(config.get("axes_dims_rope", (64, 32, 32))),
        gradient_checkpointing=gradient_checkpointing,
        dtype=dtype,
    )


def load_hidream_diffusers(base_dir: str, weight_dtype=np.float32,
                           compute_dtype=jnp.bfloat16,
                           gradient_checkpointing=False,
                           device: bool = True):
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)

    tcfg, transformer_params = load_component(
        base_dir, "transformer", hidream_state_dict_to_flax, np_dtype, device)
    vcfg, vae_params = load_component(
        base_dir, "vae", vae_state_dict_to_flax, np_dtype, device)
    c1, te_params = load_component(
        base_dir, "text_encoder", clip_state_dict_to_flax, np_dtype, device)
    c2, te2_params = load_component(
        base_dir, "text_encoder_2", clip_state_dict_to_flax, np_dtype, device)
    c3, te3_params = load_component(
        base_dir, "text_encoder_3", t5_state_dict_to_flax, np_dtype, device)
    c4, te4_params = load_component(
        base_dir, "text_encoder_4", llama_state_dict_to_flax, np_dtype, device)

    return {
        "transformer_config": hidream_config_from_diffusers(
            tcfg or {}, compute_dtype, gradient_checkpointing),
        "vae_config": vae_config_from_diffusers(vcfg or {}, compute_dtype),
        "te_config": clip_config_from_transformers(c1 or {}, compute_dtype),
        "te2_config": clip_config_from_transformers(c2 or {}, compute_dtype),
        "te3_config": t5_config_from_transformers(c3 or {}, compute_dtype),
        "te4_config": llama_config_from_transformers(c4 or {}, compute_dtype),
        "transformer_params": transformer_params,
        "vae_params": vae_params,
        "te_params": te_params,
        "te2_params": te2_params,
        "te3_params": te3_params,
        "te4_params": te4_params,
        "tokenizer_dir": os.path.join(base_dir, "tokenizer"),
        "tokenizer_2_dir": os.path.join(base_dir, "tokenizer_2"),
        "tokenizer_3_dir": os.path.join(base_dir, "tokenizer_3"),
        "tokenizer_4_dir": os.path.join(base_dir, "tokenizer_4"),
        "prediction_type": "flow",
    }


def save_hidream_diffusers(base_dir, model, transformer_params,
                           save_dtype=np.float32,
                           source_dir: str | None = None):
    import shutil
    os.makedirs(base_dir, exist_ok=True)
    if source_dir:
        for name in ("transformer", "vae", "text_encoder", "text_encoder_2",
                     "text_encoder_3", "text_encoder_4", "tokenizer",
                     "tokenizer_2", "tokenizer_3", "tokenizer_4", "scheduler"):
            src = os.path.join(source_dir, name)
            dst = os.path.join(base_dir, name)
            if os.path.isdir(src) and not os.path.isdir(dst):
                shutil.copytree(src, dst,
                                ignore=shutil.ignore_patterns("*.safetensors",
                                                              "*.bin"))
    os.makedirs(os.path.join(base_dir, "transformer"), exist_ok=True)
    save_safetensors(
        os.path.join(base_dir, "transformer",
                     "diffusion_pytorch_model.safetensors"),
        {k: np.asarray(v, save_dtype) for k, v in
         hidream_flax_to_state_dict(_to_numpy_tree(transformer_params)).items()})
