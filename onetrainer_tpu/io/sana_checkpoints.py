"""Load / save Sana checkpoints in diffusers directory layout
(reference: modules/modelLoader/sana/SanaModelLoader.py): transformer/
(SanaTransformer2DModel), vae/ (AutoencoderDC), text_encoder/ (Gemma2),
tokenizer/.

Transformer and Gemma key maps follow the diffusers/transformers module
trees exactly; the DC-AE block layout keys round-trip exactly within this
framework (the diffusers AutoencoderDC ModuleList flattening may differ —
revisit against a real checkpoint)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.safetensors_io import save_safetensors
from onetrainer_tpu.io.sd_checkpoints import (
    _read_json, _to_numpy_tree, load_component,
)
from onetrainer_tpu.io.torch_flax import (
    flax_params_to_torch, torch_state_dict_to_flax,
)
from onetrainer_tpu.models.dcae import DCAEConfig
from onetrainer_tpu.models.gemma import Gemma2Config
from onetrainer_tpu.models.sana import SanaConfig

_SANA_RENAMES = [
    ("patch_embed.proj.", "patch_embed_proj."),
    ("time_embed.emb.timestep_embedder.", "time_embed_emb_timestep_embedder."),
    ("time_embed.linear.", "time_embed_linear."),
    ("caption_projection.linear_1.", "caption_projection_linear_1."),
    ("caption_projection.linear_2.", "caption_projection_linear_2."),
]


def sana_torch_key_map(key: str) -> str:
    for torch_prefix, flax_prefix in _SANA_RENAMES:
        if key.startswith(torch_prefix):
            return flax_prefix + key[len(torch_prefix):]
    return key


def sana_flax_key_map(key: str) -> str:
    for torch_prefix, flax_prefix in _SANA_RENAMES:
        if key.startswith(flax_prefix):
            return torch_prefix + key[len(flax_prefix):]
    return key


def sana_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    # scale_shift_table leaves pass through the generic converter untouched
    # (2D, leaf name is neither 'weight' nor 'bias')
    return torch_state_dict_to_flax(state_dict, key_map=sana_torch_key_map)


def sana_flax_to_state_dict(params: dict) -> dict[str, np.ndarray]:
    return flax_params_to_torch(params, key_map=sana_flax_key_map)


_GEMMA_EMBEDDING_PATHS = frozenset({("embed_tokens",)})


def gemma_torch_key_map(key: str) -> str | None:
    if key.startswith("model."):
        key = key[len("model."):]
    return key


def gemma_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    return torch_state_dict_to_flax(
        state_dict, key_map=gemma_torch_key_map,
        embedding_paths=_GEMMA_EMBEDDING_PATHS)


def gemma_flax_to_state_dict(params: dict) -> dict[str, np.ndarray]:
    return flax_params_to_torch(
        params, embedding_paths=_GEMMA_EMBEDDING_PATHS)


def dcae_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    return torch_state_dict_to_flax(state_dict)


def dcae_flax_to_state_dict(params: dict) -> dict[str, np.ndarray]:
    return flax_params_to_torch(params)


def sana_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                               gradient_checkpointing=False) -> SanaConfig:
    return SanaConfig(
        in_channels=config.get("in_channels", 32),
        out_channels=config.get("out_channels", 32),
        num_layers=config.get("num_layers", 20),
        num_attention_heads=config.get("num_attention_heads", 70),
        attention_head_dim=config.get("attention_head_dim", 32),
        num_cross_attention_heads=config.get("num_cross_attention_heads", 20),
        cross_attention_head_dim=config.get("cross_attention_head_dim", 112),
        caption_channels=config.get("caption_channels", 2304),
        mlp_ratio=config.get("mlp_ratio", 2.5),
        patch_size=config.get("patch_size", 1),
        gradient_checkpointing=gradient_checkpointing,
        dtype=dtype,
    )


def gemma_config_from_transformers(config: dict, dtype=jnp.bfloat16) -> Gemma2Config:
    return Gemma2Config(
        vocab_size=config.get("vocab_size", 256000),
        hidden_size=config.get("hidden_size", 2304),
        intermediate_size=config.get("intermediate_size", 9216),
        num_layers=config.get("num_hidden_layers", 26),
        num_heads=config.get("num_attention_heads", 8),
        num_kv_heads=config.get("num_key_value_heads", 4),
        head_dim=config.get("head_dim", 256),
        rope_theta=config.get("rope_theta", 10000.0),
        attn_logit_softcapping=config.get("attn_logit_softcapping", 50.0),
        query_pre_attn_scalar=config.get("query_pre_attn_scalar", 256.0),
        dtype=dtype,
    )


def dcae_config_from_diffusers(config: dict, dtype=jnp.bfloat16) -> DCAEConfig:
    enc = tuple(config.get("encoder_block_out_channels",
                           (128, 256, 512, 512, 1024, 1024)))
    dec = tuple(config.get("decoder_block_out_channels", enc))
    n = len(enc)
    return DCAEConfig(
        in_channels=config.get("in_channels", 3),
        latent_channels=config.get("latent_channels", 32),
        encoder_block_out_channels=enc,
        decoder_block_out_channels=dec,
        encoder_layers_per_block=tuple(
            config.get("encoder_layers_per_block", (2, 2, 2, 3, 3, 3))[:n]),
        decoder_layers_per_block=tuple(
            config.get("decoder_layers_per_block", (3, 3, 3, 3, 3, 3))[:n]),
        vit_stages=tuple(
            "Sana" in str(t) or "ViT" in str(t)
            for t in config.get("encoder_block_types",
                                ["ResBlock"] * 3 + ["EfficientViTBlock"] * 3)),
        attention_head_dim=config.get("attention_head_dim", 32),
        scaling_factor=config.get("scaling_factor", 0.41407),
        dtype=dtype,
    )


def load_sana_diffusers(base_dir: str, weight_dtype=np.float32,
                        compute_dtype=jnp.bfloat16,
                        gradient_checkpointing=False,
                        device: bool = True):
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)

    tcfg, transformer_params = load_component(
        base_dir, "transformer", sana_state_dict_to_flax, np_dtype, device)
    vcfg, vae_params = load_component(
        base_dir, "vae", dcae_state_dict_to_flax, np_dtype, device)
    gcfg, te_params = load_component(
        base_dir, "text_encoder", gemma_state_dict_to_flax, np_dtype, device)

    tconfig = sana_config_from_diffusers(tcfg or {}, compute_dtype,
                                         gradient_checkpointing)
    # bias layout detection (attn1/attn2 qkv bias presence varies)
    if transformer_params is not None:
        blocks0 = transformer_params.get("transformer_blocks_0", {})
        qkv_bias = "bias" in blocks0.get("attn1", {}).get("to_q", {})
        cross_bias = "bias" in blocks0.get("attn2", {}).get("to_q", {})
        from dataclasses import replace
        tconfig = replace(tconfig, qkv_bias=qkv_bias, cross_qkv_bias=cross_bias)

    return {
        "transformer_config": tconfig,
        "vae_config": dcae_config_from_diffusers(vcfg or {}, compute_dtype),
        "te_config": gemma_config_from_transformers(gcfg or {}, compute_dtype),
        "transformer_params": transformer_params,
        "vae_params": vae_params,
        "te_params": te_params,
        "tokenizer_dir": os.path.join(base_dir, "tokenizer"),
        "prediction_type": "flow",
    }


def save_sana_diffusers(base_dir, model, transformer_params, te_params,
                        save_dtype=np.float32,
                        source_dir: str | None = None):
    import shutil
    os.makedirs(base_dir, exist_ok=True)
    if source_dir:
        for name in ("transformer", "vae", "text_encoder", "tokenizer",
                     "scheduler"):
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
         sana_flax_to_state_dict(_to_numpy_tree(transformer_params)).items()})
    if te_params is not None:
        os.makedirs(os.path.join(base_dir, "text_encoder"), exist_ok=True)
        save_safetensors(
            os.path.join(base_dir, "text_encoder", "model.safetensors"),
            {k: np.asarray(v, save_dtype) for k, v in
             gemma_flax_to_state_dict(_to_numpy_tree(te_params)).items()})
