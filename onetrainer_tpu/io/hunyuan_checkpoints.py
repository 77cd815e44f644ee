"""Load / save HunyuanVideo checkpoints in diffusers directory layout
(reference: modules/modelLoader/hunyuanVideo/HunyuanVideoModelLoader.py):
transformer/ (HunyuanVideoTransformer3DModel), vae/
(AutoencoderKLHunyuanVideo), text_encoder/ (LlamaModel),
text_encoder_2/ (CLIPTextModel), tokenizer/, tokenizer_2/.

The transformer keys are FLUX-style and convert mechanically except
x_embedder.proj: a conv3d with kernel (1, 2, 2) whose weight reshapes
losslessly to the packed-token Dense. The video-VAE block layout
round-trips exactly within this framework (the diffusers causal-VAE
ModuleList flattening may differ — revisit against a real checkpoint)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.safetensors_io import save_safetensors
from onetrainer_tpu.io.sd_checkpoints import (
    _to_numpy_tree, clip_config_from_transformers, load_component,
)
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, clip_state_dict_to_flax, flax_params_to_torch,
    torch_state_dict_to_flax,
)
from onetrainer_tpu.models.hunyuan_video import HunyuanVideoConfig
from onetrainer_tpu.models.llama import LlamaConfig
from onetrainer_tpu.models.remat import default_policy as _remat_default
from onetrainer_tpu.models.video_vae import VideoVAEConfig

_LLAMA_EMBEDDING_PATHS = frozenset({("embed_tokens",)})


def hunyuan_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    sd = dict(state_dict)
    key = "x_embedder.proj.weight"
    if key in sd and np.asarray(sd[key]).ndim == 5:
        w = np.asarray(sd[key])                 # [dim, C, 1, 2, 2]
        sd[key] = w.reshape(w.shape[0], -1)     # -> [dim, C*4] (c-major, 2x2)
    return torch_state_dict_to_flax(sd)


def hunyuan_flax_to_state_dict(params: dict) -> dict[str, np.ndarray]:
    sd = flax_params_to_torch(params)
    key = "x_embedder.proj.weight"
    if key in sd:
        w = np.asarray(sd[key])                 # [dim, C*4]
        sd[key] = w.reshape(w.shape[0], -1, 1, 2, 2)
    return sd


def llama_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    def key_map(key):
        return key[len("model."):] if key.startswith("model.") else key
    return torch_state_dict_to_flax(state_dict, key_map=key_map,
                                    embedding_paths=_LLAMA_EMBEDDING_PATHS)


def llama_flax_to_state_dict(params: dict) -> dict[str, np.ndarray]:
    return flax_params_to_torch(params, embedding_paths=_LLAMA_EMBEDDING_PATHS)


def video_vae_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    return torch_state_dict_to_flax(state_dict)


def video_vae_flax_to_state_dict(params: dict) -> dict[str, np.ndarray]:
    return flax_params_to_torch(params)


def hunyuan_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                                  gradient_checkpointing=False,
                                  ) -> HunyuanVideoConfig:
    return HunyuanVideoConfig(
        in_channels=config.get("in_channels", 16),
        out_channels=config.get("out_channels", 16),
        num_layers=config.get("num_layers", 20),
        num_single_layers=config.get("num_single_layers", 40),
        num_refiner_layers=config.get("num_refiner_layers", 2),
        hidden_size=config.get("num_attention_heads", 24)
        * config.get("attention_head_dim", 128),
        num_heads=config.get("num_attention_heads", 24),
        head_dim=config.get("attention_head_dim", 128),
        text_embed_dim=config.get("text_embed_dim", 4096),
        pooled_projection_dim=config.get("pooled_projection_dim", 768),
        guidance_embeds=config.get("guidance_embeds", True),
        axes_dims_rope=tuple(config.get("rope_axes_dim", (16, 56, 56))),
        gradient_checkpointing=gradient_checkpointing,
        remat_policy=_remat_default("hunyuan_video"),
        dtype=dtype,
    )


def llama_config_from_transformers(config: dict, dtype=jnp.bfloat16) -> LlamaConfig:
    return LlamaConfig(
        vocab_size=config.get("vocab_size", 128320),
        hidden_size=config.get("hidden_size", 4096),
        intermediate_size=config.get("intermediate_size", 14336),
        num_layers=config.get("num_hidden_layers", 32),
        num_heads=config.get("num_attention_heads", 32),
        num_kv_heads=config.get("num_key_value_heads", 8),
        head_dim=config.get("head_dim",
                            config.get("hidden_size", 4096)
                            // config.get("num_attention_heads", 32)),
        rope_theta=config.get("rope_theta", 500000.0),
        rms_norm_eps=config.get("rms_norm_eps", 1e-5),
        dtype=dtype,
    )


def video_vae_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                                    ) -> VideoVAEConfig:
    return VideoVAEConfig(
        in_channels=config.get("in_channels", 3),
        latent_channels=config.get("latent_channels", 16),
        block_out_channels=tuple(config.get(
            "block_out_channels", (128, 256, 512, 512))),
        layers_per_block=config.get("layers_per_block", 2),
        temporal_compression=config.get("temporal_compression_ratio", 4),
        spatial_compression=config.get("spatial_compression_ratio", 8),
        scaling_factor=config.get("scaling_factor", 0.476986),
        dtype=dtype,
    )


def load_hunyuan_diffusers(base_dir: str, weight_dtype=np.float32,
                           compute_dtype=jnp.bfloat16,
                           gradient_checkpointing=False,
                           device: bool = True):
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)

    tcfg, transformer_params = load_component(
        base_dir, "transformer", hunyuan_state_dict_to_flax, np_dtype, device)
    vcfg, vae_params = load_component(
        base_dir, "vae", video_vae_state_dict_to_flax, np_dtype, device)
    lcfg, te_params = load_component(
        base_dir, "text_encoder", llama_state_dict_to_flax, np_dtype, device)
    ccfg, te2_params = load_component(
        base_dir, "text_encoder_2", clip_state_dict_to_flax, np_dtype, device)

    return {
        "transformer_config": hunyuan_config_from_diffusers(
            tcfg or {}, compute_dtype, gradient_checkpointing),
        "vae_config": video_vae_config_from_diffusers(vcfg or {}, compute_dtype),
        "te_config": llama_config_from_transformers(lcfg or {}, compute_dtype),
        "te2_config": clip_config_from_transformers(ccfg or {}, compute_dtype),
        "transformer_params": transformer_params,
        "vae_params": vae_params,
        "te_params": te_params,
        "te2_params": te2_params,
        "tokenizer_dir": os.path.join(base_dir, "tokenizer"),
        "tokenizer_2_dir": os.path.join(base_dir, "tokenizer_2"),
        "prediction_type": "flow",
    }


def save_hunyuan_diffusers(base_dir, model, transformer_params, te_params,
                           save_dtype=np.float32,
                           source_dir: str | None = None):
    import shutil
    os.makedirs(base_dir, exist_ok=True)
    if source_dir:
        for name in ("transformer", "vae", "text_encoder", "text_encoder_2",
                     "tokenizer", "tokenizer_2", "scheduler"):
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
         hunyuan_flax_to_state_dict(_to_numpy_tree(transformer_params)).items()})
    if te_params is not None:
        os.makedirs(os.path.join(base_dir, "text_encoder"), exist_ok=True)
        save_safetensors(
            os.path.join(base_dir, "text_encoder", "model.safetensors"),
            {k: np.asarray(v, save_dtype) for k, v in
             llama_flax_to_state_dict(_to_numpy_tree(te_params)).items()})
