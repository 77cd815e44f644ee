"""Load / save Würstchen v2 / Stable Cascade checkpoints
(reference: modules/modelLoader/wuerstchen/WuerstchenModelLoader.py,
modules/modelSaver/wuerstchen/WuerstchenModelSaver.py).

Layout: the prior repo (warp-ai/wuerstchen-prior style) holds
prior/ + text_encoder/ + tokenizer/; the EfficientNet encoder is a
standalone safetensors state dict (keys backbone.* / mapper.*); the
decoder repo is only needed for sampling and loads lazily.
"""

from __future__ import annotations

import os
import re

import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.sd_checkpoints import (
    _read_json, _to_numpy_tree, clip_config_from_transformers, load_component,
)
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, clip_state_dict_to_flax, flax_params_to_torch,
    torch_state_dict_to_flax,
)
from onetrainer_tpu.models.wuerstchen import EffnetConfig, WuerstchenPriorConfig


def prior_config_from_diffusers(config: dict, dtype=jnp.bfloat16,
                                gradient_checkpointing=False):
    if "block_out_channels" in config or "down_num_layers_per_block" in config \
            or str(config.get("_class_name", "")) == "StableCascadeUNet":
        from onetrainer_tpu.models.cascade import CascadePriorConfig
        hidden = tuple(config.get("block_out_channels", (2048, 2048)))
        return CascadePriorConfig(
            c_in=config.get("in_channels", 16),
            c_hidden=hidden,
            nhead=tuple(config.get("num_attention_heads", (32, 32))),
            blocks=tuple(config.get("down_num_layers_per_block", (8, 24))),
            c_cond=config.get("c_cond", hidden[0]),
            clip_text_in=config.get("clip_text_in_channels", 1280),
            clip_text_pooled_in=config.get("clip_text_pooled_in_channels", 1280),
            clip_image_in=config.get("clip_image_in_channels", 768),
            patch_size=config.get("patch_size", 1),
            gradient_checkpointing=gradient_checkpointing,
            dtype=dtype,
        )
    return WuerstchenPriorConfig(
        c_in=config.get("c_in", 16),
        c=config.get("c", 1536),
        c_cond=config.get("c_cond", 1024),
        c_r=config.get("c_r", 64),
        depth=config.get("depth", 32),
        nhead=config.get("nhead", 24),
        gradient_checkpointing=gradient_checkpointing,
        dtype=dtype,
    )


def prior_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    # mechanical: blocks.{i}.* / cond_mapper.{i}.* / out.1.* merge into the
    # flax module names directly (torch_flax.merge_int_tokens)
    return torch_state_dict_to_flax(state_dict)


def prior_flax_to_state_dict(params: dict) -> dict[str, np.ndarray]:
    return flax_params_to_torch(params)


# -- EfficientNet encoder: torchvision feature keys -> named stages -----------------

_EFFNET_RULES = [
    (re.compile(r"^backbone\.0\.([01])\."),
     lambda m: "stem." + ("conv." if m.group(1) == "0" else "norm.")),
    (re.compile(r"^backbone\.(\d+)\.(\d+)\.block\.(\d+)\.fc([12])\."),
     lambda m: f"stage{m.group(1)}_{m.group(2)}.se.fc{m.group(4)}."),
    (re.compile(r"^backbone\.(\d+)\.(\d+)\.block\.(\d+)\.([01])\."),
     lambda m: f"stage{m.group(1)}_{m.group(2)}.block{m.group(3)}."
     + ("conv." if m.group(4) == "0" else "norm.")),
    (re.compile(r"^backbone\.7\.([01])\."),
     lambda m: "head." + ("conv." if m.group(1) == "0" else "norm.")),
    (re.compile(r"^backbone\.8\.([01])\."),        # effnet_v2_l head index
     lambda m: "head." + ("conv." if m.group(1) == "0" else "norm.")),
    (re.compile(r"^mapper\.0\."), lambda m: "mapper_conv."),
    (re.compile(r"^mapper\.1\."), lambda m: "mapper_norm."),
]


def effnet_torch_key_map(key: str) -> str | None:
    if key.endswith("num_batches_tracked"):
        return None
    for pattern, repl in _EFFNET_RULES:
        m = pattern.match(key)
        if m:
            return repl(m) + key[m.end():]
    return key


def effnet_flax_key_map(key: str) -> str:
    """Inverse of effnet_torch_key_map (for export). Input keys arrive in
    split_int_tokens form, e.g. 'stage1.0.block0.conv.weight'. The SE module
    always sits at torch index block.2 (after expand + depthwise)."""
    key = key.replace("stem.conv.", "backbone.0.0.")
    key = key.replace("stem.norm.", "backbone.0.1.")
    key = re.sub(r"^stage(\d+)\.(\d+)\.se\.fc([12])\.",
                 r"backbone.\1.\2.block.2.fc\3.", key)
    key = re.sub(r"^stage(\d+)\.(\d+)\.block(\d+)\.conv\.",
                 r"backbone.\1.\2.block.\3.0.", key)
    key = re.sub(r"^stage(\d+)\.(\d+)\.block(\d+)\.norm\.",
                 r"backbone.\1.\2.block.\3.1.", key)
    key = key.replace("head.conv.", "backbone.7.0.")
    key = key.replace("head.norm.", "backbone.7.1.")
    key = key.replace("mapper_conv.", "mapper.0.")
    key = key.replace("mapper_norm.", "mapper.1.")
    return key


def effnet_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    return torch_state_dict_to_flax(state_dict, key_map=effnet_torch_key_map)


def load_wuerstchen_diffusers(base_dir: str,
                              effnet_path: str | None = None,
                              weight_dtype=np.float32,
                              compute_dtype=jnp.bfloat16,
                              gradient_checkpointing=False,
                              device: bool = True):
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)

    prior_cfg_json, prior_params = load_component(
        base_dir, "prior", prior_state_dict_to_flax, np_dtype, device)
    te_cfg_json, te_params = load_component(
        base_dir, "text_encoder", clip_state_dict_to_flax, np_dtype, device)

    effnet_params = None
    effnet_cfg = EffnetConfig(dtype=compute_dtype)
    if effnet_path and os.path.isfile(effnet_path):
        sd = load_safetensors(effnet_path)
        sd = {k: v.astype(np_dtype)
              if np.issubdtype(np.asarray(v).dtype, np.floating) else v
              for k, v in sd.items()}
        effnet_params = effnet_state_dict_to_flax(sd)
        if device:
            import jax
            effnet_params = jax.tree.map(jnp.asarray, effnet_params)

    return {
        "prior_config": prior_config_from_diffusers(
            prior_cfg_json or {}, compute_dtype, gradient_checkpointing),
        "te_config": clip_config_from_transformers(
            te_cfg_json or {}, compute_dtype),
        "effnet_config": effnet_cfg,
        "prior_params": prior_params,
        "te_params": te_params,
        "effnet_params": effnet_params,
        "tokenizer_dir": os.path.join(base_dir, "tokenizer"),
        "prediction_type": "epsilon",
    }


def save_wuerstchen_diffusers(base_dir, model, prior_params, te_params,
                              save_dtype=np.float32,
                              source_dir: str | None = None):
    import shutil
    os.makedirs(base_dir, exist_ok=True)
    if source_dir:
        for name in ("prior", "text_encoder", "tokenizer", "scheduler"):
            src = os.path.join(source_dir, name)
            dst = os.path.join(base_dir, name)
            if os.path.isdir(src) and not os.path.isdir(dst):
                shutil.copytree(src, dst,
                                ignore=shutil.ignore_patterns("*.safetensors",
                                                              "*.bin"))
    os.makedirs(os.path.join(base_dir, "prior"), exist_ok=True)
    os.makedirs(os.path.join(base_dir, "text_encoder"), exist_ok=True)
    save_safetensors(
        os.path.join(base_dir, "prior", "diffusion_pytorch_model.safetensors"),
        {k: np.asarray(v, save_dtype) for k, v in
         prior_flax_to_state_dict(_to_numpy_tree(prior_params)).items()})
    if te_params is not None:
        save_safetensors(
            os.path.join(base_dir, "text_encoder", "model.safetensors"),
            {k: np.asarray(v, save_dtype) for k, v in
             clip_flax_to_state_dict(_to_numpy_tree(te_params)).items()})


# -- decoder stage (DiffNeXt + Paella VQGAN + decoder CLIP), sampling only -----------

def diffnext_config_from_diffusers(config: dict, dtype=jnp.bfloat16):
    """diffusers WuerstchenDiffNeXt config.json -> DiffNeXtConfig
    (reference: WuerstchenModelLoader loads decoder_decoder from the
    decoder repo's `decoder` subfolder)."""
    from onetrainer_tpu.models.diffnext import DiffNeXtConfig
    return DiffNeXtConfig(
        c_in=config.get("c_in", 4),
        c_out=config.get("c_out", 4),
        c_r=config.get("c_r", 64),
        patch_size=config.get("patch_size", 2),
        c_cond=config.get("c_cond", 1024),
        c_hidden=tuple(config.get("c_hidden", (320, 640, 1280, 1280))),
        nhead=tuple(config.get("nhead", (-1, 10, 20, 20))),
        blocks=tuple(config.get("blocks", (4, 4, 14, 4))),
        level_config=tuple(config.get("level_config",
                                      ("CT", "CTA", "CTA", "CTA"))),
        inject_effnet=tuple(config.get("inject_effnet",
                                       (False, True, True, True))),
        effnet_embd=config.get("effnet_embd", 16),
        clip_embd=config.get("clip_embd", 1024),
        kernel_size=config.get("kernel_size", 3),
        dtype=dtype,
    )


def diffnext_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    return torch_state_dict_to_flax(state_dict)


def paella_vq_config_from_diffusers(config: dict, dtype=jnp.float32):
    from onetrainer_tpu.models.paella_vq import PaellaVQConfig
    return PaellaVQConfig(
        in_channels=config.get("in_channels", 3),
        out_channels=config.get("out_channels", 3),
        up_down_scale_factor=config.get("up_down_scale_factor", 2),
        levels=config.get("levels", 2),
        bottleneck_blocks=config.get("bottleneck_blocks", 12),
        embed_dim=config.get("embed_dim", 384),
        latent_channels=config.get("latent_channels", 4),
        scale_factor=config.get("scale_factor", 0.3764),
        dtype=dtype,
    )


def _paella_vq_key_map(key: str) -> str | None:
    # the quantizer codebook is unused (decode never quantizes:
    # WuerstchenSampler.py:337 calls decode on continuous latents)
    if key.startswith("vquantizer."):
        return None
    # tolerate a channelwise MLP without the Dropout slot
    return key.replace("channelwise.3.weight", "channelwise.4.weight") \
              .replace("channelwise.3.bias", "channelwise.4.bias")


def paella_vq_state_dict_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    return torch_state_dict_to_flax(state_dict, key_map=_paella_vq_key_map)


def load_wuerstchen_decoder(decoder_dir: str,
                            weight_dtype=np.float32,
                            compute_dtype=jnp.bfloat16):
    """Load the stage-B sampling components from a Würstchen decoder repo
    dir (decoder/ + vqgan/ + text_encoder/ + tokenizer/, the
    warp-ai/wuerstchen layout; reference:
    WuerstchenModelLoader.__load_internal/__load_diffusers decoder part).
    Returns a dict of configs/params; missing subdirs load as None."""
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)

    dec_cfg_json, decoder_params = load_component(
        decoder_dir, "decoder", diffnext_state_dict_to_flax, np_dtype)
    vq_cfg_json, vqgan_params = load_component(
        decoder_dir, "vqgan", paella_vq_state_dict_to_flax, np.float32)
    te_cfg_json, decoder_te_params = load_component(
        decoder_dir, "text_encoder", clip_state_dict_to_flax, np_dtype)

    return {
        "decoder_config": diffnext_config_from_diffusers(
            dec_cfg_json or {}, compute_dtype),
        "vqgan_config": paella_vq_config_from_diffusers(vq_cfg_json or {}),
        "decoder_te_config": clip_config_from_transformers(
            te_cfg_json or {}, compute_dtype) if te_cfg_json else None,
        "decoder_params": decoder_params,
        "vqgan_params": vqgan_params,
        "decoder_te_params": decoder_te_params,
        "decoder_tokenizer_dir": os.path.join(decoder_dir, "tokenizer"),
    }
