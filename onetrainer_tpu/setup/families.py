"""Model-family registry: one adapter per family wiring loader, setup,
encode fns, sampler, and save paths for the GenericTrainer
(functional equivalent of the reference's create.py dispatch —
reference: modules/util/create.py:149-433)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from collections.abc import Callable

import jax
import numpy as np

from onetrainer_tpu.io.safetensors_io import save_safetensors
from onetrainer_tpu.peft.lora import peft_to_kohya_state_dict
from onetrainer_tpu.util.enums import ModelType, TrainingMethod


@dataclass
class ModelFamily:
    name: str
    quantization: int
    load: Callable          # (base_dir, config) -> model
    create_setup: Callable  # (model, config, total_steps) -> setup
    make_encode_fns: Callable
    sample: Callable        # (setup, sample_config, on_progress) -> SamplerOutput
    save_model: Callable    # (setup, dir, source_dir, save_dtype=None) -> None
    save_single_file: Callable  # (setup, path, save_dtype=None) -> None
    lora_prefixes: dict     # trainable key -> kohya prefix
    video: bool = False     # data loader samples video clips


# -- SD 1.5 / 2.x -------------------------------------------------------------------

def _sd_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.sd_checkpoints import (
        load_sd_diffusers, load_sd_single_file,
    )
    from onetrainer_tpu.models.sd import StableDiffusionModel
    kwargs = dict(
        weight_dtype=config.weight_dtypes().unet.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    if os.path.isfile(base_dir):
        loaded = load_sd_single_file(base_dir, config.model_type, **kwargs)
    else:
        loaded = load_sd_diffusers(base_dir, **kwargs)
    return StableDiffusionModel(
        model_type=config.model_type,
        unet_config=loaded["unet_config"],
        vae_config=loaded["vae_config"],
        te_config=loaded["te_config"],
        unet_params=loaded["unet_params"],
        vae_params=loaded["vae_params"],
        te_params=loaded["te_params"],
        prediction_type=loaded["prediction_type"],
        text_encoder_layer_skip=1 if config.model_type.is_sd_v2() else 0,
        tokenizer=loaded["tokenizer_dir"],
    )


def _sd_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.sd_setup import create_sd_setup
    return create_sd_setup(model, config, total_steps, steps_per_epoch)


def _sd_encode_fns(setup):
    from onetrainer_tpu.setup.sd_setup import make_encode_fns
    return make_encode_fns(setup)


def _sd_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.sd_sampler import sample_stable_diffusion
    unet, te, extra = setup.merged_inference_params()
    return sample_stable_diffusion(
        setup.model, unet, te, setup.effective_vae_params(), setup.tokenizer,
        sample_config, extra_embeddings=extra, on_update_progress=on_progress)


def _sd_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.sd_checkpoints import save_sd_diffusers
    unet, te, _ = setup.merged_inference_params()
    save_sd_diffusers(out_dir, setup.model, unet,
                      setup.effective_vae_params(), te,
                      save_dtype=save_dtype or np.float32,
                      source_dir=source_dir)


def _sd_save_single_file(setup, path, save_dtype=None):
    from onetrainer_tpu.io.sd_checkpoints import save_sd_single_file
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    unet, te, _ = setup.merged_inference_params()
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution,
        prediction_type=setup.model.prediction_type,
        train_config=setup.config)
    save_sd_single_file(path, setup.model, unet,
                        setup.effective_vae_params(), te, metadata=meta,
                        save_dtype=save_dtype or np.float32)


# -- SDXL -----------------------------------------------------------------------------

def _sdxl_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.sd_checkpoints import (
        load_sdxl_diffusers, load_sdxl_single_file,
    )
    from onetrainer_tpu.models.sdxl import StableDiffusionXLModel
    kwargs = dict(
        weight_dtype=config.weight_dtypes().unet.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    if os.path.isfile(base_dir):
        loaded = load_sdxl_single_file(base_dir, config.model_type, **kwargs)
    else:
        loaded = load_sdxl_diffusers(base_dir, **kwargs)
    return StableDiffusionXLModel(
        model_type=config.model_type,
        unet_config=loaded["unet_config"],
        vae_config=loaded["vae_config"],
        te_config=loaded["te_config"],
        te2_config=loaded["te2_config"],
        unet_params=loaded["unet_params"],
        vae_params=loaded["vae_params"],
        te_params=loaded["te_params"],
        te2_params=loaded["te2_params"],
        prediction_type=loaded["prediction_type"],
        tokenizer=loaded["tokenizer_dir"],
        tokenizer_2=loaded["tokenizer_2_dir"],
    )


def _sdxl_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.sdxl_setup import create_sdxl_setup
    return create_sdxl_setup(model, config, total_steps, steps_per_epoch)


def _sdxl_encode_fns(setup):
    from onetrainer_tpu.setup.sdxl_setup import make_sdxl_encode_fns
    return make_sdxl_encode_fns(setup)


def _sdxl_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.sdxl_sampler import sample_stable_diffusion_xl
    unet, te, te2, extra = setup.merged_inference_params()
    return sample_stable_diffusion_xl(
        setup.model, unet, te, te2, setup.model.vae_params,
        setup.tokenizer, setup.tokenizer_2, sample_config,
        extra_embeddings=extra, on_update_progress=on_progress)


def _sdxl_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.sd_checkpoints import save_sdxl_diffusers
    unet, te, te2, _ = setup.merged_inference_params()
    save_sdxl_diffusers(out_dir, setup.model, unet, setup.model.vae_params,
                        te, te2, save_dtype=save_dtype or np.float32,
                        source_dir=source_dir)


def _sdxl_save_single_file(setup, path, save_dtype=None):
    from onetrainer_tpu.io.sd_checkpoints import save_sdxl_single_file
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    unet, te, te2, _ = setup.merged_inference_params()
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution,
        prediction_type=setup.model.prediction_type,
        train_config=setup.config)
    save_sdxl_single_file(path, setup.model, unet, setup.model.vae_params,
                          te, te2, metadata=meta,
                          save_dtype=save_dtype or np.float32)



def _apply_scan_layers(loaded, count: int | None = None,
                       single_count: int | None = None,
                       prefixes: tuple = ("transformer_blocks",
                                          "single_transformer_blocks")):
    """OT_SCAN_LAYERS=1: mark the transformer config scan_layers=True and
    stack its homogeneous block prefixes into the [L, ...] layout
    (io/torch_flax.stack_scanned_blocks; inverse: _unstacked_blocks)."""
    if os.environ.get("OT_SCAN_LAYERS") != "1":
        return loaded
    from dataclasses import replace as _dc_replace

    import jax as _jax
    import jax.numpy as _jnp

    from onetrainer_tpu.io.torch_flax import stack_scanned_blocks
    loaded["transformer_config"] = _dc_replace(
        loaded["transformer_config"], scan_layers=True)
    p = dict(loaded["transformer_params"])
    counts = (count, single_count)
    for prefix, n in zip(prefixes, counts):
        stack_scanned_blocks(p, prefix, count=n)
    loaded["transformer_params"] = _jax.tree.map(_jnp.asarray, p)
    return loaded


# -- FLUX -----------------------------------------------------------------------------

def _flux_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.flux_checkpoints import load_flux_diffusers
    from onetrainer_tpu.models.flux_model import FluxModel
    kwargs = dict(
        weight_dtype=config.weight_dtypes().prior.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    if os.path.isfile(base_dir):
        from onetrainer_tpu.io.single_file import load_flux_single_file
        loaded = load_flux_single_file(base_dir, **kwargs)
    else:
        loaded = load_flux_diffusers(base_dir, **kwargs)
    loaded = _apply_scan_layers(loaded)
    return FluxModel(
        model_type=config.model_type,
        transformer_config=loaded["transformer_config"],
        vae_config=loaded["vae_config"],
        te_config=loaded["te_config"],
        te2_config=loaded["te2_config"],
        transformer_params=loaded["transformer_params"],
        vae_params=loaded["vae_params"],
        te_params=loaded["te_params"],
        te2_params=loaded["te2_params"],
        tokenizer=loaded["tokenizer_dir"],
        tokenizer_2=loaded["tokenizer_2_dir"],
    )


def _flux_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.flux_setup import create_flux_setup
    return create_flux_setup(model, config, total_steps, steps_per_epoch)


def _flux_encode_fns(setup):
    from onetrainer_tpu.setup.flux_setup import make_flux_encode_fns
    return make_flux_encode_fns(setup)


def _flux_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.flux_sampler import sample_flux
    transformer, te, te2, extra = setup.merged_inference_params()
    return sample_flux(
        setup.model, transformer, te, te2, setup.model.vae_params,
        setup.tokenizer, setup.tokenizer_2, sample_config,
        extra_embeddings=extra, on_update_progress=on_progress)


def _unstacked_blocks(transformer):
    """Scan-stacked transformer params -> per-layer layout for export
    (no-op for the ordinary loop layout)."""
    from onetrainer_tpu.io.torch_flax import unstack_scanned_blocks
    transformer = dict(transformer)
    unstack_scanned_blocks(transformer, "transformer_blocks")
    unstack_scanned_blocks(transformer, "single_transformer_blocks")
    return transformer


def _flux_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.flux_checkpoints import save_flux_diffusers
    transformer, te, te2, _ = setup.merged_inference_params()
    save_flux_diffusers(out_dir, setup.model, _unstacked_blocks(transformer),
                        setup.model.vae_params, te, te2,
                        save_dtype=save_dtype or np.float32,
                        source_dir=source_dir)


def _flux_save_single_file(setup, path, save_dtype=None):
    """BFL single-file layout (reference:
    modules/util/convert/convert_flux_diffusers_to_ckpt.py)."""
    import numpy as _np
    from onetrainer_tpu.io.sd_checkpoints import _to_numpy_tree
    from onetrainer_tpu.io.single_file import flux_transformer_to_bfl
    from onetrainer_tpu.io.torch_flax import unet_flax_to_state_dict
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    transformer, *_ = setup.merged_inference_params()
    sd = flux_transformer_to_bfl(
        unet_flax_to_state_dict(
            _to_numpy_tree(_unstacked_blocks(transformer), save_dtype)))
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution,
        train_config=setup.config)
    save_safetensors(path, {k: _np.asarray(v) for k, v in sd.items()},
                     metadata=meta)


# -- PixArt ---------------------------------------------------------------------------

def _pixart_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.pixart_checkpoints import load_pixart_diffusers
    from onetrainer_tpu.models.pixart_model import PixArtAlphaModel
    kwargs = dict(
        weight_dtype=config.weight_dtypes().prior.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    if os.path.isfile(base_dir):
        from onetrainer_tpu.io.single_file import load_pixart_single_file
        loaded = load_pixart_single_file(base_dir, **kwargs)
    else:
        loaded = load_pixart_diffusers(base_dir, **kwargs)
    loaded = _apply_scan_layers(loaded)
    return PixArtAlphaModel(
        model_type=config.model_type,
        transformer_config=loaded["transformer_config"],
        vae_config=loaded["vae_config"],
        te_config=loaded["te_config"],
        transformer_params=loaded["transformer_params"],
        vae_params=loaded["vae_params"],
        te_params=loaded["te_params"],
        tokenizer=loaded["tokenizer_dir"],
    )


def _pixart_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.pixart_setup import create_pixart_setup
    return create_pixart_setup(model, config, total_steps, steps_per_epoch)


def _pixart_encode_fns(setup):
    from onetrainer_tpu.setup.pixart_setup import make_pixart_encode_fns
    return make_pixart_encode_fns(setup)


def _pixart_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.pixart_sampler import sample_pixart
    transformer, te, extra = setup.merged_inference_params()
    return sample_pixart(
        setup.model, transformer, te, setup.model.vae_params,
        setup.tokenizer, sample_config,
        extra_embeddings=extra, on_update_progress=on_progress)


def _pixart_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.pixart_checkpoints import save_pixart_diffusers
    transformer, te, _ = setup.merged_inference_params()
    save_pixart_diffusers(out_dir, setup.model, _unstacked_blocks(transformer),
                          setup.model.vae_params, te,
                          save_dtype=save_dtype or np.float32,
                          source_dir=source_dir)


def _pixart_save_single_file(setup, path, save_dtype=None):
    """Original PixArt repo single-file layout (reference:
    modules/util/convert/convert_pixart_diffusers_to_ckpt.py)."""
    import numpy as _np
    from onetrainer_tpu.io.sd_checkpoints import _to_numpy_tree
    from onetrainer_tpu.io.single_file import pixart_transformer_to_ckpt
    from onetrainer_tpu.io.torch_flax import unet_flax_to_state_dict
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    transformer, *_ = setup.merged_inference_params()
    transformer = _unstacked_blocks(transformer)
    sd = pixart_transformer_to_ckpt(
        unet_flax_to_state_dict(_to_numpy_tree(transformer, save_dtype)))
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution,
        train_config=setup.config)
    save_safetensors(path, {k: _np.asarray(v) for k, v in sd.items()},
                     metadata=meta)


# -- HiDream ------------------------------------------------------------------------------

def _hidream_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.hidream_checkpoints import load_hidream_diffusers
    from onetrainer_tpu.models.hidream_model import HiDreamModel
    loaded = load_hidream_diffusers(
        base_dir,
        weight_dtype=config.weight_dtypes().prior.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    loaded = _apply_scan_layers(
        loaded, prefixes=("double_stream_blocks", "single_stream_blocks"))
    return HiDreamModel(
        model_type=config.model_type,
        transformer_config=loaded["transformer_config"],
        vae_config=loaded["vae_config"],
        te_config=loaded["te_config"], te2_config=loaded["te2_config"],
        te3_config=loaded["te3_config"], te4_config=loaded["te4_config"],
        transformer_params=loaded["transformer_params"],
        vae_params=loaded["vae_params"],
        te_params=loaded["te_params"], te2_params=loaded["te2_params"],
        te3_params=loaded["te3_params"], te4_params=loaded["te4_params"],
        tokenizer=loaded["tokenizer_dir"],
        tokenizer_2=loaded["tokenizer_2_dir"],
        tokenizer_3=loaded["tokenizer_3_dir"],
        tokenizer_4=loaded["tokenizer_4_dir"],
    )


def _hidream_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.hidream_setup import create_hidream_setup
    return create_hidream_setup(model, config, total_steps, steps_per_epoch)


def _hidream_encode_fns(setup):
    from onetrainer_tpu.setup.hidream_setup import make_hidream_encode_fns
    return make_hidream_encode_fns(setup)


def _hidream_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.hidream_sampler import sample_hidream
    transformer, te, te2, te3, te4, extra = setup.merged_inference_params()
    return sample_hidream(
        setup.model, transformer, te, te2, te3, te4, setup.model.vae_params,
        setup.tokenizer, setup.tokenizer_2, setup.tokenizer_3,
        setup.tokenizer_4, sample_config,
        extra_embeddings=extra, on_update_progress=on_progress)


def _hidream_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.hidream_checkpoints import save_hidream_diffusers
    transformer, *_ = setup.merged_inference_params()
    transformer = dict(transformer)
    from onetrainer_tpu.io.torch_flax import unstack_scanned_blocks
    unstack_scanned_blocks(transformer, "double_stream_blocks")
    unstack_scanned_blocks(transformer, "single_stream_blocks")
    save_hidream_diffusers(out_dir, setup.model, transformer,
                           save_dtype=save_dtype or np.float32,
                           source_dir=source_dir)


def _hidream_save_single_file(setup, path, save_dtype=None):
    """Transformer state-dict dump in diffusers key layout — the reference
    saves exactly model.transformer.state_dict() to safetensors
    (modules/modelSaver/hidream/HiDreamModelSaver.py:51-63)."""
    import numpy as _np
    from onetrainer_tpu.io.hidream_checkpoints import hidream_flax_to_state_dict
    from onetrainer_tpu.io.sd_checkpoints import _to_numpy_tree
    from onetrainer_tpu.io.torch_flax import unstack_scanned_blocks
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    transformer, *_ = setup.merged_inference_params()
    transformer = dict(transformer)
    unstack_scanned_blocks(transformer, "double_stream_blocks")
    unstack_scanned_blocks(transformer, "single_stream_blocks")
    sd = hidream_flax_to_state_dict(_to_numpy_tree(transformer, save_dtype))
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution,
        train_config=setup.config)
    save_safetensors(path, {k: _np.asarray(v) for k, v in sd.items()},
                     metadata=meta)


# -- HunyuanVideo ------------------------------------------------------------------------

def _hunyuan_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.hunyuan_checkpoints import load_hunyuan_diffusers
    from onetrainer_tpu.models.hunyuan_video_model import HunyuanVideoModel
    kwargs = dict(
        weight_dtype=config.weight_dtypes().prior.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    if os.path.isfile(base_dir):
        from onetrainer_tpu.io.single_file import load_hunyuan_single_file
        loaded = load_hunyuan_single_file(base_dir, **kwargs)
    else:
        loaded = load_hunyuan_diffusers(base_dir, **kwargs)
    loaded = _apply_scan_layers(loaded)
    return HunyuanVideoModel(
        model_type=config.model_type,
        transformer_config=loaded["transformer_config"],
        vae_config=loaded["vae_config"],
        te_config=loaded["te_config"],
        te2_config=loaded["te2_config"],
        transformer_params=loaded["transformer_params"],
        vae_params=loaded["vae_params"],
        te_params=loaded["te_params"],
        te2_params=loaded["te2_params"],
        tokenizer=loaded["tokenizer_dir"],
        tokenizer_2=loaded["tokenizer_2_dir"],
    )


def _hunyuan_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.hunyuan_setup import create_hunyuan_setup
    return create_hunyuan_setup(model, config, total_steps, steps_per_epoch)


def _hunyuan_encode_fns(setup):
    from onetrainer_tpu.setup.hunyuan_setup import make_hunyuan_encode_fns
    return make_hunyuan_encode_fns(setup)


def _hunyuan_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.hunyuan_sampler import sample_hunyuan_video
    transformer, te, te2, extra = setup.merged_inference_params()
    return sample_hunyuan_video(
        setup.model, transformer, te, te2, setup.model.vae_params,
        setup.tokenizer, setup.tokenizer_2, sample_config,
        extra_embeddings=extra, on_update_progress=on_progress)


def _hunyuan_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.hunyuan_checkpoints import save_hunyuan_diffusers
    transformer, te, _, _ = setup.merged_inference_params()
    save_hunyuan_diffusers(out_dir, setup.model, _unstacked_blocks(transformer),
                           te, save_dtype=save_dtype or np.float32,
                           source_dir=source_dir)


def _hunyuan_save_single_file(setup, path, save_dtype=None):
    """Original-repo ckpt layout under the `model.model` prefix (reference:
    modules/util/convert/convert_hunyuan_video_diffusers_to_ckpt.py:143-149,
    modules/modelSaver/hunyuanVideo/HunyuanVideoModelSaver.py:60-92)."""
    import numpy as _np
    from onetrainer_tpu.io.hunyuan_checkpoints import hunyuan_flax_to_state_dict
    from onetrainer_tpu.io.sd_checkpoints import _to_numpy_tree
    from onetrainer_tpu.io.single_file import hunyuan_transformer_to_ckpt
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    transformer, *_ = setup.merged_inference_params()
    sd = hunyuan_transformer_to_ckpt(
        hunyuan_flax_to_state_dict(
            _to_numpy_tree(_unstacked_blocks(transformer), save_dtype)))
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution,
        train_config=setup.config)
    save_safetensors(path, {k: _np.asarray(v) for k, v in sd.items()},
                     metadata=meta)


# -- Sana -------------------------------------------------------------------------------

def _sana_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.sana_checkpoints import load_sana_diffusers
    from onetrainer_tpu.models.sana_model import SanaModel
    loaded = load_sana_diffusers(
        base_dir,
        weight_dtype=config.weight_dtypes().prior.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    loaded = _apply_scan_layers(loaded)
    return SanaModel(
        model_type=config.model_type,
        transformer_config=loaded["transformer_config"],
        vae_config=loaded["vae_config"],
        te_config=loaded["te_config"],
        transformer_params=loaded["transformer_params"],
        vae_params=loaded["vae_params"],
        te_params=loaded["te_params"],
        tokenizer=loaded["tokenizer_dir"],
    )


def _sana_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.sana_setup import create_sana_setup
    return create_sana_setup(model, config, total_steps, steps_per_epoch)


def _sana_encode_fns(setup):
    from onetrainer_tpu.setup.sana_setup import make_sana_encode_fns
    return make_sana_encode_fns(setup)


def _sana_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.sana_sampler import sample_sana
    transformer, te, extra = setup.merged_inference_params()
    return sample_sana(
        setup.model, transformer, te, setup.model.vae_params,
        setup.tokenizer, sample_config,
        extra_embeddings=extra, on_update_progress=on_progress)


def _sana_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.sana_checkpoints import save_sana_diffusers
    transformer, te, _ = setup.merged_inference_params()
    save_sana_diffusers(out_dir, setup.model, _unstacked_blocks(transformer),
                        te, save_dtype=save_dtype or np.float32,
                        source_dir=source_dir)


def _sana_save_single_file(setup, path, save_dtype=None):
    raise NotImplementedError(
        "Sana single-file export not implemented; use DIFFUSERS format")


# -- Würstchen v2 / Stable Cascade -----------------------------------------------------

def _wuerstchen_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.wuerstchen_checkpoints import load_wuerstchen_diffusers
    from onetrainer_tpu.models.wuerstchen_model import WuerstchenModel
    kwargs = dict(
        weight_dtype=config.weight_dtypes().prior.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    if os.path.isfile(base_dir) and config.model_type.is_stable_cascade():
        from onetrainer_tpu.io.single_file import load_cascade_single_file
        loaded = load_cascade_single_file(
            base_dir, effnet_path=config.effnet_encoder.model_name or None,
            **kwargs)
    else:
        loaded = load_wuerstchen_diffusers(
            base_dir,
            effnet_path=config.effnet_encoder.model_name or None,
            **kwargs)
    model = WuerstchenModel(
        model_type=config.model_type,
        prior_config=loaded["prior_config"],
        effnet_config=loaded["effnet_config"],
        te_config=loaded["te_config"],
        prior_params=loaded["prior_params"],
        effnet_params=loaded["effnet_params"],
        te_params=loaded["te_params"],
        text_encoder_layer_skip=config.text_encoder_layer_skip or 0,
        tokenizer=loaded["tokenizer_dir"],
    )
    # stage B/A decode components (sampling only; reference:
    # WuerstchenModelLoader decoder_model_name from config.decoder)
    decoder_dir = getattr(config.decoder, "model_name", None)
    if decoder_dir and os.path.isdir(decoder_dir):
        from onetrainer_tpu.io.wuerstchen_checkpoints import (
            load_wuerstchen_decoder,
        )
        dec = load_wuerstchen_decoder(
            decoder_dir,
            compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16)
        model.decoder_config = dec["decoder_config"]
        model.vqgan_config = dec["vqgan_config"]
        model.decoder_params = dec["decoder_params"]
        model.vqgan_params = dec["vqgan_params"]
        model.decoder_te_config = dec["decoder_te_config"]
        model.decoder_te_params = dec["decoder_te_params"]
    return model


def _wuerstchen_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.wuerstchen_setup import create_wuerstchen_setup
    return create_wuerstchen_setup(model, config, total_steps, steps_per_epoch)


def _wuerstchen_encode_fns(setup):
    from onetrainer_tpu.setup.wuerstchen_setup import make_wuerstchen_encode_fns
    return make_wuerstchen_encode_fns(setup)


def _wuerstchen_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.wuerstchen_sampler import sample_wuerstchen
    prior, te, extra = setup.merged_inference_params()
    return sample_wuerstchen(
        setup.model, prior, te, setup.tokenizer, sample_config,
        extra_embeddings=extra, on_update_progress=on_progress)


def _wuerstchen_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.wuerstchen_checkpoints import save_wuerstchen_diffusers
    prior, te, _ = setup.merged_inference_params()
    save_wuerstchen_diffusers(out_dir, setup.model, prior, te,
                              save_dtype=save_dtype or np.float32,
                              source_dir=source_dir)


def _wuerstchen_save_single_file(setup, path, save_dtype=None):
    """Stable Cascade single-file export: stage_c.safetensors (fused
    in_proj attention keys) + text_encoder.safetensors (reference:
    modules/modelSaver/wuerstchen/WuerstchenModelSaver.py:41-69 — a
    directory destination; Würstchen v2 raises NotImplementedError there
    too). A `*.safetensors` path is taken as the stage_c file with the
    text encoder saved alongside it."""
    if not setup.config.model_type.is_stable_cascade():
        raise NotImplementedError(
            "Würstchen v2 single-file export is unsupported (reference "
            "WuerstchenModelSaver.__save_safetensors raises for non-Cascade)")
    import numpy as _np
    from onetrainer_tpu.io.sd_checkpoints import _to_numpy_tree
    from onetrainer_tpu.io.single_file import cascade_prior_to_ckpt
    from onetrainer_tpu.io.torch_flax import clip_flax_to_state_dict
    from onetrainer_tpu.io.wuerstchen_checkpoints import prior_flax_to_state_dict
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    prior, te, _ = setup.merged_inference_params()
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution,
        train_config=setup.config)
    if path.endswith(".safetensors"):
        stage_c_path = path
        te_path = os.path.join(os.path.dirname(path) or ".",
                               "text_encoder.safetensors")
    else:
        os.makedirs(path, exist_ok=True)
        stage_c_path = os.path.join(path, "stage_c.safetensors")
        te_path = os.path.join(path, "text_encoder.safetensors")
    sd = cascade_prior_to_ckpt(
        prior_flax_to_state_dict(_to_numpy_tree(prior, save_dtype)))
    save_safetensors(stage_c_path,
                     {k: _np.asarray(v) for k, v in sd.items()}, metadata=meta)
    te_sd = clip_flax_to_state_dict(_to_numpy_tree(te, save_dtype))
    save_safetensors(te_path,
                     {k: _np.asarray(v) for k, v in te_sd.items()},
                     metadata=meta)


# -- SD3 -----------------------------------------------------------------------------

def _sd3_load(base_dir, config):
    import jax.numpy as jnp
    from onetrainer_tpu.io.sd3_checkpoints import load_sd3_diffusers
    from onetrainer_tpu.models.sd3_model import StableDiffusion3Model
    kwargs = dict(
        weight_dtype=config.weight_dtypes().prior.to_load_dtype() or np.float32,
        compute_dtype=config.train_dtype.to_compute_dtype() or jnp.bfloat16,
        gradient_checkpointing=config.gradient_checkpointing.enabled(),
    )
    if os.path.isfile(base_dir):
        from onetrainer_tpu.io.single_file import load_sd3_single_file
        loaded = load_sd3_single_file(base_dir, **kwargs)
    else:
        loaded = load_sd3_diffusers(base_dir, **kwargs)
    # first N-1 joint blocks scan; the final context-pre-only block
    # stays per-layer (models/sd3.py scan_layers)
    loaded = _apply_scan_layers(
        loaded, count=loaded["transformer_config"].num_layers - 1)
    return StableDiffusion3Model(
        model_type=config.model_type,
        transformer_config=loaded["transformer_config"],
        vae_config=loaded["vae_config"],
        te_config=loaded["te_config"],
        te2_config=loaded["te2_config"],
        te3_config=loaded["te3_config"],
        transformer_params=loaded["transformer_params"],
        vae_params=loaded["vae_params"],
        te_params=loaded["te_params"],
        te2_params=loaded["te2_params"],
        te3_params=loaded["te3_params"],
        tokenizer=loaded["tokenizer_dir"],
        tokenizer_2=loaded["tokenizer_2_dir"],
        tokenizer_3=loaded["tokenizer_3_dir"],
    )


def _sd3_create_setup(model, config, total_steps, steps_per_epoch=100):
    from onetrainer_tpu.setup.sd3_setup import create_sd3_setup
    return create_sd3_setup(model, config, total_steps, steps_per_epoch)


def _sd3_encode_fns(setup):
    from onetrainer_tpu.setup.sd3_setup import make_sd3_encode_fns
    return make_sd3_encode_fns(setup)


def _sd3_sample(setup, sample_config, on_progress):
    from onetrainer_tpu.sampling.sd3_sampler import sample_sd3
    transformer, te, te2, te3, extra = setup.merged_inference_params()
    return sample_sd3(
        setup.model, transformer, te, te2, te3, setup.model.vae_params,
        setup.tokenizer, setup.tokenizer_2, setup.tokenizer_3, sample_config,
        extra_embeddings=extra, on_update_progress=on_progress)


def _sd3_save_model(setup, out_dir, source_dir, save_dtype=None):
    from onetrainer_tpu.io.sd3_checkpoints import save_sd3_diffusers
    transformer, te, te2, te3, _ = setup.merged_inference_params()
    save_sd3_diffusers(out_dir, setup.model, _unstacked_blocks(transformer),
                       setup.model.vae_params, te, te2, te3,
                       save_dtype=save_dtype or np.float32,
                       source_dir=source_dir)


def _sd3_save_single_file(setup, path, save_dtype=None):
    """SAI single-file layout: vae + MMDiT + 3 TEs
    (reference: modules/util/convert/convert_sd3_diffusers_to_ckpt.py)."""
    import numpy as _np
    from onetrainer_tpu.io.ldm import convert_vae_diffusers_to_ldm
    from onetrainer_tpu.io.sd_checkpoints import _to_numpy_tree
    from onetrainer_tpu.io.single_file import sd3_transformer_to_sai
    from onetrainer_tpu.io.torch_flax import (
        clip_flax_to_state_dict, t5_flax_to_state_dict,
        unet_flax_to_state_dict, vae_flax_to_state_dict,
    )
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    transformer, te, te2, te3, _ = setup.merged_inference_params()
    sd = {}
    vae_sd = convert_vae_diffusers_to_ldm(
        vae_flax_to_state_dict(_to_numpy_tree(setup.model.vae_params,
                                              save_dtype)))
    sd.update({f"first_stage_model.{k}": v for k, v in vae_sd.items()})
    sd.update({f"model.diffusion_model.{k}": v for k, v in
               sd3_transformer_to_sai(unet_flax_to_state_dict(
                   _to_numpy_tree(_unstacked_blocks(transformer),
                                  save_dtype))).items()})
    if te is not None:
        sd.update({f"text_encoders.clip_l.transformer.{k}": v for k, v in
                   clip_flax_to_state_dict(
                       _to_numpy_tree(te, save_dtype)).items()})
    if te2 is not None:
        sd.update({f"text_encoders.clip_g.transformer.{k}": v for k, v in
                   clip_flax_to_state_dict(
                       _to_numpy_tree(te2, save_dtype)).items()})
    if te3 is not None:
        sd.update({f"text_encoders.t5xxl.transformer.{k}": v for k, v in
                   t5_flax_to_state_dict(
                       _to_numpy_tree(te3, save_dtype)).items()})
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution,
        train_config=setup.config)
    save_safetensors(path, {k: _np.asarray(v) for k, v in sd.items()},
                     metadata=meta)


def make_eval_loss(setup, family_name: str):
    """Jitted deterministic per-sample loss (validation + calculate_loss;
    reference: GenericTrainer.__validate, GenerateLossesModel)."""
    import jax
    import jax.numpy as jnp
    from onetrainer_tpu.math.losses import diffusion_losses

    model = setup.model
    cfg = setup.step_cfg

    if family_name == "pixart":
        from onetrainer_tpu.train.pixart_train_step import pixart_predict
        coefficients_px = model.coefficients()

        @jax.jit
        def eval_loss_px(params, batch):
            transformer, te, extra = params
            data = pixart_predict(model, transformer, te, batch,
                                  jax.random.PRNGKey(0), cfg, coefficients_px,
                                  extra, deterministic=True)
            return diffusion_losses(batch, data, cfg.loss, coefficients_px)

        def run_px(batch):
            return eval_loss_px(setup.merged_inference_params(), batch)
        return run_px

    if family_name == "sd3":
        from onetrainer_tpu.math.losses import flow_matching_losses
        from onetrainer_tpu.train.sd3_train_step import sd3_predict

        @jax.jit
        def eval_loss_sd3(params, batch):
            transformer, te, te2, te3, extra = params
            data = sd3_predict(model, transformer, te, te2, te3, batch,
                               jax.random.PRNGKey(0), cfg,
                               extra_embeddings=extra, deterministic=True)
            return flow_matching_losses(batch, data, cfg.loss)

        def run_sd3(batch):
            return eval_loss_sd3(setup.merged_inference_params(), batch)
        return run_sd3

    if family_name == "hidream":
        from onetrainer_tpu.math.losses import flow_matching_losses
        from onetrainer_tpu.train.hidream_train_step import hidream_predict

        @jax.jit
        def eval_loss_hd(params, batch):
            transformer, te, te2, te3, te4, extra = params
            data = hidream_predict(model, transformer, te, te2, te3, te4,
                                   batch, jax.random.PRNGKey(0), cfg,
                                   extra_embeddings=extra, deterministic=True)
            return flow_matching_losses(batch, data, cfg.loss)

        def run_hd(batch):
            return eval_loss_hd(setup.merged_inference_params(), batch)
        return run_hd

    if family_name == "hunyuan":
        from onetrainer_tpu.math.losses import flow_matching_losses
        from onetrainer_tpu.train.hunyuan_train_step import hunyuan_predict

        @jax.jit
        def eval_loss_hv(params, batch):
            transformer, te, te2, extra = params
            data = hunyuan_predict(model, transformer, te, te2, batch,
                                   jax.random.PRNGKey(0), cfg,
                                   extra_embeddings=extra, deterministic=True)
            return flow_matching_losses(batch, data, cfg.loss)

        def run_hv(batch):
            return eval_loss_hv(setup.merged_inference_params(), batch)
        return run_hv

    if family_name == "sana":
        from onetrainer_tpu.math.losses import flow_matching_losses
        from onetrainer_tpu.train.sana_train_step import sana_predict

        @jax.jit
        def eval_loss_sana(params, batch):
            transformer, te, extra = params
            data = sana_predict(model, transformer, te, batch,
                                jax.random.PRNGKey(0), cfg,
                                extra_embeddings=extra, deterministic=True)
            return flow_matching_losses(batch, data, cfg.loss)

        def run_sana(batch):
            return eval_loss_sana(setup.merged_inference_params(), batch)
        return run_sana

    if family_name == "wuerstchen":
        from onetrainer_tpu.train.wuerstchen_train_step import (
            ContinuousCoefficients, wuerstchen_predict,
        )
        cc = ContinuousCoefficients()

        @jax.jit
        def eval_loss_w(params, batch):
            prior, te, extra = params
            data = wuerstchen_predict(model, prior, te, batch,
                                      jax.random.PRNGKey(0), cfg,
                                      extra_embeddings=extra,
                                      deterministic=True)
            return diffusion_losses(batch, data, cfg.loss, cc)

        def run_w(batch):
            return eval_loss_w(setup.merged_inference_params(), batch)
        return run_w

    if family_name == "flux":
        from onetrainer_tpu.math.losses import flow_matching_losses
        from onetrainer_tpu.train.flux_train_step import flux_predict

        @jax.jit
        def eval_loss_flux(params, batch):
            transformer, te, te2, extra = params
            data = flux_predict(model, transformer, te, te2, batch,
                                jax.random.PRNGKey(0), cfg,
                                extra_embeddings=extra, deterministic=True)
            return flow_matching_losses(batch, data, cfg.loss)

        def run_flux(batch):
            return eval_loss_flux(setup.merged_inference_params(), batch)
        return run_flux

    coefficients = model.coefficients()

    if family_name == "sdxl":
        from onetrainer_tpu.train.sdxl_train_step import sdxl_predict

        @jax.jit
        def eval_loss(params, batch):
            unet, te, te2, extra = params
            data = sdxl_predict(model, unet, te, te2, batch,
                                jax.random.PRNGKey(0), cfg, coefficients,
                                extra, deterministic=True)
            return diffusion_losses(batch, data, cfg.loss, coefficients)

        def run(batch):
            return eval_loss(setup.merged_inference_params(), batch)
        return run

    from onetrainer_tpu.train.sd_train_step import sd_predict

    @jax.jit
    def eval_loss(params, batch):
        unet, te, extra = params
        if extra is not None:
            batch = dict(batch, extra_embeddings=extra)
        data, _ = sd_predict(
            model.unet.apply, model.text_encoder.apply, unet, te, batch,
            jax.random.PRNGKey(0), cfg, coefficients, deterministic=True)
        return diffusion_losses(batch, data, cfg.loss, coefficients)

    def run(batch):
        return eval_loss(setup.merged_inference_params(), batch)
    return run


def make_debug_data(setup, family_name: str):
    """Deterministic predict() outputs for debug-mode dumps
    (reference: ModelSetupDebugMixin — the reference dumps these inside
    predict(); here a separate jitted pass keeps the hot step clean)."""
    import jax

    model = setup.model
    cfg = setup.step_cfg

    if family_name == "sd":
        from onetrainer_tpu.train.sd_train_step import sd_predict
        coefficients = model.coefficients()

        @jax.jit
        def debug_sd(params, batch):
            unet, te, extra = params
            if extra is not None:
                batch = dict(batch, extra_embeddings=extra)
            data, _ = sd_predict(model.unet.apply, model.text_encoder.apply,
                                 unet, te, batch, jax.random.PRNGKey(0), cfg,
                                 coefficients, deterministic=True)
            return {k: v for k, v in data.items()
                    if hasattr(v, "ndim")}

        def run(batch):
            return jax.device_get(
                debug_sd(setup.merged_inference_params(), batch))
        return run

    if family_name == "sdxl":
        from onetrainer_tpu.train.sdxl_train_step import sdxl_predict
        coefficients = model.coefficients()

        @jax.jit
        def debug_sdxl(params, batch):
            unet, te, te2, extra = params
            data = sdxl_predict(model, unet, te, te2, batch,
                                jax.random.PRNGKey(0), cfg, coefficients,
                                extra, deterministic=True)
            return {k: v for k, v in data.items() if hasattr(v, "ndim")}

        def run_xl(batch):
            return jax.device_get(
                debug_sdxl(setup.merged_inference_params(), batch))
        return run_xl

    return None   # other families: debug dumps not wired yet


def get_family(model_type: ModelType) -> ModelFamily:
    if model_type.is_stable_diffusion():
        return ModelFamily(
            name="sd", quantization=8,
            load=_sd_load, create_setup=_sd_create_setup,
            make_encode_fns=_sd_encode_fns, sample=_sd_sample,
            save_model=_sd_save_model, save_single_file=_sd_save_single_file,
            lora_prefixes={"unet_lora": "lora_unet", "te_lora": "lora_te"},
        )
    if model_type.is_stable_diffusion_xl():
        return ModelFamily(
            name="sdxl", quantization=64,
            load=_sdxl_load, create_setup=_sdxl_create_setup,
            make_encode_fns=_sdxl_encode_fns, sample=_sdxl_sample,
            save_model=_sdxl_save_model, save_single_file=_sdxl_save_single_file,
            lora_prefixes={"unet_lora": "lora_unet", "te_lora": "lora_te1",
                           "te2_lora": "lora_te2"},
        )
    if model_type.is_pixart():
        return ModelFamily(
            name="pixart", quantization=8,
            load=_pixart_load, create_setup=_pixart_create_setup,
            make_encode_fns=_pixart_encode_fns, sample=_pixart_sample,
            save_model=_pixart_save_model, save_single_file=_pixart_save_single_file,
            lora_prefixes={"transformer_lora": "lora_transformer"},
        )
    if model_type.is_stable_diffusion_3():
        return ModelFamily(
            name="sd3", quantization=64,
            load=_sd3_load, create_setup=_sd3_create_setup,
            make_encode_fns=_sd3_encode_fns, sample=_sd3_sample,
            save_model=_sd3_save_model, save_single_file=_sd3_save_single_file,
            lora_prefixes={"transformer_lora": "lora_transformer",
                           "te_lora": "lora_te1", "te2_lora": "lora_te2"},
        )
    if model_type.is_hi_dream():
        return ModelFamily(
            name="hidream", quantization=16,
            load=_hidream_load, create_setup=_hidream_create_setup,
            make_encode_fns=_hidream_encode_fns, sample=_hidream_sample,
            save_model=_hidream_save_model,
            save_single_file=_hidream_save_single_file,
            lora_prefixes={"transformer_lora": "lora_transformer"},
        )
    if model_type.is_hunyuan_video():
        return ModelFamily(
            name="hunyuan", quantization=32,
            load=_hunyuan_load, create_setup=_hunyuan_create_setup,
            make_encode_fns=_hunyuan_encode_fns, sample=_hunyuan_sample,
            save_model=_hunyuan_save_model,
            save_single_file=_hunyuan_save_single_file,
            lora_prefixes={"transformer_lora": "lora_transformer",
                           "te_lora": "lora_te1"},
            video=True,
        )
    if model_type.is_sana():
        return ModelFamily(
            name="sana", quantization=32,
            load=_sana_load, create_setup=_sana_create_setup,
            make_encode_fns=_sana_encode_fns, sample=_sana_sample,
            save_model=_sana_save_model,
            save_single_file=_sana_save_single_file,
            lora_prefixes={"transformer_lora": "lora_transformer",
                           "te_lora": "lora_te1"},
        )
    if model_type.is_wuerstchen():
        return ModelFamily(
            name="wuerstchen", quantization=128,
            load=_wuerstchen_load, create_setup=_wuerstchen_create_setup,
            make_encode_fns=_wuerstchen_encode_fns, sample=_wuerstchen_sample,
            save_model=_wuerstchen_save_model,
            save_single_file=_wuerstchen_save_single_file,
            lora_prefixes={"prior_lora": "lora_prior",
                           "te_lora": "lora_prior_te"},
        )
    if model_type.is_flux():
        return ModelFamily(
            name="flux", quantization=64,
            load=_flux_load, create_setup=_flux_create_setup,
            make_encode_fns=_flux_encode_fns, sample=_flux_sample,
            save_model=_flux_save_model, save_single_file=_flux_save_single_file,
            lora_prefixes={"transformer_lora": "lora_transformer",
                           "te_lora": "lora_te1"},
        )
    raise NotImplementedError(
        f"model family {model_type} is not wired up yet")


def cast_float_array(arr, dtype):
    """Cast float arrays (incl. ml_dtypes bf16/fp8) to `dtype`; pass
    integers and None through — mirrors the reference's
    DtypeModelSaverMixin._convert_state_dict_dtype, which `.to()`s every
    tensor but only floats actually change representation here."""
    import ml_dtypes
    if dtype is None:
        return arr
    a = np.asarray(jax.device_get(arr))
    if (np.issubdtype(a.dtype, np.floating)
            or a.dtype in (np.dtype(ml_dtypes.bfloat16),
                           np.dtype(ml_dtypes.float8_e4m3fn),
                           np.dtype(ml_dtypes.float8_e5m2))):
        return np.ascontiguousarray(a.astype(dtype))
    return a


@dataclass
class _InferenceSetup:
    """A minimal stand-in for a training setup wrapping a freshly loaded
    (untrained) model, so `ModelFamily.save_model` / `save_single_file`
    can run outside a trainer — used by scripts/convert_model.py
    (reference: that script builds a full model_loader/model_saver pair,
    scripts/convert_model.py:16-47)."""
    model: object
    config: object
    parts: tuple

    def merged_inference_params(self, params=None):
        return self.parts

    def effective_vae_params(self):
        return self.model.vae_params


def make_inference_setup(model, config) -> _InferenceSetup:
    """Build the per-family `merged_inference_params()` tuple straight
    from the loaded model's param attributes (the FINE_TUNE branch of each
    setup's merged_inference_params with no trained deltas applied)."""
    mt = config.model_type
    if mt.is_stable_diffusion():
        parts = (model.unet_params, model.te_params, None)
    elif mt.is_stable_diffusion_xl():
        parts = (model.unet_params, model.te_params, model.te2_params, None)
    elif mt.is_stable_diffusion_3():
        parts = (model.transformer_params, model.te_params,
                 model.te2_params, model.te3_params, None)
    elif mt.is_flux():
        parts = (model.transformer_params, model.te_params,
                 model.te2_params, None)
    elif mt.is_pixart() or mt.is_sana():
        parts = (model.transformer_params, model.te_params, None)
    elif mt.is_hi_dream():
        parts = (model.transformer_params, model.te_params, model.te2_params,
                 model.te3_params, model.te4_params, None)
    elif mt.is_hunyuan_video():
        parts = (model.transformer_params, model.te_params,
                 model.te2_params, None)
    elif mt.is_wuerstchen():
        parts = (model.prior_params, model.te_params, None)
    else:
        raise ValueError(f"unsupported model type {mt}")
    return _InferenceSetup(model=model, config=config, parts=parts)


def save_lora_output(setup, destination: str, lora_prefixes: dict,
                     save_dtype=None):
    """kohya-format LoRA safetensors across all adapter groups, with
    trained additional embeddings bundled as bundle_emb.* keys
    (reference: StableDiffusionLoRASaver.py:33-41; tensors cast to the
    configured output_dtype like LoRASaverMixin.save via
    DtypeModelSaverMixin._convert_state_dict_dtype)."""
    tensors = {}
    params = setup.state.params
    for key, prefix in lora_prefixes.items():
        if key in params:
            tensors.update(peft_to_kohya_state_dict(
                jax.device_get(params[key]), setup.peft_cfg, prefix))
    if ("embeddings" in params
            and getattr(setup.config, "bundle_additional_embeddings", True)
            and getattr(setup, "embedding_ids", None)):
        vectors = np.asarray(jax.device_get(params["embeddings"]))
        for cfg_e in setup.config.all_embedding_configs():
            span = setup.embedding_ids.get(cfg_e.uuid)
            if span is None:
                continue
            start, count = span
            tensors[f"bundle_emb.{cfg_e.placeholder}.emp_params"] = \
                vectors[start:start + count]
    if save_dtype is not None:
        tensors = {k: cast_float_array(v, save_dtype)
                   for k, v in tensors.items()}
    if not destination.endswith(".safetensors"):
        destination += ".safetensors"
    from onetrainer_tpu.util.model_spec import make_modelspec_metadata
    meta = make_modelspec_metadata(
        setup.config.model_type, setup.config.training_method,
        resolution=setup.config.resolution, train_config=setup.config,
        tensors=tensors)
    save_safetensors(destination, tensors,
                     metadata={"format": "pt", **meta})
