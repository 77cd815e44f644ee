"""SDXL end-to-end: tiny diffusers-layout SDXL checkpoint -> GenericTrainer
LoRA run -> kohya output with lora_te1/lora_te2 prefixes + backup round-trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, unet_flax_to_state_dict, vae_flax_to_state_dict,
)
from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
from onetrainer_tpu.util.enums import EMAMode, ModelType, TimeUnit, TrainingMethod
from tests.test_data import make_dataset
from tests.test_sdxl import tiny_sdxl_model, _init


def write_tiny_sdxl_checkpoint(base_dir, model):
    unet_params, te, te2 = _init(model)
    rng = jax.random.PRNGKey(0)
    vae_params = model.vae.init(rng, jnp.zeros((1, 32, 32, 3)), rng)["params"]

    def write(component, sd, config, weights_name="diffusion_pytorch_model.safetensors"):
        d = os.path.join(base_dir, component)
        os.makedirs(d, exist_ok=True)
        save_safetensors(os.path.join(d, weights_name), sd)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config, f)

    write("unet", unet_flax_to_state_dict(jax.device_get(unet_params)), {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [32, 64],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
        "layers_per_block": 1,
        "transformer_layers_per_block": [1, 2],
        "attention_head_dim": 4,
        "cross_attention_dim": 80,
        "use_linear_projection": True,
        "addition_time_embed_dim": 8,
    })
    write("vae", vae_flax_to_state_dict(jax.device_get(vae_params)), {
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "scaling_factor": 0.13025,
    })
    write("text_encoder", clip_flax_to_state_dict(jax.device_get(te)), {
        "vocab_size": 100, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 16, "hidden_act": "quick_gelu",
        "eos_token_id": 99,
    }, weights_name="model.safetensors")
    write("text_encoder_2", clip_flax_to_state_dict(jax.device_get(te2)), {
        "vocab_size": 100, "hidden_size": 48, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 16, "hidden_act": "gelu",
        "eos_token_id": 99, "projection_dim": 48,
        "architectures": ["CLIPTextModelWithProjection"],
    }, weights_name="model.safetensors")
    os.makedirs(os.path.join(base_dir, "scheduler"), exist_ok=True)
    with open(os.path.join(base_dir, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump({"prediction_type": "epsilon"}, f)


def test_sdxl_e2e_lora(tmp_path):
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sdxl_model()
    write_tiny_sdxl_checkpoint(base, model)

    config = TrainConfig.default_values()
    config.model_type = ModelType.STABLE_DIFFUSION_XL_10_BASE
    config.training_method = TrainingMethod.LORA
    config.base_model_name = base
    config.workspace_dir = str(tmp_path / "ws")
    config.cache_dir = str(tmp_path / "cache")
    config.epochs = 1
    config.batch_size = 2
    config.resolution = "32"
    config.aspect_ratio_bucketing = False
    config.lora_rank = 4
    config.learning_rate = 1e-3
    config.learning_rate_warmup_steps = 0.0
    config.tensorboard = False
    config.sample_after_unit = TimeUnit.NEVER
    config.backup_after_unit = TimeUnit.NEVER
    config.save_every_unit = TimeUnit.NEVER
    config.ema = EMAMode.OFF
    config.optimizer.stochastic_rounding = False
    config.text_encoder.train = True
    config.text_encoder_2.train = True
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_xl.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 2
    sd = load_safetensors(config.output_model_destination)
    prefixes = {k.split("_", 2)[1] for k in sd}
    assert any(k.startswith("lora_unet_") for k in sd)
    assert any(k.startswith("lora_te1_") for k in sd)
    assert any(k.startswith("lora_te2_") for k in sd)
    # gradient-flow canary: lora_up starts at zero, so a nonzero up matrix
    # proves grads reached the adapters (a disconnected adapter tree lets
    # XLA prune the whole backward and the run silently trains nothing)
    up_max = max(float(np.abs(v).max()) for k, v in sd.items()
                 if k.endswith("lora_up.weight"))
    assert up_max > 0.0


def test_sdxl_e2e_lora_fp8_base(tmp_path):
    """The bench-headline configuration through the SHIPPED trainer:
    LoRA over an fp8-quantized frozen UNet. Regression for the r5
    forward-only bug: quantize_frozen_parts re-points model.unet_params
    at the quantized tree (to free the bf16 copy), the trainer's second
    create_setup then initialized adapters from quantized leaves that
    _kernel_paths silently skipped → empty adapter tree → XLA pruned the
    backward; 224 'training' steps updated nothing (caught on-device via
    the step's XLA cost analysis, BASELINE 2026-08-21)."""
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sdxl_model()
    write_tiny_sdxl_checkpoint(base, model)

    from onetrainer_tpu.util.enums import DataType
    config = TrainConfig.default_values()
    config.model_type = ModelType.STABLE_DIFFUSION_XL_10_BASE
    config.training_method = TrainingMethod.LORA
    config.base_model_name = base
    config.workspace_dir = str(tmp_path / "ws")
    config.cache_dir = str(tmp_path / "cache")
    config.epochs = 1
    config.batch_size = 2
    config.resolution = "32"
    config.aspect_ratio_bucketing = False
    config.lora_rank = 4
    config.learning_rate = 1e-3
    config.learning_rate_warmup_steps = 0.0
    config.tensorboard = False
    config.sample_after_unit = TimeUnit.NEVER
    config.backup_after_unit = TimeUnit.NEVER
    config.save_every_unit = TimeUnit.NEVER
    config.ema = EMAMode.OFF
    config.optimizer.stochastic_rounding = False
    config.unet.train = True
    config.unet.weight_dtype = DataType.FLOAT_8
    config.text_encoder.train = False
    config.text_encoder_2.train = False
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_xl_fp8.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    # the second create_setup pass must see the full adapter set even
    # though model.unet_params now holds QuantizedArray leaves
    from onetrainer_tpu.peft.lora import PeftConfig, peft_module_keys
    n_modules = len(peft_module_keys(
        model.unet.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 4, 4)), jnp.asarray([1]),
                        jnp.zeros((1, 8, 80)), jnp.zeros((1, 48)),
                        jnp.zeros((1, 6)))["params"],
        PeftConfig(rank=4)))
    lora_tree = trainer.setup.state.params["unet_lora"]
    assert len(lora_tree) == n_modules and n_modules > 0
    trainer.train()
    trainer.end()

    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_unet_") for k in sd)
    up_max = max(float(np.abs(v).max()) for k, v in sd.items()
                 if k.endswith("lora_up.weight"))
    assert up_max > 0.0


def test_sdxl_embedding_e2e(tmp_path):
    """SDXL textual inversion: per-TE vector tables (768/1280-style dims
    differ) + per-TE output embeddings, saved in the XL embedding format
    (reference: StableDiffusionXLModelEmbedding,
    StableDiffusionXLEmbeddingSaver.py:29-35 clip_l/clip_g[_out])."""
    from onetrainer_tpu.config.train_config import TrainEmbeddingConfig

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sdxl_model()
    write_tiny_sdxl_checkpoint(base, model)
    for name in os.listdir(ds):
        if name.endswith(".txt"):
            path = os.path.join(ds, name)
            with open(path) as f:
                text = f.read()
            with open(path, "w") as f:
                f.write("<xl-emb> " + text)

    config = TrainConfig.default_values()
    config.model_type = ModelType.STABLE_DIFFUSION_XL_10_BASE
    config.training_method = TrainingMethod.EMBEDDING
    config.base_model_name = base
    config.workspace_dir = str(tmp_path / "ws")
    config.cache_dir = str(tmp_path / "cache")
    config.epochs = 1
    config.batch_size = 2
    config.resolution = "32"
    config.aspect_ratio_bucketing = False
    config.learning_rate = 1e-3
    config.learning_rate_warmup_steps = 0.0
    config.tensorboard = False
    config.sample_after_unit = TimeUnit.NEVER
    config.backup_after_unit = TimeUnit.NEVER
    config.save_every_unit = TimeUnit.NEVER
    config.ema = EMAMode.OFF
    config.optimizer.stochastic_rounding = False
    config.samples = []
    emb = TrainEmbeddingConfig.default_values()
    emb.placeholder = "<xl-emb>"
    emb.token_count = 2
    emb.initial_embedding_text = "thing"
    config.embedding = emb
    out_emb = TrainEmbeddingConfig.default_values()
    out_emb.uuid = "out-1"
    out_emb.placeholder = "<xl-out>"
    out_emb.token_count = 1
    out_emb.initial_embedding_text = "thing"
    out_emb.is_output_embedding = True
    config.additional_embeddings = [out_emb]
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_xl_emb.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    params = trainer.setup.state.params
    # per-TE dims: TE1 hidden 32, TE2 hidden 48 in the tiny model
    assert params["embeddings"].shape == (2, 32)
    assert params["embeddings_2"].shape == (2, 48)
    assert params["output_embeddings"].shape == (1, 32)
    assert params["output_embeddings_2"].shape == (1, 48)
    before = np.asarray(params["embeddings_2"]).copy()
    trainer.train()
    trainer.end()

    after = np.asarray(jax.device_get(
        trainer.setup.state.params["embeddings_2"]))
    assert not np.allclose(before, after)     # TE2 table actually trained
    sd = load_safetensors(config.output_model_destination)
    assert sd["clip_l"].shape == (2, 32)
    assert sd["clip_g"].shape == (2, 48)
    assert sd["clip_l_out"].shape == (1, 32)
    assert sd["clip_g_out"].shape == (1, 48)
