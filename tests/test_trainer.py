"""End-to-end integration: tiny diffusers checkpoint on disk -> GenericTrainer
start/train/end -> LoRA output + backup + resume."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, unet_flax_to_state_dict, vae_flax_to_state_dict,
)
from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
from onetrainer_tpu.util.enums import EMAMode, TimeUnit, TrainingMethod
from tests.test_data import make_dataset
from tests.test_train_step import tiny_sd_model


def write_tiny_checkpoint(base_dir, model):
    """Write the tiny SD model as a diffusers-layout checkpoint."""
    rng = jax.random.PRNGKey(0)
    unet_params = model.unet.init(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray([1]),
        jnp.zeros((1, 8, 32)))["params"]
    te_params = model.text_encoder.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
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
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        "layers_per_block": 1,
        "attention_head_dim": 4,
        "cross_attention_dim": 32,
        "use_linear_projection": False,
    })
    write("vae", vae_flax_to_state_dict(jax.device_get(vae_params)), {
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "scaling_factor": 0.18215,
    })
    write("text_encoder", clip_flax_to_state_dict(jax.device_get(te_params)), {
        "vocab_size": 100, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 16, "hidden_act": "quick_gelu",
        "eos_token_id": 99,
    }, weights_name="model.safetensors")
    os.makedirs(os.path.join(base_dir, "scheduler"), exist_ok=True)
    with open(os.path.join(base_dir, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump({"prediction_type": "epsilon", "beta_schedule": "scaled_linear"}, f)
    return unet_params


def tiny_train_config(base_dir, dataset_dir, workspace, cache_dir):
    config = TrainConfig.default_values()
    config.base_model_name = base_dir
    config.model_type = config.model_type  # STABLE_DIFFUSION_15
    config.training_method = TrainingMethod.LORA
    config.workspace_dir = workspace
    config.cache_dir = cache_dir
    config.epochs = 2
    config.batch_size = 2
    config.resolution = "32"
    config.lora_rank = 4
    config.lora_alpha = 8.0
    config.learning_rate = 1e-3
    config.learning_rate_warmup_steps = 0.0
    config.tensorboard = False
    config.sample_after_unit = TimeUnit.NEVER
    config.backup_after_unit = TimeUnit.NEVER
    config.save_every_unit = TimeUnit.NEVER
    config.ema = EMAMode.OFF
    config.aspect_ratio_bucketing = False
    config.latent_caching = True
    config.optimizer.stochastic_rounding = False
    config.text_encoder.train = False
    concept = ConceptConfig.default_values()
    concept.path = dataset_dir
    concept.seed = 7
    config.concepts = [concept]
    config.samples = []
    config.output_model_destination = os.path.join(workspace, "out_lora.safetensors")
    config.backup_before_save = True
    return config


@pytest.fixture(scope="module")
def trained_workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    base = str(tmp / "ckpt")
    ds = make_dataset(str(tmp / "ds"), n=4)
    model = tiny_sd_model()
    write_tiny_checkpoint(base, model)
    config = tiny_train_config(base, ds, str(tmp / "ws"), str(tmp / "cache"))
    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()
    return tmp, config, trainer


def test_e2e_lora_training_produces_output(trained_workspace):
    tmp, config, trainer = trained_workspace
    assert trainer.train_progress.global_step >= 4  # 2 epochs x 2 steps
    out = config.output_model_destination
    assert os.path.exists(out)
    sd = load_safetensors(out)
    assert any(k.startswith("lora_unet_") and k.endswith("lora_down.weight")
               for k in sd)
    assert any(k.endswith(".alpha") for k in sd)
    # LoRA actually trained (up weights non-zero after steps)
    ups = [v for k, v in sd.items() if k.endswith("lora_up.weight")]
    assert max(float(np.abs(u).max()) for u in ups) > 0


def test_e2e_backup_and_resume(trained_workspace):
    tmp, config, trainer = trained_workspace
    backup_dir = config.get_last_backup_path()
    assert backup_dir is not None
    assert os.path.exists(os.path.join(backup_dir, "meta.json"))
    assert os.path.exists(os.path.join(backup_dir, "optimizer.safetensors"))
    assert os.path.exists(os.path.join(
        backup_dir, "model", "unet", "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(backup_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["train_progress"]["global_step"] == trainer.train_progress.global_step

    # resume: progress restored
    config2 = TrainConfig.default_values().from_dict(config.to_dict())
    config2.continue_last_backup = True
    config2.epochs = 2  # already done -> no new steps
    trainer2 = GenericTrainer(config2)
    trainer2.start()
    assert trainer2.train_progress.global_step == trainer.train_progress.global_step
    trainer2.train()  # completes immediately (epochs exhausted)
