"""PixArt end-to-end trainer run with VB loss + T5-only conditioning."""

import json
import os

import jax
import jax.numpy as jnp

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.torch_flax import (
    t5_flax_to_state_dict, unet_flax_to_state_dict, vae_flax_to_state_dict,
)
from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
from onetrainer_tpu.util.enums import EMAMode, ModelType, TimeUnit, TrainingMethod
from tests.test_data import make_dataset
from tests.test_pixart import tiny_pixart_model


def write_tiny_pixart_checkpoint(base_dir, model):
    rng = jax.random.PRNGKey(0)
    transformer_params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([1]),
        jnp.zeros((1, 6, 24)))["params"]
    te = model.text_encoder.init(rng, jnp.zeros((1, 6), jnp.int32))["params"]
    vae = model.vae.init(rng, jnp.zeros((1, 32, 32, 3)), rng)["params"]

    def write(component, sd, config, weights_name="diffusion_pytorch_model.safetensors"):
        d = os.path.join(base_dir, component)
        os.makedirs(d, exist_ok=True)
        save_safetensors(os.path.join(d, weights_name), sd)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config, f)

    write("transformer", unet_flax_to_state_dict(jax.device_get(transformer_params)), {
        "sample_size": 8, "patch_size": 2, "in_channels": 4, "out_channels": 8,
        "num_layers": 2, "num_attention_heads": 2, "attention_head_dim": 16,
        "cross_attention_dim": 24, "caption_channels": 24,
    })
    write("vae", vae_flax_to_state_dict(jax.device_get(vae)), {
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "scaling_factor": 0.18215,
    })
    write("text_encoder", t5_flax_to_state_dict(jax.device_get(te)), {
        "vocab_size": 110, "d_model": 24, "d_kv": 6, "d_ff": 48,
        "num_layers": 2, "num_heads": 4,
    }, weights_name="model.safetensors")


def test_pixart_e2e_lora(tmp_path):
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_pixart_model()
    write_tiny_pixart_checkpoint(base, model)

    config = TrainConfig.default_values()
    config.model_type = ModelType.PIXART_ALPHA
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
    config.prior.train = True
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_pixart.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 2
    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_transformer_") for k in sd)
