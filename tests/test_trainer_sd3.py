"""SD3 end-to-end: tiny diffusers-layout SD3 checkpoint -> GenericTrainer
flow-matching LoRA run -> kohya output."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, t5_flax_to_state_dict, unet_flax_to_state_dict,
    vae_flax_to_state_dict,
)
from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
from onetrainer_tpu.util.enums import EMAMode, ModelType, TimeUnit, TrainingMethod
from tests.test_data import make_dataset
from tests.test_sd3 import tiny_sd3_model


def write_tiny_sd3_checkpoint(base_dir, model):
    rng = jax.random.PRNGKey(0)
    transformer_params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([1.0]), jnp.zeros((1, 16)),
        jnp.zeros((1, 10, 24)))["params"]
    te = model.text_encoder.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    te2 = model.text_encoder_2.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    te3 = model.text_encoder_3.init(rng, jnp.zeros((1, 6), jnp.int32))["params"]
    vae = model.vae.init(rng, jnp.zeros((1, 32, 32, 3)), rng)["params"]

    def write(component, sd, config, weights_name="diffusion_pytorch_model.safetensors"):
        d = os.path.join(base_dir, component)
        os.makedirs(d, exist_ok=True)
        save_safetensors(os.path.join(d, weights_name), sd)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config, f)

    write("transformer", unet_flax_to_state_dict(jax.device_get(transformer_params)), {
        "sample_size": 8, "patch_size": 2, "in_channels": 4, "out_channels": 4,
        "num_layers": 2, "num_attention_heads": 2, "attention_head_dim": 16,
        "joint_attention_dim": 24, "caption_projection_dim": 32,
        "pooled_projection_dim": 16, "pos_embed_max_size": 16,
    })
    write("vae", vae_flax_to_state_dict(jax.device_get(vae)), {
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "scaling_factor": 1.5305, "shift_factor": 0.0609,
    })
    write("text_encoder", clip_flax_to_state_dict(jax.device_get(te)), {
        "vocab_size": 100, "hidden_size": 6, "intermediate_size": 12,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "max_position_embeddings": 16, "hidden_act": "quick_gelu",
        "eos_token_id": 99, "projection_dim": 6,
        "architectures": ["CLIPTextModelWithProjection"],
    }, weights_name="model.safetensors")
    write("text_encoder_2", clip_flax_to_state_dict(jax.device_get(te2)), {
        "vocab_size": 100, "hidden_size": 10, "intermediate_size": 20,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "max_position_embeddings": 16, "hidden_act": "gelu",
        "eos_token_id": 99, "projection_dim": 10,
        "architectures": ["CLIPTextModelWithProjection"],
    }, weights_name="model.safetensors")
    write("text_encoder_3", t5_flax_to_state_dict(jax.device_get(te3)), {
        "vocab_size": 110, "d_model": 24, "d_kv": 6, "d_ff": 48,
        "num_layers": 2, "num_heads": 4,
    }, weights_name="model.safetensors")


def test_sd3_e2e_lora(tmp_path):
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sd3_model()
    write_tiny_sd3_checkpoint(base, model)

    config = TrainConfig.default_values()
    config.model_type = ModelType.STABLE_DIFFUSION_3
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
    config.text_encoder.train = False
    config.text_encoder_2.train = False
    config.text_encoder_3.train = False
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_sd3.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 2
    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_transformer_") for k in sd)


def test_sd3_embedding_e2e(tmp_path):
    """SD3 textual inversion: three per-TE vector tables (clip_l/clip_g/
    t5) + per-TE output embeddings, saved in the SD3 multi-TE embedding
    format (reference: StableDiffusion3ModelEmbedding,
    StableDiffusion3EmbeddingSaver.py:29-39)."""
    from onetrainer_tpu.config.train_config import TrainEmbeddingConfig

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sd3_model()
    write_tiny_sd3_checkpoint(base, model)
    for name in os.listdir(ds):
        if name.endswith(".txt"):
            path = os.path.join(ds, name)
            with open(path, "w") as f:
                f.write("<sd3-emb> test prompt")

    config = TrainConfig.default_values()
    config.model_type = ModelType.STABLE_DIFFUSION_3
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
    emb.placeholder = "<sd3-emb>"
    emb.token_count = 2
    emb.initial_embedding_text = "thing"
    config.embedding = emb
    out_emb = TrainEmbeddingConfig.default_values()
    out_emb.uuid = "out-1"
    out_emb.placeholder = "<sd3-out>"
    out_emb.token_count = 1
    out_emb.initial_embedding_text = "thing"
    out_emb.is_output_embedding = True
    config.additional_embeddings = [out_emb]
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_sd3_emb.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    params = trainer.setup.state.params
    # per-TE dims in the tiny model: clip_l 6, clip_g 10, t5 24
    assert params["embeddings"].shape == (2, 6)
    assert params["embeddings_2"].shape == (2, 10)
    assert params["embeddings_3"].shape == (2, 24)
    assert params["output_embeddings_3"].shape == (1, 24)
    before = np.asarray(params["embeddings_3"]).copy()
    trainer.train()
    trainer.end()

    after = np.asarray(jax.device_get(
        trainer.setup.state.params["embeddings_3"]))
    assert not np.allclose(before, after)     # the T5 table trained
    sd = load_safetensors(config.output_model_destination)
    assert sd["clip_l"].shape == (2, 6)
    assert sd["clip_g"].shape == (2, 10)
    assert sd["t5"].shape == (2, 24)
    assert sd["t5_out"].shape == (1, 24)


def test_sd3_e2e_lora_with_cached_te_dropout(tmp_path):
    """Per-TE conditioning dropout must work on the CACHED conditioning
    path, where the per-TE slices live inside the combined sd3_context
    (reference: StableDiffusion3Model.py:397-415 applies dropout to
    cached states too). Exercises the slice-masking branch of
    sd3_conditioning end to end."""
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sd3_model()
    write_tiny_sd3_checkpoint(base, model)

    config = TrainConfig.default_values()
    config.model_type = ModelType.STABLE_DIFFUSION_3
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
    config.text_encoder.train = False
    config.text_encoder.dropout_probability = 0.5
    config.text_encoder_2.train = False
    config.text_encoder_2.dropout_probability = 0.5
    config.text_encoder_3.train = False
    config.text_encoder_3.dropout_probability = 0.5
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_sd3_drop.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 2
    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_transformer_") for k in sd)
