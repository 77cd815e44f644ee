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


def test_pixart_embedding_e2e(tmp_path):
    """PixArt textual inversion on the T5 encoder, t5/t5_out artifact
    keys (reference: PixArtAlphaModelEmbedding,
    PixArtAlphaEmbeddingSaver.py:29-31)."""
    import numpy as np

    from onetrainer_tpu.config.train_config import TrainEmbeddingConfig

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_pixart_model()
    write_tiny_pixart_checkpoint(base, model)
    for name in os.listdir(ds):
        if name.endswith(".txt"):
            with open(os.path.join(ds, name), "w") as f:
                f.write("<px-emb> test prompt")

    config = TrainConfig.default_values()
    config.model_type = ModelType.PIXART_ALPHA
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
    emb.placeholder = "<px-emb>"
    emb.token_count = 2
    emb.initial_embedding_text = "thing"
    config.embedding = emb
    out_emb = TrainEmbeddingConfig.default_values()
    out_emb.uuid = "out-1"
    out_emb.placeholder = "<px-out>"
    out_emb.token_count = 1
    out_emb.initial_embedding_text = "thing"
    out_emb.is_output_embedding = True
    config.additional_embeddings = [out_emb]
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_px_emb.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    params = trainer.setup.state.params
    assert params["embeddings"].shape == (2, 24)
    assert params["output_embeddings"].shape == (1, 24)
    before = np.asarray(params["embeddings"]).copy()
    trainer.train()
    trainer.end()

    after = np.asarray(jax.device_get(trainer.setup.state.params["embeddings"]))
    assert not np.allclose(before, after)
    sd = load_safetensors(config.output_model_destination)
    assert sd["t5"].shape == (2, 24)
    assert sd["t5_out"].shape == (1, 24)
