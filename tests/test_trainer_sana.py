"""Sana end-to-end trainer run: DC-AE latents + Gemma2 conditioning +
linear-attention DiT flow matching (reference: BaseSanaSetup.py:159-233)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.sana_checkpoints import (
    dcae_flax_to_state_dict, gemma_flax_to_state_dict,
    sana_flax_to_state_dict, sana_state_dict_to_flax,
)
from onetrainer_tpu.models.dcae import DCAEConfig
from onetrainer_tpu.models.gemma import Gemma2Config
from onetrainer_tpu.models.sana import SanaConfig
from onetrainer_tpu.models.sana_model import SanaModel
from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
from onetrainer_tpu.util.enums import (
    EMAMode, ModelType, TimeUnit, TrainingMethod,
)
from tests.test_data import make_dataset


def tiny_sana_model():
    return SanaModel(
        model_type=ModelType.SANA,
        transformer_config=SanaConfig(
            in_channels=8, out_channels=8, num_layers=2,
            num_attention_heads=4, attention_head_dim=8,
            num_cross_attention_heads=2, cross_attention_head_dim=16,
            caption_channels=24, patch_size=1, dtype=jnp.float32),
        vae_config=DCAEConfig(
            latent_channels=8,
            encoder_block_out_channels=(8, 16, 16),
            decoder_block_out_channels=(8, 16, 16),
            encoder_layers_per_block=(1, 1, 1),
            decoder_layers_per_block=(1, 1, 1),
            vit_stages=(False, False, True),
            attention_head_dim=8,
            dtype=jnp.float32),
        te_config=Gemma2Config(
            vocab_size=120, hidden_size=24, intermediate_size=48,
            num_layers=2, num_heads=2, num_kv_heads=1, head_dim=12,
            query_pre_attn_scalar=12.0, max_length=16, dtype=jnp.float32),
    )


def write_tiny_sana_checkpoint(base_dir, model):
    rng = jax.random.PRNGKey(0)
    transformer_params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 8)), jnp.asarray([1.0]),
        jnp.zeros((1, 6, 24)), jnp.ones((1, 6), jnp.int32))["params"]
    te = model.text_encoder.init(rng, jnp.zeros((1, 6), jnp.int32))["params"]
    vae = jax.jit(lambda r: model.vae.init(
        r, jnp.zeros((1, 32, 32, 3))))(rng)["params"]

    def write(component, sd, config,
              weights_name="diffusion_pytorch_model.safetensors"):
        d = os.path.join(base_dir, component)
        os.makedirs(d, exist_ok=True)
        save_safetensors(os.path.join(d, weights_name),
                         {k: np.asarray(v) for k, v in sd.items()})
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config, f)

    write("transformer",
          sana_flax_to_state_dict(jax.device_get(transformer_params)), {
              "in_channels": 8, "out_channels": 8, "num_layers": 2,
              "num_attention_heads": 4, "attention_head_dim": 8,
              "num_cross_attention_heads": 2, "cross_attention_head_dim": 16,
              "caption_channels": 24, "patch_size": 1,
          })
    write("vae", dcae_flax_to_state_dict(jax.device_get(vae)), {
        "in_channels": 3, "latent_channels": 8,
        "encoder_block_out_channels": [8, 16, 16],
        "decoder_block_out_channels": [8, 16, 16],
        "encoder_layers_per_block": [1, 1, 1],
        "decoder_layers_per_block": [1, 1, 1],
        "encoder_block_types": ["ResBlock", "ResBlock", "EfficientViTBlock"],
        "attention_head_dim": 8,
        "scaling_factor": 0.41407,
    })
    write("text_encoder", gemma_flax_to_state_dict(jax.device_get(te)), {
        "vocab_size": 120, "hidden_size": 24, "intermediate_size": 48,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 1, "head_dim": 12,
        "query_pre_attn_scalar": 12.0,
    }, weights_name="model.safetensors")


def test_sana_transformer_key_roundtrip():
    model = tiny_sana_model()
    rng = jax.random.PRNGKey(0)
    params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 8)), jnp.asarray([1.0]),
        jnp.zeros((1, 6, 24)), jnp.ones((1, 6), jnp.int32))["params"]
    sd = sana_flax_to_state_dict(jax.device_get(params))
    assert "patch_embed.proj.weight" in sd
    assert "time_embed.linear.weight" in sd
    assert "transformer_blocks.0.attn1.to_q.weight" in sd
    assert "transformer_blocks.0.ff.conv_depth.weight" in sd
    assert "transformer_blocks.0.scale_shift_table" in sd
    back = sana_state_dict_to_flax(sd)
    for a, b in zip(jax.tree.leaves(jax.device_get(params)),
                    jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_sana_e2e_lora(tmp_path):
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sana_model()
    write_tiny_sana_checkpoint(base, model)

    config = TrainConfig.default_values()
    config.model_type = ModelType.SANA
    config.training_method = TrainingMethod.LORA
    config.base_model_name = base
    config.workspace_dir = str(tmp_path / "ws")
    config.cache_dir = str(tmp_path / "cache")
    config.epochs = 1
    config.batch_size = 2
    config.resolution = "32"
    config.aspect_ratio_bucketing = False
    config.lora_rank = 4
    config.lora_layers = "attn"
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
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_sana.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    # DC-AE 3 stages -> 4x downscale: 32px -> 8x8 latents, 8 channels
    batches = trainer.data_loader.batches_for_epoch(0)
    trainer.data_loader.ensure_cached(batches)
    batch = trainer.data_loader.materialize_batch(batches[0])
    assert batch["latent_image"].shape[1:] == (8, 8, 8)
    assert "tokens_mask" in batch
    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 2
    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_transformer_") for k in sd)


def test_sana_embedding_e2e(tmp_path):
    """Sana textual inversion on the Gemma2 encoder, gemma/gemma_out
    artifact keys (reference: SanaEmbeddingSetup.py,
    SanaEmbeddingSaver.py:27-31) — closes the VERDICT r2 embedding gap."""
    from onetrainer_tpu.config.train_config import TrainEmbeddingConfig

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sana_model()
    hidden = model.te_config.hidden_size
    write_tiny_sana_checkpoint(base, model)
    for name in os.listdir(ds):
        if name.endswith(".txt"):
            with open(os.path.join(ds, name), "w") as f:
                f.write("<sana-emb> test prompt <sana-out>")

    config = TrainConfig.default_values()
    config.model_type = ModelType.SANA
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
    emb.placeholder = "<sana-emb>"
    emb.token_count = 2
    emb.initial_embedding_text = "thing"
    config.embedding = emb
    out_emb = TrainEmbeddingConfig.default_values()
    out_emb.uuid = "out-1"
    out_emb.placeholder = "<sana-out>"
    out_emb.token_count = 1
    out_emb.initial_embedding_text = "thing"
    out_emb.is_output_embedding = True
    config.additional_embeddings = [out_emb]
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_sana_emb.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    params = trainer.setup.state.params
    assert params["embeddings"].shape == (2, hidden)
    assert params["output_embeddings"].shape == (1, hidden)
    before = np.asarray(params["embeddings"]).copy()
    trainer.train()
    trainer.end()

    after = np.asarray(jax.device_get(trainer.setup.state.params["embeddings"]))
    assert not np.allclose(before, after)
    sd = load_safetensors(config.output_model_destination)
    assert sd["gemma"].shape == (2, hidden)
    assert sd["gemma_out"].shape == (1, hidden)
