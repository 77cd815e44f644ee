import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.math.losses import LossConfig
from onetrainer_tpu.math.timesteps import TimestepConfig
from onetrainer_tpu.models.clip import CLIPTextConfig
from onetrainer_tpu.models.sdxl import StableDiffusionXLModel
from onetrainer_tpu.models.unet import UNetConfig
from onetrainer_tpu.models.vae import VAEConfig
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.sdxl_train_step import make_sdxl_train_step
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import ModelType, TrainingMethod


def tiny_sdxl_model():
    te1 = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                         num_layers=2, num_heads=4, max_position_embeddings=16,
                         eos_token_id=99, dtype=jnp.float32)
    te2 = CLIPTextConfig(vocab_size=100, hidden_size=48, intermediate_size=96,
                         num_layers=2, num_heads=4, max_position_embeddings=16,
                         eos_token_id=99, projection_dim=48, dtype=jnp.float32)
    return StableDiffusionXLModel(
        model_type=ModelType.STABLE_DIFFUSION_XL_10_BASE,
        unet_config=UNetConfig(
            block_out_channels=(32, 64),
            cross_attn_blocks=(False, True),
            layers_per_block=1,
            transformer_layers_per_block=(1, 2),
            num_heads=(4, 4),
            cross_attention_dim=32 + 48,
            use_linear_projection=True,
            addition_embed_dim=8,
            addition_pooled_dim=48,
            dtype=jnp.float32),
        vae_config=VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                             scaling_factor=0.13025, dtype=jnp.float32),
        te_config=te1,
        te2_config=te2,
    )


def _init(model):
    rng = jax.random.PRNGKey(0)
    unet_params = model.unet.init(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray([1]),
        jnp.zeros((1, 8, 80)), jnp.zeros((1, 48)), jnp.zeros((1, 6)))["params"]
    te = model.text_encoder.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    te2 = model.text_encoder_2.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    return unet_params, te, te2


def _batch(bs=4):
    k = jax.random.PRNGKey(0)
    tokens = jnp.tile(jnp.asarray([[1, 5, 7, 99, 0, 0, 0, 0]], jnp.int32), (bs, 1))
    return {
        "latent_image": jax.random.normal(k, (bs, 16, 16, 4)),
        "loss_weight": jnp.ones((bs,)),
        "tokens": tokens,
        "tokens_2": tokens,
        "original_resolution": jnp.tile(jnp.asarray([[512, 384]], jnp.int32), (bs, 1)),
        "crop_offset": jnp.zeros((bs, 2), jnp.int32),
        "crop_resolution": jnp.tile(jnp.asarray([[128, 128]], jnp.int32), (bs, 1)),
    }


def test_sdxl_lora_step():
    model = tiny_sdxl_model()
    unet_params, te, te2 = _init(model)
    peft_cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0),
        vae_scaling_factor=0.13025,
        text_encoder_layer_skip=1,
        train_text_encoder=True,
        stochastic_rounding=False,
    )
    tx = optax.adamw(1e-3)
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sdxl_train_step(model, cfg, tx, peft_cfg)
    frozen = {"unet": unet_params, "text_encoder": te, "text_encoder_2": te2}
    state, metrics = step(state, frozen, _batch(), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_sdxl_finetune_with_cached_text():
    model = tiny_sdxl_model()
    unet_params, te, te2 = _init(model)
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0),
        vae_scaling_factor=0.13025,
        stochastic_rounding=False,
    )
    tx = optax.adamw(1e-4)
    state = create_train_state({"unet": unet_params}, tx)
    step = make_sdxl_train_step(model, cfg, tx)
    batch = _batch()
    del batch["tokens"], batch["tokens_2"]
    batch["text_encoder_hidden_state"] = jax.random.normal(
        jax.random.PRNGKey(5), (4, 8, 32))
    batch["text_encoder_2_hidden_state"] = jax.random.normal(
        jax.random.PRNGKey(6), (4, 8, 48))
    batch["text_encoder_2_pooled_state"] = jax.random.normal(
        jax.random.PRNGKey(7), (4, 48))
    state, metrics = step(state, {}, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
