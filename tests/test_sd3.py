import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.math.losses import LossConfig
from onetrainer_tpu.math.timesteps import TimestepConfig
from onetrainer_tpu.models.clip import CLIPTextConfig
from onetrainer_tpu.models.sd3 import SD3Config, SD3Transformer2D, sd3_text_context
from onetrainer_tpu.models.sd3_model import StableDiffusion3Model
from onetrainer_tpu.models.t5 import T5Config
from onetrainer_tpu.models.vae import VAEConfig
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.sd3_train_step import make_sd3_train_step
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import ModelType, TrainingMethod


def tiny_sd3_config(**kw):
    base = dict(sample_size=8, patch_size=2, in_channels=4, out_channels=4,
                num_layers=2, num_heads=2, head_dim=16,
                joint_attention_dim=24, caption_projection_dim=32,
                pooled_projection_dim=36, pos_embed_max_size=16,
                dtype=jnp.float32)
    base.update(kw)
    return SD3Config(**base)


def test_sd3_transformer_forward_and_keys():
    cfg = tiny_sd3_config()
    model = SD3Transformer2D(cfg)
    latents = jnp.zeros((2, 8, 8, 4))
    t = jnp.asarray([100.0, 500.0])
    pooled = jnp.zeros((2, 36))
    context = jnp.zeros((2, 10, 24))
    params = model.init(jax.random.PRNGKey(0), latents, t, pooled, context)
    out = model.apply(params, latents, t, pooled, context)
    assert out.shape == (2, 8, 8, 4)

    p = params["params"]
    assert "pos_embed" in p and "proj" in p["pos_embed"]
    assert "transformer_blocks_0" in p
    assert "add_q_proj" in p["transformer_blocks_0"]["attn"]
    # last block is context_pre_only: no to_add_out, continuous context norm
    last = p["transformer_blocks_1"]
    assert "to_add_out" not in last["attn"]
    assert "linear" in last["norm1_context"]

    from onetrainer_tpu.io.torch_flax import unet_flax_to_state_dict
    sd = unet_flax_to_state_dict(jax.device_get(p))
    assert "transformer_blocks.0.attn.add_q_proj.weight" in sd
    assert "pos_embed.proj.weight" in sd
    assert "time_text_embed.timestep_embedder.linear_1.weight" in sd


def test_sd3_qk_norm_variant():
    cfg = tiny_sd3_config(qk_norm=True)
    model = SD3Transformer2D(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.asarray([1.0]), jnp.zeros((1, 36)),
                        jnp.zeros((1, 10, 24)))["params"]
    assert "norm_q" in params["transformer_blocks_0"]["attn"]


def test_sd3_text_context_assembly():
    clip_l = jnp.ones((1, 8, 6))
    clip_g = jnp.ones((1, 8, 10))
    t5 = jnp.ones((1, 12, 24))
    context, pooled = sd3_text_context(
        clip_l, clip_g, t5, jnp.ones((1, 6)), jnp.ones((1, 10)))
    assert context.shape == (1, 20, 24)
    assert pooled.shape == (1, 16)
    # clip part zero-padded on channels
    np.testing.assert_array_equal(np.asarray(context[0, 0, 16:]), 0)
    np.testing.assert_array_equal(np.asarray(context[0, 10]), 1)


def tiny_sd3_model():
    return StableDiffusion3Model(
        model_type=ModelType.STABLE_DIFFUSION_3,
        # pooled dim = clip_l(6) + clip_g(10)
        transformer_config=tiny_sd3_config(pooled_projection_dim=16),
        vae_config=VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                             latent_channels=4, scaling_factor=1.5305,
                             shift_factor=0.0609, dtype=jnp.float32),
        te_config=CLIPTextConfig(vocab_size=100, hidden_size=6,
                                 intermediate_size=12, num_layers=2, num_heads=2,
                                 max_position_embeddings=16, eos_token_id=99,
                                 projection_dim=6, dtype=jnp.float32),
        te2_config=CLIPTextConfig(vocab_size=100, hidden_size=10,
                                  intermediate_size=20, num_layers=2, num_heads=2,
                                  max_position_embeddings=16, eos_token_id=99,
                                  projection_dim=10, dtype=jnp.float32),
        te3_config=T5Config(vocab_size=110, d_model=24, d_kv=6, d_ff=48,
                            num_layers=2, num_heads=4, dtype=jnp.float32),
    )


def test_sd3_lora_train_step_live_text():
    model = tiny_sd3_model()
    rng = jax.random.PRNGKey(0)
    transformer_params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([1.0]), jnp.zeros((1, 16)),
        jnp.zeros((1, 10, 24)))["params"]
    te = model.text_encoder.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    te2 = model.text_encoder_2.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    te3 = model.text_encoder_3.init(rng, jnp.zeros((1, 6), jnp.int32))["params"]

    peft_cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(1), transformer_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0),
        vae_scaling_factor=1.5305, vae_shift_factor=0.0609,
        train_text_encoder=True, stochastic_rounding=False)
    tx = optax.adamw(1e-3)
    state = create_train_state({"transformer_lora": adapters}, tx)
    step = make_sd3_train_step(model, cfg, tx, peft_cfg)

    tokens = jnp.tile(jnp.asarray([[1, 5, 99, 0, 0, 0, 0, 0]], jnp.int32), (2, 1))
    batch = {
        "latent_image": jax.random.normal(rng, (2, 8, 8, 4)),
        "loss_weight": jnp.ones((2,)),
        "tokens": tokens, "tokens_2": tokens,
        "tokens_3": jnp.tile(jnp.asarray([[3, 7, 1, 0, 0, 0]], jnp.int32), (2, 1)),
    }
    frozen = {"transformer": transformer_params, "text_encoder": te,
              "text_encoder_2": te2, "text_encoder_3": te3}
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
