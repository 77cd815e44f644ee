import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.math.losses import LossConfig
from onetrainer_tpu.math.timesteps import TimestepConfig
from onetrainer_tpu.models.clip import CLIPTextConfig
from onetrainer_tpu.models.flux import (
    FluxConfig, FluxTransformer2D, pack_latents, prepare_latent_image_ids,
    unpack_latents,
)
from onetrainer_tpu.models.flux_model import FluxModel
from onetrainer_tpu.models.t5 import T5Config
from onetrainer_tpu.models.vae import VAEConfig
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.flux_train_step import make_flux_train_step
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import ModelType, TrainingMethod


def tiny_flux_config(**kw):
    base = dict(
        in_channels=16, out_channels=16, num_layers=2, num_single_layers=2,
        hidden_size=32, num_heads=2, head_dim=16, joint_attention_dim=24,
        pooled_projection_dim=20, axes_dims_rope=(4, 6, 6), dtype=jnp.float32)
    base.update(kw)
    return FluxConfig(**base)


def tiny_flux_model():
    return FluxModel(
        model_type=ModelType.FLUX_DEV_1,
        transformer_config=tiny_flux_config(),
        vae_config=VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                             latent_channels=4, scaling_factor=0.3611,
                             shift_factor=0.1159, dtype=jnp.float32),
        te_config=CLIPTextConfig(vocab_size=100, hidden_size=20,
                                 intermediate_size=40, num_layers=2, num_heads=4,
                                 max_position_embeddings=16, eos_token_id=99,
                                 dtype=jnp.float32),
        te2_config=T5Config(vocab_size=110, d_model=24, d_kv=6, d_ff=48,
                            num_layers=2, num_heads=4, dtype=jnp.float32),
    )


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6, 16))
    packed = pack_latents(x)
    assert packed.shape == (2, 4 * 3, 64)
    back = unpack_latents(packed, 8, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_latent_image_ids():
    ids = prepare_latent_image_ids(8, 6)
    assert ids.shape == (12, 3)
    np.testing.assert_array_equal(np.asarray(ids[:, 0]), 0)
    assert float(ids[:, 1].max()) == 3  # h/2 - 1
    assert float(ids[:, 2].max()) == 2  # w/2 - 1


def test_flux_transformer_forward():
    cfg = tiny_flux_config()
    model = FluxTransformer2D(cfg)
    b, h, w = 2, 8, 8
    packed = jnp.zeros((b, (h // 2) * (w // 2), 16))
    t = jnp.asarray([0.5, 0.9])
    pooled = jnp.zeros((b, 20))
    t5 = jnp.zeros((b, 6, 24))
    img_ids = prepare_latent_image_ids(h, w)
    params = model.init(jax.random.PRNGKey(0), packed, t, pooled, t5, img_ids)
    out = model.apply(params, packed, t, pooled, t5, img_ids,
                      None, jnp.asarray([1.0, 1.0]))
    assert out.shape == (b, 16, 16)

    p = params["params"]
    assert "x_embedder" in p and "context_embedder" in p
    assert "transformer_blocks_0" in p and "single_transformer_blocks_1" in p
    assert "attn" in p["transformer_blocks_0"]
    assert "to_q" in p["transformer_blocks_0"]["attn"]
    assert "add_q_proj" in p["transformer_blocks_0"]["attn"]
    assert "scale" in p["transformer_blocks_0"]["attn"]["norm_q"]
    assert "net_0" in p["transformer_blocks_0"]["ff"]
    assert "timestep_embedder" in p["time_text_embed"]
    assert "guidance_embedder" in p["time_text_embed"]
    assert "linear" in p["norm_out"]


def test_flux_key_roundtrip():
    from onetrainer_tpu.io.torch_flax import (
        unet_flax_to_state_dict, unet_state_dict_to_flax,
    )
    cfg = tiny_flux_config()
    model = FluxTransformer2D(cfg)
    packed = jnp.zeros((1, 16, 16))
    params = model.init(jax.random.PRNGKey(0), packed, jnp.asarray([0.5]),
                        jnp.zeros((1, 20)), jnp.zeros((1, 6, 24)),
                        prepare_latent_image_ids(8, 8))["params"]
    sd = unet_flax_to_state_dict(jax.device_get(params))
    assert "transformer_blocks.0.attn.to_q.weight" in sd
    assert "transformer_blocks.0.attn.norm_q.weight" in sd
    assert "single_transformer_blocks.0.norm.linear.weight" in sd
    assert "time_text_embed.timestep_embedder.linear_1.weight" in sd
    assert "transformer_blocks.0.ff.net.0.proj.weight" in sd
    back = unet_state_dict_to_flax(sd)
    flat_a = sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda x: str(x[0]))
    flat_b = sorted(jax.tree_util.tree_leaves_with_path(back), key=lambda x: str(x[0]))
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_flux_lora_train_step():
    model = tiny_flux_model()
    rng = jax.random.PRNGKey(0)
    b, h, w = 2, 8, 8
    packed_shape = (1, (h // 2) * (w // 2), 16)
    transformer_params = model.transformer.init(
        rng, jnp.zeros(packed_shape), jnp.asarray([0.5]), jnp.zeros((1, 20)),
        jnp.zeros((1, 6, 24)), prepare_latent_image_ids(h, w))["params"]

    peft_cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(1), transformer_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA,
        timestep=TimestepConfig(dynamic_timestep_shifting=True),
        loss=LossConfig(vb_loss_strength=0.0),
        vae_scaling_factor=0.3611, vae_shift_factor=0.1159,
        stochastic_rounding=False)
    tx = optax.adamw(1e-3)
    state = create_train_state({"transformer_lora": adapters}, tx)
    step = make_flux_train_step(model, cfg, tx, peft_cfg)

    batch = {
        "latent_image": jax.random.normal(rng, (b, h, w, 4)),
        "loss_weight": jnp.ones((b,)),
        "t5_hidden_state": jax.random.normal(jax.random.PRNGKey(2), (b, 6, 24)),
        "clip_pooled_state": jax.random.normal(jax.random.PRNGKey(3), (b, 20)),
    }
    frozen = {"transformer": transformer_params}
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 1


def test_flux_live_text_encoders():
    model = tiny_flux_model()
    rng = jax.random.PRNGKey(0)
    te_params = model.text_encoder.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    te2_params = model.text_encoder_2.init(rng, jnp.zeros((1, 6), jnp.int32))["params"]
    transformer_params = model.transformer.init(
        rng, jnp.zeros((1, 16, 16)), jnp.asarray([0.5]), jnp.zeros((1, 20)),
        jnp.zeros((1, 6, 24)), prepare_latent_image_ids(8, 8))["params"]
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0),
        vae_scaling_factor=0.3611, vae_shift_factor=0.1159,
        train_text_encoder=True, stochastic_rounding=False)
    tx = optax.adamw(1e-4)
    state = create_train_state({"transformer": transformer_params}, tx)
    step = make_flux_train_step(model, cfg, tx)
    batch = {
        "latent_image": jax.random.normal(rng, (2, 8, 8, 4)),
        "loss_weight": jnp.ones((2,)),
        "tokens": jnp.tile(jnp.asarray([[1, 5, 99, 0, 0, 0, 0, 0]], jnp.int32), (2, 1)),
        "tokens_2": jnp.tile(jnp.asarray([[3, 7, 1, 0, 0, 0]], jnp.int32), (2, 1)),
    }
    frozen = {"text_encoder": te_params, "text_encoder_2": te2_params}
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
