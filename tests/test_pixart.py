import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.math.losses import LossConfig
from onetrainer_tpu.math.timesteps import TimestepConfig
from onetrainer_tpu.models.pixart import PixArtConfig, PixArtTransformer2D
from onetrainer_tpu.models.pixart_model import PixArtAlphaModel
from onetrainer_tpu.models.t5 import T5Config
from onetrainer_tpu.models.vae import VAEConfig
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.pixart_train_step import make_pixart_train_step
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import ModelType, TrainingMethod


def tiny_pixart_config(**kw):
    base = dict(sample_size=8, patch_size=2, in_channels=4, out_channels=8,
                num_layers=2, num_heads=2, head_dim=16,
                cross_attention_dim=24, caption_channels=24, dtype=jnp.float32)
    base.update(kw)
    return PixArtConfig(**base)


def test_pixart_forward_and_keys():
    cfg = tiny_pixart_config()
    model = PixArtTransformer2D(cfg)
    latents = jnp.zeros((2, 8, 8, 4))
    t = jnp.asarray([100, 500])
    ctx = jnp.zeros((2, 6, 24))
    params = model.init(jax.random.PRNGKey(0), latents, t, ctx)
    out = model.apply(params, latents, t, ctx)
    assert out.shape == (2, 8, 8, 8)  # eps + learned variance

    p = params["params"]
    assert "proj" in p["pos_embed"]
    assert "scale_shift_table" in p["transformer_blocks_0"]
    assert "attn1" in p["transformer_blocks_0"]
    assert "attn2" in p["transformer_blocks_0"]
    assert "caption_projection" in p and "adaln_single" in p

    from onetrainer_tpu.io.torch_flax import unet_flax_to_state_dict
    sd = unet_flax_to_state_dict(jax.device_get(p))
    assert "pos_embed.proj.weight" in sd
    assert "transformer_blocks.0.attn2.to_k.weight" in sd
    assert "adaln_single.emb.timestep_embedder.linear_1.weight" in sd
    assert "caption_projection.linear_1.weight" in sd


def tiny_pixart_model():
    return PixArtAlphaModel(
        model_type=ModelType.PIXART_ALPHA,
        transformer_config=tiny_pixart_config(),
        vae_config=VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                             latent_channels=4, dtype=jnp.float32),
        te_config=T5Config(vocab_size=110, d_model=24, d_kv=6, d_ff=48,
                           num_layers=2, num_heads=4, dtype=jnp.float32),
    )


def test_pixart_lora_step_with_vb_loss():
    model = tiny_pixart_model()
    rng = jax.random.PRNGKey(0)
    transformer_params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([1]),
        jnp.zeros((1, 6, 24)))["params"]
    te_params = model.text_encoder.init(rng, jnp.zeros((1, 6), jnp.int32))["params"]

    peft_cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(1), transformer_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=1.0),  # exercises the IDDPM VB path
        stochastic_rounding=False)
    tx = optax.adamw(1e-3)
    state = create_train_state({"transformer_lora": adapters}, tx)
    step = make_pixart_train_step(model, cfg, tx, peft_cfg)

    batch = {
        "latent_image": jax.random.normal(rng, (2, 8, 8, 4)),
        "loss_weight": jnp.ones((2,)),
        "t5_hidden_state": jax.random.normal(jax.random.PRNGKey(2), (2, 6, 24)),
    }
    frozen = {"transformer": transformer_params, "text_encoder": te_params}
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_pixart_alpha_1024_micro_conditions():
    """alpha-1024 (use_additional_conditions): resolution/aspect-ratio
    embedders exist, feed the conditioning, and change the output
    (reference: BasePixArtAlphaSetup.py:209-225 feeds them from the
    latent shape; diffusers PixArtAlphaCombinedTimestepSizeEmbeddings)."""
    cfg = tiny_pixart_config(num_heads=3, head_dim=8,
                             use_additional_conditions=True)
    model = PixArtTransformer2D(cfg)
    latents = jnp.ones((2, 8, 8, 4)) * 0.1
    t = jnp.asarray([100, 500])
    ctx = jnp.zeros((2, 6, 24))
    res = jnp.tile(jnp.asarray([[64.0, 64.0]]), (2, 1))
    ar = jnp.ones((2, 1))
    params = model.init(jax.random.PRNGKey(0), latents, t, ctx, res, ar)

    p = params["params"]["adaln_single"]["emb"]
    assert "resolution_embedder" in p and "aspect_ratio_embedder" in p

    out_a = model.apply(params, latents, t, ctx, res, ar)
    out_b = model.apply(params, latents, t, ctx, res * 4.0, ar * 2.0)
    assert float(jnp.abs(out_a - out_b).max()) > 0


def test_pixart_final_modulation_uses_embedded_timestep():
    """The final norm's scale/shift is scale_shift_table + embedded
    timestep (diffusers PixArtTransformer2DModel forward), so two
    different timesteps must modulate the output differently even with
    identical blocks (regression: the table alone was used before)."""
    cfg = tiny_pixart_config(num_layers=0)
    model = PixArtTransformer2D(cfg)
    latents = jnp.ones((2, 8, 8, 4)) * 0.1
    ctx = jnp.zeros((2, 6, 24))
    params = model.init(jax.random.PRNGKey(0), latents,
                        jnp.asarray([100, 100]), ctx)
    out = model.apply(params, latents, jnp.asarray([100, 900]), ctx)
    # with zero blocks the only timestep dependence is the final AdaLN
    assert float(jnp.abs(out[0] - out[1]).max()) > 0
