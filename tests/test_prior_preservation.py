import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.math.losses import LossConfig
from onetrainer_tpu.math.timesteps import TimestepConfig
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.sd_train_step import SDStepConfig, make_sd_train_step
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import TrainingMethod
from tests.test_train_step import init_model_params, make_batch, tiny_sd_model


def test_prior_preservation_zero_adapter_zero_loss():
    """With zero-init adapters the merged model == base model, so a pure
    PRIOR_PREDICTION batch must give (near) zero loss: the target IS the
    frozen-base prediction."""
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft_cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)

    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0),
        stochastic_rounding=False,
        prior_preservation=True,
    )
    tx = optax.adamw(1e-3)
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)

    batch = make_batch(0)
    batch["prior_flag"] = jnp.ones((8,))
    frozen = {"unet": unet_params, "text_encoder": te_params}
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
    assert float(metrics["loss"]) < 1e-8


def test_prior_preservation_masked_prior_loss():
    """masked prior preservation: unmasked area pulls toward the frozen-base
    prediction (loss stays finite, gradients flow)."""
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft_cfg = PeftConfig(rank=4, alpha=8.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    # non-zero up so merged != base
    adapters = jax.tree.map(
        lambda x: x if x.ndim != 2 else x + 0.01, adapters)

    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, masked_training=True,
                        unmasked_weight=0.1,
                        masked_prior_preservation_weight=1.0),
        stochastic_rounding=False,
        prior_preservation=True,
    )
    tx = optax.adamw(1e-3)
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)

    batch = make_batch(0)
    mask = np.zeros((8, 16, 16, 1), np.float32)
    mask[:, :8] = 1.0
    batch["latent_mask"] = jnp.asarray(mask)
    batch["prior_flag"] = jnp.zeros((8,))
    frozen = {"unet": unet_params, "text_encoder": te_params}
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
