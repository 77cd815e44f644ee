"""SD-VAE fine-tune training step: decode(latent) → pixel reconstruction
loss against the original image
(reference: modules/modelSetup/StableDiffusionFineTuneVaeSetup.py:68-101)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import diffusion_losses
from onetrainer_tpu.ops.stochastic import apply_updates_stochastic
from onetrainer_tpu.train.ema import maybe_update_ema
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import (
    TrainState, ema_to_compute, ema_to_storage, opt_to_compute, opt_to_storage,
)


def vae_predict(model, vae_params, batch, rng, cfg: SDStepConfig,
                deterministic: bool = False):
    latent = batch["latent_image"]
    if "latent_logvar" in batch and not deterministic:
        std = jnp.exp(0.5 * jnp.clip(batch["latent_logvar"], -30.0, 20.0))
        latent = latent + std * jax.random.normal(rng, latent.shape, latent.dtype)
    predicted = model.vae.apply({"params": vae_params}, latent,
                                method=model.vae.decode)
    return {
        "loss_type": "target",
        "predicted": predicted,
        "target": batch["image"],
        "prediction_type": "epsilon",
    }


def make_vae_train_step(model, cfg: SDStepConfig, tx):
    def loss_fn(trainable, frozen, batch, rng):
        data = vae_predict(model, trainable["vae"], batch, rng, cfg)
        losses = diffusion_losses(batch, data, cfg.loss, None)
        return losses.mean(), {}

    def train_step(state: TrainState, frozen: dict, batch: dict, rng):
        rng_loss, rng_round = jax.random.split(jax.random.fold_in(rng, state.step))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng_loss)
        updates, opt_state = tx.update(
            grads, opt_to_compute(state.opt_state), state.params)
        if cfg.stochastic_rounding:
            params = apply_updates_stochastic(state.params, updates, rng_round)
        else:
            params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None and cfg.ema_decay > 0:
            ema = maybe_update_ema(ema_to_compute(ema), params, cfg.ema_decay, state.step,
                                   cfg.ema_update_interval, cfg.accum)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_to_storage(opt_state),
                               ema=ema_to_storage(ema))
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))
