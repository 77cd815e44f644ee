"""PixArt training step: epsilon prediction with learned variance — the
DiT output chunks into (eps, var) on channels; VB loss trains the
variance head (reference: modules/modelSetup/BasePixArtAlphaSetup.py:226-233)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import diffusion_losses
from onetrainer_tpu.math.noise import add_noise_discrete, create_noise
from onetrainer_tpu.math.timesteps import sample_timesteps_discrete
from onetrainer_tpu.ops.stochastic import apply_updates_stochastic
from onetrainer_tpu.peft.lora import PeftConfig, as_variables, lora_variables
from onetrainer_tpu.train.ema import maybe_update_ema
from onetrainer_tpu.train.sd_train_step import (
    SDStepConfig,
    preserve_input_embedding_norms,
)
from onetrainer_tpu.train.train_state import (
    TrainState, ema_to_compute, ema_to_storage, opt_to_compute, opt_to_storage,
)
from onetrainer_tpu.util.enums import TrainingMethod


def pixart_predict(model, transformer_params, te_params, batch, rng,
                   cfg: SDStepConfig, coefficients, extra_embeddings=None,
                   deterministic: bool = False):
    rng_t, rng_noise, rng_sample = jax.random.split(rng, 3)

    latent = batch["latent_image"]
    if "latent_logvar" in batch:
        std = jnp.exp(0.5 * jnp.clip(batch["latent_logvar"], -30.0, 20.0))
        latent = latent + std * jax.random.normal(rng_sample, latent.shape, latent.dtype)
    scaled = latent * cfg.vae_scaling_factor

    b = scaled.shape[0]
    timestep = sample_timesteps_discrete(
        rng_t, b, cfg.timestep, num_train_timesteps=cfg.num_train_timesteps,
        deterministic=deterministic)
    noise = create_noise(rng_noise, scaled.shape, scaled.dtype,
                         cfg.offset_noise_weight, cfg.perturbation_noise_weight)
    noisy = add_noise_discrete(
        scaled, noise, timestep,
        coefficients.sqrt_alphas_cumprod, coefficients.sqrt_one_minus_alphas_cumprod)

    if "t5_hidden_state" in batch and not cfg.train_text_encoder:
        context = batch["t5_hidden_state"]
    else:
        # T5 layer skip (reference: PixArtAlphaModel.py:173,201)
        context = model.text_encoder.apply(
            as_variables(te_params), batch["tokens_2"], extra_embeddings,
            layer_skip=cfg.text_encoder_layer_skip)
        if batch.get("output_embeddings") is not None:
            # output embeddings scatter into the T5 output
            # (reference: PixArtAlphaModel.encode_text:206)
            from onetrainer_tpu.train.sd_train_step import (
                scatter_output_embeddings,
            )
            context = scatter_output_embeddings(
                context, batch["tokens_2"], batch["output_embeddings"],
                cfg.output_embedding_base_id)

    if cfg.te_dropout > 0:
        # conditioning dropout on the T5 sequence (reference:
        # PixArtAlphaModel.py:214-219; the reference also zeroes the
        # attention mask — our transformer takes no text mask, so zeroed
        # states are the whole effect)
        from onetrainer_tpu.train.sd_train_step import (
            conditioning_dropout_mask,
        )
        keep = conditioning_dropout_mask(
            jax.random.fold_in(rng, 0xd0), context.shape[0], cfg.te_dropout)
        context = context * keep[:, None, None].astype(context.dtype)

    # micro-conditions from the latent shape, like the reference
    # (BasePixArtAlphaSetup.py:209-216); consumed only by alpha-1024
    # models (use_additional_conditions)
    b, lh, lw = noisy.shape[0], noisy.shape[1], noisy.shape[2]
    resolution = jnp.tile(
        jnp.asarray([[lh * 8, lw * 8]], jnp.float32), (b, 1))
    aspect_ratio = jnp.full((b, 1), float(lh) / float(lw), jnp.float32)
    out = model.transformer.apply(
        as_variables(transformer_params), noisy, timestep, context,
        resolution, aspect_ratio)
    latent_ch = scaled.shape[-1]
    predicted = out[..., :latent_ch]
    predicted_var = out[..., latent_ch:]

    return {
        "loss_type": "target",
        "predicted": predicted,
        "predicted_var_values": predicted_var,
        "target": noise.astype(jnp.float32),
        "timestep": timestep,
        "scaled_latent_image": scaled,
        "noisy_latent_image": noisy,
        "prediction_type": "epsilon",
    }


def make_pixart_train_step(model, cfg: SDStepConfig, tx,
                           peft_cfg: PeftConfig | None = None):
    coefficients = model.coefficients()

    def resolve(trainable, frozen, rng):
        if cfg.training_method == TrainingMethod.LORA:
            transformer = lora_variables(frozen["transformer"], trainable["transformer_lora"], peft_cfg, rng) \
                if "transformer_lora" in trainable else frozen["transformer"]
            return transformer, frozen.get("text_encoder"), \
                trainable.get("embeddings")
        if cfg.training_method == TrainingMethod.EMBEDDING:
            extra = trainable.get("embeddings")
            inputs = frozen.get("embedding_inputs")
            if inputs is not None:
                rows = ([extra] if extra is not None else []) + [inputs]
                extra = jnp.concatenate(rows, axis=0)
            return frozen["transformer"], frozen["text_encoder"], extra
        return (trainable.get("transformer", frozen.get("transformer")),
                trainable.get("text_encoder", frozen.get("text_encoder")),
                trainable.get("embeddings"))

    def loss_fn(trainable, frozen, batch, rng):
        rng_peft, rng_predict = jax.random.split(rng)
        transformer, te, extra = resolve(trainable, frozen, rng_peft)
        if "output_embeddings" in trainable:
            batch = dict(batch, output_embeddings=trainable["output_embeddings"])
        data = pixart_predict(model, transformer, te, batch, rng_predict,
                              cfg, coefficients, extra)
        losses = diffusion_losses(batch, data, cfg.loss, coefficients)
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
        if "output_embeddings" in params and cfg.output_embedding_spans \
                and cfg.preserve_embedding_norm:
            from onetrainer_tpu.train.sd_train_step import (
                normalize_output_embeddings,
            )
            params = {**params, "output_embeddings":
                      normalize_output_embeddings(
                          params["output_embeddings"],
                          cfg.output_embedding_spans,
                          cfg.output_embedding_stds)}
        params = preserve_input_embedding_norms(params, frozen, cfg)
        ema = state.ema
        if ema is not None and cfg.ema_decay > 0:
            ema = maybe_update_ema(ema_to_compute(ema), params, cfg.ema_decay, state.step,
                                   cfg.ema_update_interval,
                                   cfg.accum)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_to_storage(opt_state),
                               ema=ema_to_storage(ema))
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))
