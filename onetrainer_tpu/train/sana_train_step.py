"""The jitted Sana training step: discrete-timestep flow matching with
Gemma2 conditioning and the encoder attention mask threaded into the
DiT's cross attention (reference: modules/modelSetup/BaseSanaSetup.py:
159-233 — flow = noise − x0, σ = (t+1)/T)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import flow_matching_losses
from onetrainer_tpu.math.noise import create_noise
from onetrainer_tpu.math.timesteps import sample_timesteps_discrete
from onetrainer_tpu.models.gemma import apply_gemma_final_norm, encode_gemma_text
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


def sana_text_conditioning(model, te_params, batch, layer_skip: int,
                           extra_embeddings=None,
                           output_embedding_base_id: int = 0):
    if "text_encoder_hidden_state" in batch:
        return batch["text_encoder_hidden_state"], batch.get("tokens_mask")
    mask = batch.get("tokens_mask")
    out = model.text_encoder.apply(
        as_variables(te_params), batch["tokens"], mask, extra_embeddings)
    hidden = encode_gemma_text(out, layer_skip)
    if layer_skip > 0:
        hidden = apply_gemma_final_norm(te_params, hidden)
    if batch.get("output_embeddings") is not None:
        # output embeddings patch the gemma OUTPUT at placeholder positions
        # (reference: SanaModel._apply_output_embeddings via encode_text:195,
        # SanaEmbeddingSaver.py gemma_out key)
        from onetrainer_tpu.train.sd_train_step import (
            scatter_output_embeddings,
        )
        hidden = scatter_output_embeddings(
            hidden, batch["tokens"], batch["output_embeddings"],
            output_embedding_base_id)
    return hidden, mask


def sana_predict(model, transformer_params, te_params, batch, rng,
                 cfg: SDStepConfig, extra_embeddings=None,
                 deterministic: bool = False):
    rng_t, rng_noise = jax.random.split(rng)

    latent = batch["latent_image"]           # DC-AE latents (deterministic)
    scaled = latent * cfg.vae_scaling_factor

    b = scaled.shape[0]
    timestep = sample_timesteps_discrete(
        rng_t, b, cfg.timestep, num_train_timesteps=cfg.num_train_timesteps,
        deterministic=deterministic)
    sigma = (timestep.astype(jnp.float32) + 1.0) / cfg.num_train_timesteps
    noise = create_noise(rng_noise, scaled.shape, scaled.dtype,
                         cfg.offset_noise_weight, cfg.perturbation_noise_weight)
    s = sigma.reshape(-1, 1, 1, 1)
    noisy = (noise.astype(jnp.float32) * s
             + scaled.astype(jnp.float32) * (1.0 - s)).astype(scaled.dtype)

    context, mask = sana_text_conditioning(
        model, te_params, batch, cfg.text_encoder_layer_skip, extra_embeddings,
        cfg.output_embedding_base_id)

    if cfg.te_dropout > 0:
        # conditioning dropout on the Gemma2 sequence AND its attention
        # mask (reference: SanaModel.py:203-208)
        from onetrainer_tpu.train.sd_train_step import (
            conditioning_dropout_mask,
        )
        keep = conditioning_dropout_mask(
            jax.random.fold_in(rng, 0xd0), context.shape[0], cfg.te_dropout)
        context = context * keep[:, None, None].astype(context.dtype)
        if mask is not None:
            mask = mask * keep[:, None].astype(mask.dtype)

    dit_in = noisy
    if "latent_conditioning_image" in batch:
        dit_in = jnp.concatenate([
            noisy, batch["latent_mask"].astype(noisy.dtype),
            batch["latent_conditioning_image"] * cfg.vae_scaling_factor,
        ], axis=-1)

    predicted = model.transformer.apply(
        as_variables(transformer_params), dit_in, timestep, context, mask)

    target = noise.astype(jnp.float32) - scaled.astype(jnp.float32)
    return {
        "loss_type": "target",
        "predicted": predicted,
        "target": target,
        "timestep": timestep,
        "scaled_latent_image": scaled,
        "noisy_latent_image": noisy,
    }


def make_sana_train_step(model, cfg: SDStepConfig, tx,
                         peft_cfg: PeftConfig | None = None):
    def resolve_params(trainable, frozen, rng):
        method = cfg.training_method
        if method == TrainingMethod.LORA:
            transformer = lora_variables(
                frozen["transformer"], trainable.get("transformer_lora"),
                peft_cfg, rng)
            te = frozen.get("text_encoder")
            if "te_lora" in trainable and te is not None:
                te = lora_variables(te, trainable["te_lora"], peft_cfg, rng)
            return transformer, te, trainable.get("embeddings")
        if method == TrainingMethod.EMBEDDING:
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
        transformer, te, extra = resolve_params(trainable, frozen, rng_peft)
        if "output_embeddings" in trainable:
            batch = dict(batch, output_embeddings=trainable["output_embeddings"])
        data = sana_predict(model, transformer, te, batch, rng_predict, cfg,
                            extra_embeddings=extra)
        losses = flow_matching_losses(batch, data, cfg.loss,
                                      cfg.num_train_timesteps)
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
                                   cfg.ema_update_interval, cfg.accum)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_to_storage(opt_state),
                               ema=ema_to_storage(ema))
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))
