"""The jitted SDXL training step.

Like sd_train_step but with SDXL conditioning: concat(TE1 penultimate,
TE2 penultimate) [B,77,2048] context, TE2 pooled text embeds, and
add_time_ids built from the batch crop metadata
(reference: modules/modelSetup/BaseStableDiffusionXLSetup.py:241-330).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import diffusion_losses
from onetrainer_tpu.math.noise import add_noise_discrete, create_noise
from onetrainer_tpu.math.timesteps import sample_timesteps_discrete
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.ops.stochastic import apply_updates_stochastic
from onetrainer_tpu.peft.lora import PeftConfig, as_variables, lora_variables
from onetrainer_tpu.train.ema import maybe_update_ema
from onetrainer_tpu.train.sd_train_step import (
    preserve_input_embedding_norms,
    SDStepConfig,
    conditioning_dropout_mask,
)
from onetrainer_tpu.train.train_state import (
    TrainState, ema_to_compute, ema_to_storage, opt_to_compute, opt_to_storage,
)
from onetrainer_tpu.util.enums import TrainingMethod


def sdxl_text_conditioning(model, te_params, te2_params, batch, layer_skip: int,
                           extra_embeddings=None, cfg=None, dropout_rng=None):
    """-> (context [B,S,2048], pooled [B,1280]). extra_embeddings is a
    per-TE tuple (hidden sizes differ: 768 vs 1280 — reference:
    StableDiffusionXLModelEmbedding keeps a vector per text encoder)."""
    def _te_dropout(h1, h2, pooled):
        # per-TE conditioning dropout: TE1 sequence, TE2 sequence+pooled
        # share one mask (reference: StableDiffusionXLModel.py:273-284)
        if cfg is None or dropout_rng is None:
            return h1, h2, pooled
        b = h1.shape[0]
        if cfg.te_dropout > 0:
            m1 = conditioning_dropout_mask(
                jax.random.fold_in(dropout_rng, 1), b, cfg.te_dropout)
            h1 = h1 * m1[:, None, None].astype(h1.dtype)
        if cfg.te2_dropout > 0:
            m2 = conditioning_dropout_mask(
                jax.random.fold_in(dropout_rng, 2), b, cfg.te2_dropout)
            h2 = h2 * m2[:, None, None].astype(h2.dtype)
            pooled = pooled * m2[:, None].astype(pooled.dtype)
        return h1, h2, pooled

    if "text_encoder_hidden_state" in batch and "text_encoder_2_hidden_state" in batch:
        h1, h2, pooled = _te_dropout(
            batch["text_encoder_hidden_state"],
            batch["text_encoder_2_hidden_state"],
            batch["text_encoder_2_pooled_state"])
        return jnp.concatenate([h1, h2], axis=-1), pooled
    extra_1, extra_2 = extra_embeddings if isinstance(extra_embeddings, tuple) \
        else (extra_embeddings, extra_embeddings)
    out1 = model.text_encoder.apply(
        as_variables(te_params), batch["tokens"], None, extra_1)
    out2 = model.text_encoder_2.apply(
        as_variables(te2_params), batch["tokens_2"], None, extra_2)
    h1 = encode_clip_text(out1, layer_skip)
    # TE2 has its own layer skip (reference: text_encoder_2_layer_skip,
    # BaseStableDiffusionXLSetup predict kwargs)
    h2 = encode_clip_text(
        out2, cfg.te2_layer_skip if cfg is not None else layer_skip)
    if cfg is not None and batch.get("output_embeddings") is not None:
        # per-TE output-embedding scatter
        # (reference: StableDiffusionXLModel.encode_text:258-270)
        from onetrainer_tpu.train.sd_train_step import scatter_output_embeddings
        h1 = scatter_output_embeddings(
            h1, batch["tokens"], batch["output_embeddings"],
            cfg.output_embedding_base_id)
        h2 = scatter_output_embeddings(
            h2, batch["tokens_2"], batch["output_embeddings_2"],
            cfg.output_embedding_base_id_2)
    h1, h2, pooled = _te_dropout(h1, h2, out2["pooled_output"])
    context = jnp.concatenate([h1, h2], axis=-1)
    return context, pooled


def sdxl_predict(model, unet_params, te_params, te2_params, batch, rng,
                 cfg: SDStepConfig, coefficients, extra_embeddings=None,
                 deterministic: bool = False):
    rng_t, rng_noise, rng_sample = jax.random.split(rng, 3)

    latent = batch["latent_image"]
    if "latent_logvar" in batch:
        std = jnp.exp(0.5 * jnp.clip(batch["latent_logvar"], -30.0, 20.0))
        latent = latent + std * jax.random.normal(rng_sample, latent.shape, latent.dtype)
    scaled_latent = latent * cfg.vae_scaling_factor

    batch_size = scaled_latent.shape[0]
    timestep = sample_timesteps_discrete(
        rng_t, batch_size, cfg.timestep,
        num_train_timesteps=cfg.num_train_timesteps, deterministic=deterministic)
    noise = create_noise(rng_noise, scaled_latent.shape, scaled_latent.dtype,
                         cfg.offset_noise_weight, cfg.perturbation_noise_weight)
    noisy = add_noise_discrete(
        scaled_latent, noise, timestep,
        coefficients.sqrt_alphas_cumprod, coefficients.sqrt_one_minus_alphas_cumprod)

    context, pooled = sdxl_text_conditioning(
        model, te_params, te2_params, batch, cfg.text_encoder_layer_skip,
        extra_embeddings, cfg, dropout_rng=jax.random.fold_in(rng, 0xd0))

    # add_time_ids: original size + crop offset + target size
    add_time_ids = jnp.concatenate([
        batch["original_resolution"].astype(jnp.float32),
        batch["crop_offset"].astype(jnp.float32),
        batch["crop_resolution"].astype(jnp.float32),
    ], axis=-1)

    unet_in = noisy
    if "latent_conditioning_image" in batch:
        unet_in = jnp.concatenate([
            noisy, batch["latent_mask"].astype(noisy.dtype),
            batch["latent_conditioning_image"] * cfg.vae_scaling_factor,
        ], axis=-1)

    predicted = model.unet.apply(
        as_variables(unet_params), unet_in, timestep, context,
        pooled, add_time_ids)

    if cfg.prediction_type == "v_prediction":
        sac = coefficients.sqrt_alphas_cumprod[timestep].reshape(-1, 1, 1, 1)
        somac = coefficients.sqrt_one_minus_alphas_cumprod[timestep].reshape(-1, 1, 1, 1)
        target = sac * noise.astype(jnp.float32) - somac * scaled_latent.astype(jnp.float32)
    else:
        target = noise.astype(jnp.float32)

    return {
        "loss_type": "target",
        "predicted": predicted,
        "target": target,
        "timestep": timestep,
        "scaled_latent_image": scaled_latent,
        "noisy_latent_image": noisy,
        "prediction_type": cfg.prediction_type,
    }


def make_sdxl_train_step(model, cfg: SDStepConfig, tx, peft_cfg: PeftConfig | None = None):
    coefficients = model.coefficients()

    def resolve_params(trainable, frozen, rng):
        method = cfg.training_method
        if method == TrainingMethod.LORA:
            unet = lora_variables(frozen["unet"], trainable["unet_lora"], peft_cfg, rng) \
                if "unet_lora" in trainable else frozen["unet"]
            te = frozen.get("text_encoder")
            te2 = frozen.get("text_encoder_2")
            if "te_lora" in trainable and te is not None:
                te = lora_variables(te, trainable["te_lora"], peft_cfg, rng)
            if "te2_lora" in trainable and te2 is not None:
                te2 = lora_variables(te2, trainable["te2_lora"], peft_cfg, rng)
            return unet, te, te2, (trainable.get("embeddings"),
                                   trainable.get("embeddings_2"))
        if method == TrainingMethod.EMBEDDING:
            extra_1 = trainable.get("embeddings")
            extra_2 = trainable.get("embeddings_2")
            if "embedding_inputs" in frozen:
                rows_1 = ([extra_1] if extra_1 is not None else []) + \
                    [frozen["embedding_inputs"]]
                rows_2 = ([extra_2] if extra_2 is not None else []) + \
                    [frozen["embedding_inputs_2"]]
                extra_1 = jnp.concatenate(rows_1, axis=0)
                extra_2 = jnp.concatenate(rows_2, axis=0)
            return (frozen["unet"], frozen["text_encoder"],
                    frozen["text_encoder_2"], (extra_1, extra_2))
        return (trainable.get("unet", frozen.get("unet")),
                trainable.get("text_encoder", frozen.get("text_encoder")),
                trainable.get("text_encoder_2", frozen.get("text_encoder_2")),
                (trainable.get("embeddings"), trainable.get("embeddings_2")))

    def loss_fn(trainable, frozen, batch, rng):
        rng_peft, rng_predict = jax.random.split(rng)
        unet_params, te, te2, extra = resolve_params(trainable, frozen, rng_peft)
        if "output_embeddings" in trainable:
            batch = dict(batch,
                         output_embeddings=trainable["output_embeddings"],
                         output_embeddings_2=trainable["output_embeddings_2"])
        data = sdxl_predict(model, unet_params, te, te2, batch, rng_predict,
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
            params = {
                **params,
                "output_embeddings": normalize_output_embeddings(
                    params["output_embeddings"],
                    cfg.output_embedding_spans, cfg.output_embedding_stds),
                "output_embeddings_2": normalize_output_embeddings(
                    params["output_embeddings_2"],
                    cfg.output_embedding_spans, cfg.output_embedding_stds_2),
            }
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
