"""The jitted FLUX training step: rectified flow with dynamic µ-shifted
continuous timesteps, 2x2 packing, guidance embedding
(reference: modules/modelSetup/BaseFluxSetup.py:263-313 — noisy = σ·ε +
(1-σ)·x0, flow target = ε − x0)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import flow_matching_losses
from onetrainer_tpu.math.noise import create_noise
from onetrainer_tpu.math.timesteps import sample_timesteps_continuous
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.models.flux import (
    pack_latents, prepare_latent_image_ids, unpack_latents,
)
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


def flux_text_conditioning(model, te_params, te2_params, batch,
                           extra_embeddings=None, cfg=None):
    """-> (t5 sequence states [B,S,4096], clip pooled [B,768]).
    extra_embeddings: per-TE (clip, t5) tuple (reference:
    FluxModelEmbedding holds text_encoder_{1,2}_vector)."""
    if "t5_hidden_state" in batch and "clip_pooled_state" in batch:
        return batch["t5_hidden_state"], batch["clip_pooled_state"]
    extra_1, extra_2 = extra_embeddings if isinstance(extra_embeddings, tuple) \
        else (extra_embeddings, None)
    out_clip = model.text_encoder.apply(
        as_variables(te_params), batch["tokens"], None, extra_1)
    pooled = out_clip["pooled_output"]
    # T5 layer skip (reference: FluxModel.py:206,258 text_encoder_2_layer_skip)
    t5_states = model.text_encoder_2.apply(
        as_variables(te2_params), batch["tokens_2"], extra_2,
        layer_skip=cfg.te2_layer_skip if cfg is not None else 0)
    if cfg is not None and batch.get("output_embeddings_2") is not None:
        # output embeddings apply to the T5 sequence states (reference:
        # FluxModel.encode_text:278 — only text_encoder_2 output)
        from onetrainer_tpu.train.sd_train_step import scatter_output_embeddings
        t5_states = scatter_output_embeddings(
            t5_states, batch["tokens_2"], batch["output_embeddings_2"],
            cfg.output_embedding_base_id_2)
    return t5_states, pooled


def flux_predict(model, transformer_params, te_params, te2_params, batch, rng,
                 cfg: SDStepConfig, guidance_scale: float = 1.0,
                 extra_embeddings=None, deterministic: bool = False):
    rng_t, rng_noise, rng_sample = jax.random.split(rng, 3)

    latent = batch["latent_image"]          # [B, H, W, 16] unscaled
    if "latent_logvar" in batch:
        std = jnp.exp(0.5 * jnp.clip(batch["latent_logvar"], -30.0, 20.0))
        latent = latent + std * jax.random.normal(rng_sample, latent.shape, latent.dtype)
    scaled = (latent - cfg.vae_shift_factor) * cfg.vae_scaling_factor

    b, h, w, c = scaled.shape
    # dynamic µ-shift from the packed sequence length
    from dataclasses import replace
    tcfg = cfg.timestep
    t = sample_timesteps_continuous(rng_t, b, tcfg, deterministic=deterministic) \
        if not tcfg.dynamic_timestep_shifting else None
    if t is None:
        from onetrainer_tpu.math.timesteps import flux_mu_shift
        shift = flux_mu_shift(w, h)
        t = sample_timesteps_continuous(
            rng_t, b, replace(tcfg, dynamic_timestep_shifting=False,
                              timestep_shift=shift),
            deterministic=deterministic)

    noise = create_noise(rng_noise, scaled.shape, scaled.dtype,
                         cfg.offset_noise_weight, cfg.perturbation_noise_weight)
    sigma = t.reshape(-1, 1, 1, 1)
    noisy = (noise.astype(jnp.float32) * sigma
             + scaled.astype(jnp.float32) * (1.0 - sigma)).astype(scaled.dtype)

    t5_states, pooled = flux_text_conditioning(
        model, te_params, te2_params, batch, extra_embeddings, cfg)

    # per-TE conditioning dropout: TE1 = CLIP pooled, TE2 = T5 sequence
    # (reference: FluxModel.py:286-296)
    if cfg.te_dropout > 0 or cfg.te2_dropout > 0:
        from onetrainer_tpu.train.sd_train_step import (
            conditioning_dropout_mask,
        )
        rng_drop = jax.random.fold_in(rng, 0xd0)
        b = pooled.shape[0]
        if cfg.te_dropout > 0:
            m1 = conditioning_dropout_mask(
                jax.random.fold_in(rng_drop, 1), b, cfg.te_dropout)
            pooled = pooled * m1[:, None].astype(pooled.dtype)
        if cfg.te2_dropout > 0:
            m2 = conditioning_dropout_mask(
                jax.random.fold_in(rng_drop, 2), b, cfg.te2_dropout)
            t5_states = t5_states * m2[:, None, None].astype(t5_states.dtype)

    packed = pack_latents(noisy)
    if "latent_conditioning_image" in batch:
        # FLUX-fill: packed [noisy(64) | cond latent(64) | 8x8-shuffled
        # pixel mask(256)] = 384 input channels (reference:
        # BaseFluxSetup predict for FILL + ShuffleFluxFillMaskChannels)
        cond = (batch["latent_conditioning_image"] - cfg.vae_shift_factor) \
            * cfg.vae_scaling_factor
        packed = jnp.concatenate([
            packed,
            pack_latents(cond.astype(packed.dtype)),
            pack_latents(batch["latent_mask"].astype(packed.dtype)),
        ], axis=-1)
    img_ids = prepare_latent_image_ids(h, w)
    guidance = jnp.full((b,), guidance_scale, jnp.float32)

    predicted_packed = model.transformer.apply(
        as_variables(transformer_params), packed, t, pooled, t5_states,
        img_ids, None, guidance)
    predicted = unpack_latents(predicted_packed, h, w)

    # flow target (reference: BaseFluxSetup.py:307)
    target = noise.astype(jnp.float32) - scaled.astype(jnp.float32)

    return {
        "loss_type": "target",
        "predicted": predicted,
        "target": target,
        "timestep": jnp.clip((t * 1000).astype(jnp.int32) - 1, 0, 999),
        "scaled_latent_image": scaled,
        "noisy_latent_image": noisy,
    }


def make_flux_train_step(model, cfg: SDStepConfig, tx,
                         peft_cfg: PeftConfig | None = None,
                         guidance_scale: float = 1.0):
    def resolve(trainable, frozen, rng):
        method = cfg.training_method
        if method == TrainingMethod.LORA:
            transformer = lora_variables(frozen["transformer"], trainable["transformer_lora"], peft_cfg, rng) \
                if "transformer_lora" in trainable else frozen["transformer"]
            te = frozen.get("text_encoder")
            te2 = frozen.get("text_encoder_2")
            if "te_lora" in trainable and te is not None:
                te = lora_variables(te, trainable["te_lora"], peft_cfg, rng)
            return transformer, te, te2, (trainable.get("embeddings"),
                                          trainable.get("embeddings_2"))
        if method == TrainingMethod.EMBEDDING:
            extras = []
            for suffix in ("", "_2"):
                extra = trainable.get(f"embeddings{suffix}")
                inputs = frozen.get(f"embedding_inputs{suffix}")
                if inputs is not None:
                    rows = ([extra] if extra is not None else []) + [inputs]
                    extra = jnp.concatenate(rows, axis=0)
                extras.append(extra)
            return (frozen["transformer"], frozen["text_encoder"],
                    frozen["text_encoder_2"], tuple(extras))
        return (trainable.get("transformer", frozen.get("transformer")),
                trainable.get("text_encoder", frozen.get("text_encoder")),
                trainable.get("text_encoder_2", frozen.get("text_encoder_2")),
                (trainable.get("embeddings"), trainable.get("embeddings_2")))

    def loss_fn(trainable, frozen, batch, rng):
        rng_peft, rng_predict = jax.random.split(rng)
        transformer, te, te2, extra = resolve(trainable, frozen, rng_peft)
        if "output_embeddings" in trainable or \
                "output_embeddings_2" in trainable:
            batch = dict(batch)
            for suffix in ("", "_2"):
                key = f"output_embeddings{suffix}"
                if key in trainable:
                    batch[key] = trainable[key]
        data = flux_predict(model, transformer, te, te2, batch, rng_predict,
                            cfg, guidance_scale, extra)
        losses = flow_matching_losses(batch, data, cfg.loss)
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
        if "output_embeddings_2" in params and cfg.output_embedding_spans \
                and cfg.preserve_embedding_norm:
            from onetrainer_tpu.train.sd_train_step import (
                normalize_output_embeddings,
            )
            params = {**params, "output_embeddings_2":
                      normalize_output_embeddings(
                          params["output_embeddings_2"],
                          cfg.output_embedding_spans,
                          cfg.output_embedding_stds_2)}
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
