"""The jitted HunyuanVideo training step: discrete-timestep flow matching
over 5-D video latents, Llama (template-cropped, layer -3) + CLIP-pooled
conditioning, guidance-distilled scalar ×1000
(reference: modules/modelSetup/BaseHunyuanVideoSetup.py:220-290)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import flow_matching_losses
from onetrainer_tpu.math.noise import create_noise
from onetrainer_tpu.math.timesteps import sample_timesteps_discrete
from onetrainer_tpu.models.llama import encode_llama_text
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


def hunyuan_text_conditioning(model, te_params, te2_params, batch,
                              layer_skip: int, crop_start: int,
                              extra_embeddings=None,
                              output_embedding_base_id: int = 0):
    """-> (llama states [B,S,4096] cropped, mask [B,S], CLIP pooled [B,768])
    (reference: HunyuanVideoModel.encode_text:214-290).

    extra_embeddings: per-TE (llama, clip) tuple — the reference's
    HunyuanVideoModelEmbedding carries text_encoder_1_vector (llama) and
    text_encoder_2_vector (clip_l)."""
    if "text_encoder_1_hidden_state" in batch:
        states = batch["text_encoder_1_hidden_state"]
        mask = batch.get("tokens_mask_1")
        pooled = batch["text_encoder_2_pooled_state"]
        return states, mask, pooled
    extra_1, extra_2 = extra_embeddings if isinstance(extra_embeddings, tuple) \
        else (extra_embeddings, None)
    mask = batch.get("tokens_mask_1")
    out = model.text_encoder.apply(
        as_variables(te_params), batch["tokens_1"], mask, extra_1)
    states = encode_llama_text(out, layer_skip, default_layer=-3,
                               crop_start=crop_start)
    if batch.get("output_embeddings") is not None:
        # output embeddings patch the cropped llama context (reference:
        # HunyuanVideoModelEmbedding text_encoder_1 is_output_embedding,
        # HunyuanVideoEmbeddingSaver.py llama_out key)
        from onetrainer_tpu.train.sd_train_step import (
            scatter_output_embeddings,
        )
        states = scatter_output_embeddings(
            states, batch["tokens_1"][:, crop_start:],
            batch["output_embeddings"], output_embedding_base_id)
    if mask is not None:
        mask = mask[:, crop_start:]
    out2 = model.text_encoder_2.apply(
        as_variables(te2_params), batch["tokens_2"], None, extra_2)
    pooled = out2["pooled_output"]
    return states, mask, pooled


def hunyuan_predict(model, transformer_params, te_params, te2_params, batch,
                    rng, cfg: SDStepConfig, guidance_scale: float = 1.0,
                    extra_embeddings=None, deterministic: bool = False):
    from onetrainer_tpu.models.hunyuan_video import PROMPT_TEMPLATE_CROP_START
    rng_t, rng_noise, rng_sample = jax.random.split(rng, 3)

    latent = batch["latent_image"]          # [B,T,H,W,16] or [B,H,W,16]
    if "latent_logvar" in batch:
        std = jnp.exp(0.5 * jnp.clip(batch["latent_logvar"], -30.0, 20.0))
        latent = latent + std * jax.random.normal(
            rng_sample, latent.shape, latent.dtype)
    scaled = latent * cfg.vae_scaling_factor
    if scaled.ndim == 4:
        # image batches become 1-frame videos
        # (reference: BaseHunyuanVideoSetup.py:232-234)
        scaled = scaled[:, None]

    b = scaled.shape[0]
    timestep = sample_timesteps_discrete(
        rng_t, b, cfg.timestep, num_train_timesteps=cfg.num_train_timesteps,
        deterministic=deterministic)
    sigma = (timestep.astype(jnp.float32) + 1.0) / cfg.num_train_timesteps
    noise = create_noise(rng_noise, scaled.shape, scaled.dtype,
                         cfg.offset_noise_weight, cfg.perturbation_noise_weight)
    s = sigma.reshape((-1,) + (1,) * (scaled.ndim - 1))
    noisy = (noise.astype(jnp.float32) * s
             + scaled.astype(jnp.float32) * (1.0 - s)).astype(scaled.dtype)

    states, mask, pooled = hunyuan_text_conditioning(
        model, te_params, te2_params, batch, cfg.text_encoder_layer_skip,
        PROMPT_TEMPLATE_CROP_START, extra_embeddings,
        cfg.output_embedding_base_id)

    if cfg.te_dropout > 0 or cfg.te2_dropout > 0:
        # per-TE conditioning dropout: TE1 = Llama sequence, TE2 = CLIP
        # pooled; the attention mask is NOT zeroed (reference:
        # HunyuanVideoModel.py:301-311)
        from onetrainer_tpu.train.sd_train_step import (
            conditioning_dropout_mask,
        )
        rng_drop = jax.random.fold_in(rng, 0xd0)
        if cfg.te_dropout > 0:
            m1 = conditioning_dropout_mask(
                jax.random.fold_in(rng_drop, 1), b, cfg.te_dropout)
            states = states * m1[:, None, None].astype(states.dtype)
        if cfg.te2_dropout > 0:
            m2 = conditioning_dropout_mask(
                jax.random.fold_in(rng_drop, 2), b, cfg.te2_dropout)
            pooled = pooled * m2[:, None].astype(pooled.dtype)

    guidance = jnp.full((b,), guidance_scale * 1000.0, jnp.float32)
    predicted = model.transformer.apply(
        as_variables(transformer_params), noisy, timestep, states, mask,
        pooled, guidance)

    target = noise.astype(jnp.float32) - scaled.astype(jnp.float32)
    return {
        "loss_type": "target",
        "predicted": predicted,
        "target": target,
        "timestep": timestep,
        "scaled_latent_image": scaled,
        "noisy_latent_image": noisy,
    }


def make_hunyuan_train_step(model, cfg: SDStepConfig, tx,
                            peft_cfg: PeftConfig | None = None,
                            guidance_scale: float = 1.0):
    def resolve_params(trainable, frozen, rng):
        method = cfg.training_method
        if method == TrainingMethod.LORA:
            transformer = lora_variables(
                frozen["transformer"], trainable.get("transformer_lora"),
                peft_cfg, rng)
            te = frozen.get("text_encoder")
            if "te_lora" in trainable and te is not None:
                te = lora_variables(te, trainable["te_lora"], peft_cfg, rng)
            return transformer, te, frozen.get("text_encoder_2"), \
                trainable.get("embeddings")
        if cfg.training_method == TrainingMethod.EMBEDDING:
            extras = []
            for suffix in ("", "_2"):
                extra = trainable.get(f"embeddings{suffix}")
                inputs = frozen.get(f"embedding_inputs{suffix}")
                if inputs is not None:
                    rows = ([extra] if extra is not None else []) + [inputs]
                    extra = jnp.concatenate(rows, axis=0)
                extras.append(extra)
            return (frozen["transformer"], frozen["text_encoder"],
                    frozen.get("text_encoder_2"), tuple(extras))
        return (trainable.get("transformer", frozen.get("transformer")),
                trainable.get("text_encoder", frozen.get("text_encoder")),
                frozen.get("text_encoder_2"),
                trainable.get("embeddings"))

    def loss_fn(trainable, frozen, batch, rng):
        rng_peft, rng_predict = jax.random.split(rng)
        transformer, te, te2, extra = resolve_params(trainable, frozen, rng_peft)
        if "output_embeddings" in trainable:
            batch = dict(batch, output_embeddings=trainable["output_embeddings"])
        data = hunyuan_predict(model, transformer, te, te2, batch,
                               rng_predict, cfg, guidance_scale,
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
