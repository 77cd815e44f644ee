"""The jitted SD3 training step: flow matching over 16ch latents with
triple text encoders (reference: modules/modelSetup/BaseStableDiffusion3Setup.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import flow_matching_losses
from onetrainer_tpu.math.noise import create_noise
from onetrainer_tpu.math.timesteps import sample_timesteps_discrete
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.models.sd3 import sd3_text_context
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


def sd3_conditioning(model, te, te2, te3, batch, layer_skip: int,
                     extra_embeddings=None, cfg=None, dropout_rng=None):
    """extra_embeddings: per-TE (clip_l, clip_g, t5) tuple — each TE keeps
    its own trained vector table (reference:
    StableDiffusion3ModelEmbedding holds three vectors)."""
    def _masks(b):
        # per-TE conditioning dropout masks: TE1/TE2 sequence+pooled,
        # TE3 sequence (reference: StableDiffusion3Model.py:397-415)
        if cfg is None or dropout_rng is None:
            return None, None, None
        from onetrainer_tpu.train.sd_train_step import (
            conditioning_dropout_mask,
        )
        return tuple(
            conditioning_dropout_mask(
                jax.random.fold_in(dropout_rng, i), b, p) if p > 0 else None
            for i, p in enumerate(
                (cfg.te_dropout, cfg.te2_dropout, cfg.te3_dropout)))

    if "sd3_context" in batch and "sd3_pooled" in batch:
        context, pooled = batch["sd3_context"], batch["sd3_pooled"]
        m1, m2, m3 = _masks(context.shape[0])
        if m1 is not None or m2 is not None or m3 is not None:
            # cached layout (models/sd3.py sd3_text_context): rows
            # [:clip_len] = channel-concat [clip_l | clip_g | 0-pad],
            # rows [clip_len:] = T5; pooled = [clip_l | clip_g]
            clip_len = batch["tokens"].shape[1]
            l_dim = model.te_config.hidden_size
            g_dim = model.te2_config.hidden_size
            clip, t5 = context[:, :clip_len], context[:, clip_len:]
            h_l, h_g = clip[..., :l_dim], clip[..., l_dim:l_dim + g_dim]
            pad = clip[..., l_dim + g_dim:]
            p_l, p_g = pooled[:, :l_dim], pooled[:, l_dim:]
            if m1 is not None:
                h_l = h_l * m1[:, None, None].astype(h_l.dtype)
                p_l = p_l * m1[:, None].astype(p_l.dtype)
            if m2 is not None:
                h_g = h_g * m2[:, None, None].astype(h_g.dtype)
                p_g = p_g * m2[:, None].astype(p_g.dtype)
            if m3 is not None:
                t5 = t5 * m3[:, None, None].astype(t5.dtype)
            context = jnp.concatenate(
                [jnp.concatenate([h_l, h_g, pad], axis=-1), t5], axis=1)
            pooled = jnp.concatenate([p_l, p_g], axis=-1)
        return context, pooled
    extra_1, extra_2, extra_3 = extra_embeddings \
        if isinstance(extra_embeddings, tuple) \
        else (extra_embeddings, extra_embeddings, None)
    out_l = model.text_encoder.apply(as_variables(te), batch["tokens"],
                                     None, extra_1)
    out_g = model.text_encoder_2.apply(as_variables(te2), batch["tokens_2"],
                                       None, extra_2)
    # per-TE layer skips (reference: StableDiffusion3Model.py:245-247)
    t5 = model.text_encoder_3.apply(
        as_variables(te3), batch["tokens_3"], extra_3,
        layer_skip=cfg.te3_layer_skip if cfg is not None else 0)
    h_l = encode_clip_text(out_l, layer_skip)
    h_g = encode_clip_text(
        out_g, cfg.te2_layer_skip if cfg is not None else layer_skip)
    if cfg is not None and batch.get("output_embeddings") is not None:
        # per-TE output-embedding scatter
        # (reference: StableDiffusion3Model.encode_text:375-395)
        from onetrainer_tpu.train.sd_train_step import scatter_output_embeddings
        h_l = scatter_output_embeddings(
            h_l, batch["tokens"], batch["output_embeddings"],
            cfg.output_embedding_base_id)
        h_g = scatter_output_embeddings(
            h_g, batch["tokens_2"], batch["output_embeddings_2"],
            cfg.output_embedding_base_id_2)
        t5 = scatter_output_embeddings(
            t5, batch["tokens_3"], batch["output_embeddings_3"],
            cfg.output_embedding_base_id_3)
    p_l, p_g = out_l["pooled_output"], out_g["pooled_output"]
    m1, m2, m3 = _masks(h_l.shape[0])
    if m1 is not None:
        h_l = h_l * m1[:, None, None].astype(h_l.dtype)
        p_l = p_l * m1[:, None].astype(p_l.dtype)
    if m2 is not None:
        h_g = h_g * m2[:, None, None].astype(h_g.dtype)
        p_g = p_g * m2[:, None].astype(p_g.dtype)
    if m3 is not None:
        t5 = t5 * m3[:, None, None].astype(t5.dtype)
    return sd3_text_context(
        h_l,
        h_g,
        t5,
        p_l,
        p_g,
    )


def sd3_predict(model, transformer_params, te, te2, te3, batch, rng,
                cfg: SDStepConfig, extra_embeddings=None,
                deterministic: bool = False):
    rng_t, rng_noise, rng_sample = jax.random.split(rng, 3)

    latent = batch["latent_image"]
    if "latent_logvar" in batch:
        std = jnp.exp(0.5 * jnp.clip(batch["latent_logvar"], -30.0, 20.0))
        latent = latent + std * jax.random.normal(rng_sample, latent.shape, latent.dtype)
    scaled = (latent - cfg.vae_shift_factor) * cfg.vae_scaling_factor

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

    context, pooled = sd3_conditioning(
        model, te, te2, te3, batch, cfg.text_encoder_layer_skip,
        extra_embeddings, cfg, dropout_rng=jax.random.fold_in(rng, 0xd0))

    predicted = model.transformer.apply(
        as_variables(transformer_params), noisy,
        sigma * 1000.0, pooled, context)

    target = noise.astype(jnp.float32) - scaled.astype(jnp.float32)
    return {
        "loss_type": "target",
        "predicted": predicted,
        "target": target,
        "timestep": timestep,
        "scaled_latent_image": scaled,
        "noisy_latent_image": noisy,
    }


def make_sd3_train_step(model, cfg: SDStepConfig, tx,
                        peft_cfg: PeftConfig | None = None):
    def resolve(trainable, frozen, rng):
        method = cfg.training_method
        if method == TrainingMethod.LORA:
            transformer = lora_variables(frozen["transformer"], trainable["transformer_lora"], peft_cfg, rng) \
                if "transformer_lora" in trainable else frozen["transformer"]
            te = frozen.get("text_encoder")
            te2 = frozen.get("text_encoder_2")
            if "te_lora" in trainable and te is not None:
                te = lora_variables(te, trainable["te_lora"], peft_cfg, rng)
            if "te2_lora" in trainable and te2 is not None:
                te2 = lora_variables(te2, trainable["te2_lora"], peft_cfg, rng)
            return transformer, te, te2, frozen.get("text_encoder_3"), \
                (trainable.get("embeddings"), trainable.get("embeddings_2"),
                 trainable.get("embeddings_3"))
        if method == TrainingMethod.EMBEDDING:
            extras = []
            for i, suffix in enumerate(("", "_2", "_3")):
                extra = trainable.get(f"embeddings{suffix}")
                inputs = frozen.get(f"embedding_inputs{suffix}")
                if inputs is not None:
                    rows = ([extra] if extra is not None else []) + [inputs]
                    extra = jnp.concatenate(rows, axis=0)
                extras.append(extra)
            return (frozen["transformer"], frozen["text_encoder"],
                    frozen["text_encoder_2"], frozen["text_encoder_3"],
                    tuple(extras))
        return (trainable.get("transformer", frozen.get("transformer")),
                trainable.get("text_encoder", frozen.get("text_encoder")),
                trainable.get("text_encoder_2", frozen.get("text_encoder_2")),
                trainable.get("text_encoder_3", frozen.get("text_encoder_3")),
                (trainable.get("embeddings"), trainable.get("embeddings_2"),
                 trainable.get("embeddings_3")))

    def loss_fn(trainable, frozen, batch, rng):
        rng_peft, rng_predict = jax.random.split(rng)
        transformer, te, te2, te3, extra = resolve(trainable, frozen, rng_peft)
        if "output_embeddings" in trainable:
            batch = dict(
                batch,
                output_embeddings=trainable["output_embeddings"],
                output_embeddings_2=trainable["output_embeddings_2"],
                output_embeddings_3=trainable["output_embeddings_3"])
        data = sd3_predict(model, transformer, te, te2, te3, batch, rng_predict,
                           cfg, extra)
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
        if "output_embeddings" in params and cfg.output_embedding_spans \
                and cfg.preserve_embedding_norm:
            from onetrainer_tpu.train.sd_train_step import (
                normalize_output_embeddings,
            )
            params = dict(params)
            for suffix, stds in (("", cfg.output_embedding_stds),
                                 ("_2", cfg.output_embedding_stds_2),
                                 ("_3", cfg.output_embedding_stds_3)):
                key = f"output_embeddings{suffix}"
                params[key] = normalize_output_embeddings(
                    params[key], cfg.output_embedding_spans, stds)
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
