"""The jitted Würstchen v2 / Stable Cascade prior training step.

Continuous-timestep epsilon prediction in EfficientNet latent space with
the family-specific timestep warp (v2: t·1.08+0.001, Cascade: t+0.001)
and the warped cosine ᾱ(t)
(reference: modules/modelSetup/BaseWuerstchenSetup.py:158-270,
modules/modelSetup/mixin/ModelSetupDiffusionMixin.py:40-57).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import diffusion_losses
from onetrainer_tpu.math.noise import create_noise
from onetrainer_tpu.math.timesteps import sample_timesteps_continuous
from onetrainer_tpu.models.clip import encode_clip_text
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
from onetrainer_tpu.util.enums import ModelType, TrainingMethod


def wuerstchen_alpha_cumprod(t: jnp.ndarray) -> jnp.ndarray:
    """Warped cosine ᾱ(t), t∈[0,1]
    (reference: BaseWuerstchenSetup.__alpha_cumprod:158-180)."""
    s = 0.008
    init = math.cos(s / (1 + s) * math.pi * 0.5) ** 2
    ac = jnp.cos((t.astype(jnp.float32) + s) / (1 + s) * jnp.pi * 0.5) ** 2 / init
    return jnp.clip(ac, 0.0001, 0.9999)


class ContinuousCoefficients:
    """Duck-typed DiffusionScheduleCoefficients for continuous timesteps —
    enough for the SNR-based loss weightings."""

    def snr(self, t: jnp.ndarray) -> jnp.ndarray:
        ac = wuerstchen_alpha_cumprod(t)
        return ac / (1.0 - ac)


def warp_timestep(t: jnp.ndarray, model_type: ModelType) -> jnp.ndarray:
    if model_type.is_wuerstchen_v2():
        return jnp.clip(t * 1.08 + 0.001, 0.001, 1.0)
    return jnp.clip(t + 0.001, 0.001, 1.0)


def wuerstchen_predict(model, prior_params, te_params, batch, rng,
                       cfg: SDStepConfig, extra_embeddings=None,
                       deterministic: bool = False) -> dict:
    rng_t, rng_noise = jax.random.split(rng)

    latent = batch["latent_image"]
    if model.model_type.is_wuerstchen_v2():
        scaled = (latent + 1.0) / 42.0
    else:
        scaled = latent

    t = sample_timesteps_continuous(
        rng_t, scaled.shape[0], cfg.timestep, deterministic=deterministic)
    t = warp_timestep(t, model.model_type)

    noise = create_noise(rng_noise, scaled.shape, jnp.float32,
                         cfg.offset_noise_weight, cfg.perturbation_noise_weight)
    ac = wuerstchen_alpha_cumprod(t).reshape(-1, 1, 1, 1)
    noisy = jnp.sqrt(ac) * scaled.astype(jnp.float32) \
        + jnp.sqrt(1.0 - ac) * noise

    pooled = None
    if "text_encoder_hidden_state" in batch and not cfg.train_text_encoder:
        context = batch["text_encoder_hidden_state"]
        pooled = batch.get("pooled_text_encoder_output")
    else:
        extra = extra_embeddings if extra_embeddings is not None \
            else batch.get("extra_embeddings")
        out = model.text_encoder.apply(
            as_variables(te_params), batch["tokens"],
            batch.get("tokens_mask"), extra)
        if model.model_type.is_stable_cascade():
            # Cascade: raw hidden state + projected pooled output
            # (reference: WuerstchenModel.encode_text:249-251)
            context = encode_clip_text(out, cfg.text_encoder_layer_skip)
            pooled = out["pooled_output"]
        else:
            # v2 applies the final layer norm to the picked hidden state
            # (reference: WuerstchenModel.encode_text:243-248)
            from onetrainer_tpu.models.clip import apply_final_layer_norm
            context = apply_final_layer_norm(
                te_params, encode_clip_text(out, cfg.text_encoder_layer_skip))

    if cfg.te_dropout > 0:
        # conditioning dropout (reference: WuerstchenModel.py:264-272 —
        # v2 zeroes the hidden-state sequence, Cascade zeroes the pooled
        # projection)
        from onetrainer_tpu.train.sd_train_step import (
            conditioning_dropout_mask,
        )
        keep = conditioning_dropout_mask(
            jax.random.fold_in(rng, 0xd0), context.shape[0], cfg.te_dropout)
        context = context * keep[:, None, None].astype(context.dtype)
        if model.model_type.is_stable_cascade():
            # Cascade drops the pooled projection as well
            # (reference: WuerstchenModel.py:271-273)
            pooled = pooled * keep.reshape(
                (-1,) + (1,) * (pooled.ndim - 1)).astype(pooled.dtype)

    if model.model_type.is_stable_cascade():
        # clip_text_pooled + zero clip_img kwargs
        # (reference: BaseWuerstchenSetup.py:246-258)
        predicted = model.prior.apply(
            as_variables(prior_params), noisy, t, context, pooled, None)
    else:
        predicted = model.prior.apply(
            as_variables(prior_params), noisy, t, context)

    return {
        "loss_type": "target",
        "predicted": predicted,
        "target": noise,
        "timestep": t,
        "scaled_latent_image": scaled,
        "noisy_latent_image": noisy,
        "prediction_type": "epsilon",
    }


def make_wuerstchen_train_step(model, cfg: SDStepConfig, tx,
                               peft_cfg: PeftConfig | None = None):
    coefficients = ContinuousCoefficients()

    def resolve_params(trainable, frozen, rng):
        method = cfg.training_method
        if method == TrainingMethod.LORA:
            prior = lora_variables(frozen["prior"],
                                   trainable.get("prior_lora"), peft_cfg, rng)
            te = frozen.get("text_encoder")
            if "te_lora" in trainable and te is not None:
                te = lora_variables(te, trainable["te_lora"], peft_cfg, rng)
            return prior, te, trainable.get("embeddings")
        if method == TrainingMethod.EMBEDDING:
            return frozen["prior"], frozen["text_encoder"], \
                trainable["embeddings"]
        return (trainable.get("prior", frozen.get("prior")),
                trainable.get("text_encoder", frozen.get("text_encoder")),
                trainable.get("embeddings"))

    def loss_fn(trainable, frozen, batch, rng):
        rng_peft, rng_predict = jax.random.split(rng)
        prior, te, extra = resolve_params(trainable, frozen, rng_peft)
        data = wuerstchen_predict(model, prior, te, batch, rng_predict, cfg,
                                  extra_embeddings=extra)
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
