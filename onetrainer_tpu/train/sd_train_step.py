"""The jitted SD-family training step.

One XLA program per configuration: timestep sampling → noising → text
conditioning (cached or live) → UNet forward → loss stack → backward →
clip → optimizer → (stochastic-rounded) param update → EMA. Replaces the
reference's python hot loop + device shuffling + fused-back-pass
machinery (reference: modules/trainer/GenericTrainer.py:568-764,
modules/modelSetup/BaseStableDiffusionSetup.py:135-310).

Sharding: state/frozen params carry FSDP NamedShardings, batches carry
("data","fsdp") shardings; compute follows data under jit and XLA places
the collectives.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import LossConfig, diffusion_losses
from onetrainer_tpu.math.noise import add_noise_discrete, create_noise
from onetrainer_tpu.math.schedules import DiffusionScheduleCoefficients
from onetrainer_tpu.math.timesteps import TimestepConfig, sample_timesteps_discrete
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.ops.stochastic import apply_updates_stochastic
from onetrainer_tpu.peft.lora import PeftConfig, as_variables, lora_variables
from onetrainer_tpu.train.ema import maybe_update_ema
from onetrainer_tpu.train.train_state import (
    TrainState, ema_to_compute, ema_to_storage, opt_to_compute, opt_to_storage,
)
from onetrainer_tpu.util.enums import TrainingMethod


@dataclass(frozen=True)
class SDStepConfig:
    """Static configuration baked into the compiled step."""
    training_method: TrainingMethod
    timestep: TimestepConfig
    loss: LossConfig
    offset_noise_weight: float = 0.0
    perturbation_noise_weight: float = 0.0
    vae_scaling_factor: float = 0.18215
    vae_shift_factor: float = 0.0
    prediction_type: str = "epsilon"
    text_encoder_layer_skip: int = 0
    train_text_encoder: bool = False
    stochastic_rounding: bool = True
    ema_decay: float = 0.0              # 0 = EMA off
    ema_update_interval: int = 1
    accum: int = 1                      # gradient accumulation micro-steps
    num_train_timesteps: int = 1000
    # prior preservation: predict with the frozen base (adapters detached)
    # and use it as target for PRIOR_PREDICTION samples / masked prior loss
    # (reference: GenericTrainer.py:672-686, BaseModelSetup.prior_model)
    prior_preservation: bool = False
    # output embeddings: trained vectors patched into the TE output at the
    # placeholder positions; token ids >= base_id index them
    # (reference: BaseModel._apply_output_embeddings:119-143)
    output_embedding_base_id: int = 0
    output_embedding_spans: tuple = ()
    output_embedding_stds: tuple = ()
    # SDXL/SD3 extra text encoders (vocabs differ -> separate base ids/stds)
    output_embedding_base_id_2: int = 0
    output_embedding_stds_2: tuple = ()
    output_embedding_base_id_3: int = 0
    output_embedding_stds_3: tuple = ()
    # per-TE conditioning dropout: each sample's text-encoder output is
    # zeroed with probability p during the step, cached or live
    # (reference: the "apply dropout" blocks in every family's
    # encode_text, e.g. StableDiffusionModel.py:226-231,
    # StableDiffusionXLModel.py:273-284; fed from
    # config.text_encoder*.dropout_probability in each Base setup's
    # predict, e.g. BaseStableDiffusionSetup.py:160)
    te_dropout: float = 0.0
    te2_dropout: float = 0.0
    te3_dropout: float = 0.0
    te4_dropout: float = 0.0
    # preserve_embedding_norm: after each optimizer step, renormalize
    # trained embedding rows — input embeddings to the base table's median
    # row norm, output embeddings to their original std (reference:
    # after_optimizer_step gated on config.preserve_embedding_norm, e.g.
    # StableDiffusionEmbeddingSetup.py:90-92,
    # StableDiffusion3EmbeddingSetup.py:117-120)
    preserve_embedding_norm: bool = False
    # per-TE hidden-state layer skips (reference: per-TE
    # text_encoder_*_layer_skip threaded into encode_text, e.g.
    # StableDiffusion3Model.py:245-247, FluxModel.py:206,
    # t5_util.encode_t5:6-29); text_encoder_layer_skip covers TE1
    te2_layer_skip: int = 0
    te3_layer_skip: int = 0
    te4_layer_skip: int = 0

    @staticmethod
    def from_train_config(config, prediction_type: str = "epsilon",
                          layer_skip: int = 0) -> "SDStepConfig":
        def _part_dropout(name: str) -> float:
            part = getattr(config, name, None)
            return float(getattr(part, "dropout_probability", 0.0) or 0.0)

        return SDStepConfig(
            training_method=config.training_method,
            timestep=TimestepConfig.from_train_config(config),
            loss=LossConfig.from_train_config(
                config, v_prediction=prediction_type == "v_prediction"),
            offset_noise_weight=config.offset_noise_weight,
            perturbation_noise_weight=config.perturbation_noise_weight,
            prediction_type=prediction_type,
            text_encoder_layer_skip=layer_skip,
            train_text_encoder=config.train_text_encoder_or_embedding(),
            stochastic_rounding=config.optimizer.stochastic_rounding,
            ema_decay=config.ema_decay if config.ema.value != "OFF" else 0.0,
            ema_update_interval=config.ema_update_step_interval,
            accum=max(config.gradient_accumulation_steps, 1),
            te_dropout=_part_dropout("text_encoder"),
            te2_dropout=_part_dropout("text_encoder_2"),
            te3_dropout=_part_dropout("text_encoder_3"),
            te4_dropout=_part_dropout("text_encoder_4"),
            preserve_embedding_norm=bool(
                getattr(config, "preserve_embedding_norm", False)),
            te2_layer_skip=int(getattr(config, "text_encoder_2_layer_skip", 0) or 0),
            te3_layer_skip=int(getattr(config, "text_encoder_3_layer_skip", 0) or 0),
            te4_layer_skip=int(getattr(config, "text_encoder_4_layer_skip", 0) or 0),
        )


def conditioning_dropout_mask(rng, batch_size: int, p: float):
    """Per-sample keep mask for text-conditioning dropout: 0 with
    probability p, else 1 (reference: the "apply dropout" blocks in every
    family's encode_text, e.g. StableDiffusionModel.py:226-231 — a
    host-RNG Bernoulli per batch element, applied to cached and live
    states alike; validation draws from a fixed seed, matching our fixed
    validation rng)."""
    return (jax.random.uniform(rng, (batch_size,)) >= p).astype(jnp.float32)


def scatter_output_embeddings(hidden, tokens, vectors, base_id: int):
    """Patch trained vectors into the TE output at placeholder positions
    (reference: BaseModel._apply_output_embeddings:119-143). Placeholder
    token ids are >= base_id; row index = token id - base_id."""
    ids = tokens - base_id
    is_placeholder = ids >= 0
    gathered = vectors[jnp.clip(ids, 0, vectors.shape[0] - 1)]
    return jnp.where(is_placeholder[..., None],
                     gathered.astype(hidden.dtype), hidden)


def _base_embedding_table(te_params):
    """Locate the frozen input-embedding table in a TE param tree (CLIP
    'token_embedding', T5 'shared', Gemma2/Llama 'embed_tokens' — the same
    keys as setup/sd_setup._embedding_table)."""
    if te_params is None:
        return None
    for key in ("token_embedding", "shared", "embed_tokens"):
        if key in te_params:
            t = te_params[key]
            if isinstance(t, dict) and "embedding" in t:
                return t["embedding"]
            return t
    return None


def preserve_input_embedding_norms(params, frozen, cfg):
    """preserve_embedding_norm for input embeddings: after the optimizer
    step, L2-renormalize each trained embedding row to the base table's
    median row norm (reference:
    AdditionalEmbeddingWrapper.normalize_embeddings:69-75, called from
    after_optimizer_step when config.preserve_embedding_norm). The median
    is recomputed from the frozen table inside the jitted step — a
    vocab-sized norm reduction, negligible next to the model forward."""
    if not cfg.preserve_embedding_norm:
        return params
    out = dict(params)
    for key, vec in params.items():
        if not key.startswith("embeddings"):
            continue
        te_key = "text_encoder" + key[len("embeddings"):]
        # the TE param tree lives in `frozen` normally, but in `params`
        # when the text encoder itself is being fine-tuned — the
        # reference normalizes learned embeddings either way
        # (AdditionalEmbeddingWrapper.normalize_embeddings:69-75)
        table = _base_embedding_table(
            frozen.get(te_key, params.get(te_key)))
        if table is None:
            continue
        median = jnp.median(
            jnp.linalg.norm(table.astype(jnp.float32), axis=-1))
        v = vec.astype(jnp.float32)
        norms = jnp.linalg.norm(v, axis=-1, keepdims=True)
        out[key] = (v / jnp.maximum(norms, 1e-12) * median).astype(vec.dtype)
    return out


def normalize_output_embeddings(vectors, spans, stds):
    """Rescale each output embedding back to its original per-row std
    after the optimizer update (reference:
    ModelSetupEmbeddingMixin._normalize_output_embeddings:105-110)."""
    oe = vectors.astype(jnp.float32)
    segments = []
    for (start, count), orig in zip(spans, stds):
        seg = jax.lax.dynamic_slice_in_dim(oe, start, count, 0)
        std = seg.std(axis=1).mean()
        segments.append(seg * (orig / (std + 1e-8)))
    return jnp.concatenate(segments, 0)


def sd_predict(
        unet_apply,
        te_apply,
        unet_params: dict,
        te_params: dict | None,
        batch: dict,
        rng: jax.Array,
        cfg: SDStepConfig,
        coefficients: DiffusionScheduleCoefficients,
        deterministic: bool = False,
) -> tuple[dict, dict]:
    """The SD1.x/2.x predict: returns (data, batch-extras) like the
    reference's setup.predict (reference: BaseStableDiffusionSetup.py:135-310).
    `batch['latent_image']` is the *unscaled* VAE latent (NHWC)."""
    rng_t, rng_noise, rng_sample = jax.random.split(rng, 3)

    latent = batch["latent_image"]
    if "latent_logvar" in batch:
        # sample from the cached VAE distribution per step
        std = jnp.exp(0.5 * jnp.clip(batch["latent_logvar"], -30.0, 20.0))
        latent = latent + std * jax.random.normal(rng_sample, latent.shape, latent.dtype)
    scaled_latent = latent * cfg.vae_scaling_factor

    batch_size = scaled_latent.shape[0]
    timestep = sample_timesteps_discrete(
        rng_t, batch_size, cfg.timestep,
        num_train_timesteps=cfg.num_train_timesteps,
        deterministic=deterministic)

    noise = create_noise(
        rng_noise, scaled_latent.shape, scaled_latent.dtype,
        cfg.offset_noise_weight, cfg.perturbation_noise_weight)

    noisy = add_noise_discrete(
        scaled_latent, noise, timestep,
        coefficients.sqrt_alphas_cumprod,
        coefficients.sqrt_one_minus_alphas_cumprod)

    # text conditioning: cached hidden state or live encode
    if "text_encoder_hidden_state" in batch and not cfg.train_text_encoder:
        context = batch["text_encoder_hidden_state"]
    else:
        extra = batch.get("extra_embeddings")
        out = te_apply(as_variables(te_params), batch["tokens"],
                       None, extra)
        context = encode_clip_text(out, cfg.text_encoder_layer_skip)

    output_embeddings = batch.get("output_embeddings")
    if output_embeddings is not None:
        context = scatter_output_embeddings(
            context, batch["tokens"], output_embeddings,
            cfg.output_embedding_base_id)

    if cfg.te_dropout > 0:
        keep = conditioning_dropout_mask(
            jax.random.fold_in(rng, 0xd0), batch_size, cfg.te_dropout)
        context = context * keep[:, None, None].astype(context.dtype)

    unet_in = noisy
    if "latent_conditioning_image" in batch:
        # inpainting: concat [noisy, mask, conditioning latent] on channels
        unet_in = jnp.concatenate([
            noisy,
            batch["latent_mask"].astype(noisy.dtype),
            batch["latent_conditioning_image"] * cfg.vae_scaling_factor,
        ], axis=-1)
    elif "latent_depth" in batch:
        unet_in = jnp.concatenate(
            [noisy, batch["latent_depth"].astype(noisy.dtype)], axis=-1)

    predicted = unet_apply(as_variables(unet_params), unet_in, timestep, context)

    if cfg.prediction_type == "v_prediction":
        sac = coefficients.sqrt_alphas_cumprod[timestep].reshape(-1, 1, 1, 1)
        somac = coefficients.sqrt_one_minus_alphas_cumprod[timestep].reshape(-1, 1, 1, 1)
        target = sac * noise.astype(jnp.float32) - somac * scaled_latent.astype(jnp.float32)
    else:
        target = noise.astype(jnp.float32)

    data = {
        "loss_type": "target",
        "predicted": predicted,
        "target": target,
        "timestep": timestep,
        "scaled_latent_image": scaled_latent,
        "noisy_latent_image": noisy,
        "prediction_type": cfg.prediction_type,
    }
    return data, {}


def make_sd_train_step(
        model,                      # StableDiffusionModel (module defs + betas)
        cfg: SDStepConfig,
        tx: optax.GradientTransformation,
        peft_cfg: PeftConfig | None = None,
):
    """Build the jitted train step.

    Signature of the returned fn:
        train_step(state: TrainState, frozen: dict, batch: dict, rng)
            -> (TrainState, metrics dict)

    `frozen` holds the non-trained param trees ('unet', 'text_encoder' as
    applicable); `state.params` holds the trainable tree:
      FINE_TUNE: {'unet': ..., ['text_encoder': ...]}
      LORA:      {'unet_lora': adapters, ['te_lora': adapters]}
      EMBEDDING: {'embeddings': [n_tokens, hidden]}
    """
    unet_apply = model.unet.apply
    te_apply = model.text_encoder.apply
    coefficients = model.coefficients()

    def resolve_params(trainable: dict, frozen: dict, rng):
        """Merge trainable + frozen into concrete unet/te params."""
        method = cfg.training_method
        if method == TrainingMethod.LORA:
            # functional LoRA: adapters ride a separate flax collection and
            # the low-rank term is applied inside each layer — no merged
            # weight copy, no dense per-layer dW in the backward pass
            unet_params = lora_variables(
                frozen["unet"], trainable.get("unet_lora"), peft_cfg, rng)
            te_params = frozen.get("text_encoder")
            if "te_lora" in trainable and te_params is not None:
                te_params = lora_variables(
                    te_params, trainable["te_lora"], peft_cfg, rng)
            extra = trainable.get("embeddings")
            return unet_params, te_params, extra
        if method == TrainingMethod.EMBEDDING:
            extra = trainable.get("embeddings")
            if "embedding_inputs" in frozen:
                rows = [extra] if extra is not None else []
                rows.append(frozen["embedding_inputs"])
                extra = jnp.concatenate(rows, axis=0)
            return frozen["unet"], frozen["text_encoder"], extra
        # FINE_TUNE
        unet_params = trainable.get("unet", frozen.get("unet"))
        te_params = trainable.get("text_encoder", frozen.get("text_encoder"))
        return unet_params, te_params, trainable.get("embeddings")

    def loss_fn(trainable, frozen, batch, rng):
        rng_peft, rng_predict = jax.random.split(rng)
        unet_params, te_params, extra = resolve_params(trainable, frozen, rng_peft)
        if extra is not None:
            batch = dict(batch, extra_embeddings=extra)
        if "output_embeddings" in trainable:
            batch = dict(batch, output_embeddings=trainable["output_embeddings"])
        data, _ = sd_predict(
            unet_apply, te_apply, unet_params, te_params, batch,
            rng_predict, cfg, coefficients)

        if cfg.prior_preservation and cfg.training_method == TrainingMethod.LORA:
            # same rng -> identical noise/timesteps for the frozen-base pass
            prior_data, _ = sd_predict(
                unet_apply, te_apply, frozen["unet"],
                frozen.get("text_encoder"), batch, rng_predict, cfg,
                coefficients)
            prior_pred = jax.lax.stop_gradient(prior_data["predicted"])
            data["prior_target"] = prior_pred
            if "prior_flag" in batch:
                flag = batch["prior_flag"].reshape(-1, 1, 1, 1)
                data["target"] = jnp.where(flag > 0, prior_pred, data["target"])

        losses = diffusion_losses(batch, data, cfg.loss, coefficients)
        return losses.mean(), {"timestep_mean": data["timestep"].mean()}

    def train_step(state: TrainState, frozen: dict, batch: dict, rng: jax.Array):
        rng_loss, rng_round = jax.random.split(jax.random.fold_in(rng, state.step))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng_loss)

        updates, opt_state = tx.update(
            grads, opt_to_compute(state.opt_state), state.params)
        if cfg.stochastic_rounding:
            params = apply_updates_stochastic(state.params, updates, rng_round)
        else:
            params = optax.apply_updates(state.params, updates)

        if cfg.preserve_embedding_norm and cfg.output_embedding_stds \
                and "output_embeddings" in params:
            params = {**params, "output_embeddings": normalize_output_embeddings(
                params["output_embeddings"], cfg.output_embedding_spans,
                cfg.output_embedding_stds)}
        params = preserve_input_embedding_norms(params, frozen, cfg)

        ema = state.ema
        if ema is not None and cfg.ema_decay > 0:
            ema = maybe_update_ema(ema_to_compute(ema), params, cfg.ema_decay,
                                   state.step, cfg.ema_update_interval,
                                   cfg.accum)

        new_state = TrainState(
            step=state.step + 1, params=params,
            opt_state=opt_to_storage(opt_state), ema=ema_to_storage(ema))
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
