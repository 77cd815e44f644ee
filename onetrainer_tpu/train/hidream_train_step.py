"""The jitted HiDream training step: flow matching over packed latents with
4-TE conditioning (CLIP-L/G pooled concat, T5 sequence, all-layer llama
states) and a negated transformer output
(reference: modules/modelSetup/BaseHiDreamSetup.py:281-400)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from onetrainer_tpu.math.losses import flow_matching_losses
from onetrainer_tpu.math.noise import create_noise
from onetrainer_tpu.math.timesteps import sample_timesteps_discrete
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


def hidream_text_conditioning(model, te, te2, te3, te4, batch,
                              extra_embeddings=None,
                              output_embedding_base_id_3: int = 0,
                              dropout_rng=None,
                              te_dropouts=(0.0, 0.0, 0.0, 0.0),
                              te3_layer_skip: int = 0):
    """-> (t5 states, llama all-layer states [L,B,S,D], pooled concat)
    (reference: HiDreamModel.encode_text:300-480,
    combine_text_encoder_output:472-480).

    extra_embeddings: per-TE 4-tuple (clip_l, clip_g, t5, llama) — the
    reference's HiDreamModelEmbedding carries one vector per TE."""
    def _te_dropout(p1, p2, t5, llama):
        # per-TE conditioning dropout: TE1/TE2 pooled, TE3 sequence,
        # TE4 stacked layers (reference: HiDreamModel.py:445-470)
        if dropout_rng is None or not any(p > 0 for p in te_dropouts):
            return p1, p2, t5, llama
        from onetrainer_tpu.train.sd_train_step import (
            conditioning_dropout_mask,
        )
        b = p1.shape[0]
        masks = [conditioning_dropout_mask(
            jax.random.fold_in(dropout_rng, i), b, p) if p > 0 else None
            for i, p in enumerate(te_dropouts)]
        if masks[0] is not None:
            p1 = p1 * masks[0][:, None].astype(p1.dtype)
        if masks[1] is not None:
            p2 = p2 * masks[1][:, None].astype(p2.dtype)
        if masks[2] is not None:
            t5 = t5 * masks[2][:, None, None].astype(t5.dtype)
        if masks[3] is not None:
            llama = llama * masks[3][None, :, None, None].astype(llama.dtype)
        return p1, p2, t5, llama

    if "text_encoder_3_hidden_state" in batch:
        llama = batch["text_encoder_4_hidden_state"]
        if llama.ndim == 4:          # cached rows stack to [B, L, S, D]
            llama = jnp.transpose(llama, (1, 0, 2, 3))
        p1, p2, t5, llama = _te_dropout(
            batch["text_encoder_1_pooled_state"],
            batch["text_encoder_2_pooled_state"],
            batch["text_encoder_3_hidden_state"], llama)
        return t5, llama, jnp.concatenate([p1, p2], -1)
    extras = extra_embeddings if isinstance(extra_embeddings, tuple) \
        else (extra_embeddings, None, None, None)
    e1, e2, e3, e4 = extras
    out1 = model.text_encoder.apply(as_variables(te), batch["tokens_1"],
                                    None, e1)
    out2 = model.text_encoder_2.apply(as_variables(te2), batch["tokens_2"],
                                      None, e2)
    # T5 layer skip (reference: HiDreamModel.py:309,398
    # text_encoder_3_layer_skip)
    t5 = model.text_encoder_3.apply(
        as_variables(te3), batch["tokens_3"], e3,
        layer_skip=te3_layer_skip)
    if batch.get("output_embeddings_3") is not None:
        # output embeddings patch the T5 context (reference:
        # HiDreamModelEmbedding text_encoder_3 is_output_embedding,
        # HiDreamEmbeddingSaver.py t5_out key)
        from onetrainer_tpu.train.sd_train_step import (
            scatter_output_embeddings,
        )
        t5 = scatter_output_embeddings(
            t5, batch["tokens_3"], batch["output_embeddings_3"],
            output_embedding_base_id_3)
    mask4 = batch.get("tokens_mask_4")
    out4 = model.text_encoder_4.apply(as_variables(te4), batch["tokens_4"],
                                      mask4, e4)
    # all decoder layers (transformers hidden_states[1:]), masked
    # (reference: HiDreamModel.py:416-463)
    states = out4["hidden_states"]
    layers = list(states[1:])
    if mask4 is not None:
        layers = [layer * mask4[:, :, None].astype(layer.dtype)
                  for layer in layers]
    llama = jnp.stack(layers, axis=0)
    p1, p2, t5, llama = _te_dropout(
        out1["pooled_output"], out2["pooled_output"], t5, llama)
    pooled = jnp.concatenate([p1, p2], axis=-1)
    return t5, llama, pooled


def hidream_predict(model, transformer_params, te, te2, te3, te4, batch, rng,
                    cfg: SDStepConfig, extra_embeddings=None,
                    deterministic: bool = False):
    rng_t, rng_noise, rng_sample = jax.random.split(rng, 3)

    latent = batch["latent_image"]
    if "latent_logvar" in batch:
        std = jnp.exp(0.5 * jnp.clip(batch["latent_logvar"], -30.0, 20.0))
        latent = latent + std * jax.random.normal(
            rng_sample, latent.shape, latent.dtype)
    scaled = (latent - cfg.vae_shift_factor) * cfg.vae_scaling_factor

    b, h, w, _ = scaled.shape
    timestep = sample_timesteps_discrete(
        rng_t, b, cfg.timestep, num_train_timesteps=cfg.num_train_timesteps,
        deterministic=deterministic)
    sigma = (timestep.astype(jnp.float32) + 1.0) / cfg.num_train_timesteps
    noise = create_noise(rng_noise, scaled.shape, scaled.dtype,
                         cfg.offset_noise_weight, cfg.perturbation_noise_weight)
    s = sigma.reshape(-1, 1, 1, 1)
    noisy = (noise.astype(jnp.float32) * s
             + scaled.astype(jnp.float32) * (1.0 - s)).astype(scaled.dtype)

    t5, llama, pooled = hidream_text_conditioning(
        model, te, te2, te3, te4, batch, extra_embeddings,
        cfg.output_embedding_base_id_3,
        dropout_rng=jax.random.fold_in(rng, 0xd0),
        te_dropouts=(cfg.te_dropout, cfg.te2_dropout,
                     cfg.te3_dropout, cfg.te4_dropout),
        te3_layer_skip=cfg.te3_layer_skip)

    packed = pack_latents(noisy)
    img_ids = prepare_latent_image_ids(h, w)
    predicted_packed = model.transformer.apply(
        as_variables(transformer_params), packed, timestep, t5, llama,
        pooled, img_ids)
    # HiDream predicts the negated flow (reference:
    # BaseHiDreamSetup.py:388 `predicted_flow = -predicted_flow`)
    predicted = -unpack_latents(predicted_packed, h, w)

    target = noise.astype(jnp.float32) - scaled.astype(jnp.float32)
    return {
        "loss_type": "target",
        "predicted": predicted,
        "target": target,
        "timestep": timestep,
        "scaled_latent_image": scaled,
        "noisy_latent_image": noisy,
    }


def make_hidream_train_step(model, cfg: SDStepConfig, tx,
                            peft_cfg: PeftConfig | None = None):
    def resolve_params(trainable, frozen, rng):
        method = cfg.training_method
        if method == TrainingMethod.LORA:
            transformer = lora_variables(
                frozen["transformer"], trainable.get("transformer_lora"),
                peft_cfg, rng)
            return (transformer, frozen.get("text_encoder"),
                    frozen.get("text_encoder_2"), frozen.get("text_encoder_3"),
                    frozen.get("text_encoder_4"), trainable.get("embeddings"))
        if method == TrainingMethod.EMBEDDING:
            extras = []
            for suffix in ("", "_2", "_3", "_4"):
                extra = trainable.get(f"embeddings{suffix}")
                inputs = frozen.get(f"embedding_inputs{suffix}")
                if inputs is not None:
                    rows = ([extra] if extra is not None else []) + [inputs]
                    extra = jnp.concatenate(rows, axis=0)
                extras.append(extra)
            return (frozen["transformer"], frozen.get("text_encoder"),
                    frozen.get("text_encoder_2"), frozen.get("text_encoder_3"),
                    frozen.get("text_encoder_4"), tuple(extras))
        return (trainable.get("transformer", frozen.get("transformer")),
                frozen.get("text_encoder"), frozen.get("text_encoder_2"),
                frozen.get("text_encoder_3"), frozen.get("text_encoder_4"),
                trainable.get("embeddings"))

    def loss_fn(trainable, frozen, batch, rng):
        rng_peft, rng_predict = jax.random.split(rng)
        transformer, te, te2, te3, te4, extra = resolve_params(
            trainable, frozen, rng_peft)
        if "output_embeddings_3" in trainable:
            batch = dict(batch,
                         output_embeddings_3=trainable["output_embeddings_3"])
        data = hidream_predict(model, transformer, te, te2, te3, te4, batch,
                               rng_predict, cfg, extra_embeddings=extra)
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
        if "output_embeddings_3" in params and cfg.output_embedding_spans \
                and cfg.preserve_embedding_norm:
            from onetrainer_tpu.train.sd_train_step import (
                normalize_output_embeddings,
            )
            params = {**params, "output_embeddings_3":
                      normalize_output_embeddings(
                          params["output_embeddings_3"],
                          cfg.output_embedding_spans,
                          cfg.output_embedding_stds_3)}
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
