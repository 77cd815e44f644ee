"""FLUX sampler: rectified-flow Euler with µ-shifted timesteps, guidance
embedding (distilled CFG — no negative pass)
(reference: modules/modelSampler/FluxSampler.py:52-205)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.models.flux import (
    pack_latents, prepare_latent_image_ids, unpack_latents,
)
from onetrainer_tpu.math.timesteps import flux_mu_shift
from onetrainer_tpu.sampling.sd_sampler import SamplerOutput


def sample_flux(
        model, transformer_params, te_params, te2_params, vae_params,
        tokenize, tokenize_2,
        sample_config: SampleConfig,
        extra_embeddings=None,
        rng: jax.Array | None = None,
        on_update_progress=None,
) -> SamplerOutput:
    steps = sample_config.diffusion_steps
    height, width = sample_config.height, sample_config.width
    if rng is None:
        from onetrainer_tpu.sampling.sd_sampler import sample_rng_for
        rng = sample_rng_for(sample_config)

    scale = model.vae_config.spatial_scale
    lh, lw = height // scale, width // scale

    # µ-shifted sigma schedule (reference: FluxSampler µ-shift :121-135)
    shift = flux_mu_shift(lw, lh)
    sigmas = np.linspace(1.0, 1.0 / steps, steps)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

    extra_1, extra_2 = extra_embeddings if isinstance(extra_embeddings, tuple) \
        else (extra_embeddings, None)
    t1 = jnp.asarray(tokenize(sample_config.prompt), jnp.int32)[None]
    t2 = jnp.asarray(tokenize_2(sample_config.prompt), jnp.int32)[None]
    out_clip = model.text_encoder.apply({"params": te_params}, t1,
                                        None, extra_1)
    pooled = out_clip["pooled_output"]
    t5_states = model.text_encoder_2.apply(
        {"params": te2_params}, t2, extra_2,
        layer_skip=sample_config.text_encoder_2_layer_skip)
    if getattr(sample_config, "prior_attention_mask", False):
        # reference: FluxModel.py:275-276 (apply_attention_mask zeroes
        # padded T5 positions; T5 pad id is 0)
        t5_states = t5_states * (t2 != 0)[..., None].astype(t5_states.dtype)

    rng, noise_rng = jax.random.split(rng)
    latents = jax.random.normal(
        noise_rng, (1, lh, lw, model.vae_config.latent_channels), jnp.float32)
    img_ids = prepare_latent_image_ids(lh, lw)
    guidance = jnp.asarray([sample_config.cfg_scale], jnp.float32)

    # FLUX-fill: packed conditioning channels appended every step
    # (reference: FluxSampler.__sample_inpainting:221-360 — eroded mask,
    # masked conditioning image, 8x8 mask channel shuffle)
    extra_packed = None
    if model.transformer_config.in_channels > 64:
        from onetrainer_tpu.sampling.inpaint import (
            flux_fill_mask_channels, load_inpainting_inputs,
        )
        image, mask, conditioning = load_inpainting_inputs(
            sample_config, height, width)
        cond_latent, _ = model.vae.apply(
            {"params": vae_params}, jnp.asarray(conditioning)[None],
            method=model.vae.encode)
        cond_latent = (cond_latent - model.vae_config.shift_factor) \
            * model.vae_config.scaling_factor
        mask64 = jnp.asarray(flux_fill_mask_channels(mask))[None]
        extra_packed = jnp.concatenate([
            pack_latents(cond_latent.astype(jnp.float32)),
            pack_latents(mask64.astype(jnp.float32)),
        ], axis=-1)

    @jax.jit
    def velocity(transformer_params, packed, t):
        if extra_packed is not None:
            packed = jnp.concatenate([packed, extra_packed], axis=-1)
        return model.transformer.apply(
            {"params": transformer_params}, packed,
            jnp.full((1,), t, jnp.float32), pooled, t5_states, img_ids,
            None, guidance)

    packed = pack_latents(latents)
    for i in range(steps):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        v = velocity(transformer_params, packed.astype(jnp.float32), sigma)
        packed = packed + (sigma_next - sigma) * v
        if on_update_progress:
            on_update_progress(i + 1, steps)

    latents = unpack_latents(packed, lh, lw)
    latents = latents / model.vae_config.scaling_factor + model.vae_config.shift_factor
    image = model.vae.apply({"params": vae_params}, latents,
                            method=model.vae.decode)
    image = np.asarray(jnp.clip(image[0] * 0.5 + 0.5, 0, 1))
    return SamplerOutput(image=(image * 255).astype(np.uint8))
