"""SDXL sampler (reference: modules/modelSampler/StableDiffusionXLSampler.py):
dual text encoders, pooled conditioning, size/crop time ids, CFG in one
batched UNet pass."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.sampling import schedulers as sched
from onetrainer_tpu.sampling.sd_sampler import SamplerOutput


def sample_stable_diffusion_xl(
        model, unet_params, te_params, te2_params, vae_params,
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

    state = sched.create_scheduler(
        sample_config.noise_scheduler, model.betas, steps,
        prediction_type=model.prediction_type,
        force_last_timestep=sample_config.force_last_timestep)

    extra_1, extra_2 = extra_embeddings if isinstance(extra_embeddings, tuple) \
        else (extra_embeddings, extra_embeddings)

    def encode(prompt: str):
        t1 = jnp.asarray(tokenize(prompt), jnp.int32)[None]
        t2 = jnp.asarray(tokenize_2(prompt), jnp.int32)[None]
        out1 = model.text_encoder.apply({"params": te_params}, t1,
                                        None, extra_1)
        out2 = model.text_encoder_2.apply({"params": te2_params}, t2,
                                          None, extra_2)
        skip = model.text_encoder_layer_skip
        ctx = jnp.concatenate([
            encode_clip_text(out1, sample_config.text_encoder_1_layer_skip + skip),
            encode_clip_text(out2, sample_config.text_encoder_2_layer_skip + skip),
        ], axis=-1)
        return ctx, out2["pooled_output"]

    ctx_pos, pooled_pos = encode(sample_config.prompt)
    ctx_neg, pooled_neg = encode(sample_config.negative_prompt)
    context = jnp.concatenate([ctx_pos, ctx_neg], axis=0)
    pooled = jnp.concatenate([pooled_pos, pooled_neg], axis=0)
    time_ids = jnp.asarray(
        [[height, width, 0, 0, height, width]] * 2, jnp.float32)

    scale = model.vae_config.spatial_scale
    latent_shape = (1, height // scale, width // scale,
                    model.vae_config.latent_channels)
    rng, noise_rng = jax.random.split(rng)
    latents = jax.random.normal(noise_rng, latent_shape, jnp.float32)
    latents = latents * state.init_noise_sigma
    cfg_scale = sample_config.cfg_scale

    # SDXL-inpaint (9ch unet): per-step conditioning channels
    # (reference: FluxSampler.__sample_inpainting pattern)
    extra_channels = None
    if model.unet_config.in_channels == 9:
        from onetrainer_tpu.sampling.inpaint import (
            downsample_mask, load_inpainting_inputs,
        )
        image, mask, conditioning = load_inpainting_inputs(
            sample_config, height, width)
        cond_latent, _ = model.vae.apply(
            {"params": vae_params}, jnp.asarray(conditioning)[None],
            method=model.vae.encode)
        cond_latent = cond_latent * model.vae_config.scaling_factor
        latent_mask = jnp.asarray(downsample_mask(mask, scale))[None]
        extra_channels = jnp.concatenate(
            [latent_mask, cond_latent.astype(jnp.float32)], axis=-1)

    # unet params are a jit argument, not a closure capture (captured
    # arrays inline into the HLO as literals — see make_sdxl_encode_fns)
    @jax.jit
    def unet_step(unet_params, latents, t):
        if extra_channels is not None:
            latents = jnp.concatenate([latents, extra_channels], axis=-1)
        both = jnp.concatenate([latents, latents], axis=0)
        ts = jnp.full((2,), t, jnp.int32)
        out = model.unet.apply({"params": unet_params}, both, ts, context,
                               pooled, time_ids)
        cond, uncond = out[0:1], out[1:2]
        return uncond + cfg_scale * (cond - uncond)

    history: dict = {}
    for i in range(steps):
        t = int(state.timesteps[i])
        model_in = sched.scale_model_input(state, latents, i)
        noise_pred = unet_step(unet_params, model_in.astype(jnp.float32), t)
        rng, step_rng = jax.random.split(rng)
        latents = sched.step(state, noise_pred.astype(jnp.float32), i, latents,
                             rng=step_rng, history=history)
        if on_update_progress:
            on_update_progress(i + 1, steps)

    image = model.vae.apply(
        {"params": vae_params},
        latents / model.vae_config.scaling_factor,
        method=model.vae.decode)
    image = np.asarray(jnp.clip(image[0] * 0.5 + 0.5, 0, 1))
    return SamplerOutput(image=(image * 255).astype(np.uint8))
