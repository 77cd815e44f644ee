"""SD-family sampler: the manual denoising loop with CFG + VAE decode
(reference: modules/modelSampler/StableDiffusionSampler.py pattern —
encode prompts, scheduler loop, decode; EMA and inpainting handled by the
trainer wrapper).

TPU shape: the UNet call is jitted once (static latent shape + step count
live outside jit); cond and uncond run as one batched forward (CFG in a
single MXU pass).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.sampling import schedulers as sched
from onetrainer_tpu.util.enums import NoiseScheduler


@dataclass
class SamplerOutput:
    image: np.ndarray                     # HWC uint8 (video: first frame)
    video: np.ndarray | None = None       # THWC uint8 when sampling video


def sample_rng_for(sample_config) -> jax.Array:
    """Sampling PRNG: the configured seed, or OS entropy when
    sample_config.random_seed is set (reference: generator.seed() vs
    manual_seed(seed), e.g. FluxSampler.py:71-75)."""
    seed = sample_config.seed
    if getattr(sample_config, "random_seed", False):
        import secrets
        seed = secrets.randbits(31)
    return jax.random.PRNGKey(seed)


def sample_stable_diffusion(
        model,                        # StableDiffusionModel
        unet_params: dict,
        te_params: dict,
        vae_params: dict,
        tokenize,                     # fn(str) -> int32 [77]
        sample_config: SampleConfig,
        extra_embeddings=None,
        rng: jax.Array | None = None,
        on_update_progress=None,
) -> SamplerOutput:
    cfg_scale = sample_config.cfg_scale
    steps = sample_config.diffusion_steps
    height, width = sample_config.height, sample_config.width
    if rng is None:
        rng = sample_rng_for(sample_config)

    state = sched.create_scheduler(
        sample_config.noise_scheduler,
        model.betas,
        steps,
        prediction_type=model.prediction_type,
        force_last_timestep=sample_config.force_last_timestep,
    )

    tokens = jnp.stack([
        jnp.asarray(tokenize(sample_config.prompt), jnp.int32),
        jnp.asarray(tokenize(sample_config.negative_prompt), jnp.int32),
    ])
    te_out = model.text_encoder.apply(
        {"params": te_params}, tokens, None, extra_embeddings)
    context = encode_clip_text(
        te_out, sample_config.text_encoder_1_layer_skip + model.text_encoder_layer_skip)

    scale = model.vae_config.spatial_scale
    latent_shape = (1, height // scale, width // scale, model.vae_config.latent_channels)
    rng, noise_rng = jax.random.split(rng)
    latents = jax.random.normal(noise_rng, latent_shape, jnp.float32)
    latents = latents * state.init_noise_sigma

    # inpainting model types: concat [noisy, latent mask, conditioning
    # latent] on channels every step (reference: FluxSampler.
    # __sample_inpainting pattern applied to the SD 9-channel unet)
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
    def unet_step(unet_params, latents, t, context):
        if extra_channels is not None:
            latents = jnp.concatenate([latents, extra_channels], axis=-1)
        both = jnp.concatenate([latents, latents], axis=0)
        ts = jnp.full((2,), t, jnp.int32)
        out = model.unet.apply({"params": unet_params}, both, ts, context)
        cond, uncond = out[0:1], out[1:2]
        return uncond + cfg_scale * (cond - uncond)

    history: dict = {}
    for i in range(steps):
        t = int(state.timesteps[i])
        model_in = sched.scale_model_input(state, latents, i)
        noise_pred = unet_step(unet_params, model_in.astype(jnp.float32),
                               t, context)
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
