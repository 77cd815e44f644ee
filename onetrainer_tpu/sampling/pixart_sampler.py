"""PixArt sampler: DDIM over the DiT (learned-variance channels dropped
for deterministic DDIM steps; reference: modules/modelSampler/
PixArtAlphaSampler.py pattern)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.sampling import schedulers as sched
from onetrainer_tpu.sampling.sd_sampler import SamplerOutput


def sample_pixart(
        model, transformer_params, te_params, vae_params,
        tokenize,
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
        prediction_type="epsilon",
        force_last_timestep=sample_config.force_last_timestep)

    tokens = jnp.stack([
        jnp.asarray(tokenize(sample_config.prompt), jnp.int32),
        jnp.asarray(tokenize(sample_config.negative_prompt), jnp.int32),
    ])
    context = model.text_encoder.apply(
        {"params": te_params}, tokens, extra_embeddings,
        layer_skip=sample_config.text_encoder_1_layer_skip)

    scale = model.vae_config.spatial_scale
    latent_shape = (1, height // scale, width // scale,
                    model.vae_config.latent_channels)
    rng, noise_rng = jax.random.split(rng)
    latents = jax.random.normal(noise_rng, latent_shape, jnp.float32)
    latents = latents * state.init_noise_sigma
    cfg_scale = sample_config.cfg_scale
    latent_ch = model.vae_config.latent_channels

    @jax.jit
    def dit_step(transformer_params, latents, t):
        both = jnp.concatenate([latents, latents], axis=0)
        ts = jnp.full((2,), t, jnp.int32)
        lh, lw = both.shape[1], both.shape[2]
        resolution = jnp.tile(
            jnp.asarray([[lh * 8, lw * 8]], jnp.float32), (2, 1))
        aspect_ratio = jnp.full((2, 1), float(lh) / float(lw), jnp.float32)
        out = model.transformer.apply(
            {"params": transformer_params}, both, ts, context,
            resolution, aspect_ratio)
        eps = out[..., :latent_ch]
        cond, uncond = eps[0:1], eps[1:2]
        return uncond + cfg_scale * (cond - uncond)

    history: dict = {}
    for i in range(steps):
        t = int(state.timesteps[i])
        model_in = sched.scale_model_input(state, latents, i)
        noise_pred = dit_step(transformer_params,
                              model_in.astype(jnp.float32), t)
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
