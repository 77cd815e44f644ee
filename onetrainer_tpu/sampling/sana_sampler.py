"""Sana sampler: flow-matching Euler over the linear-attention DiT +
DC-AE decode (reference: modules/modelSampler/SanaSampler.py pattern —
manual denoise loop, CFG, Gemma conditioning with attention masks)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.models.gemma import apply_gemma_final_norm, encode_gemma_text
from onetrainer_tpu.peft.lora import as_variables
from onetrainer_tpu.sampling.sd_sampler import SamplerOutput


def sample_sana(
        model, transformer_params, te_params, vae_params,
        tokenizer,
        sample_config: SampleConfig,
        extra_embeddings=None,
        rng: jax.Array | None = None,
        on_update_progress=None,
) -> SamplerOutput:
    steps = sample_config.diffusion_steps
    cfg_scale = sample_config.cfg_scale
    height, width = sample_config.height, sample_config.width
    if rng is None:
        from onetrainer_tpu.sampling.sd_sampler import sample_rng_for
        rng = sample_rng_for(sample_config)

    tokens = np.stack([tokenizer(sample_config.prompt),
                       tokenizer(sample_config.negative_prompt or "")])
    mask = np.stack([tokenizer.mask(tokens[0]), tokenizer.mask(tokens[1])])
    out = model.text_encoder.apply(
        as_variables(te_params), jnp.asarray(tokens), jnp.asarray(mask),
        extra_embeddings)
    context = encode_gemma_text(out, 0)

    scale = model.vae_config.spatial_scale
    latent_shape = (1, height // scale, width // scale,
                    model.vae_config.latent_channels)
    rng, noise_rng = jax.random.split(rng)
    latents = jax.random.normal(noise_rng, latent_shape, jnp.float32)

    mask_j = jnp.asarray(mask)

    @jax.jit
    def dit_step(transformer_params, latents, t):
        both = jnp.concatenate([latents, latents], axis=0)
        ts = jnp.full((2,), t, jnp.float32)
        flow = model.transformer.apply(
            as_variables(transformer_params), both, ts, context, mask_j)
        cond, uncond = flow[0:1], flow[1:2]
        return uncond + cfg_scale * (cond - uncond)

    # rectified-flow Euler: sigma goes 1 -> 0, x <- x - (s_i - s_{i+1})·v
    sigmas = np.linspace(1.0, 0.0, steps + 1)
    for i in range(steps):
        t = sigmas[i] * 1000.0
        flow = dit_step(transformer_params, latents, t)
        latents = latents - (sigmas[i] - sigmas[i + 1]) * flow
        if on_update_progress:
            on_update_progress(i + 1, steps)

    image = model.vae.apply(
        {"params": vae_params},
        latents / model.vae_config.scaling_factor,
        method=model.vae.decode)
    image = np.asarray(jnp.clip(image[0] * 0.5 + 0.5, 0, 1))
    return SamplerOutput(image=(image * 255).astype(np.uint8))
