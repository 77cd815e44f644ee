"""HiDream sampler: flow-matching Euler with CFG over the MoE DiT
(reference: modules/modelSampler/HiDreamSampler.py pattern)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.models.flux import (
    pack_latents, prepare_latent_image_ids, unpack_latents,
)
from onetrainer_tpu.peft.lora import as_variables
from onetrainer_tpu.sampling.sd_sampler import SamplerOutput


def sample_hidream(
        model, transformer_params, te, te2, te3, te4, vae_params,
        tokenizer, tokenizer_2, tokenizer_3, tokenizer_4,
        sample_config: SampleConfig,
        extra_embeddings=None,
        rng: jax.Array | None = None,
        on_update_progress=None,
) -> SamplerOutput:
    from onetrainer_tpu.train.hidream_train_step import hidream_text_conditioning
    steps = sample_config.diffusion_steps
    cfg_scale = sample_config.cfg_scale
    height, width = sample_config.height, sample_config.width
    if rng is None:
        from onetrainer_tpu.sampling.sd_sampler import sample_rng_for
        rng = sample_rng_for(sample_config)

    def conditioning(text):
        batch = {
            "tokens_1": jnp.asarray(tokenizer(text))[None],
            "tokens_2": jnp.asarray(tokenizer_2(text))[None],
            "tokens_3": jnp.asarray(tokenizer_3(text))[None],
            "tokens_4": jnp.asarray(tokenizer_4(text))[None],
            "tokens_mask_4": jnp.asarray(
                tokenizer_4.mask(tokenizer_4(text)))[None],
        }
        return hidream_text_conditioning(
            model, te, te2, te3, te4, batch, extra_embeddings,
            te3_layer_skip=sample_config.text_encoder_3_layer_skip)

    t5_p, llama_p, pooled_p = conditioning(sample_config.prompt)
    t5_n, llama_n, pooled_n = conditioning(sample_config.negative_prompt or "")
    t5 = jnp.concatenate([t5_p, t5_n], axis=0)
    llama = jnp.concatenate([llama_p, llama_n], axis=1)
    pooled = jnp.concatenate([pooled_p, pooled_n], axis=0)

    scale = model.vae_config.spatial_scale
    lh, lw = height // scale, width // scale
    rng, noise_rng = jax.random.split(rng)
    latents = jax.random.normal(
        noise_rng, (1, lh, lw, model.vae_config.latent_channels), jnp.float32)
    img_ids = prepare_latent_image_ids(lh, lw)

    @jax.jit
    def velocity(transformer_params, latents, t):
        both = jnp.concatenate([latents, latents], axis=0)
        packed = pack_latents(both)
        out = model.transformer.apply(
            as_variables(transformer_params), packed,
            jnp.full((2,), t, jnp.float32), t5, llama, pooled, img_ids)
        flow = -unpack_latents(out, lh, lw)
        cond, uncond = flow[0:1], flow[1:2]
        return uncond + cfg_scale * (cond - uncond)

    sigmas = np.linspace(1.0, 0.0, steps + 1)
    for i in range(steps):
        v = velocity(transformer_params, latents, sigmas[i] * 1000.0)
        latents = latents - (sigmas[i] - sigmas[i + 1]) * v
        if on_update_progress:
            on_update_progress(i + 1, steps)

    latents = latents / model.vae_config.scaling_factor \
        + model.vae_config.shift_factor
    image = model.vae.apply({"params": vae_params}, latents,
                            method=model.vae.decode)
    image = np.asarray(jnp.clip(image[0] * 0.5 + 0.5, 0, 1))
    return SamplerOutput(image=(image * 255).astype(np.uint8))
