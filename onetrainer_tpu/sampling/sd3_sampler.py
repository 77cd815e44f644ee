"""SD3 sampler: flow Euler with CFG over the MMDiT
(reference: modules/modelSampler/StableDiffusion3Sampler.py pattern)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.models.sd3 import sd3_text_context
from onetrainer_tpu.sampling.sd_sampler import SamplerOutput


def sample_sd3(
        model, transformer_params, te_params, te2_params, te3_params, vae_params,
        tokenize, tokenize_2, tokenize_3,
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

    # SD3 static shift=3.0 sigma schedule
    shift = 3.0
    sigmas = np.linspace(1.0, 1.0 / steps, steps)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

    extra_1, extra_2, extra_3 = extra_embeddings \
        if isinstance(extra_embeddings, tuple) \
        else (extra_embeddings, extra_embeddings, None)

    def encode(prompt):
        t1 = jnp.asarray(tokenize(prompt), jnp.int32)[None]
        t2 = jnp.asarray(tokenize_2(prompt), jnp.int32)[None]
        t3 = jnp.asarray(tokenize_3(prompt), jnp.int32)[None]
        out_l = model.text_encoder.apply({"params": te_params}, t1,
                                         None, extra_1)
        out_g = model.text_encoder_2.apply({"params": te2_params}, t2,
                                           None, extra_2)
        t5 = model.text_encoder_3.apply(
            {"params": te3_params}, t3, extra_3,
            layer_skip=sample_config.text_encoder_3_layer_skip)
        if getattr(sample_config, "prior_attention_mask", False):
            # reference: StableDiffusion3Sampler prior_attention_mask ->
            # apply_attention_mask on the T5 output (pad id 0)
            t5 = t5 * (t3 != 0)[..., None].astype(t5.dtype)
        skip1 = sample_config.text_encoder_1_layer_skip
        skip2 = sample_config.text_encoder_2_layer_skip
        return sd3_text_context(
            encode_clip_text(out_l, skip1), encode_clip_text(out_g, skip2),
            t5, out_l["pooled_output"], out_g["pooled_output"])

    ctx_pos, pooled_pos = encode(sample_config.prompt)
    ctx_neg, pooled_neg = encode(sample_config.negative_prompt)
    context = jnp.concatenate([ctx_pos, ctx_neg], axis=0)
    pooled = jnp.concatenate([pooled_pos, pooled_neg], axis=0)
    cfg_scale = sample_config.cfg_scale

    scale = model.vae_config.spatial_scale
    latents = jax.random.normal(
        rng, (1, height // scale, width // scale,
              model.vae_config.latent_channels), jnp.float32)

    @jax.jit
    def velocity(transformer_params, latents, t):
        both = jnp.concatenate([latents, latents], axis=0)
        ts = jnp.full((2,), t * 1000.0, jnp.float32)
        out = model.transformer.apply(
            {"params": transformer_params}, both, ts, pooled, context)
        cond, uncond = out[0:1], out[1:2]
        return uncond + cfg_scale * (cond - uncond)

    for i in range(steps):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        v = velocity(transformer_params, latents.astype(jnp.float32), sigma)
        latents = latents + (sigma_next - sigma) * v
        if on_update_progress:
            on_update_progress(i + 1, steps)

    latents = latents / model.vae_config.scaling_factor + model.vae_config.shift_factor
    image = model.vae.apply({"params": vae_params}, latents,
                            method=model.vae.decode)
    image = np.asarray(jnp.clip(image[0] * 0.5 + 0.5, 0, 1))
    return SamplerOutput(image=(image * 255).astype(np.uint8))
