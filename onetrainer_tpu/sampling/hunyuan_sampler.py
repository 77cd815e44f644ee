"""HunyuanVideo sampler: flow-matching Euler over the 3D DiT + causal-VAE
decode to a frame stack (reference: modules/modelSampler/
HunyuanVideoSampler.py:85-199 — frames quantized to 4k+1, guidance scalar
×1000 instead of CFG on the distilled model)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.models.hunyuan_video import PROMPT_TEMPLATE_CROP_START
from onetrainer_tpu.models.llama import encode_llama_text
from onetrainer_tpu.peft.lora import as_variables
from onetrainer_tpu.sampling.sd_sampler import SamplerOutput


def sample_hunyuan_video(
        model, transformer_params, te_params, te2_params, vae_params,
        tokenizer, tokenizer_2,
        sample_config: SampleConfig,
        extra_embeddings=None,
        rng: jax.Array | None = None,
        on_update_progress=None,
) -> SamplerOutput:
    steps = sample_config.diffusion_steps
    height, width = sample_config.height, sample_config.width
    # frames quantized to 4k+1 (reference: HunyuanVideoSampler.py:85-199)
    frames = max(int(sample_config.frames or 1), 1)
    frames = ((frames - 1) // 4) * 4 + 1
    if rng is None:
        from onetrainer_tpu.sampling.sd_sampler import sample_rng_for
        rng = sample_rng_for(sample_config)

    tokens = tokenizer(sample_config.prompt)[None]
    mask = tokenizer.mask(tokens[0])[None]
    out = model.text_encoder.apply(
        as_variables(te_params), jnp.asarray(tokens), jnp.asarray(mask),
        extra_embeddings)
    states = encode_llama_text(out, 0, default_layer=-3,
                               crop_start=PROMPT_TEMPLATE_CROP_START)
    mask_c = jnp.asarray(mask)[:, PROMPT_TEMPLATE_CROP_START:]
    out2 = model.text_encoder_2.apply(
        as_variables(te2_params), jnp.asarray(tokenizer_2(sample_config.prompt))[None])
    pooled = out2["pooled_output"]

    scale = model.vae_config.spatial_scale
    t_latent = (frames - 1) // model.vae_config.temporal_compression + 1
    rng, noise_rng = jax.random.split(rng)
    latents = jax.random.normal(
        noise_rng, (1, t_latent, height // scale, width // scale,
                    model.vae_config.latent_channels), jnp.float32)

    guidance = jnp.asarray([sample_config.cfg_scale * 1000.0], jnp.float32)

    @jax.jit
    def velocity(transformer_params, latents, t):
        return model.transformer.apply(
            as_variables(transformer_params), latents,
            jnp.full((1,), t, jnp.float32), states, mask_c, pooled, guidance)

    sigmas = np.linspace(1.0, 0.0, steps + 1)
    for i in range(steps):
        v = velocity(transformer_params, latents, sigmas[i] * 1000.0)
        latents = latents - (sigmas[i] - sigmas[i + 1]) * v
        if on_update_progress:
            on_update_progress(i + 1, steps)

    video = model.vae.apply(
        {"params": vae_params}, latents / model.vae_config.scaling_factor,
        method=model.vae.decode)
    video = np.asarray(jnp.clip(video[0] * 0.5 + 0.5, 0, 1))
    frames_u8 = (video * 255).astype(np.uint8)        # [T, H, W, 3]
    # first frame as the image preview; full stack in .video
    out = SamplerOutput(image=frames_u8[0])
    out.video = frames_u8
    return out


def write_video(path: str, frames: np.ndarray, fps: float = 24.0) -> None:
    """[T, H, W, 3] uint8 -> mp4 (reference: BaseModelSampler.save video
    path, :79-99)."""
    import cv2
    t, h, w, _ = frames.shape
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
