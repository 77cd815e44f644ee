"""Würstchen v2 / Stable Cascade sampler.

Stage 1 (the trained component) runs the full prior denoising loop with
CFG + cfg_rescale under the continuous cosine DDPM schedule
(reference: modules/modelSampler/WuerstchenSampler.py:35-155,
DDPMWuerstchenScheduler semantics re-derived from the same warped ᾱ as
training). Stage 2 (v2: DiffNeXt decoder + Paella VQGAN,
models/diffnext.py + models/paella_vq.py) reconstructs pixels when a
decoder repo is loaded (config.decoder.model_name); otherwise — and for
Stable Cascade, whose stage-B UNet is not implemented yet — a linear
latent→RGB projection (the reference debug-mixin visualization) stands in
so in-training sampling still produces an inspectable image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.peft.lora import as_variables
from onetrainer_tpu.sampling.sd_sampler import SamplerOutput
from onetrainer_tpu.train.wuerstchen_train_step import wuerstchen_alpha_cumprod


def _encode_prompt(model, te_params, tokenize, text, extra_embeddings,
                   layer_skip: int, with_pooled: bool = False):
    from onetrainer_tpu.models.clip import (
        apply_final_layer_norm, encode_clip_text,
    )
    tokens = jnp.asarray(tokenize(text))[None]
    out = model.text_encoder.apply(
        as_variables(te_params), tokens, None, extra_embeddings)
    hidden = encode_clip_text(out, layer_skip)
    if with_pooled:
        # Cascade: raw hidden state + pooled output
        # (reference: WuerstchenModel.encode_text:249-251)
        return hidden, out["pooled_output"]
    return apply_final_layer_norm(te_params, hidden)


def sample_wuerstchen(
        model,
        prior_params: dict,
        te_params: dict,
        tokenize,
        sample_config: SampleConfig,
        extra_embeddings=None,
        rng: jax.Array | None = None,
        on_update_progress=None,
) -> SamplerOutput:
    steps = sample_config.diffusion_steps
    cfg_scale = sample_config.cfg_scale
    cfg_rescale = getattr(sample_config, "cfg_rescale", 0.0) or 0.0
    height, width = sample_config.height, sample_config.width
    if rng is None:
        from onetrainer_tpu.sampling.sd_sampler import sample_rng_for
        rng = sample_rng_for(sample_config)

    layer_skip = getattr(sample_config, "text_encoder_1_layer_skip", 0) or 0
    is_cascade = model.model_type.is_stable_cascade()
    pooled = None
    if is_cascade:
        pos, pos_pooled = _encode_prompt(
            model, te_params, tokenize, sample_config.prompt,
            extra_embeddings, layer_skip, with_pooled=True)
        neg, neg_pooled = _encode_prompt(
            model, te_params, tokenize, sample_config.negative_prompt or "",
            extra_embeddings, layer_skip, with_pooled=True)
        pooled = jnp.concatenate([neg_pooled, pos_pooled], axis=0)
    else:
        pos = _encode_prompt(model, te_params, tokenize, sample_config.prompt,
                             extra_embeddings, layer_skip)
        neg = _encode_prompt(model, te_params, tokenize,
                             sample_config.negative_prompt or "",
                             extra_embeddings, layer_skip)
    context = jnp.concatenate([neg, pos], axis=0)

    # latent grid: width*0.75/32 (reference: WuerstchenSampler.py:79-87)
    lh = int((height * 0.75) / 32.0)
    lw = int((width * 0.75) / 32.0)
    rng, noise_rng = jax.random.split(rng)
    latent = jax.random.normal(noise_rng, (1, lh, lw, 16), jnp.float32)

    if is_cascade:
        # clip_text_pooled + zero clip_img, like training
        # (reference: WuerstchenSampler.py:110-116 cascade prior_kwargs)
        prior_apply = jax.jit(lambda p, x, t, c: model.prior.apply(
            as_variables(p), x, t, c, pooled, None))
    else:
        prior_apply = jax.jit(lambda p, x, t, c: model.prior.apply(
            as_variables(p), x, t, c))

    # linspace(1, 0, steps+1): denoise t_i -> t_{i+1}
    ts = np.linspace(1.0, 0.0, steps + 1)
    for i in range(steps):
        t = jnp.full((2,), ts[i], jnp.float32)
        x_in = jnp.concatenate([latent, latent], axis=0)
        pred = prior_apply(prior_params, x_in, t, context)
        pred_neg, pred_pos = jnp.split(pred, 2, axis=0)
        noise_pred = pred_neg + cfg_scale * (pred_pos - pred_neg)
        if cfg_rescale > 0.0:
            std_pos = jnp.std(pred_pos, axis=tuple(range(1, pred_pos.ndim)),
                              keepdims=True)
            std_pred = jnp.std(noise_pred, axis=tuple(range(1, noise_pred.ndim)),
                               keepdims=True)
            rescaled = noise_pred * (std_pos / jnp.maximum(std_pred, 1e-8))
            noise_pred = cfg_rescale * rescaled + (1 - cfg_rescale) * noise_pred

        # DDPM-Würstchen update under the warped cosine ᾱ
        ac = wuerstchen_alpha_cumprod(jnp.asarray([ts[i]]))
        ac_prev = wuerstchen_alpha_cumprod(jnp.asarray([ts[i + 1]])) \
            if ts[i + 1] > 0 else jnp.asarray([1.0])
        alpha = ac / ac_prev
        mu = (1.0 / jnp.sqrt(alpha)) * (
            latent - (1 - alpha) * noise_pred / jnp.sqrt(1 - ac))
        if i + 1 < steps:
            rng, step_rng = jax.random.split(rng)
            var = (1 - alpha) * (1 - ac_prev) / (1 - ac)
            mu = mu + jnp.sqrt(var) * jax.random.normal(
                step_rng, mu.shape, mu.dtype)
        latent = mu
        if on_update_progress:
            on_update_progress(i + 1, steps)

    if model.model_type.is_wuerstchen_v2():
        latent = latent * 42.0 - 1.0

    if model.model_type.is_wuerstchen_v2() and \
            model.decoder_params is not None and \
            model.vqgan_params is not None:
        img = _decode_stage(model, latent, te_params, tokenize,
                            sample_config, extra_embeddings, rng,
                            on_update_progress)
        return SamplerOutput(image=img)

    # stand-in decode (no decoder repo loaded, or Cascade stage B not yet
    # implemented): fixed linear projection of the 16ch latent to RGB,
    # upsampled to the requested size (reference debug visualization:
    # ModelSetupDebugMixin latent projection)
    lat = np.asarray(latent[0], np.float32)
    rng_proj = np.random.default_rng(0)
    proj = rng_proj.standard_normal((lat.shape[-1], 3)).astype(np.float32)
    proj /= np.linalg.norm(proj, axis=0, keepdims=True)
    img = lat @ proj
    img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
    img = jax.image.resize(jnp.asarray(img), (height, width, 3), "nearest")
    return SamplerOutput(image=(np.asarray(img) * 255).astype(np.uint8))


def _decode_stage(model, image_embedding, prior_te_params, tokenize,
                  sample_config, extra_embeddings, rng,
                  on_update_progress=None) -> np.ndarray:
    """Stage B + A: DiffNeXt denoises a 4ch latent at H/4 over 10 fixed
    steps (no CFG) conditioned on the prior output + decoder-CLIP states,
    then the Paella VQGAN decodes `scale_factor * latents` to pixels
    (reference: WuerstchenSampler.__sample_decoder:156-262 and
    __sample_base:334-338)."""
    height, width = sample_config.height, sample_config.width
    layer_skip = getattr(sample_config, "text_encoder_1_layer_skip", 0) or 0

    # decoder prompt conditioning: v2 uses the decoder repo's own CLIP TE;
    # Cascade reuses the prior TE's pooled embedding
    if model.model_type.is_wuerstchen_v2() and \
            model.decoder_te_params is not None:
        te_params = model.decoder_te_params
        tok = model.decoder_tokenizer or tokenize
        clip_states = _encode_prompt(
            WuerstchenDecoderTE(model), te_params, tok,
            sample_config.prompt, None, layer_skip)
    else:
        clip_states = _encode_prompt(model, prior_te_params, tokenize,
                                     sample_config.prompt,
                                     extra_embeddings, layer_skip)

    decoder_apply = jax.jit(lambda p, x, t, eff, clip: model.decoder.apply(
        as_variables(p), x, t, eff, clip))

    steps = 10   # reference: decoder_noise_scheduler.set_timesteps(10)
    lh, lw = height // 4, width // 4
    rng, noise_rng = jax.random.split(rng)
    latent = jax.random.normal(noise_rng, (1, lh, lw, 4), jnp.float32)

    ts = np.linspace(1.0, 0.0, steps + 1)
    for i in range(steps):
        t = jnp.full((1,), ts[i], jnp.float32)
        noise_pred = decoder_apply(model.decoder_params, latent, t,
                                   image_embedding.astype(jnp.float32),
                                   clip_states)
        # plain cosine DDPM-Würstchen update (decoder scheduler: no warp)
        ac = wuerstchen_alpha_cumprod(jnp.asarray([ts[i]]))
        ac_prev = wuerstchen_alpha_cumprod(jnp.asarray([ts[i + 1]])) \
            if ts[i + 1] > 0 else jnp.asarray([1.0])
        alpha = ac / ac_prev
        mu = (1.0 / jnp.sqrt(alpha)) * (
            latent - (1 - alpha) * noise_pred / jnp.sqrt(1 - ac))
        if i + 1 < steps:
            rng, step_rng = jax.random.split(rng)
            var = (1 - alpha) * (1 - ac_prev) / (1 - ac)
            mu = mu + jnp.sqrt(var) * jax.random.normal(
                step_rng, mu.shape, mu.dtype)
        latent = mu
        if on_update_progress:
            on_update_progress(i + 1, steps)

    vq_decode = jax.jit(lambda p, z: model.vqgan_decoder.apply(
        {"params": p}, z))
    scale = getattr(model.vqgan_config, "scale_factor", 0.3764)
    image = vq_decode(model.vqgan_params, latent * scale)
    image = jnp.clip(image[0], 0.0, 1.0)
    return np.asarray(
        jnp.round(image.astype(jnp.float32) * 255)).astype(np.uint8)


class WuerstchenDecoderTE:
    """Adapter giving _encode_prompt the decoder-stage text encoder."""

    def __init__(self, model):
        self.text_encoder = model.decoder_text_encoder
