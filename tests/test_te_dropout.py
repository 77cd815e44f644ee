"""Per-TE conditioning dropout (reference parity).

The reference zeroes each sample's text-encoder output with probability
``config.text_encoder*.dropout_probability`` inside every family's
encode_text — cached or live (e.g. StableDiffusionModel.py:226-231,
StableDiffusionXLModel.py:273-284, StableDiffusion3Model.py:397-415,
FluxModel.py:286-296, HiDreamModel.py:445-470). These tests drive the
jax equivalents with p=0/p=1 determinism plus a rate check on the mask.
"""
import dataclasses
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.train.sd_train_step import (
    SDStepConfig,
    conditioning_dropout_mask,
)


def _cfg(**dropouts):
    config = TrainConfig.default_values()
    base = SDStepConfig.from_train_config(config)
    return dataclasses.replace(base, train_text_encoder=False, **dropouts)


def test_mask_rate_and_extremes():
    rng = jax.random.PRNGKey(0)
    m = conditioning_dropout_mask(rng, 20_000, 0.3)
    assert abs(float(m.mean()) - 0.7) < 0.02
    assert float(conditioning_dropout_mask(rng, 64, 0.0).min()) == 1.0
    assert float(conditioning_dropout_mask(rng, 64, 1.0).max()) == 0.0


def test_from_train_config_maps_part_dropouts():
    config = TrainConfig.default_values()
    config.text_encoder.dropout_probability = 0.1
    config.text_encoder_2.dropout_probability = 0.2
    config.text_encoder_3.dropout_probability = 0.3
    config.text_encoder_4.dropout_probability = 0.4
    cfg = SDStepConfig.from_train_config(config)
    assert (cfg.te_dropout, cfg.te2_dropout, cfg.te3_dropout,
            cfg.te4_dropout) == (0.1, 0.2, 0.3, 0.4)


def test_sdxl_per_te_masks_cached_path():
    from onetrainer_tpu.train.sdxl_train_step import sdxl_text_conditioning
    b, s = 4, 7
    batch = {
        "text_encoder_hidden_state": jnp.ones((b, s, 768)),
        "text_encoder_2_hidden_state": jnp.ones((b, s, 1280)),
        "text_encoder_2_pooled_state": jnp.ones((b, 1280)),
    }
    rng = jax.random.PRNGKey(1)
    # TE1 dropped, TE2 kept: first 768 channels zero, rest + pooled intact
    cfg = _cfg(te_dropout=1.0, te2_dropout=0.0)
    context, pooled = sdxl_text_conditioning(
        None, None, None, batch, 0, cfg=cfg, dropout_rng=rng)
    assert float(jnp.abs(context[..., :768]).max()) == 0.0
    assert float(context[..., 768:].min()) == 1.0
    assert float(pooled.min()) == 1.0
    # TE2 dropped: its sequence AND pooled share the mask
    cfg = _cfg(te_dropout=0.0, te2_dropout=1.0)
    context, pooled = sdxl_text_conditioning(
        None, None, None, batch, 0, cfg=cfg, dropout_rng=rng)
    assert float(context[..., :768].min()) == 1.0
    assert float(jnp.abs(context[..., 768:]).max()) == 0.0
    assert float(jnp.abs(pooled).max()) == 0.0
    # no dropout_rng -> untouched (sampling/cache-fill path)
    context, pooled = sdxl_text_conditioning(
        None, None, None, batch, 0, cfg=cfg, dropout_rng=None)
    assert float(context.min()) == 1.0


def test_sd3_cached_layout_slices():
    from onetrainer_tpu.train.sd3_train_step import sd3_conditioning
    b, clip_len, t5_len = 3, 5, 9
    l_dim, g_dim, width = 8, 16, 32
    model = SimpleNamespace(te_config=SimpleNamespace(hidden_size=l_dim),
                            te2_config=SimpleNamespace(hidden_size=g_dim))
    batch = {
        "sd3_context": jnp.ones((b, clip_len + t5_len, width)),
        "sd3_pooled": jnp.ones((b, l_dim + g_dim)),
        "tokens": jnp.zeros((b, clip_len), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)
    cfg = _cfg(te_dropout=1.0, te2_dropout=0.0, te3_dropout=1.0)
    context, pooled = sd3_conditioning(
        model, None, None, None, batch, 0, cfg=cfg, dropout_rng=rng)
    clip, t5 = context[:, :clip_len], context[:, clip_len:]
    assert float(jnp.abs(clip[..., :l_dim]).max()) == 0.0          # TE1 seq
    assert float(clip[..., l_dim:l_dim + g_dim].min()) == 1.0      # TE2 kept
    assert float(clip[..., l_dim + g_dim:].min()) == 1.0           # pad rows
    assert float(jnp.abs(t5).max()) == 0.0                         # TE3 seq
    assert float(jnp.abs(pooled[:, :l_dim]).max()) == 0.0          # TE1 pool
    assert float(pooled[:, l_dim:].min()) == 1.0                   # TE2 pool


def test_sd_predict_context_dropout_zeroes_conditioning():
    # With p=1, the UNet sees zero conditioning: sd_predict must equal a
    # run whose cached context is zeroed by hand (p=0).
    from tests.test_train_step import init_model_params, tiny_sd_model
    from onetrainer_tpu.train.sd_train_step import sd_predict

    model = tiny_sd_model()
    unet_params, _ = init_model_params(model, jax.random.PRNGKey(0))
    b, s, d = 2, 7, model.te_config.hidden_size
    rng = jax.random.PRNGKey(3)
    batch = {
        "latent_image": jax.random.normal(jax.random.PRNGKey(4), (b, 16, 16, 4)),
        "text_encoder_hidden_state":
            jax.random.normal(jax.random.PRNGKey(5), (b, s, d)),
    }
    coeff = model.coefficients()
    cfg_drop = _cfg(te_dropout=1.0)
    data_drop, _ = sd_predict(
        model.unet.apply, model.text_encoder.apply, unet_params, None,
        batch, rng, cfg_drop, coeff, deterministic=True)
    cfg_zero = _cfg(te_dropout=0.0)
    zero_batch = dict(batch, text_encoder_hidden_state=jnp.zeros((b, s, d)))
    data_zero, _ = sd_predict(
        model.unet.apply, model.text_encoder.apply, unet_params, None,
        zero_batch, rng, cfg_zero, coeff, deterministic=True)
    np.testing.assert_allclose(np.asarray(data_drop["predicted"]),
                               np.asarray(data_zero["predicted"]),
                               rtol=1e-5, atol=1e-6)
    # and p=0 differs from zeroed conditioning (the mask actually gates)
    data_keep, _ = sd_predict(
        model.unet.apply, model.text_encoder.apply, unet_params, None,
        batch, rng, cfg_zero, coeff, deterministic=True)
    assert not np.allclose(np.asarray(data_keep["predicted"]),
                           np.asarray(data_zero["predicted"]))


def test_hidream_cached_per_te_masks():
    from onetrainer_tpu.train.hidream_train_step import (
        hidream_text_conditioning,
    )
    b, s, layers = 2, 5, 3
    batch = {
        "text_encoder_1_pooled_state": jnp.ones((b, 4)),
        "text_encoder_2_pooled_state": jnp.ones((b, 6)),
        "text_encoder_3_hidden_state": jnp.ones((b, s, 8)),
        "text_encoder_4_hidden_state": jnp.ones((b, layers, s, 8)),
    }
    rng = jax.random.PRNGKey(6)
    t5, llama, pooled = hidream_text_conditioning(
        None, None, None, None, None, batch, dropout_rng=rng,
        te_dropouts=(1.0, 0.0, 0.0, 1.0))
    assert float(jnp.abs(pooled[:, :4]).max()) == 0.0   # TE1 pooled dropped
    assert float(pooled[:, 4:].min()) == 1.0            # TE2 pooled kept
    assert float(t5.min()) == 1.0                       # TE3 kept
    assert llama.shape == (layers, b, s, 8)
    assert float(jnp.abs(llama).max()) == 0.0           # TE4 stacked dropped
