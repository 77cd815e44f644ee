"""Single-file conversion round trips for SD3 / FLUX / PixArt
(reference key tables: modules/util/convert/convert_{sd3,flux,pixart}_
diffusers_to_ckpt.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.single_file import (
    flux_bfl_to_transformer, flux_transformer_to_bfl,
    pixart_ckpt_to_transformer, pixart_transformer_to_ckpt,
    sd3_sai_to_transformer, sd3_transformer_to_sai,
)
from onetrainer_tpu.io.torch_flax import unet_flax_to_state_dict
from tests.test_flux import tiny_flux_model
from tests.test_pixart import tiny_pixart_model
from tests.test_sd3 import tiny_sd3_model


def _assert_roundtrip(sd, forward, inverse, dropped=()):
    converted = forward(sd)
    back = inverse(converted)
    missing = set(sd) - set(back) - set(dropped)
    extra = set(back) - set(sd)
    assert not missing, f"lost keys: {sorted(missing)[:5]}"
    assert not extra, f"invented keys: {sorted(extra)[:5]}"
    for key in back:
        np.testing.assert_allclose(
            np.asarray(back[key]), np.asarray(sd[key]), atol=0,
            err_msg=key)
    return converted


def test_flux_bfl_roundtrip():
    from onetrainer_tpu.models.flux import prepare_latent_image_ids
    model = tiny_flux_model()
    rng = jax.random.PRNGKey(0)
    h = w = 8
    params = model.transformer.init(
        rng, jnp.zeros((1, (h // 2) * (w // 2), 16)), jnp.asarray([0.5]),
        jnp.zeros((1, 20)), jnp.zeros((1, 6, 24)),
        prepare_latent_image_ids(h, w))["params"]
    sd = unet_flax_to_state_dict(jax.device_get(params))
    converted = _assert_roundtrip(sd, flux_transformer_to_bfl,
                                  flux_bfl_to_transformer)
    assert any(k.startswith("double_blocks.0.img_attn.qkv") for k in converted)
    assert any(k.startswith("single_blocks.0.linear1") for k in converted)
    assert "img_in.weight" in converted


def test_sd3_sai_roundtrip():
    model = tiny_sd3_model()
    rng = jax.random.PRNGKey(0)
    params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([500.0]),
        jnp.zeros((1, 16)), jnp.zeros((1, 6, 24)))["params"]
    sd = unet_flax_to_state_dict(jax.device_get(params))
    converted = _assert_roundtrip(sd, sd3_transformer_to_sai,
                                  sd3_sai_to_transformer)
    assert any(k.startswith("joint_blocks.0.x_block.attn.qkv")
               for k in converted)
    assert "final_layer.adaLN_modulation.1.weight" in converted


def test_pixart_ckpt_roundtrip():
    model = tiny_pixart_model()
    rng = jax.random.PRNGKey(0)
    params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([1]),
        jnp.zeros((1, 6, 24)))["params"]
    sd = unet_flax_to_state_dict(jax.device_get(params))
    converted = _assert_roundtrip(sd, pixart_transformer_to_ckpt,
                                  pixart_ckpt_to_transformer)
    assert any(k.startswith("blocks.0.attn.qkv") for k in converted)
    assert "final_layer.scale_shift_table" in converted
