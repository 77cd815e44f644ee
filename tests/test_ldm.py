import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.ldm import (
    convert_hf_to_openclip, convert_openclip_to_hf,
    convert_unet_diffusers_to_ldm, convert_unet_ldm_to_diffusers,
    convert_vae_diffusers_to_ldm, convert_vae_ldm_to_diffusers,
    merge_sd15_single_file, split_sd15_single_file,
)
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, unet_flax_to_state_dict, vae_flax_to_state_dict,
)


def _tiny_unet_sd():
    from tests.test_models import tiny_unet_config
    from onetrainer_tpu.models.unet import UNet2DCondition
    cfg = tiny_unet_config()
    params = UNet2DCondition(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.asarray([1]),
        jnp.zeros((1, 8, 32)))["params"]
    return unet_flax_to_state_dict(jax.device_get(params))


def _tiny_vae_sd():
    from tests.test_models import tiny_vae_config
    from onetrainer_tpu.models.vae import AutoencoderKL
    cfg = tiny_vae_config()
    rng = jax.random.PRNGKey(0)
    params = AutoencoderKL(cfg).init(rng, jnp.zeros((1, 32, 32, 3)), rng)["params"]
    return vae_flax_to_state_dict(jax.device_get(params))


def _tiny_te_sd():
    from tests.test_models import tiny_clip_config
    from onetrainer_tpu.models.clip import CLIPTextModel
    params = CLIPTextModel(tiny_clip_config()).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]
    return clip_flax_to_state_dict(jax.device_get(params))


UNET_KW = dict(num_blocks=2, layers_per_block=1, attn_blocks=(True, False))
VAE_KW = dict(num_blocks=2, layers_per_block=1)


def test_unet_ldm_roundtrip():
    sd = _tiny_unet_sd()
    ldm = convert_unet_diffusers_to_ldm(sd, **UNET_KW)
    assert all(k.startswith("model.diffusion_model.") for k in ldm)
    assert "model.diffusion_model.time_embed.0.weight" in ldm
    assert "model.diffusion_model.input_blocks.0.0.weight" in ldm
    assert "model.diffusion_model.input_blocks.1.0.in_layers.2.weight" in ldm
    back = convert_unet_ldm_to_diffusers(ldm, **UNET_KW)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_vae_ldm_roundtrip():
    sd = _tiny_vae_sd()
    ldm = convert_vae_diffusers_to_ldm(sd, **VAE_KW)
    assert "first_stage_model.encoder.down.0.block.0.norm1.weight" in ldm
    assert "first_stage_model.decoder.mid.attn_1.q.weight" in ldm
    # ldm attention weights are 1x1 convs
    assert ldm["first_stage_model.decoder.mid.attn_1.q.weight"].ndim == 4
    back = convert_vae_ldm_to_diffusers(ldm, **VAE_KW)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_openclip_roundtrip():
    sd = _tiny_te_sd()
    oc = convert_hf_to_openclip(sd, "cond_stage_model.model.")
    assert "cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight" in oc
    assert oc["cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight"].shape[0] == 3 * 32
    back = convert_openclip_to_hf(oc, "cond_stage_model.model.")
    skip = {"text_model.embeddings.position_ids"}
    for k in sd:
        if k in skip:
            continue
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_sd15_single_file_split_merge():
    unet, vae, te = _tiny_unet_sd(), _tiny_vae_sd(), _tiny_te_sd()
    # merge uses full-size key maps; use tiny maps directly for structure
    merged = {}
    merged.update(convert_unet_diffusers_to_ldm(unet, **UNET_KW))
    merged.update(convert_vae_diffusers_to_ldm(vae, **VAE_KW))
    for k, v in te.items():
        merged["cond_stage_model.transformer." + k] = v
    split = {
        "unet": convert_unet_ldm_to_diffusers(merged, **UNET_KW),
        "vae": convert_vae_ldm_to_diffusers(merged, **VAE_KW),
        "text_encoder": {k[len("cond_stage_model.transformer."):]: v
                         for k, v in merged.items()
                         if k.startswith("cond_stage_model.transformer.")},
    }
    for k in unet:
        np.testing.assert_array_equal(split["unet"][k], unet[k], err_msg=k)
    for k in vae:
        np.testing.assert_array_equal(split["vae"][k], vae[k], err_msg=k)
    for k in te:
        np.testing.assert_array_equal(split["text_encoder"][k], te[k], err_msg=k)
