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


# -- full single-file loader round trips ----------------------------------------------

def test_load_flux_single_file(tmp_path):
    """Save a BFL-layout single file, load it back through the single-file
    loader (reference: FluxModelLoader.__load_safetensors)."""
    from onetrainer_tpu.io.safetensors_io import save_safetensors
    from onetrainer_tpu.io.single_file import load_flux_single_file
    from onetrainer_tpu.models.flux import prepare_latent_image_ids

    model = tiny_flux_model()
    rng = jax.random.PRNGKey(0)
    h = w = 8
    params = model.transformer.init(
        rng, jnp.zeros((1, (h // 2) * (w // 2), 16)), jnp.asarray([0.5]),
        jnp.zeros((1, 20)), jnp.zeros((1, 6, 24)),
        prepare_latent_image_ids(h, w))["params"]
    sd = flux_transformer_to_bfl(unet_flax_to_state_dict(
        jax.device_get(params)))
    path = str(tmp_path / "flux.safetensors")
    save_safetensors(path, {k: np.asarray(v) for k, v in sd.items()})

    loaded = load_flux_single_file(path, compute_dtype=jnp.float32,
                                   device=False)
    cfg = loaded["transformer_config"]
    assert cfg.num_layers == model.transformer_config.num_layers
    assert cfg.num_single_layers == model.transformer_config.num_single_layers
    assert cfg.guidance_embeds == model.transformer_config.guidance_embeds
    a = jax.tree.leaves(jax.device_get(params))
    b = jax.tree.leaves(loaded["transformer_params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert loaded["vae_params"] is None           # not bundled
    assert loaded["te2_params"] is None


def test_load_sd3_single_file_with_components(tmp_path):
    """SAI layout with MMDiT + VAE + all 3 TEs: every component loads
    (reference: StableDiffusion3ModelLoader safetensors path)."""
    from onetrainer_tpu.io.ldm import convert_vae_diffusers_to_ldm
    from onetrainer_tpu.io.safetensors_io import save_safetensors
    from onetrainer_tpu.io.single_file import load_sd3_single_file
    from onetrainer_tpu.io.torch_flax import (
        clip_flax_to_state_dict, t5_flax_to_state_dict,
        vae_flax_to_state_dict,
    )

    model = tiny_sd3_model()
    rng = jax.random.PRNGKey(0)
    tparams = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([500.0]),
        jnp.zeros((1, 16)), jnp.zeros((1, 6, 24)))["params"]
    vae_params = model.vae.init(rng, jnp.zeros((1, 16, 16, 3)),
                                jax.random.PRNGKey(1))["params"]
    te_params = model.text_encoder.init(
        rng, jnp.zeros((1, 6), jnp.int32))["params"]
    te3_params = model.text_encoder_3.init(
        rng, jnp.zeros((1, 6), jnp.int32))["params"]

    sd = {}
    sd.update({f"model.diffusion_model.{k}": v for k, v in
               sd3_transformer_to_sai(unet_flax_to_state_dict(
                   jax.device_get(tparams))).items()})
    sd.update({f"first_stage_model.{k}": v for k, v in
               convert_vae_diffusers_to_ldm(vae_flax_to_state_dict(
                   jax.device_get(vae_params)), num_blocks=2,
                   layers_per_block=1).items()})
    sd.update({f"text_encoders.clip_l.transformer.{k}": v for k, v in
               clip_flax_to_state_dict(jax.device_get(te_params)).items()})
    sd.update({f"text_encoders.t5xxl.transformer.{k}": v for k, v in
               t5_flax_to_state_dict(jax.device_get(te3_params)).items()})
    path = str(tmp_path / "sd3.safetensors")
    save_safetensors(path, {k: np.asarray(v) for k, v in sd.items()})

    loaded = load_sd3_single_file(path, compute_dtype=jnp.float32,
                                  device=False)
    assert loaded["transformer_config"].num_layers == \
        model.transformer_config.num_layers
    for mine, theirs in [(tparams, loaded["transformer_params"]),
                         (vae_params, loaded["vae_params"]),
                         (te_params, loaded["te_params"]),
                         (te3_params, loaded["te3_params"])]:
        a = jax.tree.leaves(jax.device_get(mine))
        b = jax.tree.leaves(theirs)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert loaded["te2_params"] is None     # clip_g not bundled
    # inferred TE config matches the saved tiny shapes
    assert loaded["te_config"].hidden_size == 6
    assert loaded["te_config"].num_layers == 2


def test_load_pixart_single_file(tmp_path):
    from onetrainer_tpu.io.safetensors_io import save_safetensors
    from onetrainer_tpu.io.single_file import load_pixart_single_file

    model = tiny_pixart_model()
    rng = jax.random.PRNGKey(0)
    params = model.transformer.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([1]),
        jnp.zeros((1, 6, 24)))["params"]
    sd = pixart_transformer_to_ckpt(unet_flax_to_state_dict(
        jax.device_get(params)))
    path = str(tmp_path / "pixart.safetensors")
    save_safetensors(path, {k: np.asarray(v) for k, v in sd.items()})

    loaded = load_pixart_single_file(path, compute_dtype=jnp.float32,
                                     device=False)
    assert loaded["transformer_config"].num_layers == \
        model.transformer_config.num_layers
    a = jax.tree.leaves(jax.device_get(params))
    b = jax.tree.leaves(loaded["transformer_params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# -- HunyuanVideo / Stable Cascade ckpt round trips ------------------------------------

def test_hunyuan_ckpt_roundtrip():
    from onetrainer_tpu.io.hunyuan_checkpoints import hunyuan_flax_to_state_dict
    from onetrainer_tpu.io.single_file import (
        hunyuan_ckpt_to_transformer, hunyuan_transformer_to_ckpt,
    )
    from tests.test_trainer_hunyuan import tiny_hunyuan_model

    model = tiny_hunyuan_model()
    rng = jax.random.PRNGKey(0)
    params = model.transformer.init(
        rng, jnp.zeros((1, 2, 4, 4, 16)), jnp.asarray([500.0]),
        jnp.zeros((1, 5, 24)), jnp.ones((1, 5), jnp.int32),
        jnp.zeros((1, 16)))["params"]
    sd = hunyuan_flax_to_state_dict(jax.device_get(params))
    converted = _assert_roundtrip(
        sd, hunyuan_transformer_to_ckpt, hunyuan_ckpt_to_transformer)
    assert any(k.startswith("model.model.double_blocks.0.img_attn.qkv")
               for k in converted)
    assert any(k.startswith("model.model.single_blocks.0.linear1")
               for k in converted)
    assert any(k.startswith(
        "model.model.txt_in.individual_token_refiner.blocks.0.self_attn.qkv")
        for k in converted)


def test_cascade_ckpt_roundtrip():
    from onetrainer_tpu.io.single_file import (
        cascade_ckpt_to_prior, cascade_prior_to_ckpt,
    )
    from onetrainer_tpu.io.wuerstchen_checkpoints import (
        prior_flax_to_state_dict,
    )
    from onetrainer_tpu.models.cascade import StableCascadePrior, CascadePriorConfig

    cfg = CascadePriorConfig(
        c_in=16, c_hidden=(32, 48), nhead=(4, 4), blocks=(1, 1),
        c_cond=32, clip_text_in=24, clip_text_pooled_in=24,
        clip_image_in=16, dtype=jnp.float32)
    prior = StableCascadePrior(cfg)
    rng = jax.random.PRNGKey(0)
    params = prior.init(
        rng, jnp.zeros((1, 8, 8, 16)), jnp.asarray([0.5]),
        jnp.zeros((1, 6, 24)), jnp.zeros((1, 24)), None)["params"]
    sd = prior_flax_to_state_dict(jax.device_get(params))
    converted = _assert_roundtrip(
        sd, cascade_prior_to_ckpt, cascade_ckpt_to_prior)
    assert any(k.endswith(".attention.attn.in_proj_weight")
               for k in converted)
    assert any(k.endswith(".attention.attn.out_proj.weight")
               for k in converted)
    assert not any(".attention.to_q." in k for k in converted)


def test_hidream_single_file_save_roundtrip(tmp_path):
    """HiDream single-file export (reference saves the transformer
    state_dict as-is, HiDreamModelSaver.py:51-63) — VERDICT r2 row 51."""
    from types import SimpleNamespace

    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.io.hidream_checkpoints import hidream_state_dict_to_flax
    from onetrainer_tpu.io.safetensors_io import load_safetensors
    from onetrainer_tpu.setup.families import _hidream_save_single_file
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod
    from tests.test_trainer_hidream import tiny_hidream_model

    model = tiny_hidream_model()
    rng = jax.random.PRNGKey(0)
    c = model.transformer_config
    params = model.transformer.init(
        rng, jnp.zeros((1, 16, c.in_channels)), jnp.asarray([500.0]),
        jnp.zeros((1, 5, c.t5_dim)),
        jnp.zeros((c.num_layers + c.num_single_layers + 1, 1, 5, c.llama_dim)),
        jnp.zeros((1, c.pooled_dim)), jnp.zeros((16, 3)))["params"]

    config = TrainConfig.default_values()
    config.model_type = ModelType.HI_DREAM_FULL
    config.training_method = TrainingMethod.FINE_TUNE
    setup = SimpleNamespace(
        config=config,
        merged_inference_params=lambda: (params, None, None, None, None, None))

    path = str(tmp_path / "hidream.safetensors")
    _hidream_save_single_file(setup, path)
    sd = load_safetensors(path)
    assert any("double_stream_blocks" in k for k in sd)
    back = hidream_state_dict_to_flax({k: np.asarray(v) for k, v in sd.items()})
    a = jax.tree.leaves(jax.device_get(params))
    b = jax.tree.leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_family_single_file_save_glue(tmp_path):
    """The families.py single-file save wrappers call the io conversions
    with device trees — regression for the _to_numpy_tree default-dtype
    contract (all DiT-family exports previously crashed on the missing
    dtype argument)."""
    from types import SimpleNamespace

    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.io.safetensors_io import load_safetensors
    from onetrainer_tpu.setup.families import _hunyuan_save_single_file
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod
    from tests.test_trainer_hunyuan import tiny_hunyuan_model

    model = tiny_hunyuan_model()
    params = model.transformer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 4, 4, 16)),
        jnp.asarray([500.0]), jnp.zeros((1, 5, 24)),
        jnp.ones((1, 5), jnp.int32), jnp.zeros((1, 16)))["params"]
    config = TrainConfig.default_values()
    config.model_type = ModelType.HUNYUAN_VIDEO
    config.training_method = TrainingMethod.FINE_TUNE
    setup = SimpleNamespace(
        config=config,
        merged_inference_params=lambda: (params, None, None, None))
    path = str(tmp_path / "hv.safetensors")
    _hunyuan_save_single_file(setup, path)
    sd = load_safetensors(path)
    assert any(k.startswith("model.model.") for k in sd)
