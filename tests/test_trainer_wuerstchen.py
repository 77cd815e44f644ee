"""Würstchen v2 end-to-end trainer run: continuous-timestep eps prediction
in EfficientNet latent space (reference: BaseWuerstchenSetup.py:183-270)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.torch_flax import clip_flax_to_state_dict
from onetrainer_tpu.io.wuerstchen_checkpoints import (
    effnet_flax_key_map, effnet_state_dict_to_flax, prior_flax_to_state_dict,
)
from onetrainer_tpu.io.torch_flax import flax_params_to_torch
from onetrainer_tpu.models.clip import CLIPTextConfig
from onetrainer_tpu.models.wuerstchen import (
    EffnetConfig, WuerstchenPriorConfig,
)
from onetrainer_tpu.models.wuerstchen_model import WuerstchenModel
from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
from onetrainer_tpu.util.enums import (
    EMAMode, ModelType, TimeUnit, TrainingMethod,
)
from tests.test_data import make_dataset


def tiny_wuerstchen_model():
    return WuerstchenModel(
        model_type=ModelType.WUERSTCHEN_2,
        prior_config=WuerstchenPriorConfig(
            c=48, c_cond=32, c_r=64, depth=2, nhead=4, dtype=jnp.float32),
        effnet_config=EffnetConfig(dtype=jnp.float32),
        te_config=CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, max_position_embeddings=16,
            eos_token_id=99, dtype=jnp.float32),
    )


def write_tiny_wuerstchen_checkpoint(base_dir, model):
    rng = jax.random.PRNGKey(0)
    prior_params = model.prior.init(
        rng, jnp.zeros((1, 4, 4, 16)), jnp.asarray([0.5]),
        jnp.zeros((1, 6, 32)))["params"]
    te = model.text_encoder.init(rng, jnp.zeros((1, 6), jnp.int32))["params"]

    def write(component, sd, config,
              weights_name="diffusion_pytorch_model.safetensors"):
        d = os.path.join(base_dir, component)
        os.makedirs(d, exist_ok=True)
        save_safetensors(os.path.join(d, weights_name),
                         {k: np.asarray(v) for k, v in sd.items()})
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config, f)

    write("prior", prior_flax_to_state_dict(jax.device_get(prior_params)), {
        "c_in": 16, "c": 48, "c_cond": 32, "c_r": 64, "depth": 2, "nhead": 4,
    })
    write("text_encoder", clip_flax_to_state_dict(jax.device_get(te)), {
        "vocab_size": 100, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 16, "eos_token_id": 99,
        "hidden_act": "gelu",
    }, weights_name="model.safetensors")

    # effnet: a real (tiny-weights) efficientnet_v2_s state dict
    effnet = WuerstchenModel(
        model_type=ModelType.WUERSTCHEN_2,
        prior_config=model.prior_config,
        effnet_config=model.effnet_config,
        te_config=model.te_config).effnet
    effnet_params = jax.jit(lambda r: effnet.init(
        r, jnp.zeros((1, 64, 64, 3))))(rng)["params"]
    sd = flax_params_to_torch(jax.device_get(effnet_params),
                              key_map=effnet_flax_key_map)
    effnet_path = os.path.join(base_dir, "effnet_encoder.safetensors")
    save_safetensors(effnet_path, {k: np.asarray(v) for k, v in sd.items()})
    return effnet_path


def test_effnet_key_roundtrip():
    model = tiny_wuerstchen_model()
    rng = jax.random.PRNGKey(0)
    effnet_params = jax.jit(lambda r: model.effnet.init(
        r, jnp.zeros((1, 64, 64, 3))))(rng)["params"]
    sd = flax_params_to_torch(jax.device_get(effnet_params),
                              key_map=effnet_flax_key_map)
    # torchvision-style keys present
    assert any(k.startswith("backbone.0.0.") for k in sd)
    assert any(".block.2.fc1." in k for k in sd)
    assert "mapper.0.weight" in sd
    back = effnet_state_dict_to_flax(sd)
    flat_a = jax.tree.leaves(jax.device_get(effnet_params))
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_wuerstchen_e2e_lora(tmp_path):
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_wuerstchen_model()
    effnet_path = write_tiny_wuerstchen_checkpoint(base, model)

    config = TrainConfig.default_values()
    config.model_type = ModelType.WUERSTCHEN_2
    config.training_method = TrainingMethod.LORA
    config.base_model_name = base
    config.effnet_encoder.model_name = effnet_path
    config.workspace_dir = str(tmp_path / "ws")
    config.cache_dir = str(tmp_path / "cache")
    config.epochs = 1
    config.batch_size = 2
    config.resolution = "128"
    config.aspect_ratio_bucketing = False
    config.lora_rank = 4
    config.lora_layers = "attention"
    config.learning_rate = 1e-3
    config.learning_rate_warmup_steps = 0.0
    config.tensorboard = False
    config.sample_after_unit = TimeUnit.NEVER
    config.backup_after_unit = TimeUnit.NEVER
    config.save_every_unit = TimeUnit.NEVER
    config.ema = EMAMode.OFF
    config.optimizer.stochastic_rounding = False
    config.prior.train = True
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_w2.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    # latent cache shape: 128px -> x0.75=96 -> /32 = 3x3x16
    batches = trainer.data_loader.batches_for_epoch(0)
    trainer.data_loader.ensure_cached(batches)
    batch = trainer.data_loader.materialize_batch(batches[0])
    assert batch["latent_image"].shape[1:] == (3, 3, 16)
    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 2
    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_prior_") for k in sd)


def test_stable_cascade_prior_step():
    """Cascade prior: +0.001 timestep warp, unscaled latents, pooled-text
    conditioning with zero clip_img (reference: BaseWuerstchenSetup.py:
    183-270 cascade branches)."""
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.cascade import CascadePriorConfig
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.train.wuerstchen_train_step import (
        make_wuerstchen_train_step, warp_timestep,
    )
    from onetrainer_tpu.util.enums import TrainingMethod

    # timestep warp semantics
    t = jnp.asarray([0.0, 0.5, 1.0])
    np.testing.assert_allclose(
        np.asarray(warp_timestep(t, ModelType.STABLE_CASCADE_1)),
        [0.001, 0.501, 1.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(warp_timestep(t, ModelType.WUERSTCHEN_2)),
        [0.001, 0.541, 1.0], atol=1e-6)

    model = WuerstchenModel(
        model_type=ModelType.STABLE_CASCADE_1,
        prior_config=CascadePriorConfig(
            c_in=16, c_hidden=(32, 48), nhead=(4, 4), blocks=(1, 1),
            c_cond=32, clip_text_in=24, clip_text_pooled_in=24,
            clip_image_in=16, dtype=jnp.float32),
        effnet_config=EffnetConfig(dtype=jnp.float32),
        te_config=CLIPTextConfig(
            vocab_size=100, hidden_size=24, intermediate_size=48,
            num_layers=2, num_heads=4, max_position_embeddings=16,
            eos_token_id=99, projection_dim=24, dtype=jnp.float32),
    )
    rng = jax.random.PRNGKey(0)
    prior_params = model.prior.init(
        rng, jnp.zeros((1, 8, 8, 16)), jnp.asarray([0.5]),
        jnp.zeros((1, 6, 24)), jnp.zeros((1, 24)), None)["params"]
    te_params = model.text_encoder.init(
        rng, jnp.zeros((1, 6), jnp.int32))["params"]

    peft_cfg = PeftConfig(rank=2, layer_filter=("attention",))
    adapters = init_peft_params(jax.random.PRNGKey(1), prior_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0), train_text_encoder=True,
        stochastic_rounding=False)
    tx = optax.adamw(1e-3)
    state = create_train_state({"prior_lora": adapters}, tx)
    step = make_wuerstchen_train_step(model, cfg, tx, peft_cfg)
    batch = {
        "latent_image": jax.random.normal(rng, (2, 8, 8, 16)),
        "loss_weight": jnp.ones((2,)),
        "tokens": jnp.tile(jnp.asarray([[1, 5, 7, 99, 0, 0]], jnp.int32), (2, 1)),
    }
    frozen = {"prior": prior_params, "text_encoder": te_params}
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


# -- stage B/A decode components ------------------------------------------------------

def _tiny_decoder_configs():
    from onetrainer_tpu.models.diffnext import DiffNeXtConfig
    from onetrainer_tpu.models.paella_vq import PaellaVQConfig
    dec = DiffNeXtConfig(
        c_hidden=(16, 32), nhead=(-1, 4), blocks=(1, 1),
        level_config=("CT", "CTA"), inject_effnet=(False, True),
        c_cond=16, clip_embd=32, c_r=16, effnet_embd=16, dtype=jnp.float32)
    vq = PaellaVQConfig(embed_dim=16, bottleneck_blocks=2,
                        dtype=jnp.float32)
    return dec, vq


def test_diffnext_key_roundtrip():
    """flax<->torch key naming matches the diffusers WuerstchenDiffNeXt
    layout (the contract that makes warp-ai/wuerstchen decoder weights
    load)."""
    from onetrainer_tpu.io.wuerstchen_checkpoints import (
        diffnext_state_dict_to_flax,
    )
    from onetrainer_tpu.models.diffnext import WuerstchenDiffNeXt

    dec_cfg, _ = _tiny_decoder_configs()
    m = WuerstchenDiffNeXt(dec_cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                    jnp.asarray([0.5]), jnp.zeros((1, 2, 2, 16)),
                    jnp.zeros((1, 5, 32)))["params"]
    sd = flax_params_to_torch(jax.device_get(params))
    assert "embedding.1.weight" in sd
    assert "clf.1.weight" in sd
    assert "clip_mapper.weight" in sd
    assert "effnet_mappers.1.weight" in sd          # injected down level
    assert "effnet_mappers.2.weight" in sd          # injected up level
    assert "down_blocks.1.0.1.weight" in sd         # downscaler conv
    assert "down_blocks.0.0.channelwise.0.weight" in sd
    assert "down_blocks.1.3.attention.to_q.weight" in sd
    assert "up_blocks.0.2.kv_mapper.1.weight" in sd
    assert "up_blocks.0.3.1.weight" in sd           # upscaler convtranspose
    back = diffnext_state_dict_to_flax(sd)
    a, b = jax.tree.leaves(jax.device_get(params)), jax.tree.leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_paella_vq_key_roundtrip():
    from onetrainer_tpu.io.wuerstchen_checkpoints import (
        paella_vq_state_dict_to_flax,
    )
    from onetrainer_tpu.models.paella_vq import PaellaVQDecoder

    _, vq_cfg = _tiny_decoder_configs()
    m = PaellaVQDecoder(vq_cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)))["params"]
    sd = flax_params_to_torch(jax.device_get(params))
    assert "up_blocks.0.0.weight" in sd
    assert "up_blocks.1.gammas" in sd
    assert "up_blocks.1.depthwise.1.weight" in sd
    assert "up_blocks.1.channelwise.2.gamma" in sd  # GRN
    assert "out_block.0.weight" in sd
    back = paella_vq_state_dict_to_flax(sd)
    a, b = jax.tree.leaves(jax.device_get(params)), jax.tree.leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_wuerstchen_two_stage_sampling():
    """Full prior -> DiffNeXt -> VQGAN sampling path produces a real
    decoded image (reference: WuerstchenSampler.__sample_base)."""
    from onetrainer_tpu.config.sample_config import SampleConfig
    from onetrainer_tpu.sampling.wuerstchen_sampler import sample_wuerstchen

    model = tiny_wuerstchen_model()
    rng = jax.random.PRNGKey(0)
    model.prior_params = model.prior.init(
        rng, jnp.zeros((1, 4, 4, 16)), jnp.asarray([0.5]),
        jnp.zeros((1, 6, 32)))["params"]
    model.te_params = model.text_encoder.init(
        rng, jnp.zeros((1, 6), jnp.int32))["params"]

    dec_cfg, vq_cfg = _tiny_decoder_configs()
    model.decoder_config = dec_cfg
    model.vqgan_config = vq_cfg
    model.decoder_params = model.decoder.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([0.5]),
        jnp.zeros((1, 2, 2, 16)), jnp.zeros((1, 5, 32)))["params"]
    model.vqgan_params = model.vqgan_decoder.init(
        rng, jnp.zeros((1, 4, 4, 4)))["params"]
    # decoder TE: clip_embd=32 matches the prior TE hidden size, reuse it
    model.decoder_te_config = model.te_config
    model.decoder_te_params = model.te_params

    cfg = SampleConfig.default_values()
    cfg.prompt = "a photo"
    cfg.height, cfg.width = 128, 128
    cfg.diffusion_steps = 2
    cfg.seed = 3

    def tokenize(text):
        return np.full((16,), 5, np.int32)

    out = sample_wuerstchen(model, model.prior_params, model.te_params,
                            tokenize, cfg)
    assert out.image.shape == (128, 128, 3)
    assert out.image.dtype == np.uint8
    # decoded through the VQGAN, not the projection stand-in: the
    # stand-in normalizes to full [0,255]; a random-weight VQ decode
    # after clamp almost surely does not hit both extremes exactly
    assert out.image.min() >= 0 and out.image.max() <= 255


def test_cascade_prior_key_exactness():
    """flax->torch keys match the diffusers StableCascadeUNet prior
    inventory the reference's converter enumerates (reference:
    convert_stable_cascade_diffusers_to_ckpt.py:1-83)."""
    from onetrainer_tpu.models.cascade import (
        CascadePriorConfig, StableCascadePrior,
    )

    cfg = CascadePriorConfig(
        c_in=16, c_hidden=(32, 48), nhead=(4, 4), blocks=(2, 1),
        c_cond=32, clip_text_in=24, clip_text_pooled_in=24,
        clip_image_in=16, dtype=jnp.float32)
    m = StableCascadePrior(cfg)
    params = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 16)),
        jnp.asarray([0.5]), jnp.zeros((1, 6, 24)), jnp.zeros((1, 24)),
        jnp.zeros((1, 1, 16)))["params"]
    sd = flax_params_to_torch(jax.device_get(params))
    for key in [
        "embedding.1.weight", "clf.1.weight",
        "clip_txt_mapper.weight", "clip_txt_pooled_mapper.weight",
        "clip_img_mapper.weight",
        "down_downscalers.1.1.blocks.0.weight",
        "up_upscalers.0.1.blocks.1.weight",
        "down_blocks.0.0.channelwise.0.weight",   # res
        "down_blocks.0.0.depthwise.weight",
        "down_blocks.0.1.mapper.weight",          # timestep
        "down_blocks.0.1.mapper_sca.weight",
        "down_blocks.0.1.mapper_crp.weight",
        "down_blocks.0.2.kv_mapper.1.weight",     # attn
        "down_blocks.0.2.attention.to_q.weight",
        "down_blocks.0.3.channelwise.0.weight",   # second triplet
        "down_blocks.1.0.depthwise.weight",
        "up_blocks.0.0.channelwise.0.weight",
        "up_blocks.1.2.attention.to_out.0.weight",
    ]:
        assert key in sd, key
    # the up level-0 first ResBlock takes the down skip: doubled fan-in
    assert sd["up_blocks.1.0.channelwise.0.weight"].shape[1] == 64
    assert sd["up_blocks.1.3.channelwise.0.weight"].shape[1] == 32


def test_cascade_sampling_standin():
    """Cascade prior sampling passes the pooled-text conditioning
    (reference: WuerstchenSampler.py:110-116) and falls back to the
    projection decode while stage B is unimplemented."""
    from onetrainer_tpu.config.sample_config import SampleConfig
    from onetrainer_tpu.models.cascade import CascadePriorConfig
    from onetrainer_tpu.sampling.wuerstchen_sampler import sample_wuerstchen

    model = WuerstchenModel(
        model_type=ModelType.STABLE_CASCADE_1,
        prior_config=CascadePriorConfig(
            c_in=16, c_hidden=(32, 48), nhead=(4, 4), blocks=(1, 1),
            c_cond=32, clip_text_in=32, clip_text_pooled_in=32,
            clip_image_in=16, dtype=jnp.float32),
        effnet_config=EffnetConfig(dtype=jnp.float32),
        te_config=CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, max_position_embeddings=16,
            eos_token_id=99, dtype=jnp.float32),
    )
    rng = jax.random.PRNGKey(0)
    model.prior_params = model.prior.init(
        rng, jnp.zeros((1, 4, 4, 16)), jnp.asarray([0.5]),
        jnp.zeros((1, 6, 32)), jnp.zeros((1, 32)),
        jnp.zeros((1, 1, 16)))["params"]
    model.te_params = model.text_encoder.init(
        rng, jnp.zeros((1, 6), jnp.int32))["params"]

    cfg = SampleConfig.default_values()
    cfg.prompt = "test"
    cfg.height, cfg.width = 128, 128
    cfg.diffusion_steps = 2

    out = sample_wuerstchen(
        model, model.prior_params, model.te_params,
        lambda text: np.full((16,), 5, np.int32), cfg)
    assert out.image.shape == (128, 128, 3)
