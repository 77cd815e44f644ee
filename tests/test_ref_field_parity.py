"""Parity for reference TrainConfig fields surfaced by a field-consumption
audit: unmasked_probability (mgds RandomLatentMaskRemove,
DataLoaderText2ImageMixin.py:270-289), preserve_embedding_norm
(AdditionalEmbeddingWrapper.normalize_embeddings:69-75), save_skip_first
(GenericTrainer.py:510-515), and per-TE hidden-state layer skips
(t5_util.encode_t5:6-29)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.data.loader import Text2ImageDataLoader
from onetrainer_tpu.util.enums import ModelType
from tests.test_data import _concept, _fake_encoders, make_dataset


def _inpaint_config(root, cache_dir, p, caching=True):
    config = TrainConfig.default_values()
    config.model_type = ModelType.STABLE_DIFFUSION_15_INPAINTING
    config.concepts = [_concept(root)]
    config.batch_size = 2
    config.resolution = "512"
    config.latent_caching = caching
    config.cache_dir = cache_dir
    config.masked_training = True
    config.unmasked_probability = p
    return config


def test_unmasked_probability_one_removes_every_mask(tmp_path):
    root = make_dataset(str(tmp_path / "ds"))
    enc_i, enc_t = _fake_encoders()
    config = _inpaint_config(root, str(tmp_path / "cache"), p=1.0)
    loader = Text2ImageDataLoader(
        config, enc_i, enc_t, quantization=64, conditioning_image=True)
    blank = None
    for batch in loader.iter_epoch(0):
        assert float(batch["latent_mask"].min()) == 1.0
        # conditioning latent = encode of the fully-blanked (zeros) image
        h = batch["latent_conditioning_image"].shape[1]
        w = batch["latent_conditioning_image"].shape[2]
        blank = enc_i(np.zeros((1, h * 8, w * 8, 3), np.float32))[
            "latent_image"][0]
        np.testing.assert_allclose(
            batch["latent_conditioning_image"],
            np.broadcast_to(blank, batch["latent_conditioning_image"].shape),
            rtol=1e-6)
    assert blank is not None  # at least one batch ran


def test_unmasked_probability_zero_keeps_masks(tmp_path):
    root = make_dataset(str(tmp_path / "ds"), n=1)
    enc_i, enc_t = _fake_encoders()
    config = _inpaint_config(root, str(tmp_path / "cache0"), p=0.0)
    config.batch_size = 1
    loader = Text2ImageDataLoader(
        config, enc_i, enc_t, quantization=64, conditioning_image=True)
    saw_partial = False
    for batch in loader.iter_epoch(0):
        if float(batch["latent_mask"].min()) < 1.0:
            saw_partial = True
    # img0 has a real -masklabel.png with a hole -> some mask survives
    assert saw_partial


def test_unmasked_probability_is_deterministic_per_epoch(tmp_path):
    root = make_dataset(str(tmp_path / "ds"))
    enc_i, enc_t = _fake_encoders()
    config = _inpaint_config(root, str(tmp_path / "cache5"), p=0.5)
    loader = Text2ImageDataLoader(
        config, enc_i, enc_t, quantization=64, conditioning_image=True)
    a = [np.asarray(b["latent_mask"]) for b in loader.iter_epoch(3)]
    b = [np.asarray(b["latent_mask"]) for b in loader.iter_epoch(3)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)  # resume-stable draw


def test_non_mask_model_never_removes(tmp_path):
    # the reference gates RandomLatentMaskRemove on model_type.has_mask_input
    root = make_dataset(str(tmp_path / "ds"), n=2)
    enc_i, enc_t = _fake_encoders()
    config = _inpaint_config(root, str(tmp_path / "cachenm"), p=1.0)
    config.model_type = ModelType.STABLE_DIFFUSION_15
    loader = Text2ImageDataLoader(config, enc_i, enc_t, quantization=64)
    assert loader.mask_remove_probability == 0.0


def test_preserve_input_embedding_norms():
    from onetrainer_tpu.train.sd_train_step import (
        SDStepConfig,
        preserve_input_embedding_norms,
    )
    base = SDStepConfig.from_train_config(TrainConfig.default_values())
    table = np.random.default_rng(0).normal(size=(50, 8)).astype(np.float32)
    frozen = {"text_encoder": {"token_embedding": jnp.asarray(table)}}
    vec = np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32) * 5
    params = {"embeddings": jnp.asarray(vec)}

    cfg_off = dataclasses.replace(base, preserve_embedding_norm=False)
    out = preserve_input_embedding_norms(params, frozen, cfg_off)
    np.testing.assert_array_equal(np.asarray(out["embeddings"]), vec)

    cfg_on = dataclasses.replace(base, preserve_embedding_norm=True)
    out = preserve_input_embedding_norms(params, frozen, cfg_on)
    got = np.asarray(out["embeddings"])
    median = np.median(np.linalg.norm(table, axis=-1))
    # every trained row renormalized to the base table's median norm,
    # direction preserved (reference: F.normalize(vector) * median_norm)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1),
                               np.full(3, median), rtol=1e-5)
    cos = (got * vec).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(vec, axis=-1))
    np.testing.assert_allclose(cos, np.ones(3), rtol=1e-5)


def test_save_skip_first_delays_saves(tmp_path):
    from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
    from onetrainer_tpu.util.enums import TimeUnit
    from tests.test_train_step import tiny_sd_model
    from tests.test_trainer import tiny_train_config, write_tiny_checkpoint

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    write_tiny_checkpoint(base, tiny_sd_model())
    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.epochs = 3
    config.save_every = 1
    config.save_every_unit = TimeUnit.EPOCH
    config.save_skip_first = 2
    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()
    save_dir = os.path.join(str(tmp_path / "ws"), "save")
    saves = os.listdir(save_dir) if os.path.isdir(save_dir) else []
    # epochs 0 and 1 fall in the skip window; only epoch 2 saves
    # (reference: single_action_elapsed("save_skip_first", ...) AND
    # repeating_action_needed("save", ...), GenericTrainer.py:510-515)
    assert len(saves) == 1, saves


def test_t5_layer_skip_matches_reference_semantics():
    # encode_t5 (t5_util.py:6-29): hidden_states[-1-skip], final layer
    # norm re-applied. With num_layers=2 and skip=1 that is the output of
    # block 0 -> final_layer_norm.
    from onetrainer_tpu.models.t5 import T5Config, T5Encoder

    cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                   num_heads=4, relative_attention_num_buckets=8,
                   relative_attention_max_distance=20, dtype=jnp.float32)
    model = T5Encoder(cfg)
    ids = jnp.asarray(np.array([[3, 5, 7, 1]], np.int32))
    params = model.init(jax.random.PRNGKey(0), ids)["params"]

    skipped = model.apply({"params": params}, ids, layer_skip=1)
    # manual: block_0 then final norm
    one_layer = T5Encoder(dataclasses.replace(cfg, num_layers=1))
    manual = one_layer.apply({"params": params}, ids)
    np.testing.assert_allclose(np.asarray(skipped), np.asarray(manual),
                               rtol=1e-6)
    full = model.apply({"params": params}, ids)
    assert not np.allclose(np.asarray(skipped), np.asarray(full))
