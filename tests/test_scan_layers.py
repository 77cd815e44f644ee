"""Scan-over-layers for the FLUX DiT: the 19+38 homogeneous blocks run
under lax.scan with stacked [L, ...] params (models/flux.py
scan_layers). The block body compiles once instead of L times; outputs
must be bit-compatible with the per-layer loop, and the kohya LoRA
contract (per-layer keys) must survive the stacked layout."""

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.torch_flax import (
    stack_scanned_blocks, unstack_scanned_blocks,
)
from onetrainer_tpu.models.flux import (
    FluxTransformer2D, prepare_latent_image_ids,
)
from onetrainer_tpu.peft.lora import (
    PeftConfig, init_peft_params, lora_variables, peft_to_kohya_state_dict,
    stack_scan_adapters,
)
from tests.test_flux import tiny_flux_config


def _inputs(b=2, h=8, w=8):
    s_img = (h // 2) * (w // 2)
    return (
        jax.random.normal(jax.random.PRNGKey(2), (b, s_img, 16), jnp.float32),
        jnp.full((b,), 0.4, jnp.float32),
        jax.random.normal(jax.random.PRNGKey(3), (b, 20), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(4), (b, 6, 24), jnp.float32),
        prepare_latent_image_ids(h, w),
    )


def _loop_and_scan_params():
    cfg_loop = tiny_flux_config()
    cfg_scan = tiny_flux_config(scan_layers=True)
    loop_model = FluxTransformer2D(cfg_loop)
    scan_model = FluxTransformer2D(cfg_scan)
    args = _inputs()
    params = loop_model.init(jax.random.PRNGKey(0), *args)["params"]
    stacked = dict(jax.device_get(params))
    stack_scanned_blocks(stacked, "transformer_blocks")
    stack_scanned_blocks(stacked, "single_transformer_blocks")
    return loop_model, scan_model, params, stacked, args


def test_scan_matches_loop_forward():
    loop_model, scan_model, params, stacked, args = _loop_and_scan_params()
    ref = loop_model.apply({"params": params}, *args)
    out = scan_model.apply({"params": jax.tree.map(jnp.asarray, stacked)},
                           *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_scan_param_layout_roundtrip():
    _, _, params, stacked, _ = _loop_and_scan_params()
    # stacked shape carries the layer axis
    k = stacked["transformer_blocks"]["block"]["attn"]["to_q"]["kernel"]
    assert np.asarray(k).shape[0] == 2
    back = dict(stacked)
    unstack_scanned_blocks(back, "transformer_blocks")
    unstack_scanned_blocks(back, "single_transformer_blocks")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_lora_matches_loop_lora():
    """Equivalent adapters (per-layer vs stacked) give identical outputs
    through the in-layer LoRA path."""
    loop_model, scan_model, params, stacked, args = _loop_and_scan_params()
    peft_cfg = PeftConfig(rank=2, alpha=4.0)
    loop_adapters = init_peft_params(jax.random.PRNGKey(1), params, peft_cfg)
    # make ups nonzero so the adapters actually contribute
    loop_adapters = {
        k: {n: (v + 0.01 if n == "lora_up" else v) for n, v in e.items()}
        for k, e in loop_adapters.items()}

    scan_base = jax.tree.map(jnp.asarray, stacked)
    scan_fresh = init_peft_params(jax.random.PRNGKey(1), scan_base, peft_cfg)
    scan_keys = set(scan_fresh.keys())
    # build the stacked adapters from the loop ones (exact same values)
    scan_adapters = stack_scan_adapters(dict(loop_adapters), scan_keys)
    assert any(np.asarray(e["lora_down"]).ndim == 3
               for e in scan_adapters.values())

    ref = loop_model.apply(
        lora_variables(params, loop_adapters, peft_cfg), *args)
    out = scan_model.apply(
        lora_variables(scan_base, scan_adapters, peft_cfg), *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_scan_kohya_export_matches_loop_export():
    """Stacked adapters export byte-identical kohya files to per-layer
    adapters — the ecosystem contract is unchanged by the scan layout."""
    _, _, params, stacked, _ = _loop_and_scan_params()
    peft_cfg = PeftConfig(rank=2, alpha=4.0)
    loop_adapters = init_peft_params(jax.random.PRNGKey(1), params, peft_cfg)
    scan_base = jax.tree.map(jnp.asarray, stacked)
    scan_keys = set(init_peft_params(jax.random.PRNGKey(1), scan_base,
                                     peft_cfg).keys())
    scan_adapters = stack_scan_adapters(dict(loop_adapters), scan_keys)

    ref_sd = peft_to_kohya_state_dict(loop_adapters, peft_cfg,
                                      "lora_transformer")
    scan_sd = peft_to_kohya_state_dict(scan_adapters, peft_cfg,
                                       "lora_transformer")
    assert set(ref_sd) == set(scan_sd)
    for key in ref_sd:
        np.testing.assert_array_equal(np.asarray(ref_sd[key]),
                                      np.asarray(scan_sd[key]), err_msg=key)


def test_scan_e2e_trainer(tmp_path, monkeypatch):
    """Full GenericTrainer run with OT_SCAN_LAYERS=1: load stacks the
    blocks, the scan step trains, and the kohya export still carries
    per-layer keys."""
    from onetrainer_tpu.config.concept_config import ConceptConfig
    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.io.safetensors_io import load_safetensors
    from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
    from onetrainer_tpu.util.enums import (
        EMAMode, ModelType, TimeUnit, TrainingMethod,
    )
    from tests.test_data import make_dataset
    from tests.test_trainer_flux import (
        tiny_flux_model, write_tiny_flux_checkpoint,
    )

    monkeypatch.setenv("OT_SCAN_LAYERS", "1")
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_flux_model()
    write_tiny_flux_checkpoint(base, model)

    config = TrainConfig.default_values()
    config.model_type = ModelType.FLUX_DEV_1
    config.training_method = TrainingMethod.LORA
    config.base_model_name = base
    config.workspace_dir = str(tmp_path / "ws")
    config.cache_dir = str(tmp_path / "cache")
    config.epochs = 1
    config.batch_size = 2
    config.resolution = "32"
    config.aspect_ratio_bucketing = False
    config.lora_rank = 4
    config.learning_rate = 1e-3
    config.learning_rate_warmup_steps = 0.0
    config.tensorboard = False
    config.sample_after_unit = TimeUnit.NEVER
    config.backup_after_unit = TimeUnit.NEVER
    config.save_every_unit = TimeUnit.NEVER
    config.ema = EMAMode.OFF
    config.optimizer.stochastic_rounding = False
    config.prior.train = True
    config.text_encoder.train = False
    config.text_encoder_2.train = False
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_scan.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    # the loaded transformer really is scan-stacked
    assert trainer.model.transformer_config.scan_layers
    tb = trainer.model.transformer_params["transformer_blocks"]
    assert "block" in tb
    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 2
    sd = load_safetensors(config.output_model_destination)
    # per-layer kohya keys for both stacks, no scan artifacts
    assert any(k.startswith("lora_transformer_transformer_blocks_0_")
               for k in sd)
    assert any(k.startswith("lora_transformer_transformer_blocks_1_")
               for k in sd)
    assert any(k.startswith("lora_transformer_single_transformer_blocks_1_")
               for k in sd)
    assert not any("block_" in k and "blocks" not in k.split("block_")[0]
                   for k in sd)


def test_scan_apply_peft_merge_matches_loop():
    """apply_peft on the stacked tree (batched per-layer merge) equals
    the per-layer merge — the sampler/merged-export path under scan."""
    from onetrainer_tpu.peft.lora import apply_peft

    loop_model, scan_model, params, stacked, args = _loop_and_scan_params()
    peft_cfg = PeftConfig(rank=2, alpha=4.0)
    loop_adapters = init_peft_params(jax.random.PRNGKey(1), params, peft_cfg)
    loop_adapters = {
        k: {n: (v + 0.02 if n == "lora_up" else v) for n, v in e.items()}
        for k, e in loop_adapters.items()}
    scan_base = jax.tree.map(jnp.asarray, stacked)
    scan_keys = set(init_peft_params(jax.random.PRNGKey(1), scan_base,
                                     peft_cfg).keys())
    scan_adapters = stack_scan_adapters(dict(loop_adapters), scan_keys)

    ref = loop_model.apply(
        {"params": apply_peft(params, loop_adapters, peft_cfg)}, *args)
    out = scan_model.apply(
        {"params": apply_peft(scan_base, scan_adapters, peft_cfg)}, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_hunyuan_scan_matches_loop():
    """HunyuanVideo scan path (double + single stacks) matches the
    per-layer loop bit-for-bit at fp32 tolerance."""
    from onetrainer_tpu.models.hunyuan_video import (
        HunyuanVideoConfig, HunyuanVideoTransformer3D,
    )

    kw = dict(num_layers=2, num_single_layers=2, num_refiner_layers=1,
              hidden_size=48, num_heads=4, head_dim=12,
              text_embed_dim=24, pooled_projection_dim=16,
              axes_dims_rope=(4, 4, 4), dtype=jnp.float32)
    loop_model = HunyuanVideoTransformer3D(HunyuanVideoConfig(**kw))
    scan_model = HunyuanVideoTransformer3D(
        HunyuanVideoConfig(scan_layers=True, **kw))

    args = (
        jax.random.normal(jax.random.PRNGKey(2), (2, 2, 4, 4, 16),
                          jnp.float32),
        jnp.asarray([500.0, 300.0]),
        jax.random.normal(jax.random.PRNGKey(3), (2, 5, 24), jnp.float32),
        jnp.ones((2, 5), jnp.int32),
        jax.random.normal(jax.random.PRNGKey(4), (2, 16), jnp.float32),
    )
    params = loop_model.init(jax.random.PRNGKey(0), *args)["params"]
    stacked = dict(jax.device_get(params))
    stack_scanned_blocks(stacked, "transformer_blocks")
    stack_scanned_blocks(stacked, "single_transformer_blocks")

    ref = loop_model.apply({"params": params}, *args)
    out = scan_model.apply({"params": jax.tree.map(jnp.asarray, stacked)},
                           *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sd3_scan_matches_loop():
    """SD3 scan path: first N-1 joint blocks scan, the context-pre-only
    final block stays separate; output parity with the loop."""
    from onetrainer_tpu.io.torch_flax import stack_scanned_blocks as _stack
    from onetrainer_tpu.models.sd3 import SD3Config, SD3Transformer2D

    kw = dict(sample_size=8, patch_size=2, in_channels=4, out_channels=4,
              num_layers=3, num_heads=2, head_dim=8,
              joint_attention_dim=24, caption_projection_dim=16,
              pooled_projection_dim=16, pos_embed_max_size=16,
              dtype=jnp.float32)
    loop_model = SD3Transformer2D(SD3Config(**kw))
    scan_model = SD3Transformer2D(SD3Config(scan_layers=True, **kw))
    args = (
        jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4), jnp.float32),
        jnp.asarray([500.0, 300.0]),
        jax.random.normal(jax.random.PRNGKey(3), (2, 16), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(4), (2, 6, 24), jnp.float32),
    )
    params = loop_model.init(jax.random.PRNGKey(0), *args)["params"]
    stacked = dict(jax.device_get(params))
    _stack(stacked, "transformer_blocks", count=2)
    assert "transformer_blocks_2" in stacked     # final block kept apart
    assert "transformer_blocks" in stacked

    ref = loop_model.apply({"params": params}, *args)
    out = scan_model.apply({"params": jax.tree.map(jnp.asarray, stacked)},
                           *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sana_and_pixart_scan_match_loop():
    """Sana and PixArt scan paths match their per-layer loops."""
    from onetrainer_tpu.models.pixart import PixArtConfig, PixArtTransformer2D
    from onetrainer_tpu.models.sana import SanaConfig, SanaTransformer2D

    # PixArt
    pkw = dict(sample_size=8, patch_size=2, in_channels=4, out_channels=8,
               num_layers=2, num_heads=2, head_dim=8,
               cross_attention_dim=24, dtype=jnp.float32)
    p_loop = PixArtTransformer2D(PixArtConfig(**pkw))
    p_scan = PixArtTransformer2D(PixArtConfig(scan_layers=True, **pkw))
    pargs = (
        jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4), jnp.float32),
        jnp.asarray([500, 300]),
        jax.random.normal(jax.random.PRNGKey(3), (2, 6, 24), jnp.float32),
    )
    params = p_loop.init(jax.random.PRNGKey(0), *pargs)["params"]
    stacked = dict(jax.device_get(params))
    stack_scanned_blocks(stacked, "transformer_blocks")
    np.testing.assert_allclose(
        np.asarray(p_scan.apply(
            {"params": jax.tree.map(jnp.asarray, stacked)}, *pargs)),
        np.asarray(p_loop.apply({"params": params}, *pargs)),
        rtol=2e-5, atol=2e-5)

    # Sana
    from tests.test_trainer_sana import tiny_sana_model
    model = tiny_sana_model()
    c = model.transformer_config
    s_loop = SanaTransformer2D(c)
    s_scan = SanaTransformer2D(
        c.__class__(**{**c.__dict__, "scan_layers": True}))
    sargs = (
        jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, c.in_channels),
                          jnp.float32),
        jnp.asarray([0.4, 0.7], jnp.float32),
        jax.random.normal(jax.random.PRNGKey(3),
                          (2, 6, c.caption_channels), jnp.float32),
        jnp.ones((2, 6), jnp.int32),
    )
    sparams = s_loop.init(jax.random.PRNGKey(0), *sargs)["params"]
    sstacked = dict(jax.device_get(sparams))
    stack_scanned_blocks(sstacked, "transformer_blocks")
    np.testing.assert_allclose(
        np.asarray(s_scan.apply(
            {"params": jax.tree.map(jnp.asarray, sstacked)}, *sargs)),
        np.asarray(s_loop.apply({"params": sparams}, *sargs)),
        rtol=2e-5, atol=2e-5)


def test_hidream_scan_matches_loop():
    """HiDream scan: blocks stack, per-block caption projections stay
    per-layer params and feed the scan as a stacked xs input."""
    from tests.test_trainer_hidream import tiny_hidream_model

    model = tiny_hidream_model()
    c = model.transformer_config
    loop_model = model.transformer
    scan_model = loop_model.__class__(
        c.__class__(**{**c.__dict__, "scan_layers": True}))

    llama_layers = 2
    s_img = 4
    args = (
        jax.random.normal(jax.random.PRNGKey(2),
                          (2, s_img, c.in_channels * c.patch_size ** 2),
                          jnp.float32),
        jnp.asarray([500.0, 300.0]),
        jax.random.normal(jax.random.PRNGKey(3), (2, 5, c.t5_dim),
                          jnp.float32),
        jax.random.normal(jax.random.PRNGKey(4),
                          (llama_layers, 2, 4, c.llama_dim), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(5), (2, c.pooled_dim),
                          jnp.float32),
        jnp.zeros((s_img, 3), jnp.float32),
    )
    params = loop_model.init(jax.random.PRNGKey(0), *args)["params"]
    stacked = dict(jax.device_get(params))
    stack_scanned_blocks(stacked, "double_stream_blocks")
    stack_scanned_blocks(stacked, "single_stream_blocks")
    assert "block" in stacked["double_stream_blocks"]
    # caption projections stay per-layer
    assert any(k.startswith("caption_projection_") for k in stacked)

    np.testing.assert_allclose(
        np.asarray(scan_model.apply(
            {"params": jax.tree.map(jnp.asarray, stacked)}, *args)),
        np.asarray(loop_model.apply({"params": params}, *args)),
        rtol=2e-5, atol=2e-5)
