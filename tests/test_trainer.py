"""End-to-end integration: tiny diffusers checkpoint on disk -> GenericTrainer
start/train/end -> LoRA output + backup + resume."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, unet_flax_to_state_dict, vae_flax_to_state_dict,
)
from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
from onetrainer_tpu.util.enums import EMAMode, TimeUnit, TrainingMethod
from tests.test_data import make_dataset
from tests.test_train_step import tiny_sd_model


def write_tiny_checkpoint(base_dir, model):
    """Write the tiny SD model as a diffusers-layout checkpoint."""
    rng = jax.random.PRNGKey(0)
    unet_params = model.unet.init(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray([1]),
        jnp.zeros((1, 8, 32)))["params"]
    te_params = model.text_encoder.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    vae_params = model.vae.init(rng, jnp.zeros((1, 32, 32, 3)), rng)["params"]

    def write(component, sd, config, weights_name="diffusion_pytorch_model.safetensors"):
        d = os.path.join(base_dir, component)
        os.makedirs(d, exist_ok=True)
        save_safetensors(os.path.join(d, weights_name), sd)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config, f)

    write("unet", unet_flax_to_state_dict(jax.device_get(unet_params)), {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [32, 64],
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        "layers_per_block": 1,
        "attention_head_dim": 4,
        "cross_attention_dim": 32,
        "use_linear_projection": False,
    })
    write("vae", vae_flax_to_state_dict(jax.device_get(vae_params)), {
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "scaling_factor": 0.18215,
    })
    write("text_encoder", clip_flax_to_state_dict(jax.device_get(te_params)), {
        "vocab_size": 100, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 16, "hidden_act": "quick_gelu",
        "eos_token_id": 99,
    }, weights_name="model.safetensors")
    os.makedirs(os.path.join(base_dir, "scheduler"), exist_ok=True)
    with open(os.path.join(base_dir, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump({"prediction_type": "epsilon", "beta_schedule": "scaled_linear"}, f)
    return unet_params


def tiny_train_config(base_dir, dataset_dir, workspace, cache_dir):
    config = TrainConfig.default_values()
    config.base_model_name = base_dir
    config.model_type = config.model_type  # STABLE_DIFFUSION_15
    config.training_method = TrainingMethod.LORA
    config.workspace_dir = workspace
    config.cache_dir = cache_dir
    config.epochs = 2
    config.batch_size = 2
    config.resolution = "32"
    config.lora_rank = 4
    config.lora_alpha = 8.0
    config.learning_rate = 1e-3
    config.learning_rate_warmup_steps = 0.0
    config.tensorboard = False
    config.sample_after_unit = TimeUnit.NEVER
    config.backup_after_unit = TimeUnit.NEVER
    config.save_every_unit = TimeUnit.NEVER
    config.ema = EMAMode.OFF
    config.aspect_ratio_bucketing = False
    config.latent_caching = True
    config.optimizer.stochastic_rounding = False
    config.text_encoder.train = False
    concept = ConceptConfig.default_values()
    concept.path = dataset_dir
    concept.seed = 7
    config.concepts = [concept]
    config.samples = []
    config.output_model_destination = os.path.join(workspace, "out_lora.safetensors")
    config.backup_before_save = True
    return config


@pytest.fixture(scope="module")
def trained_workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    base = str(tmp / "ckpt")
    ds = make_dataset(str(tmp / "ds"), n=4)
    model = tiny_sd_model()
    write_tiny_checkpoint(base, model)
    config = tiny_train_config(base, ds, str(tmp / "ws"), str(tmp / "cache"))
    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()
    return tmp, config, trainer


def test_e2e_lora_training_produces_output(trained_workspace):
    tmp, config, trainer = trained_workspace
    assert trainer.train_progress.global_step >= 4  # 2 epochs x 2 steps
    out = config.output_model_destination
    assert os.path.exists(out)
    sd = load_safetensors(out)
    assert any(k.startswith("lora_unet_") and k.endswith("lora_down.weight")
               for k in sd)
    assert any(k.endswith(".alpha") for k in sd)
    # LoRA actually trained (up weights non-zero after steps)
    ups = [v for k, v in sd.items() if k.endswith("lora_up.weight")]
    assert max(float(np.abs(u).max()) for u in ups) > 0


def test_e2e_dora_training_with_ema_interval(tmp_path):
    """Trainer-level DoRA e2e (reference: DoRAModule + EMAModuleWrapper
    through GenericTrainer) — the weight-decomposed path plus an EMA
    update interval > 1; saved kohya file carries dora_scale tensors in
    the reference's own shapes ([1,in,1,1]/[out,1,1,1] conv, 2-D linear)."""
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    write_tiny_checkpoint(base, tiny_sd_model())
    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.lora_decompose = True
    config.ema = EMAMode.GPU
    config.ema_update_step_interval = 2
    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()
    sd = load_safetensors(config.output_model_destination)
    scales = {k: v for k, v in sd.items() if k.endswith("dora_scale")}
    assert scales
    conv = [v for v in scales.values() if v.ndim == 4]
    lin = [v for v in scales.values() if v.ndim == 2]
    assert conv and lin
    # conv scales decompose the input axis by default: [1, in, 1, 1]
    assert all(v.shape[0] == 1 and v.shape[2] == v.shape[3] == 1
               for v in conv)


def test_save_honors_output_dtype(trained_workspace):
    """config.output_dtype casts every exported tensor (reference:
    GenericTrainer.save passes output_dtype.torch_dtype() to the saver,
    GenericTrainer.py:479)."""
    from onetrainer_tpu.io.safetensors_io import SafetensorsFile
    from onetrainer_tpu.util.enums import DataType
    tmp, config, trainer = trained_workspace
    old = config.output_dtype
    dest = str(tmp / "out_fp16.safetensors")
    try:
        config.output_dtype = DataType.FLOAT_16
        trainer.save(dest)
    finally:
        config.output_dtype = old
    with SafetensorsFile(dest) as f:
        keys = f.keys()
        assert any(k.endswith("lora_down.weight") for k in keys)
        for k in keys:
            if f.dtype(k).kind == "f":
                assert f.dtype(k) == np.float16, k


def test_e2e_backup_and_resume(trained_workspace):
    tmp, config, trainer = trained_workspace
    backup_dir = config.get_last_backup_path()
    assert backup_dir is not None
    assert os.path.exists(os.path.join(backup_dir, "meta.json"))
    assert os.path.exists(os.path.join(backup_dir, "optimizer.safetensors"))
    assert os.path.exists(os.path.join(
        backup_dir, "model", "unet", "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(backup_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["train_progress"]["global_step"] == trainer.train_progress.global_step

    # resume: progress restored
    config2 = TrainConfig.default_values().from_dict(config.to_dict())
    config2.continue_last_backup = True
    config2.epochs = 2  # already done -> no new steps
    trainer2 = GenericTrainer(config2)
    trainer2.start()
    assert trainer2.train_progress.global_step == trainer.train_progress.global_step
    trainer2.train()  # completes immediately (epochs exhausted)


def test_lora_continue_training_roundtrip(tmp_path):
    """Train -> save kohya LoRA -> new run with lora_model_name picks up the
    trained adapters (reference: LoRALoaderMixin continue-training path)."""
    import numpy as np

    from onetrainer_tpu.io.safetensors_io import load_safetensors

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sd_model()
    write_tiny_checkpoint(base, model)

    def make_config():
        config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                                   str(tmp_path / "cache"))
        config.training_method = TrainingMethod.LORA
        config.lora_rank = 4
        config.unet.train = True
        config.text_encoder.train = True
        return config

    config = make_config()
    config.output_model_destination = str(tmp_path / "first.safetensors")
    trainer = GenericTrainer(config)
    trainer.start()
    trainer.train()
    trainer.end()
    sd_first = load_safetensors(config.output_model_destination)
    # TE keys carry the HF module path for ecosystem compatibility
    assert any(k.startswith("lora_te_text_model_encoder_layers_")
               for k in sd_first)

    config2 = make_config()
    config2.lora_model_name = config.output_model_destination
    config2.output_model_destination = str(tmp_path / "second.safetensors")
    trainer2 = GenericTrainer(config2)
    trainer2.start()
    # adapters must equal the saved ones before any training
    loaded = trainer2.setup.state.params["unet_lora"]
    some_key = next(iter(loaded))
    from onetrainer_tpu.peft.lora import _module_key_to_kohya
    kohya_key = _module_key_to_kohya("lora_unet", some_key)
    np.testing.assert_allclose(
        np.asarray(loaded[some_key]["lora_down"]),
        np.asarray(sd_first[kohya_key + ".lora_down.weight"]), atol=1e-6)
    trainer2.train()
    trainer2.end()
    assert os.path.exists(config2.output_model_destination)


def test_output_embedding_e2e(tmp_path):
    """Output-embedding training: trained vectors patched into the TE
    output, norm preserved, saved to the embedding artifact
    (reference: BaseModel._apply_output_embeddings:119-143,
    ModelSetupEmbeddingMixin:37-110)."""
    from onetrainer_tpu.config.train_config import TrainEmbeddingConfig

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sd_model()
    write_tiny_checkpoint(base, model)
    # put the placeholder into the prompts
    for name in os.listdir(ds):
        if name.endswith(".txt"):
            path = os.path.join(ds, name)
            with open(path) as f:
                text = f.read()
            with open(path, "w") as f:
                f.write("<embedding> " + text)

    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.training_method = TrainingMethod.EMBEDDING
    config.epochs = 1
    emb = TrainEmbeddingConfig.default_values()
    emb.placeholder = "<embedding>"
    emb.token_count = 2
    emb.initial_embedding_text = "thing"
    emb.is_output_embedding = True
    config.embedding = emb
    config.output_model_destination = str(tmp_path / "out_emb.safetensors")

    trainer = GenericTrainer(config)
    trainer.start()
    assert "output_embeddings" in trainer.setup.state.params
    before = np.asarray(trainer.setup.state.params["output_embeddings"]).copy()
    stds_before = before.std(axis=1).mean()
    trainer.train()
    trainer.end()

    after = np.asarray(jax.device_get(
        trainer.setup.state.params["output_embeddings"]))
    assert not np.allclose(before, after)           # it trained
    # norm preservation keeps the per-row std scale
    np.testing.assert_allclose(after.std(axis=1).mean(), stds_before,
                               rtol=0.05)
    sd = load_safetensors(config.output_model_destination)
    assert "output_emp_params" in sd
    assert sd["output_emp_params"].shape == (2, 32)


def test_vae_fine_tune_e2e(tmp_path):
    """FINE_TUNE_VAE: decode(latent) -> pixel reconstruction training
    (reference: StableDiffusionFineTuneVaeSetup.py:68-101)."""
    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sd_model()
    write_tiny_checkpoint(base, model)

    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    from onetrainer_tpu.util.enums import ModelFormat
    config.training_method = TrainingMethod.FINE_TUNE_VAE
    config.epochs = 1
    config.vae.train = True
    config.vae.learning_rate = 1e-4
    config.output_model_format = ModelFormat.DIFFUSERS
    config.output_model_destination = str(tmp_path / "out_vae")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    assert "vae" in trainer.setup.state.params
    before = jax.tree.leaves(jax.device_get(trainer.setup.state.params["vae"]))
    batches = trainer.data_loader.batches_for_epoch(0)
    trainer.data_loader.ensure_cached(batches)
    batch = trainer.data_loader.materialize_batch(batches[0])
    assert "image" in batch                      # pixels cached for the target
    trainer.train()
    trainer.end()
    after = jax.tree.leaves(jax.device_get(trainer.setup.state.params["vae"]))
    changed = any(not np.allclose(a, b) for a, b in zip(before, after))
    assert changed
    # diffusers save used the trained VAE
    assert os.path.isdir(config.output_model_destination)


def test_e2e_custom_sample_command(tmp_path):
    """TrainCommands.sample_custom queued mid-run -> the loop polls it,
    samples with the caller's prompt into samples/custom/, and fires
    on_sample_custom (reference: GenericTrainer.py:640-648, SampleWindow)."""
    from onetrainer_tpu.config.sample_config import SampleConfig
    from onetrainer_tpu.util.callbacks import TrainCallbacks
    from onetrainer_tpu.util.commands import TrainCommands

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    write_tiny_checkpoint(base, tiny_sd_model())
    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.epochs = 1
    config.backup_before_save = False

    got = []
    callbacks = TrainCallbacks(on_sample_custom=got.append)
    commands = TrainCommands()
    sc = SampleConfig.default_values()
    sc.prompt = "custom prompt"
    sc.width = sc.height = 32
    sc.diffusion_steps = 2
    commands.sample_custom(sc)

    trainer = GenericTrainer(config, callbacks, commands)
    trainer.start()
    trainer.train()
    trainer.end()

    custom_dir = os.path.join(config.workspace_dir, "samples", "custom")
    assert os.path.isdir(custom_dir) and os.listdir(custom_dir)
    assert len(got) == 1 and got[0].image.shape[-1] == 3
    # from_train_config filled the train-config-derived fields
    assert sc.force_last_timestep == \
        config.rescale_noise_scheduler_to_zero_terminal_snr


def test_lora_fp8_base_e2e(tmp_path, monkeypatch):
    """unet.weight_dtype=FLOAT_8 through the real trainer, with fp8
    activations (OT_FP8_ACTS=1, ops/fp8_acts.py) on top.

    Regression: the family loaders used to raw-cast EVERY component to
    the part's storage dtype (to_compute_dtype), corrupting the VAE/TE
    (fp8 TypePromotionError in the cache encode; int8/uint8 truncation
    for INT_8/NFLOAT_4) — and sd/sdxl had no quantize wiring at all.
    Now the load keeps bf16 (DataType.to_load_dtype) and the setup
    quantizes only the frozen parts (setup/quantize.py), like the
    reference's post-load replace-linears pass
    (modules/util/quantization_util.py:72-160)."""
    from onetrainer_tpu.ops import fp8_acts
    from onetrainer_tpu.ops.quant import QuantizedArray
    from onetrainer_tpu.util.enums import DataType

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    write_tiny_checkpoint(base, tiny_sd_model())
    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.epochs = 1
    config.backup_before_save = False
    config.unet.weight_dtype = DataType.FLOAT_8
    monkeypatch.setenv("OT_FP8_ACTS", "1")

    before = fp8_acts.STATS["fp8_dot"]
    trainer = GenericTrainer(config)
    trainer.start()

    # the frozen unet is quantized, the VAE/TE are NOT degraded to fp8
    frozen_unet = trainer.setup.frozen["unet"]
    assert any(isinstance(v, QuantizedArray)
               for v in jax.tree.leaves(frozen_unet, is_leaf=lambda x:
                                        isinstance(x, QuantizedArray)))
    for leaf in jax.tree.leaves(trainer.setup.model.vae_params):
        assert leaf.dtype != jnp.float8_e4m3fn
    for leaf in jax.tree.leaves(trainer.setup.frozen["text_encoder"]):
        assert leaf.dtype != jnp.float8_e4m3fn

    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 2
    assert fp8_acts.STATS["fp8_dot"] > before  # fp8 dots actually traced
    sd = load_safetensors(config.output_model_destination)
    assert any(k.endswith("lora_down.weight") for k in sd)


def test_fine_tune_quantized_frozen_te(tmp_path):
    """FINE_TUNE with a quantized FROZEN part: quantize_frozen_parts is
    method-agnostic (frozen-ness is already encoded in the frozen dict —
    fine-tune pops trainable parts out of it), so
    text_encoder.weight_dtype=FLOAT_8 quantizes the frozen TE while the
    trained unet stays full precision. Regression for the r3 review
    finding where a (LORA, EMBEDDING) method gate silently no-op'd the
    config knob in fine-tune runs. TE-only fine-tune here: the tiny TE's
    kernels are below quantize_tree's 4096-element min_size, the unet's
    are not."""
    from onetrainer_tpu.ops.quant import QuantizedArray
    from onetrainer_tpu.util.enums import DataType

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    write_tiny_checkpoint(base, tiny_sd_model())
    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.training_method = TrainingMethod.FINE_TUNE
    config.epochs = 1
    config.backup_before_save = False
    config.unet.train = False
    config.unet.weight_dtype = DataType.FLOAT_8
    config.text_encoder.train = True
    config.output_model_destination = str(tmp_path / "ws" / "out_ft")

    trainer = GenericTrainer(config)
    trainer.start()
    q_leaves = jax.tree.leaves(
        trainer.setup.frozen["unet"],
        is_leaf=lambda x: isinstance(x, QuantizedArray))
    assert any(isinstance(v, QuantizedArray) for v in q_leaves)
    assert "text_encoder" not in trainer.setup.frozen  # trained
    trainer.train()
    trainer.end()
    assert trainer.train_progress.global_step >= 2
    # the save path must dequantize the frozen part — np.asarray on the
    # quantized container used to raise inside a swallowed try/except,
    # leaving no output model at all (the final save now also raises
    # instead of swallowing)
    out = config.output_model_destination + ".safetensors"
    assert os.path.exists(out)
    sd = load_safetensors(out)
    assert any(k.startswith("model.diffusion_model.") for k in sd)
    assert any(k.startswith("cond_stage_model.") for k in sd)
