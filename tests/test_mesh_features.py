"""Multi-chip correctness beyond plain bf16 (VERDICT r3 weak #4): FSDP-
sharded training combined with quantized frozen bases (fp8/int8/NF4
custom pytrees — scalar and per-block scales must survive sharding),
block-wise int8 optimizer state (ops/quant_opt.py block-2048 layout vs a
sharded param axis), EMA, gradient accumulation (optax.MultiSteps), and
scan-over-layers — each asserted for PARITY against the single-device
run, the same bar tests/test_trainer_mesh.py sets for the plain path
(reference test strategy: SURVEY.md §4 "distributed: DP/FSDP grad
equivalence")."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from onetrainer_tpu.ops.quant import quantize_tree
from onetrainer_tpu.ops.quant_opt import Q8State, int8_optimizer_state
from onetrainer_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.sd_train_step import make_sd_train_step
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import TrainingMethod
from tests.test_train_step import (
    _step_cfg, init_model_params, make_batch, tiny_sd_model,
)


def _run_steps(model, cfg, tx, peft_cfg, adapters, frozen, mesh=None,
               n_steps=2, ema=False):
    """n_steps of the jitted LoRA train step, sharded or single-device.
    The step donates its state, so trees are copied before placement."""
    fresh = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
    if mesh is not None:
        frozen = {k: shard_params(fresh(v), mesh, min_size_to_shard=1024)
                  for k, v in frozen.items()}
        adapters = shard_params(fresh(adapters), mesh,
                                min_size_to_shard=1024)
    else:
        adapters = fresh(adapters)
    state = create_train_state({"unet_lora": adapters}, tx, ema_enabled=ema)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)
    losses = []
    for i in range(n_steps):
        batch = make_batch(i)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    return losses, jax.device_get(state)


def _setup(tx=None, **cfg_kw):
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft_cfg = PeftConfig(rank=4, alpha=8.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    cfg = _step_cfg(TrainingMethod.LORA, **cfg_kw)
    tx = tx if tx is not None else optax.adamw(1e-3)
    return model, unet_params, te_params, peft_cfg, adapters, cfg, tx


def _assert_tree_close(a, b, atol=1e-3):
    """Parity within the Adam noise floor: the mesh and single-device
    programs compile different reduction orders (O(1e-7) grad noise),
    and Adam's m/sqrt(v) normalization amplifies that to ~lr-sized
    (1e-3) per-element differences wherever per-batch grad contributions
    cancel (observed on time_emb_proj lora_up). Losses stay tight
    (rel 1e-6-ish); param trees are compared at the lr scale."""
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=atol,
                                   rtol=1e-3)


@pytest.mark.parametrize("qdtype", ["fp8", "int8", "nf4"])
def test_mesh_quantized_base_parity(qdtype):
    """FSDP-sharded fp8/int8/NF4 frozen base: QuantizedArray's scalar
    scale + 2-D codes and NF4Array's packed 1-D codes + [nb] block scales
    all shard/replicate through param_spec; the mesh step must reproduce
    the single-device quantized step."""
    dt = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8, "nf4": "nf4"}[qdtype]
    model, unet_params, te_params, peft_cfg, adapters, cfg, tx = _setup()
    frozen = {"unet": quantize_tree(unet_params, dt, min_size=16),
              "text_encoder": te_params}
    ref_losses, _ = _run_steps(model, cfg, tx, peft_cfg, adapters, frozen)
    mesh = create_mesh(dp=2, fsdp=4)
    mesh_losses, _ = _run_steps(model, cfg, tx, peft_cfg, adapters, frozen,
                                mesh=mesh)
    assert mesh_losses == pytest.approx(ref_losses, rel=2e-4)


def test_mesh_int8_optimizer_state_parity():
    """Block-2048 int8 optimizer state over FSDP-sharded adapter params:
    the blockwise reshape inside quantize_leaf must not corrupt values
    when the underlying param axis is sharded."""
    tx = int8_optimizer_state(optax.adamw(1e-3), min_size=256)
    model, unet_params, te_params, peft_cfg, adapters, cfg, _ = _setup()
    frozen = {"unet": unet_params, "text_encoder": te_params}
    ref_losses, ref_state = _run_steps(model, cfg, tx, peft_cfg, adapters,
                                       frozen, n_steps=3)
    mesh = create_mesh(dp=2, fsdp=4)
    mesh_losses, mesh_state = _run_steps(model, cfg, tx, peft_cfg, adapters,
                                         frozen, mesh=mesh, n_steps=3)
    # int8 state really exists in BOTH runs (the feature is on)
    for st in (ref_state, mesh_state):
        leaves = jax.tree.leaves(
            st.opt_state, is_leaf=lambda l: isinstance(l, Q8State))
        assert any(isinstance(l, Q8State) for l in leaves)
    assert mesh_losses == pytest.approx(ref_losses, rel=1e-3)
    _assert_tree_close(mesh_state.params, ref_state.params)


def test_mesh_ema_parity():
    """EMA shadow params under the mesh track the single-device EMA."""
    model, unet_params, te_params, peft_cfg, adapters, cfg, tx = _setup(
        ema_decay=0.99, ema_update_interval=1)
    frozen = {"unet": unet_params, "text_encoder": te_params}
    ref_losses, ref_state = _run_steps(model, cfg, tx, peft_cfg, adapters,
                                       frozen, ema=True, n_steps=3)
    mesh = create_mesh(dp=2, fsdp=4)
    mesh_losses, mesh_state = _run_steps(model, cfg, tx, peft_cfg, adapters,
                                         frozen, mesh=mesh, ema=True,
                                         n_steps=3)
    assert ref_state.ema is not None and mesh_state.ema is not None
    assert mesh_losses == pytest.approx(ref_losses, rel=2e-4)
    _assert_tree_close(mesh_state.ema, ref_state.ema)


def test_mesh_grad_accumulation_parity():
    """optax.MultiSteps gradient accumulation on the mesh: the micro-step
    accumulator (a full param-shaped tree) shards with the params; the
    flushed update after k micro-steps matches single-device."""
    k = 2
    tx = optax.MultiSteps(optax.adamw(1e-3), every_k_schedule=k)
    model, unet_params, te_params, peft_cfg, adapters, cfg, _ = _setup(
        accum=k)
    frozen = {"unet": unet_params, "text_encoder": te_params}
    ref_losses, ref_state = _run_steps(model, cfg, tx, peft_cfg, adapters,
                                       frozen, n_steps=2 * k)
    mesh = create_mesh(dp=2, fsdp=4)
    mesh_losses, mesh_state = _run_steps(model, cfg, tx, peft_cfg, adapters,
                                         frozen, mesh=mesh, n_steps=2 * k)
    assert mesh_losses == pytest.approx(ref_losses, rel=2e-4)
    _assert_tree_close(mesh_state.params, ref_state.params)


def test_mesh_full_feature_stack_parity():
    """The production combination in one step: fp8 frozen base + int8
    optimizer state + EMA + gradient accumulation, mesh vs single-device."""
    k = 2
    tx = optax.MultiSteps(int8_optimizer_state(optax.adamw(1e-3),
                                               min_size=256),
                          every_k_schedule=k)
    model, unet_params, te_params, peft_cfg, adapters, cfg, _ = _setup(
        ema_decay=0.99, ema_update_interval=1, accum=k)
    frozen = {"unet": quantize_tree(unet_params, jnp.float8_e4m3fn,
                                    min_size=16),
              "text_encoder": te_params}
    ref_losses, ref_state = _run_steps(model, cfg, tx, peft_cfg, adapters,
                                       frozen, ema=True, n_steps=2 * k)
    mesh = create_mesh(dp=2, fsdp=4)
    mesh_losses, mesh_state = _run_steps(model, cfg, tx, peft_cfg, adapters,
                                         frozen, mesh=mesh, ema=True,
                                         n_steps=2 * k)
    assert mesh_losses == pytest.approx(ref_losses, rel=1e-3)
    _assert_tree_close(mesh_state.params, ref_state.params)
    _assert_tree_close(mesh_state.ema, ref_state.ema)


def test_mesh_scan_layers_forward_parity():
    """Scan-over-layers stacked params FSDP-sharded on the mesh: nn.scan
    slicing through sharded [L, ...] leaves must match the per-layer loop
    on a single device."""
    from tests.test_scan_layers import _loop_and_scan_params
    loop_model, scan_model, params, stacked, args = _loop_and_scan_params()
    ref = loop_model.apply({"params": params}, *args)
    mesh = create_mesh(dp=2, fsdp=4)
    sharded = shard_params(jax.tree.map(jnp.asarray, stacked), mesh,
                           min_size_to_shard=64)
    out = jax.jit(
        lambda p, *a: scan_model.apply({"params": p}, *a))(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mesh_scan_layers_quantized_base_forward_parity():
    """Scan + quantized stacked base (per-layer [L] scales) + mesh: the
    three features compose — sharded quantized leaves slice per layer
    inside nn.scan and match the same computation on one device."""
    from tests.test_scan_layers import _loop_and_scan_params
    _, scan_model, _, stacked, args = _loop_and_scan_params()
    qt = quantize_tree(jax.tree.map(np.asarray, dict(stacked)),
                       jnp.float8_e4m3fn, min_size=16)
    ref = scan_model.apply({"params": jax.tree.map(jnp.asarray, qt)}, *args)
    mesh = create_mesh(dp=2, fsdp=4)
    sharded = shard_params(qt, mesh, min_size_to_shard=64)
    out = jax.jit(
        lambda p, *a: scan_model.apply({"params": p}, *a))(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_trainer_mesh_full_stack(tmp_path, monkeypatch):
    """GenericTrainer end-to-end on the 2x4 mesh with the whole feature
    stack at once: fp8 frozen UNet (config-reachable via unet.weight_dtype),
    ADAMW_8BIT optimizer, EMA, gradient accumulation — the path a real
    multi-chip LoRA run takes."""
    from onetrainer_tpu.io.safetensors_io import load_safetensors
    from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
    from onetrainer_tpu.util.enums import DataType, EMAMode, Optimizer
    from tests.test_trainer import tiny_train_config, write_tiny_checkpoint
    from tests.test_trainer_mesh import make_uniform_dataset

    monkeypatch.setenv("OT_MESH_DP", "2")
    monkeypatch.setenv("OT_MESH_FSDP", "4")
    base = str(tmp_path / "ckpt")
    ds = make_uniform_dataset(str(tmp_path / "ds"))
    write_tiny_checkpoint(base, tiny_sd_model())
    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.epochs = 1
    config.batch_size = 8
    config.unet.weight_dtype = DataType.FLOAT_8
    config.optimizer.optimizer = Optimizer.ADAMW_8BIT
    config.ema = EMAMode.GPU
    config.ema_decay = 0.99
    config.gradient_accumulation_steps = 2
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {"data": 2, "fsdp": 4, "sp": 1}
    # the frozen base really is quantized AND sharded
    from onetrainer_tpu.ops.quant import QuantizedArray
    q_leaves = [l for l in jax.tree.leaves(
        trainer.setup.frozen["unet"],
        is_leaf=lambda l: isinstance(l, QuantizedArray))
        if isinstance(l, QuantizedArray)]
    assert q_leaves, "unet.weight_dtype=FLOAT_8 did not quantize the base"
    trainer.train()
    trainer.end()
    assert trainer.train_progress.global_step >= 1
    assert os.path.exists(config.output_model_destination)
    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_unet") for k in sd)


def test_trainer_mesh_scan_layers(tmp_path, monkeypatch):
    """GenericTrainer on the mesh with OT_SCAN_LAYERS=1 and a quantized
    frozen DiT base (FLUX tiny): scan-stacked quantized leaves shard over
    fsdp and train end to end."""
    from onetrainer_tpu.config.concept_config import ConceptConfig
    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.io.safetensors_io import load_safetensors
    from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
    from onetrainer_tpu.util.enums import (
        DataType, EMAMode, ModelType, TimeUnit, TrainingMethod,
    )
    from tests.test_trainer_flux import (
        tiny_flux_model, write_tiny_flux_checkpoint,
    )
    from tests.test_trainer_mesh import make_uniform_dataset

    monkeypatch.setenv("OT_SCAN_LAYERS", "1")
    monkeypatch.setenv("OT_MESH_DP", "2")
    monkeypatch.setenv("OT_MESH_FSDP", "4")
    base = str(tmp_path / "ckpt")
    # batch_size 8 needs >= 8 samples or the loader yields zero batches
    ds = make_uniform_dataset(str(tmp_path / "ds"), n=10)
    write_tiny_flux_checkpoint(base, tiny_flux_model())

    config = TrainConfig.default_values()
    config.model_type = ModelType.FLUX_DEV_1
    config.training_method = TrainingMethod.LORA
    config.base_model_name = base
    config.workspace_dir = str(tmp_path / "ws")
    config.cache_dir = str(tmp_path / "cache")
    config.epochs = 1
    config.batch_size = 8
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
    config.prior.weight_dtype = DataType.FLOAT_8
    config.text_encoder.train = False
    config.text_encoder_2.train = False
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    assert trainer.mesh is not None
    assert trainer.model.transformer_config.scan_layers
    trainer.train()
    trainer.end()
    assert trainer.train_progress.global_step >= 1
    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_transformer_transformer_blocks_0_")
               for k in sd)
