"""Sequence parallelism (Ulysses) for the HunyuanVideo DiT: the token
stream shards over the "sp" mesh axis between blocks and reshards to
head-parallel inside attention (parallel/sp.py). The reference has no
sequence scaling at all (SURVEY.md §2.17) — this is a TPU-native
capability; correctness gate is exact parity with the unsharded step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from onetrainer_tpu.math.losses import LossConfig
from onetrainer_tpu.math.timesteps import TimestepConfig
from onetrainer_tpu.parallel.mesh import create_mesh, shard_batch
from onetrainer_tpu.parallel.sp import disable_sp, enable_sp, sp_enabled
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.hunyuan_train_step import make_hunyuan_train_step
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import TrainingMethod
from tests.test_trainer_hunyuan import tiny_hunyuan_model


@pytest.fixture(autouse=True)
def _reset_sp():
    yield
    disable_sp()


def _make_step_inputs(model):
    rng = jax.random.PRNGKey(0)
    transformer_params = model.transformer.init(
        rng, jnp.zeros((1, 2, 4, 4, 16)), jnp.asarray([500.0]),
        jnp.zeros((1, 5, 24)), jnp.ones((1, 5), jnp.int32),
        jnp.zeros((1, 16)))["params"]
    peft_cfg = PeftConfig(rank=2, alpha=2.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), transformer_params,
                                peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=2),
        stochastic_rounding=False)
    tx = optax.adamw(1e-3)
    state = create_train_state({"transformer_lora": adapters}, tx)
    frozen = {"transformer": transformer_params}
    b = 2
    batch = {
        # 2 frames x 4x4 latents -> 2*2*2 = 8 img tokens (divisible by sp=4
        # after 2x2 spatial packing: t=2, h/2=2, w/2=2)
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (b, 2, 4, 4, 16), jnp.float32),
        "loss_weight": jnp.ones((b,)),
        "text_encoder_1_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (b, 5, 24), jnp.float32),
        "tokens_mask_1": jnp.ones((b, 5), jnp.int32),
        "text_encoder_2_pooled_state": jax.random.normal(
            jax.random.PRNGKey(4), (b, 16), jnp.float32),
    }
    return state, frozen, batch, cfg, tx, peft_cfg


def test_sp_step_matches_unsharded():
    model = tiny_hunyuan_model()
    state, frozen, batch, cfg, tx, peft_cfg = _make_step_inputs(model)
    rng = jax.random.PRNGKey(7)

    # reference: no mesh, no sp
    step = make_hunyuan_train_step(model, cfg, tx, peft_cfg)
    ref_state, ref_metrics = step(state, frozen, batch, rng)
    ref_loss = float(ref_metrics["loss"])

    # sp=4 mesh (data=1, fsdp=2, sp=4 on the 8-device CPU farm)
    mesh = create_mesh(dp=1, fsdp=2, sp=4)
    assert dict(mesh.shape) == {"data": 1, "fsdp": 2, "sp": 4}
    enable_sp(mesh)
    assert sp_enabled()
    state2, frozen2, batch2, cfg2, tx2, _ = _make_step_inputs(model)
    step_sp = make_hunyuan_train_step(model, cfg2, tx2, peft_cfg)
    batch2 = shard_batch(batch2, mesh)
    sp_state, sp_metrics = step_sp(state2, frozen2, batch2, rng)
    sp_loss = float(sp_metrics["loss"])

    assert np.isfinite(sp_loss)
    np.testing.assert_allclose(sp_loss, ref_loss, rtol=2e-5, atol=2e-5)

    # updated adapter params agree too (full step parity, not just loss)
    ref_leaves = jax.tree.leaves(ref_state.params)
    sp_leaves = jax.tree.leaves(jax.device_get(sp_state.params))
    for a, b_ in zip(ref_leaves, sp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5)


def test_sp_inserts_all_to_all():
    """The compiled HLO actually contains the Ulysses reshard collectives
    (all-to-all over "sp"), proving the constraints are not no-ops."""
    model = tiny_hunyuan_model()
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    enable_sp(mesh)
    state, frozen, batch, cfg, tx, peft_cfg = _make_step_inputs(model)
    step = make_hunyuan_train_step(model, cfg, tx, peft_cfg)
    batch = shard_batch(batch, mesh)
    compiled = step.lower(state, frozen, batch,
                          jax.random.PRNGKey(0)).compile()
    hlo = compiled.as_text()
    assert "all-to-all" in hlo or "all_to_all" in hlo


def test_distributed_env_parsing(monkeypatch):
    """Multi-host bootstrap config (parallel/distributed.py): explicit
    coordinator vars, bare TPU-pod opt-in, and the zero-config default."""
    from onetrainer_tpu.parallel import distributed

    monkeypatch.delenv("OT_COORDINATOR", raising=False)
    monkeypatch.delenv("OT_MULTIHOST", raising=False)
    assert distributed.distributed_env() is None
    assert distributed.maybe_initialize_distributed() is False

    monkeypatch.setenv("OT_MULTIHOST", "1")
    assert distributed.distributed_env() == {}

    monkeypatch.setenv("OT_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("OT_NUM_PROCESSES", "4")
    monkeypatch.setenv("OT_PROCESS_ID", "2")
    assert distributed.distributed_env() == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }


def test_sp_ring_attention_path(monkeypatch):
    """Full train step with ring attention forced (OT_RING_ATTENTION=1)
    matches the unsharded step: the CP path is a drop-in for Ulysses.
    Text length 4 makes every attention's sequence (8 img + 4 txt = 12)
    divisible by the ring size."""
    monkeypatch.setenv("OT_RING_ATTENTION", "1")
    model = tiny_hunyuan_model()

    def inputs():
        state, frozen, batch, cfg, tx, peft_cfg = _make_step_inputs(model)
        b = 2
        batch["text_encoder_1_hidden_state"] = jax.random.normal(
            jax.random.PRNGKey(3), (b, 4, 24), jnp.float32)
        batch["tokens_mask_1"] = jnp.ones((b, 4), jnp.int32)
        return state, frozen, batch, cfg, tx, peft_cfg

    state, frozen, batch, cfg, tx, peft_cfg = inputs()
    rng = jax.random.PRNGKey(11)
    step = make_hunyuan_train_step(model, cfg, tx, peft_cfg)
    ref_loss = float(step(state, frozen, batch, rng)[1]["loss"])

    mesh = create_mesh(dp=1, fsdp=2, sp=4)
    enable_sp(mesh)
    state2, frozen2, batch2, cfg2, tx2, _ = inputs()
    step_ring = make_hunyuan_train_step(model, cfg2, tx2, peft_cfg)
    batch2 = shard_batch(batch2, mesh)
    compiled = step_ring.lower(state2, frozen2, batch2, rng).compile()
    assert "collective-permute" in compiled.as_text()  # the ring is real
    ring_loss = float(step_ring(state2, frozen2, batch2, rng)[1]["loss"])
    np.testing.assert_allclose(ring_loss, ref_loss, rtol=2e-5, atol=2e-5)


def test_trainer_e2e_with_sp_mesh(tmp_path, monkeypatch):
    """Trainer-level SP: GenericTrainer on a dp2 x fsdp2 x sp2 mesh runs
    the HunyuanVideo family end to end (OT_MESH_SP wiring, batch
    sharding over (data, fsdp) with sp replication)."""
    monkeypatch.setenv("OT_MESH_DP", "2")
    monkeypatch.setenv("OT_MESH_FSDP", "2")
    monkeypatch.setenv("OT_MESH_SP", "2")
    from onetrainer_tpu.config.concept_config import ConceptConfig
    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.io.safetensors_io import load_safetensors
    from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
    from onetrainer_tpu.util.enums import (
        EMAMode, ModelType, TimeUnit, TrainingMethod,
    )
    from tests.test_trainer_hunyuan import (
        make_video_dataset, tiny_hunyuan_model, write_tiny_hunyuan_checkpoint,
    )

    base = str(tmp_path / "ckpt")
    ds = make_video_dataset(str(tmp_path / "ds"), n_videos=4, n_images=4)
    model = tiny_hunyuan_model()
    write_tiny_hunyuan_checkpoint(base, model)

    config = TrainConfig.default_values()
    config.model_type = ModelType.HUNYUAN_VIDEO
    config.training_method = TrainingMethod.LORA
    config.base_model_name = base
    config.workspace_dir = str(tmp_path / "ws")
    config.cache_dir = str(tmp_path / "cache")
    config.epochs = 1
    config.batch_size = 4          # divisible by dp x fsdp = 4
    config.resolution = "32"
    config.frames = "9"
    config.aspect_ratio_bucketing = False
    config.lora_rank = 4
    config.lora_layers = "attn"
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
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 3
    config.concepts = [concept]
    config.output_model_destination = str(tmp_path / "out_sp.safetensors")
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {"data": 2, "fsdp": 2, "sp": 2}
    trainer.train()
    trainer.end()

    assert trainer.train_progress.global_step >= 1
    sd = load_safetensors(config.output_model_destination)
    assert any(k.startswith("lora_transformer_") for k in sd)


def test_sp_composes_with_scan_layers():
    """OT_SCAN_LAYERS + sp mesh together: the scanned HunyuanVideo step
    with Ulysses constraints inside the scan body matches the unsharded
    loop step."""
    from onetrainer_tpu.io.torch_flax import stack_scanned_blocks

    model = tiny_hunyuan_model()
    state, frozen, batch, cfg, tx, peft_cfg = _make_step_inputs(model)
    rng = jax.random.PRNGKey(21)
    step = make_hunyuan_train_step(model, cfg, tx, peft_cfg)
    ref_loss = float(step(state, frozen, batch, rng)[1]["loss"])

    # scan-stacked variant of the same model
    c = model.transformer_config
    scan_cfg = c.__class__(**{**c.__dict__, "scan_layers": True})

    class _M:
        pass

    from onetrainer_tpu.models.hunyuan_video import HunyuanVideoTransformer3D
    scan_model = _M()
    scan_model.transformer = HunyuanVideoTransformer3D(scan_cfg)

    mesh = create_mesh(dp=1, fsdp=2, sp=4)
    enable_sp(mesh)
    state2, frozen2, batch2, cfg2, tx2, _ = _make_step_inputs(model)
    stacked = dict(jax.device_get(frozen2["transformer"]))
    stack_scanned_blocks(stacked, "transformer_blocks")
    stack_scanned_blocks(stacked, "single_transformer_blocks")
    frozen2 = {"transformer": jax.tree.map(jnp.asarray, stacked)}
    from onetrainer_tpu.peft.lora import init_peft_params
    adapters = init_peft_params(jax.random.PRNGKey(1),
                                frozen2["transformer"], peft_cfg)
    from onetrainer_tpu.train.train_state import create_train_state
    state2 = create_train_state({"transformer_lora": adapters}, tx2)
    step2 = make_hunyuan_train_step(scan_model, cfg2, tx2, peft_cfg)
    batch2 = shard_batch(batch2, mesh)
    sp_loss = float(step2(state2, frozen2, batch2, rng)[1]["loss"])
    np.testing.assert_allclose(sp_loss, ref_loss, rtol=5e-5, atol=5e-5)
