import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from onetrainer_tpu.math.losses import LossConfig
from onetrainer_tpu.math.timesteps import TimestepConfig
from onetrainer_tpu.models.clip import CLIPTextConfig
from onetrainer_tpu.models.sd import StableDiffusionModel
from onetrainer_tpu.models.unet import UNetConfig
from onetrainer_tpu.models.vae import VAEConfig
from onetrainer_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.sd_train_step import SDStepConfig, make_sd_train_step
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import ModelType, TrainingMethod


def tiny_sd_model():
    return StableDiffusionModel(
        model_type=ModelType.STABLE_DIFFUSION_15,
        unet_config=UNetConfig(
            block_out_channels=(32, 64), cross_attn_blocks=(True, False),
            layers_per_block=1, transformer_layers_per_block=(1, 1),
            num_heads=(4, 4), cross_attention_dim=32, dtype=jnp.float32),
        vae_config=VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                             dtype=jnp.float32),
        te_config=CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, max_position_embeddings=16, eos_token_id=99,
            dtype=jnp.float32),
    )


def init_model_params(model, rng):
    unet_params = model.unet.init(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray([1]),
        jnp.zeros((1, 8, 32)))["params"]
    te_params = model.text_encoder.init(
        rng, jnp.zeros((1, 8), jnp.int32))["params"]
    return unet_params, te_params


def make_batch(rng, batch_size=8, cached_text=True):
    k1, k2 = jax.random.split(jax.random.PRNGKey(rng))
    batch = {
        "latent_image": jax.random.normal(k1, (batch_size, 16, 16, 4)),
        "loss_weight": jnp.ones((batch_size,)),
    }
    if cached_text:
        batch["text_encoder_hidden_state"] = jax.random.normal(k2, (batch_size, 8, 32))
    else:
        batch["tokens"] = jnp.asarray(
            np.tile([[1, 5, 7, 99, 0, 0, 0, 0]], (batch_size, 1)), jnp.int32)
    return batch


def _step_cfg(method, **kw):
    base = dict(
        training_method=method,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0),
        stochastic_rounding=False,
    )
    base.update(kw)
    return SDStepConfig(**base)


def test_lora_train_step_runs_and_learns():
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft_cfg = PeftConfig(rank=4, alpha=8.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)

    cfg = _step_cfg(TrainingMethod.LORA)
    tx = optax.adamw(1e-3)
    trainable = {"unet_lora": adapters}
    frozen = {"unet": unet_params, "text_encoder": te_params}
    state = create_train_state(trainable, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)

    batch = make_batch(0)
    losses = []
    for i in range(8):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    # same batch + same rng fold-in varies only via step; loss should drop
    assert min(losses[4:]) < losses[0]


def test_finetune_train_step_with_live_text_encoder():
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    cfg = _step_cfg(TrainingMethod.FINE_TUNE, train_text_encoder=True)
    tx = optax.adamw(1e-4)
    trainable = {"unet": unet_params, "text_encoder": te_params}
    state = create_train_state(trainable, tx)
    step = make_sd_train_step(model, cfg, tx)
    batch = make_batch(0, cached_text=False)
    state, metrics = step(state, {}, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_embedding_training_step():
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    cfg = _step_cfg(TrainingMethod.EMBEDDING, train_text_encoder=True)
    tx = optax.adamw(1e-3)
    # 2 extra token vectors, referenced by ids >= vocab_size (100, 101)
    trainable = {"embeddings": jnp.zeros((2, 32))}
    frozen = {"unet": unet_params, "text_encoder": te_params}
    state = create_train_state(trainable, tx)
    step = make_sd_train_step(model, cfg, tx)
    batch = make_batch(0, cached_text=False)
    batch["tokens"] = jnp.asarray(
        np.tile([[1, 100, 101, 99, 0, 0, 0, 0]], (8, 1)), jnp.int32)
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(jnp.abs(state.params["embeddings"]).max()) > 0  # got gradient


def test_ema_in_step():
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft_cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    cfg = _step_cfg(TrainingMethod.LORA, ema_decay=0.99, ema_update_interval=1)
    tx = optax.adamw(1e-3)
    trainable = {"unet_lora": adapters}
    state = create_train_state(trainable, tx, ema_enabled=True)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)
    state, _ = step(state, {"unet": unet_params, "text_encoder": te_params},
                    make_batch(0), jax.random.PRNGKey(2))
    assert int(state.ema.step) == 1


def test_sharded_lora_step_on_mesh():
    """Full FSDP+DP path on the virtual 8-device CPU mesh."""
    mesh = create_mesh(dp=2, fsdp=4)
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft_cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)

    cfg = _step_cfg(TrainingMethod.LORA)
    tx = optax.adamw(1e-3)

    # single-device reference first (the sharded step donates its buffers,
    # which may alias the originals via device_put)
    state1 = create_train_state({"unet_lora": jax.tree.map(jnp.copy, adapters)}, tx)
    step1 = make_sd_train_step(model, cfg, tx, peft_cfg)
    _, metrics1 = step1(state1, {"unet": unet_params, "text_encoder": te_params},
                        make_batch(0, cached_text=True), jax.random.PRNGKey(2))

    frozen = {
        "unet": shard_params(unet_params, mesh, min_size_to_shard=1024),
        "text_encoder": shard_params(te_params, mesh, min_size_to_shard=1024),
    }
    trainable = {"unet_lora": shard_params(adapters, mesh, min_size_to_shard=2 ** 30)}
    state = create_train_state(trainable, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)

    batch = shard_batch(make_batch(0, cached_text=True), mesh)
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) == pytest.approx(float(metrics1["loss"]), rel=1e-4)


def test_process_batch_slice_single_host():
    """Single host owns the whole batch; the multi-host slice math is the
    same code path with process_count=1
    (reference parallel design: SURVEY.md §2.17 multi-host input)."""
    from onetrainer_tpu.parallel.mesh import process_batch_slice
    sl = process_batch_slice(8)
    assert sl == slice(0, 8)
