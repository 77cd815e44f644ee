"""Host offload of optimizer/EMA state via XLA pinned_host memories —
the TPU analog of the reference's RAM offloading + EMAMode.CPU
(reference: modules/util/LayerOffloadConductor.py,
modules/module/EMAModule.py). The compiled step streams the optimizer
tree device<->host around the update.

The full compiled-step numerics run is TPU-only (the CPU backend's
memory-space support aborts mid-execution as of jax 0.9); CI covers the
placement layer, and test_offloaded_step_matches_on_device_tpu below
runs when the suite executes on real TPU hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
from onetrainer_tpu.train.train_state import (
    configure_offload, create_train_state, ema_to_compute, ema_to_storage,
    opt_to_compute, opt_to_storage,
)
from onetrainer_tpu.util.enums import TrainingMethod
from tests.test_train_step import init_model_params, tiny_sd_model


@pytest.fixture(autouse=True)
def _reset_offload():
    yield
    configure_offload(opt_state=False, ema=False)


def test_offload_placement_and_roundtrip():
    """create_train_state puts optimizer + EMA trees in pinned host
    memory when offload is configured; the to_compute/to_storage pair
    round-trips values exactly (outside jit — the in-step path is the
    same device_put lowered by XLA)."""
    model = tiny_sd_model()
    unet_params, _ = init_model_params(model, jax.random.PRNGKey(0))
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params,
                                PeftConfig(rank=4))
    tx = optax.adamw(1e-3)

    configure_offload(opt_state=True, ema=True)
    state = create_train_state({"unet_lora": adapters}, tx, ema_enabled=True)

    kinds = {leaf.sharding.memory_kind
             for leaf in jax.tree.leaves(state.opt_state)
             if hasattr(leaf, "sharding")}
    assert kinds == {"pinned_host"}, kinds
    ema_kinds = {leaf.sharding.memory_kind
                 for leaf in jax.tree.leaves(state.ema.params)}
    assert ema_kinds == {"pinned_host"}, ema_kinds
    # trainable params stay in device memory
    param_kinds = {leaf.sharding.memory_kind
                   for leaf in jax.tree.leaves(state.params)}
    assert "pinned_host" not in param_kinds

    # round-trip values survive exactly
    back = opt_to_compute(state.opt_state)
    back_kinds = {leaf.sharding.memory_kind
                  for leaf in jax.tree.leaves(back)
                  if hasattr(leaf, "sharding")}
    assert back_kinds == {"device"}, back_kinds
    again = opt_to_storage(back)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(again)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ema_dev = ema_to_compute(state.ema)
    assert {leaf.sharding.memory_kind
            for leaf in jax.tree.leaves(ema_dev.params)} == {"device"}
    ema_back = ema_to_storage(ema_dev)
    for a, b in zip(jax.tree.leaves(state.ema.params),
                    jax.tree.leaves(ema_back.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_offload_disabled_is_identity():
    configure_offload(opt_state=False, ema=False)
    tree = {"a": jnp.ones((4,))}
    assert opt_to_compute(tree) is tree
    assert opt_to_storage(tree) is tree
    assert ema_to_compute(None) is None


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="CPU backend aborts on in-step memory spaces")
def test_offloaded_step_matches_on_device_tpu():
    from onetrainer_tpu.train.sd_train_step import make_sd_train_step
    from tests.test_train_step import _step_cfg, make_batch

    model = tiny_sd_model()

    def run(offload):
        configure_offload(opt_state=offload, ema=offload)
        unet_params, te_params = init_model_params(model,
                                                   jax.random.PRNGKey(0))
        adapters = init_peft_params(
            jax.random.PRNGKey(1), jax.tree.map(jnp.copy, unet_params),
            PeftConfig(rank=4, alpha=8.0))
        cfg = _step_cfg(TrainingMethod.LORA)
        cfg = cfg.__class__(**{**cfg.__dict__, "ema_decay": 0.5})
        tx = optax.adamw(1e-3)
        state = create_train_state({"unet_lora": adapters}, tx,
                                   ema_enabled=True)
        step = make_sd_train_step(model, cfg, tx,
                                  PeftConfig(rank=4, alpha=8.0))
        frozen = {"unet": unet_params, "text_encoder": te_params}
        batch = make_batch(0)
        for _ in range(3):
            state, metrics = step(state, frozen, batch,
                                  jax.random.PRNGKey(2))
        return state, float(metrics["loss"])

    ref_state, ref_loss = run(False)
    off_state, off_loss = run(True)
    kinds = {leaf.sharding.memory_kind
             for leaf in jax.tree.leaves(off_state.opt_state)
             if hasattr(leaf, "sharding")}
    assert kinds == {"pinned_host"}, kinds
    np.testing.assert_allclose(off_loss, ref_loss, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(off_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
