"""Functional train state: one pytree carrying everything that changes
per step. Replaces the reference's mutable BaseModel fields
(reference: modules/model/BaseModel.py:65-143 — parameters/optimizer/ema/
train_progress)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from onetrainer_tpu.train.ema import EMAState


@struct.dataclass
class TrainState:
    step: jnp.ndarray                 # global optimizer step (int32)
    params: Any                       # trainable pytree (lora adapters, unet parts, embeddings)
    opt_state: Any
    ema: EMAState | None = None


# -- host offload of optimizer / EMA state -------------------------------------------
#
# The reference streams layers and optimizer state to pinned host RAM to
# fit big models on small GPUs (modules/util/LayerOffloadConductor.py;
# EMAModule EMAMode.CPU). The TPU equivalent is XLA memories: optimizer
# and EMA trees live in `pinned_host` HBM-adjacent host memory and the
# compiled step streams them in/out around the update — no Python-side
# choreography, XLA schedules the DMA overlap. Enabled by the trainer
# when `gradient_checkpointing == CPU_OFFLOADED` (opt state) or
# `ema == CPU` (EMA); the helpers are trace-time no-ops otherwise.

_OFFLOAD = {"opt": False, "ema": False}


def configure_offload(opt_state: bool = False, ema: bool = False) -> None:
    _OFFLOAD["opt"] = opt_state
    _OFFLOAD["ema"] = ema


def offload_enabled(kind: str = "opt") -> bool:
    return _OFFLOAD[kind]


def _placed(tree, memory_kind: str):
    # single-device only: on a mesh, FSDP sharding is the memory tool and
    # the trainer never enables offload (see GenericTrainer._setup_mesh)
    import jax
    if tree is None:
        return None
    from jax.sharding import SingleDeviceSharding
    target = SingleDeviceSharding(jax.devices()[0], memory_kind=memory_kind)
    return jax.tree.map(lambda x: jax.device_put(x, target), tree)


def opt_to_compute(tree):
    """Host-offloaded optimizer state -> device memory (inside jit)."""
    return _placed(tree, "device") if _OFFLOAD["opt"] else tree


def opt_to_storage(tree):
    """Optimizer state -> pinned host after the update (inside jit)."""
    return _placed(tree, "pinned_host") if _OFFLOAD["opt"] else tree


def ema_to_storage(ema):
    """EMA params -> pinned host (reference EMAMode.CPU)."""
    if ema is None or not _OFFLOAD["ema"]:
        return ema
    return ema._replace(params=_placed(ema.params, "pinned_host"))


def create_train_state(params, tx, ema_enabled: bool = False) -> TrainState:
    from onetrainer_tpu.train.ema import init_ema
    state = TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=init_ema(params) if ema_enabled else None,
    )
    if _OFFLOAD["opt"]:
        state = state.replace(opt_state=_placed(state.opt_state,
                                                "pinned_host"))
    if _OFFLOAD["ema"] and state.ema is not None:
        state = state.replace(ema=ema_to_storage(state.ema))
    return state


def ema_to_compute(ema):
    """Host-offloaded EMA params -> device memory for the update."""
    if ema is None or not _OFFLOAD["ema"]:
        return ema
    return ema._replace(params=_placed(ema.params, "device"))
