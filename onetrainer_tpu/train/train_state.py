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


def create_train_state(params, tx, ema_enabled: bool = False) -> TrainState:
    from onetrainer_tpu.train.ema import init_ema
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=init_ema(params) if ema_enabled else None,
    )
