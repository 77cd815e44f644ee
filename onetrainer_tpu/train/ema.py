"""EMA of trainable params as a pure pytree transform
(reference: modules/module/EMAModule.py:6-86).

Decay warmup: min((1+s)/(10+s), decay) with s counted in EMA updates;
updates gated on a step interval. On TPU the EMA lives in HBM next to
the params (EMAMode.GPU) or on the host (EMAMode.CPU) via device_put.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: dict
    step: jnp.ndarray  # number of EMA updates so far


def init_ema(params: dict) -> EMAState:
    # jnp.copy (not astype): fp32 astype aliases the input buffer, and an
    # aliased params/ema pair breaks buffer donation of the train state
    return EMAState(
        params=jax.tree.map(lambda p: jnp.copy(p).astype(jnp.float32), params),
        step=jnp.zeros([], jnp.int32),
    )


def ema_decay(state_step: jnp.ndarray, max_decay: float) -> jnp.ndarray:
    step = state_step.astype(jnp.float32)
    return jnp.minimum((1.0 + step) / (10.0 + step), max_decay)


def update_ema(state: EMAState, params: dict, max_decay: float,
               decay_step: jnp.ndarray | None = None) -> EMAState:
    """One EMA update. `decay_step` overrides the warmup step used for the
    decay; the reference warms up on the *optimizer-update index*
    (GenericTrainer.py:737 `update_step = global_step // accum` →
    `get_current_decay(update_step)`), which only equals the EMA-update
    count when update_step_interval == 1."""
    decay = ema_decay(state.step if decay_step is None else decay_step,
                      max_decay)
    new_params = jax.tree.map(
        lambda e, p: e * decay + p.astype(jnp.float32) * (1.0 - decay),
        state.params, params)
    return EMAState(params=new_params, step=state.step + 1)


def maybe_update_ema(
        state: EMAState,
        params: dict,
        max_decay: float,
        global_step: jnp.ndarray,
        update_interval: int,
        accum: int = 1,
) -> EMAState:
    """Interval-gated EMA update, usable inside jit (lax.cond).

    With gradient accumulation (accum > 1) params only change every
    `accum` micro-steps; the EMA advances on that boundary only, so the
    effective decay matches the reference's per-optimizer-step EMA
    (reference: GenericTrainer per-update EMA.step)."""
    period = max(update_interval, 1) * max(accum, 1)
    if period <= 1:
        return update_ema(state, params, max_decay)
    # reference decay warmup runs on the optimizer-update index, not the
    # EMA-update count (GenericTrainer.py:737-746)
    decay_step = global_step // max(accum, 1)
    return jax.lax.cond(
        ((global_step + 1) % period) == 0,
        lambda s: update_ema(s, params, max_decay, decay_step=decay_step),
        lambda s: s,
        state,
    )
