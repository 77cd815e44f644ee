"""Learning-rate schedules as jnp-traceable step→factor functions.

Same curve semantics as the reference factories
(reference: modules/util/lr_scheduler_util.py:5-95 and
modules/util/create.py:1114-1232): a unit-height base curve composed with
linear warmup and a min-factor floor; the optimizer multiplies by the
group learning rate. Traceable so the whole schedule lives inside the
jitted update (no per-step host sync). CUSTOM schedulers (importlib
classes with %PLACEHOLDER% args) are resolved host-side and injected.
"""

from __future__ import annotations

import importlib
import math

import jax.numpy as jnp

from onetrainer_tpu.util.enums import LearningRateScheduler


def _apply_min_factor(value, min_factor: float):
    return min_factor + (1.0 - min_factor) * value


def make_lr_lambda(
        scheduler: LearningRateScheduler,
        scheduler_steps: int,
        num_cycles: float = 1.0,
        min_factor: float = 0.0,
):
    """Unit-height schedule factor (no warmup)."""
    steps = max(scheduler_steps, 1)

    if scheduler == LearningRateScheduler.CONSTANT:
        return lambda step: jnp.ones_like(jnp.asarray(step, jnp.float32))

    if scheduler == LearningRateScheduler.LINEAR:
        def fn(step):
            lin = jnp.maximum(0.0, (steps - step) / steps)
            return _apply_min_factor(lin, min_factor)
        return fn

    if scheduler == LearningRateScheduler.COSINE:
        def fn(step):
            progress = step / steps
            cos_val = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(progress * math.pi)))
            return _apply_min_factor(cos_val, min_factor)
        return fn

    if scheduler == LearningRateScheduler.COSINE_WITH_RESTARTS:
        def fn(step):
            progress = jnp.minimum(step, steps - 1) / steps
            cos_val = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(progress * 2.0 * math.pi * num_cycles)))
            return _apply_min_factor(cos_val, min_factor)
        return fn

    if scheduler == LearningRateScheduler.COSINE_WITH_HARD_RESTARTS:
        def fn(step):
            progress = jnp.minimum(step, steps - 1) / steps
            cos_val = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(((progress * num_cycles) % 1.0) * math.pi)))
            return _apply_min_factor(cos_val, min_factor)
        return fn

    if scheduler == LearningRateScheduler.REX:
        def fn(step):
            # Reflected exponential (arXiv:2107.04197), d=0.9
            d = 0.9
            progress = step / steps
            div = (1 - d) + d * (1 - progress)
            val = jnp.where(step < steps, (1 - progress) / div, 0.0)
            return _apply_min_factor(jnp.maximum(val, 0.0), min_factor)
        return fn

    if scheduler == LearningRateScheduler.ADAFACTOR:
        # relative-step inverse-sqrt schedule (AdafactorSchedule semantics)
        def fn(step):
            return 1.0 / jnp.sqrt(jnp.maximum(step.astype(jnp.float32), 1.0))
        return fn

    raise ValueError(f"unsupported scheduler {scheduler}")


def with_warmup(lr_lambda, warmup_steps: float):
    """Linear warmup for `warmup_steps`, then the base schedule restarted at 0
    (reference: lr_lambda_warmup)."""
    warmup_steps = float(warmup_steps)
    if warmup_steps <= 0:
        return lr_lambda

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step < warmup_steps,
            step / warmup_steps,
            lr_lambda(jnp.maximum(step - warmup_steps, 0.0)),
        )
    return fn


def make_schedule(
        scheduler: LearningRateScheduler,
        total_steps: int,
        warmup_steps: float,
        num_cycles: float,
        min_factor: float,
        base_lr: float,
):
    """step -> absolute LR, traceable."""
    scheduler_steps = max(int(total_steps - warmup_steps), 1)
    base = make_lr_lambda(scheduler, scheduler_steps, num_cycles, min_factor)
    fn = with_warmup(base, warmup_steps)
    return lambda step: base_lr * fn(jnp.asarray(step, jnp.float32))


def load_custom_scheduler(class_name: str, scheduler_params: list[dict],
                          placeholders: dict[str, float]):
    """Import a user scheduler class and resolve %PLACEHOLDER% args
    (reference: modules/util/create.py:1181-1222). Returns (cls, kwargs)."""
    module_name, _, cls_name = class_name.rpartition(".")
    module = importlib.import_module(module_name)
    cls = getattr(module, cls_name)
    kwargs = {}
    for entry in scheduler_params or []:
        key, value = entry["key"], entry["value"]
        if isinstance(value, str) and value.startswith("%") and value.endswith("%"):
            value = placeholders[value.strip("%")]
        else:
            try:
                value = float(value) if "." in str(value) else int(value)
            except (TypeError, ValueError):
                pass
        kwargs[key] = value
    return cls, kwargs
