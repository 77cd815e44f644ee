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


def resolve_warmup_steps(warmup_steps: float, total_steps: int,
                         gradient_accumulation_steps: int = 1) -> int:
    """The reference's warmup interpretation (modules/util/create.py:1130-1136):
    values > 1 are a literal step count (divided by gradient accumulation,
    because the schedule is indexed by optimizer steps); values in (0, 1]
    are a fraction of total optimizer steps; anything else is 0."""
    if warmup_steps > 1:
        return int(warmup_steps / max(gradient_accumulation_steps, 1))
    if 0 < warmup_steps <= 1:
        return int(warmup_steps * total_steps)
    return 0


def load_custom_scheduler(class_name: str, scheduler_params: list[dict],
                          placeholders: dict[str, float]):
    """Import a user scheduler class and resolve %PLACEHOLDER% args
    (reference: modules/util/create.py:1181-1222). Returns (cls, kwargs)."""
    import ast
    if not class_name:
        raise AssertionError(
            "Must specify a class when using a custom LR scheduler.")
    if "." not in class_name:
        raise AssertionError(
            "Custom class name must be in the format <module>.<class>")
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
                value = ast.literal_eval(value)
            except (TypeError, ValueError, SyntaxError):
                pass
        kwargs[key] = value
    return cls, kwargs


def tabulate_custom_schedule(
        class_name: str,
        scheduler_params: list[dict],
        base_lr: float,
        config_lr: float,
        total_steps: int,
        warmup_steps: int,
        num_epochs: int,
        steps_per_epoch: int,
):
    """CUSTOM scheduler → precomputed LR lookup table, the TPU-native analog
    of the reference's importlib class loading (modules/util/create.py:
    1179-1222). The user's torch ``LRScheduler`` subclass is driven on the
    host against a 1-parameter CPU optimizer for every optimizer step up
    front; the resulting float32 table (4 bytes/step) is embedded in the
    jitted update and indexed by the step counter — exact torch semantics
    (including ``SequentialLR`` warmup composition, matching the reference)
    with zero per-step host sync. Resume needs no ``last_epoch`` replay:
    the table is indexed by the absolute optimizer step.

    Placeholders mirror the reference: %LR% (config learning rate),
    %EPOCHS%, %STEPS_PER_EPOCH%, %TOTAL_STEPS%, %SCHEDULER_STEPS%; other
    values go through ``ast.literal_eval``. Non-torch callables keep the
    previous contract: a traceable ``fn(step) -> lr-factor`` (class
    instantiated with the resolved kwargs first, if it is a class).
    """
    cls, kwargs = load_custom_scheduler(class_name, scheduler_params, {
        "LR": config_lr,
        "EPOCHS": num_epochs,
        "STEPS_PER_EPOCH": steps_per_epoch,
        "TOTAL_STEPS": total_steps,
        "SCHEDULER_STEPS": max(total_steps - warmup_steps, 0),
    })

    try:
        import torch
        is_torch_sched = isinstance(cls, type) and issubclass(
            cls, torch.optim.lr_scheduler.LRScheduler)
    except ImportError:  # pragma: no cover - torch is in the image
        torch, is_torch_sched = None, False

    if not is_torch_sched:
        # Traceable-callable contract: factor(step), scaled by base_lr.
        fn = cls(**kwargs) if isinstance(cls, type) else cls
        if not callable(fn):
            raise TypeError(
                f"custom scheduler {class_name} is neither a torch "
                "LRScheduler nor a callable step->factor")
        return lambda step: base_lr * fn(jnp.asarray(step, jnp.float32))

    # Host-side replay of the real torch scheduler.
    param = torch.zeros(1, requires_grad=True)
    opt = torch.optim.SGD([param], lr=base_lr)
    sched = cls(optimizer=opt, **kwargs)
    if warmup_steps > 0:
        # Reference composition: constant-factor LambdaLR warmup, then the
        # custom scheduler, glued by SequentialLR (create.py:1213-1221).
        warmup = torch.optim.lr_scheduler.LambdaLR(
            opt, lr_lambda=lambda s: min(s / warmup_steps, 1.0))
        sched = torch.optim.lr_scheduler.SequentialLR(
            opt, schedulers=[warmup, sched], milestones=[warmup_steps])
    lrs = []
    for _ in range(max(total_steps, 1) + 1):
        lrs.append(float(opt.param_groups[0]["lr"]))
        opt.step()
        sched.step()
    table = jnp.asarray(lrs, jnp.float32)

    def fn(step):
        idx = jnp.clip(jnp.asarray(step, jnp.int32), 0, table.shape[0] - 1)
        return table[idx]
    return fn
