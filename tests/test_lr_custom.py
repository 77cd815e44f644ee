"""CUSTOM LR scheduler parity (closes the documented r2 deviation).

The reference loads an arbitrary torch LRScheduler class via importlib
with %PLACEHOLDER% args and composes warmup through SequentialLR
(modules/util/create.py:1179-1222, 1130-1141). The TPU-native analog
(train/lr_schedules.tabulate_custom_schedule) drives the same torch
class host-side against a 1-parameter optimizer and embeds the
resulting LR table in the jitted update. These tests replay the
reference's construction directly and assert the table matches, plus
the reference's warmup-step interpretation and schedule-free forcing.
"""
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.setup.sd_setup import _group_schedule
from onetrainer_tpu.train.lr_schedules import (
    resolve_warmup_steps,
    tabulate_custom_schedule,
)
from onetrainer_tpu.util.enums import LearningRateScheduler, Optimizer


def _config(**overrides):
    config = TrainConfig.default_values()
    config.learning_rate = 0.02
    config.learning_rate_warmup_steps = 0.0
    config.gradient_accumulation_steps = 1
    for key, value in overrides.items():
        setattr(config, key, value)
    return config


def _reference_replay(base_lr, total_steps, warmup_steps, make_sched):
    """Construct the scheduler exactly as the reference does
    (create.py:1209-1221: custom class, then SequentialLR warmup glue)
    and collect the LR at every optimizer step."""
    param = torch.zeros(1, requires_grad=True)
    opt = torch.optim.SGD([param], lr=base_lr)
    sched = make_sched(opt)
    if warmup_steps > 0:
        warmup = torch.optim.lr_scheduler.LambdaLR(
            opt, lr_lambda=lambda s: min(s / warmup_steps, 1.0))
        sched = torch.optim.lr_scheduler.SequentialLR(
            opt, schedulers=[warmup, sched], milestones=[warmup_steps])
    lrs = []
    for _ in range(total_steps + 1):
        lrs.append(float(opt.param_groups[0]["lr"]))
        opt.step()
        sched.step()
    return np.asarray(lrs, np.float64)


def test_custom_torch_scheduler_matches_reference_replay():
    total = 50
    config = _config(
        learning_rate_scheduler=LearningRateScheduler.CUSTOM,
        custom_learning_rate_scheduler="torch.optim.lr_scheduler.CosineAnnealingLR",
        scheduler_params=[
            {"key": "T_max", "value": "%SCHEDULER_STEPS%"},
            {"key": "eta_min", "value": "1e-4"},
        ],
    )
    schedule = _group_schedule(config, None, total)
    ref = _reference_replay(
        config.learning_rate, total, 0,
        lambda opt: torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=total, eta_min=1e-4))
    ours = np.asarray([float(schedule(s)) for s in range(total + 1)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    # the table is indexed inside jit with a traced step
    jitted = jax.jit(schedule)
    assert abs(float(jitted(jnp.asarray(7))) - ref[7]) < 1e-7
    # steps past the horizon clamp to the last entry instead of erroring
    assert float(schedule(total + 500)) == pytest.approx(ref[-1])


def test_custom_scheduler_warmup_composed_like_sequential_lr():
    total, warmup = 40, 10
    config = _config(
        learning_rate_scheduler=LearningRateScheduler.CUSTOM,
        learning_rate_warmup_steps=float(warmup),
        custom_learning_rate_scheduler="torch.optim.lr_scheduler.StepLR",
        scheduler_params=[
            {"key": "step_size", "value": "8"},
            {"key": "gamma", "value": "0.5"},
        ],
    )
    schedule = _group_schedule(config, None, total)
    ref = _reference_replay(
        config.learning_rate, total, warmup,
        lambda opt: torch.optim.lr_scheduler.StepLR(
            opt, step_size=8, gamma=0.5))
    ours = np.asarray([float(schedule(s)) for s in range(total + 1)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    assert ours[0] == 0.0                      # warmup starts at 0
    assert ours[warmup] == pytest.approx(config.learning_rate)


def test_custom_placeholders_resolved_like_reference():
    # %LR% resolves to the config learning rate (create.py:1196-1198),
    # non-placeholder strings go through ast.literal_eval.
    total = 12
    config = _config(
        learning_rate_scheduler=LearningRateScheduler.CUSTOM,
        custom_learning_rate_scheduler="torch.optim.lr_scheduler.ConstantLR",
        scheduler_params=[
            {"key": "factor", "value": "0.25"},
            {"key": "total_iters", "value": "%TOTAL_STEPS%"},
        ],
    )
    schedule = _group_schedule(config, None, total)
    ref = _reference_replay(
        config.learning_rate, total, 0,
        lambda opt: torch.optim.lr_scheduler.ConstantLR(
            opt, factor=0.25, total_iters=total))
    ours = np.asarray([float(schedule(s)) for s in range(total + 1)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_custom_traceable_callable_contract(tmp_path):
    # Non-torch callables stay supported: a traceable step->factor fn.
    mod = tmp_path / "my_sched.py"
    mod.write_text(textwrap.dedent("""
        def inverse_decay(step):
            return 1.0 / (1.0 + 0.1 * step)
    """))
    sys.path.insert(0, str(tmp_path))
    try:
        schedule = tabulate_custom_schedule(
            "my_sched.inverse_decay", [], base_lr=0.5, config_lr=0.5,
            total_steps=20, warmup_steps=0, num_epochs=1, steps_per_epoch=20)
        assert float(schedule(0)) == pytest.approx(0.5)
        assert float(schedule(10)) == pytest.approx(0.5 / 2.0)
        assert float(jax.jit(schedule)(jnp.asarray(10.0))) == pytest.approx(0.25)
    finally:
        sys.path.remove(str(tmp_path))


def test_warmup_step_interpretation_matches_reference():
    # create.py:1130-1136 — literal counts divided by accumulation,
    # fractions of total steps, invalid -> 0.
    assert resolve_warmup_steps(200.0, 1000, 1) == 200
    assert resolve_warmup_steps(200.0, 1000, 4) == 50
    assert resolve_warmup_steps(0.1, 1000, 1) == 100
    assert resolve_warmup_steps(1.0, 640, 2) == 640
    assert resolve_warmup_steps(0.0, 1000, 1) == 0
    assert resolve_warmup_steps(-5.0, 1000, 1) == 0


def test_schedule_free_forces_constant_without_warmup():
    config = _config(
        learning_rate_scheduler=LearningRateScheduler.COSINE,
        learning_rate_warmup_steps=200.0,
    )
    config.optimizer.optimizer = Optimizer.SCHEDULE_FREE_ADAMW
    schedule = _group_schedule(config, None, 100)
    for step in (0, 1, 50, 100):
        assert float(schedule(step)) == pytest.approx(config.learning_rate)


def test_fraction_warmup_reaches_base_lr_at_fraction_of_total():
    total = 200
    config = _config(
        learning_rate_scheduler=LearningRateScheduler.CONSTANT,
        learning_rate_warmup_steps=0.25,  # 25% of total -> 50 steps
    )
    schedule = _group_schedule(config, None, total)
    assert float(schedule(25)) == pytest.approx(config.learning_rate * 0.5)
    assert float(schedule(50)) == pytest.approx(config.learning_rate)
