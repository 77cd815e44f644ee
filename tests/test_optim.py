import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.config.train_config import TrainOptimizerConfig
from onetrainer_tpu.ops.stochastic import apply_updates_stochastic, stochastic_round_to_bf16
from onetrainer_tpu.train.ema import ema_decay, init_ema, maybe_update_ema, update_ema
from onetrainer_tpu.train.lr_schedules import make_lr_lambda, make_schedule, with_warmup
from onetrainer_tpu.train.optimizers import create_group_optimizer, create_optimizer
from onetrainer_tpu.util.enums import LearningRateScheduler, Optimizer

IMPLEMENTED = [
    Optimizer.ADAMW, Optimizer.ADAMW_8BIT, Optimizer.ADAM, Optimizer.SGD,
    Optimizer.ADAGRAD, Optimizer.RMSPROP, Optimizer.LION, Optimizer.LARS,
    Optimizer.LAMB, Optimizer.ADEMAMIX, Optimizer.ADOPT, Optimizer.ADABELIEF,
    Optimizer.YOGI, Optimizer.TIGER, Optimizer.ADAFACTOR, Optimizer.CAME,
    Optimizer.SCHEDULE_FREE_ADAMW, Optimizer.SCHEDULE_FREE_SGD,
    Optimizer.DADAPT_ADAM, Optimizer.PRODIGY,
    Optimizer.DADAPT_SGD, Optimizer.DADAPT_LION, Optimizer.DADAPT_ADAN,
    Optimizer.DADAPT_ADA_GRAD, Optimizer.AIDA,
]


def _params():
    rng = np.random.default_rng(0)
    return {
        "w": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
        "b": jnp.zeros((16,)),
    }


@pytest.mark.parametrize("opt", IMPLEMENTED, ids=lambda o: o.value)
def test_optimizer_runs_and_reduces_loss(opt):
    params = _params()
    # d-adaptation optimizers treat lr as a multiplier on the adaptive
    # step — their working point is lr=1 (dadaptation package docs)
    lr = 1.0 if opt.value.startswith("DADAPT") else 1e-2
    tx = create_optimizer(opt, TrainOptimizerConfig.default_values(), lr)
    state = tx.init(params)
    target = jnp.ones((8, 16))

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.mean((p["w"] + p["b"] - target) ** 2))(params)
        updates, state = tx.update(grads, state, params)
        import optax
        return optax.apply_updates(params, updates), state, loss

    loss0 = None
    for i in range(10):
        params, state, loss = step(params, state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0


def test_every_reference_optimizer_creates():
    """All 35 reference optimizer enums construct a working transform."""
    params = _params()
    for opt in Optimizer:
        tx = create_optimizer(opt, TrainOptimizerConfig.default_values(), 1e-3)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert jax.tree.structure(updates) == jax.tree.structure(params)


def test_dadaptation_grows_d():
    """The D-Adaptation estimator grows d from d0 toward a useful step
    size (Defazio & Mishchenko 2023, Alg. 3)."""
    from onetrainer_tpu.train.dadapt import DAdaptState, dadapt_sgd

    params = {"w": jnp.zeros((1000,), jnp.float32)}
    target = jnp.asarray(
        np.random.default_rng(0).standard_normal(1000), jnp.float32)
    tx = dadapt_sgd(1.0, momentum=0.0)
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: ((p["w"] - target) ** 2).mean())(params)
        updates, state = tx.update(grads, state, params)
        import optax
        return optax.apply_updates(params, updates), state

    for _ in range(50):
        params, state = step(params, state)
    d_state = state if isinstance(state, DAdaptState) else state[-1]
    assert float(d_state.d) > 1e-6          # grew beyond d0
    loss = float(((params["w"] - target) ** 2).mean())
    assert loss < 1.0                        # actually descending


def test_group_optimizer_different_lrs():
    params = {"unet": _params(), "te": _params()}
    labels = {"unet": {"w": "unet", "b": "unet"}, "te": {"w": "te", "b": "te"}}
    tx = create_group_optimizer(
        {"unet": 1e-2, "te": 0.0}, Optimizer.SGD,
        TrainOptimizerConfig.default_values(), labels)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["unet"]["w"]).max()) > 0
    assert float(jnp.abs(updates["te"]["w"]).max()) == 0


def test_lr_schedules_shapes():
    for sched in [LearningRateScheduler.CONSTANT, LearningRateScheduler.LINEAR,
                  LearningRateScheduler.COSINE, LearningRateScheduler.COSINE_WITH_RESTARTS,
                  LearningRateScheduler.COSINE_WITH_HARD_RESTARTS, LearningRateScheduler.REX]:
        fn = make_lr_lambda(sched, 100, num_cycles=2.0, min_factor=0.1)
        v0 = float(fn(jnp.asarray(0.0)))
        v_end = float(fn(jnp.asarray(99.0)))
        assert 0.0 <= v_end <= v0 + 1e-6 or sched in (
            LearningRateScheduler.COSINE_WITH_RESTARTS,
            LearningRateScheduler.COSINE_WITH_HARD_RESTARTS)
        assert v0 == pytest.approx(1.0, abs=1e-6)


def test_cosine_matches_reference_formula():
    import math
    fn = make_lr_lambda(LearningRateScheduler.COSINE, 100, min_factor=0.0)
    for step in [0, 25, 50, 99]:
        want = max(0.0, 0.5 * (1 + math.cos(step / 100 * math.pi)))
        assert float(fn(jnp.asarray(float(step)))) == pytest.approx(want, abs=1e-6)


def test_rex_matches_reference_formula():
    fn = make_lr_lambda(LearningRateScheduler.REX, 100, min_factor=0.0)
    for step in [0, 30, 70]:
        p = step / 100
        want = (1 - p) / ((1 - 0.9) + 0.9 * (1 - p))
        assert float(fn(jnp.asarray(float(step)))) == pytest.approx(want, abs=1e-5)


def test_warmup():
    fn = with_warmup(lambda s: jnp.ones_like(s), 10)
    assert float(fn(jnp.asarray(0.0))) == 0.0
    assert float(fn(jnp.asarray(5.0))) == 0.5
    assert float(fn(jnp.asarray(15.0))) == 1.0


def test_make_schedule_absolute():
    sched = make_schedule(LearningRateScheduler.CONSTANT, 100, 10, 1.0, 0.0, 3e-4)
    assert float(sched(jnp.asarray(50))) == pytest.approx(3e-4)
    assert float(sched(jnp.asarray(5))) == pytest.approx(1.5e-4)


def test_ema_decay_warmup():
    assert float(ema_decay(jnp.asarray(0), 0.999)) == pytest.approx(0.1)
    assert float(ema_decay(jnp.asarray(90), 0.999)) == pytest.approx(0.91)
    assert float(ema_decay(jnp.asarray(10_000_000), 0.999)) == pytest.approx(0.999)


def test_ema_update_and_interval():
    params = {"w": jnp.zeros((4,))}
    state = init_ema(params)
    new_params = {"w": jnp.ones((4,))}
    state = update_ema(state, new_params, max_decay=0.5)
    # decay at step 0 is 0.1 -> ema = 0*0.1 + 1*0.9
    np.testing.assert_allclose(np.asarray(state.params["w"]), 0.9)
    # interval gating: updates fire when (step+1) % interval == 0
    state2 = maybe_update_ema(state, params, 0.5, jnp.asarray(3), 5)
    np.testing.assert_allclose(np.asarray(state2.params["w"]), 0.9)
    state3 = maybe_update_ema(state, params, 0.5, jnp.asarray(4), 5)
    assert float(state3.params["w"][0]) != pytest.approx(0.9)
    # gradient accumulation: EMA advances only on the optimizer-step boundary
    state4 = maybe_update_ema(state, params, 0.5, jnp.asarray(0), 1, accum=4)
    np.testing.assert_allclose(np.asarray(state4.params["w"]), 0.9)
    state5 = maybe_update_ema(state, params, 0.5, jnp.asarray(3), 1, accum=4)
    assert float(state5.params["w"][0]) != pytest.approx(0.9)


def test_stochastic_rounding_unbiased():
    x = jnp.full((20000,), 1.0 + 1.0 / 512.0, dtype=jnp.float32)  # between bf16 steps
    rounded = stochastic_round_to_bf16(x, jax.random.PRNGKey(0))
    mean = float(rounded.astype(jnp.float32).mean())
    assert mean == pytest.approx(1.0 + 1.0 / 512.0, rel=1e-3)
    # exact values round exactly
    y = jnp.full((100,), 1.5, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(stochastic_round_to_bf16(y, jax.random.PRNGKey(1)).astype(jnp.float32)), 1.5)


def test_apply_updates_stochastic_mixed_tree():
    params = {"a": jnp.ones((8,), jnp.bfloat16), "b": jnp.ones((8,), jnp.float32)}
    updates = {"a": jnp.full((8,), 1e-4, jnp.float32), "b": jnp.full((8,), 1e-4, jnp.float32)}
    out = apply_updates_stochastic(params, updates, jax.random.PRNGKey(0))
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.float32
    assert float(out["b"][0]) == pytest.approx(1.0001)


def test_int8_optimizer_state_quantization():
    """_8BIT optimizers persist large moments as block-wise int8
    (reference: bnb 8-bit optimizers in create.py *_8BIT branches)."""
    import optax

    from onetrainer_tpu.ops.quant_opt import (
        Q8State, dequantize_leaf, int8_optimizer_state, quantize_leaf,
    )

    # quantize/dequantize round trip within absmax-int8 error
    x = jnp.asarray(np.random.default_rng(0).standard_normal(20000), jnp.float32)
    q = quantize_leaf(x)
    back = dequantize_leaf(q)
    assert q.values.dtype == jnp.int8
    # signed-sqrt codes: relative error bounded by ~2/127 of the value's
    # own sqrt-neighborhood; check both absolute (vs blockmax) and that
    # small values keep resolution
    err = np.abs(np.asarray(back) - np.asarray(x)).max()
    assert err <= float(np.abs(np.asarray(x)).max()) * (2.0 / 127.0) + 1e-6

    # training still converges on a toy problem
    params = {"w": jnp.zeros((20000,), jnp.float32)}
    target = jnp.asarray(np.random.default_rng(1).standard_normal(20000),
                         jnp.float32)
    tx = int8_optimizer_state(optax.adam(0.1), min_size=1024)
    state = tx.init(params)
    leaves = jax.tree.leaves(state, is_leaf=lambda l: isinstance(l, Q8State))
    assert any(isinstance(l, Q8State) for l in leaves)   # int8 state exists

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: ((p["w"] - target) ** 2).mean())(params)
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(60):
        params, state = step(params, state)
    loss = float(((params["w"] - target) ** 2).mean())
    assert loss < 0.5


def test_8bit_enum_wraps_quantized_state():
    from onetrainer_tpu.config.train_config import TrainOptimizerConfig
    from onetrainer_tpu.train.optimizers import create_optimizer
    from onetrainer_tpu.util.enums import Optimizer

    from onetrainer_tpu.ops.quant_opt import Q8State

    cfg = TrainOptimizerConfig.default_values()
    tx = create_optimizer(Optimizer.ADAMW_8BIT, cfg, 1e-3)
    params = {"w": jnp.zeros((20000,), jnp.float32)}
    state = tx.init(params)
    leaves = jax.tree.leaves(state, is_leaf=lambda l: isinstance(l, Q8State))
    assert any(isinstance(l, Q8State) and l.values.dtype == jnp.int8
               for l in leaves)


def test_amsgrad_matches_torch():
    # reference create.py:497,525 passes config.amsgrad into torch
    # Adam/AdamW; parity of one update step against CPU torch
    import torch

    from onetrainer_tpu.config.train_config import TrainOptimizerConfig
    from onetrainer_tpu.train.optimizers import create_optimizer
    from onetrainer_tpu.util.enums import Optimizer

    for opt, torch_cls in ((Optimizer.ADAMW, torch.optim.AdamW),
                           (Optimizer.ADAM, torch.optim.Adam)):
        cfg = TrainOptimizerConfig.default_values()
        cfg.amsgrad = True
        tx = create_optimizer(opt, cfg, 1e-3)
        p = {"w": jnp.ones((4,))}
        s = tx.init(p)
        u, s = tx.update({"w": jnp.full((4,), 0.1)}, s, p)
        ours = np.asarray(p["w"] + u["w"])

        tp = torch.ones(4, requires_grad=True)
        topt = torch_cls([tp], lr=1e-3, amsgrad=True)
        tp.grad = torch.full((4,), 0.1)
        topt.step()
        np.testing.assert_allclose(ours, tp.detach().numpy(), rtol=1e-6)
