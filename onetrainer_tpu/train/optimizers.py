"""Optimizer factory: the reference's 35-way optimizer matrix mapped onto
optax transforms, plus custom implementations (CAME, Tiger) where optax
has no equivalent (reference: modules/util/create.py:434-1087,
modules/util/optimizer_util.py:12-445).

TPU notes:
- "Fused back pass" / per-parameter `step_parameter` machinery
  (reference: modules/util/optimizer/adamw_extensions.py) is unnecessary:
  the whole optimizer update is one fused XLA program inside the jitted
  train step. The config flag is accepted and ignored.
- 8-bit variants persist optimizer-state leaves as block-wise int8 with
  per-block absmax scales (ops/quant_opt.py), dequantizing transiently
  inside the fused update — the bitsandbytes-8bit equivalent.
- bf16 stochastic rounding is applied at the param update
  (see ops/stochastic.py), not inside each optimizer.
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
import optax
import optax.contrib

from onetrainer_tpu.config.train_config import TrainOptimizerConfig
from onetrainer_tpu.util.enums import Optimizer

ScheduleOrFloat = Callable | float


def _d(value, default):
    return default if value is None else value


# -- custom transforms ------------------------------------------------------------


def scale_by_tiger(b1: float = 0.965) -> optax.GradientTransformation:
    """Tiger: sign of a single EMA of gradients (a budget Lion)."""
    def init_fn(params):
        return {"momentum": jax.tree.map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        momentum = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g, state["momentum"], updates)
        new_updates = jax.tree.map(jnp.sign, momentum)
        return new_updates, {"momentum": momentum}

    return optax.GradientTransformation(init_fn, update_fn)


def tiger(learning_rate: ScheduleOrFloat, b1: float = 0.965,
          weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_tiger(b1),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def _factored_dims(shape):
    if len(shape) < 2:
        return None
    return len(shape) - 2, len(shape) - 1  # row, col axes


def scale_by_came(
        b1: float = 0.9,
        b2: float = 0.999,
        b3: float = 0.9999,
        eps1: float = 1e-30,
        eps2: float = 1e-16,
        clip_threshold: float = 1.0,
) -> optax.GradientTransformation:
    """CAME: Confidence-guided Adaptive Memory Efficient optimizer
    (arXiv:2307.02047). Factored second moment + factored confidence;
    matches the reference's CAME implementation semantics
    (reference: modules/util/optimizer/CAME.py)."""

    def _moment_init(p):
        dims = _factored_dims(p.shape)
        if dims is None:
            return {"v": jnp.zeros_like(p)}
        r, c = dims
        row_shape = list(p.shape); row_shape.pop(c)
        col_shape = list(p.shape); col_shape.pop(r)
        return {"v_row": jnp.zeros(row_shape, p.dtype),
                "v_col": jnp.zeros(col_shape, p.dtype)}

    def init_fn(params):
        return {
            "m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(_moment_init, params,
                              is_leaf=lambda x: isinstance(x, jnp.ndarray)),
            "r": jax.tree.map(_moment_init, params,
                              is_leaf=lambda x: isinstance(x, jnp.ndarray)),
            "count": jnp.zeros([], jnp.int32),
        }

    def _approx(row, col, r_axis, c_axis):
        # factored approximation: outer(row, col) / mean(row)
        mean_row = jnp.mean(row, axis=r_axis if row.ndim > 0 else None, keepdims=True)
        row_n = row / jnp.maximum(mean_row, 1e-30)
        return jnp.expand_dims(row_n, c_axis) * jnp.expand_dims(col, r_axis)

    def _update_factored(sq, moments, beta, r_axis, c_axis):
        row = beta * moments["v_row"] + (1 - beta) * jnp.mean(sq, axis=c_axis)
        col = beta * moments["v_col"] + (1 - beta) * jnp.mean(sq, axis=r_axis)
        return {"v_row": row, "v_col": col}, _approx(row, col, r_axis, c_axis)

    def update_fn(updates, state, params=None):
        count = state["count"] + 1

        def per_param(g, m, v, r):
            dims = _factored_dims(g.shape)
            gsq = g * g + eps1
            if dims is None:
                v_new = {"v": b2 * v["v"] + (1 - b2) * gsq}
                u = g / jnp.sqrt(v_new["v"])
            else:
                ra, ca = dims
                v_new, vhat = _update_factored(gsq, v, b2, ra, ca)
                u = g / jnp.sqrt(vhat)
            # update clipping (RMS)
            rms = jnp.sqrt(jnp.mean(u * u))
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            m_new = b1 * m + (1 - b1) * u
            # confidence: EMA of (u - m)^2
            conf_sq = (u - m_new) ** 2 + eps2
            if dims is None:
                r_new = {"v": b3 * r["v"] + (1 - b3) * conf_sq}
                denom = jnp.sqrt(r_new["v"])
            else:
                ra, ca = dims
                r_new, rhat = _update_factored(conf_sq, r, b3, ra, ca)
                denom = jnp.sqrt(rhat)
            out = m_new / jnp.maximum(denom, 1e-30)
            return out, m_new, v_new, r_new

        flat_g, tdef = jax.tree.flatten(updates)
        flat_m = tdef.flatten_up_to(state["m"])
        # a moment entry is the per-param dict created by _moment_init
        is_moment = lambda x: isinstance(x, dict) and (
            set(x) == {"v"} or set(x) == {"v_row", "v_col"})
        flat_v = jax.tree.flatten(state["v"], is_leaf=is_moment)[0]
        flat_r = jax.tree.flatten(state["r"], is_leaf=is_moment)[0]

        outs = [per_param(g, m, v, r)
                for g, m, v, r in zip(flat_g, flat_m, flat_v, flat_r)]
        new_updates = tdef.unflatten([o[0] for o in outs])
        new_m = tdef.unflatten([o[1] for o in outs])
        new_v = tdef.unflatten([o[2] for o in outs])
        new_r = tdef.unflatten([o[3] for o in outs])
        return new_updates, {"m": new_m, "v": new_v, "r": new_r, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def came(learning_rate: ScheduleOrFloat, b1=0.9, b2=0.999, b3=0.9999,
         eps1=1e-30, eps2=1e-16, clip_threshold=1.0,
         weight_decay=0.0) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_came(b1, b2, b3, eps1, eps2, clip_threshold),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


# -- the factory ------------------------------------------------------------------

_UNIMPLEMENTED: dict = {}


def create_optimizer(
        optimizer: Optimizer,
        cfg: TrainOptimizerConfig,
        learning_rate: ScheduleOrFloat,
) -> optax.GradientTransformation:
    """Build the optax transformation for one param group.

    `learning_rate` may be a float or a traceable step->lr schedule.
    Hyperparameter defaults follow the reference's per-optimizer tables
    (reference: modules/util/optimizer_util.py OPTIMIZER_DEFAULT_PARAMETERS).
    _8BIT variants persist their large state leaves as block-wise int8
    (ops/quant_opt.py — the bitsandbytes 8-bit optimizer equivalent)."""
    tx = _create_base_optimizer(optimizer, cfg, learning_rate)
    if optimizer.value.endswith("_8BIT"):
        from onetrainer_tpu.ops.quant_opt import int8_optimizer_state
        tx = int8_optimizer_state(tx)
    return tx


def _create_base_optimizer(
        optimizer: Optimizer,
        cfg: TrainOptimizerConfig,
        learning_rate: ScheduleOrFloat,
) -> optax.GradientTransformation:
    lr = learning_rate
    wd = _d(cfg.weight_decay, 0.0)

    match optimizer:
        case Optimizer.ADAMW | Optimizer.ADAMW_8BIT:
            if cfg.amsgrad:
                # torch AdamW(amsgrad=True) = amsgrad + decoupled decay
                # (reference: create.py:497,525 passes config.amsgrad)
                return optax.chain(
                    optax.scale_by_amsgrad(
                        b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                        eps=_d(cfg.eps, 1e-8)),
                    optax.add_decayed_weights(_d(cfg.weight_decay, 1e-2)),
                    optax.scale_by_learning_rate(lr))
            return optax.adamw(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                eps=_d(cfg.eps, 1e-8),
                weight_decay=_d(cfg.weight_decay, 1e-2),
                nesterov=False)
        case Optimizer.ADAM | Optimizer.ADAM_8BIT:
            if cfg.amsgrad:
                base = optax.chain(
                    optax.scale_by_amsgrad(
                        b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                        eps=_d(cfg.eps, 1e-8)),
                    optax.scale_by_learning_rate(lr))
            else:
                base = optax.adam(
                    lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                    eps=_d(cfg.eps, 1e-8))
            if wd:
                # torch Adam couples L2 into the gradient
                return optax.chain(optax.add_decayed_weights(wd), base)
            return base
        case Optimizer.SGD | Optimizer.SGD_8BIT:
            return optax.sgd(
                lr, momentum=_d(cfg.momentum, 0.0) or None,
                nesterov=cfg.nesterov)
        case Optimizer.ADAGRAD | Optimizer.ADAGRAD_8BIT:
            lr_decay = _d(cfg.lr_decay, 0.0)
            if lr_decay:
                # torch Adagrad: lr_t = lr / (1 + step * lr_decay)
                base_lr = lr

                def lr(count, _base=base_lr, _dec=lr_decay):
                    scalar = _base(count) if callable(_base) else _base
                    return scalar / (1.0 + count * _dec)
            base = optax.adagrad(
                lr, initial_accumulator_value=float(_d(cfg.initial_accumulator_value, 0)),
                eps=_d(cfg.eps, 1e-10))
            if wd:
                # torch semantics: L2 term joins the gradient BEFORE the
                # accumulator update
                return optax.chain(optax.add_decayed_weights(wd), base)
            return base
        case Optimizer.RMSPROP | Optimizer.RMSPROP_8BIT:
            base = optax.rmsprop(
                lr, decay=_d(cfg.alpha, 0.99), eps=_d(cfg.eps, 1e-8),
                momentum=_d(cfg.momentum, 0.0) or None,
                centered=cfg.centered)
            if wd:
                # torch RMSprop weight_decay is L2-into-gradient
                return optax.chain(optax.add_decayed_weights(wd), base)
            return base
        case Optimizer.LION | Optimizer.LION_8BIT:
            return optax.lion(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.99),
                weight_decay=_d(cfg.weight_decay, 0.0))
        case Optimizer.LARS | Optimizer.LARS_8BIT:
            return optax.lars(
                lr, weight_decay=wd,
                momentum=_d(cfg.momentum, 0.0),
                nesterov=cfg.nesterov)
        case Optimizer.LAMB | Optimizer.LAMB_8BIT:
            return optax.lamb(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                eps=_d(cfg.eps, 1e-8), weight_decay=wd)
        case Optimizer.ADEMAMIX | Optimizer.ADEMAMIX_8BIT:
            return optax.contrib.ademamix(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                b3=_d(cfg.beta3, 0.9999), alpha=_d(cfg.alpha, 5.0),
                eps=_d(cfg.eps, 1e-8), weight_decay=_d(cfg.weight_decay, 0.0))
        case Optimizer.ADOPT:
            base = optax.contrib.adopt(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.9999),
                eps=_d(cfg.eps, 1e-6))
            if wd:
                return optax.chain(optax.add_decayed_weights(wd), base)
            return base
        case Optimizer.ADABELIEF:
            base = optax.adabelief(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                eps=_d(cfg.eps, 1e-16), eps_root=_d(cfg.eps2, 1e-16))
            if wd:
                return optax.chain(optax.add_decayed_weights(wd), base)
            return base
        case Optimizer.YOGI:
            base = optax.yogi(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                eps=_d(cfg.eps, 1e-3))
            if wd:
                return optax.chain(optax.add_decayed_weights(wd), base)
            return base
        case Optimizer.TIGER:
            return tiger(lr, b1=_d(cfg.beta1, 0.965),
                         weight_decay=_d(cfg.weight_decay, 0.01))
        case Optimizer.ADAFACTOR:
            # reference/torch uses a negative decay_rate convention (-0.8);
            # optax wants the magnitude
            return optax.adafactor(
                learning_rate=lr,
                decay_rate=abs(_d(cfg.decay_rate, -0.8)),
                clipping_threshold=_d(cfg.clip_threshold, 1.0),
                weight_decay_rate=_d(cfg.weight_decay, 0.0) or None,
                eps=_d(cfg.eps, 1e-30),
                momentum=cfg.beta1,  # reference default None = no momentum
                multiply_by_parameter_scale=bool(cfg.scale_parameter),
                factored=True)
        case Optimizer.CAME:
            return came(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                b3=_d(cfg.beta3, 0.9999), eps1=_d(cfg.eps, 1e-30),
                eps2=_d(cfg.eps2, 1e-16),
                clip_threshold=_d(cfg.clip_threshold, 1.0),
                weight_decay=_d(cfg.weight_decay, 1e-2))
        case Optimizer.SCHEDULE_FREE_ADAMW:
            # optax.contrib.schedule_free_* accept a ScalarOrSchedule —
            # the user's configured LR/warmup passes straight through
            # (reference: create.py:755-774 passes config LR)
            return optax.contrib.schedule_free_adamw(
                lr,
                b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                eps=_d(cfg.eps, 1e-8),
                weight_decay=_d(cfg.weight_decay, 0.01),
                weight_lr_power=_d(cfg.weight_lr_power, 2.0))
        case Optimizer.SCHEDULE_FREE_SGD:
            # the reference's SGDScheduleFree takes `momentum`, not beta1
            # (optimizer_util.py OPTIMIZER_DEFAULT_PARAMETERS)
            momentum = _d(cfg.momentum, 0.9)
            if momentum == 0.0:
                raise ValueError(
                    "SCHEDULE_FREE_SGD needs momentum > 0 here: optax's "
                    "schedule_free derives eval params by dividing by b1, "
                    "so the reference's momentum=0 mode cannot be "
                    "represented (default: 0.9)")
            return optax.contrib.schedule_free_sgd(
                lr,
                b1=momentum,
                weight_decay=_d(cfg.weight_decay, 0.01),
                weight_lr_power=_d(cfg.weight_lr_power, 2.0))
        case Optimizer.DADAPT_ADAM:
            # decouple=False (the reference default) is dadaptation's
            # L2-into-gradient mode; decoupled AdamW-style otherwise
            base = optax.contrib.dadapt_adamw(
                learning_rate=lr, betas=(_d(cfg.beta1, 0.9), _d(cfg.beta2, 0.999)),
                eps=_d(cfg.eps, 1e-8),
                weight_decay=wd if cfg.decouple else 0.0)
            if wd and not cfg.decouple:
                return optax.chain(optax.add_decayed_weights(wd), base)
            return base
        case Optimizer.DADAPT_SGD:
            from onetrainer_tpu.train.dadapt import dadapt_sgd
            return dadapt_sgd(
                lr, momentum=_d(cfg.momentum, 0.0), d0=_d(cfg.d0, 1e-6),
                weight_decay=_d(cfg.weight_decay, 0.0),
                growth_rate=_d(cfg.growth_rate, float("inf")))
        case Optimizer.DADAPT_LION:
            from onetrainer_tpu.train.dadapt import dadapt_lion
            return dadapt_lion(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                d0=_d(cfg.d0, 1e-6), weight_decay=_d(cfg.weight_decay, 0.0))
        case Optimizer.DADAPT_ADA_GRAD:
            from onetrainer_tpu.train.dadapt import dadapt_adagrad
            return dadapt_adagrad(
                lr, eps=_d(cfg.eps, 0.0), d0=_d(cfg.d0, 1e-6),
                weight_decay=_d(cfg.weight_decay, 0.0))
        case Optimizer.DADAPT_ADAN:
            from onetrainer_tpu.train.dadapt import dadapt_adan
            return dadapt_adan(
                lr, b1=_d(cfg.beta1, 0.98), b2=_d(cfg.beta2, 0.92),
                b3=_d(cfg.beta3, 0.99), eps=_d(cfg.eps, 1e-8),
                d0=_d(cfg.d0, 1e-6),
                weight_decay=_d(cfg.weight_decay, 0.02))
        case Optimizer.AIDA:
            from onetrainer_tpu.train.dadapt import aida
            return aida(
                lr, b1=_d(cfg.beta1, 0.9), b2=_d(cfg.beta2, 0.999),
                k=_d(cfg.k, 2), xi=_d(cfg.xi, 1e-20), eps=_d(cfg.eps, 1e-8),
                weight_decay=_d(cfg.weight_decay, 0.0))
        case Optimizer.PRODIGY:
            return optax.contrib.prodigy(
                learning_rate=lr, betas=(_d(cfg.beta1, 0.9), _d(cfg.beta2, 0.999)),
                beta3=cfg.beta3,
                eps=_d(cfg.eps, 1e-8),
                estim_lr0=_d(cfg.d0, 1e-6),
                estim_lr_coef=_d(cfg.d_coef, 1.0),
                weight_decay=_d(cfg.weight_decay, 0.0),
                safeguard_warmup=cfg.safeguard_warmup)
        case Optimizer.PRODIGY_PLUS_SCHEDULE_FREE:
            # prodigy's d-adaptive step sizes with schedule-free averaging
            # in place of momentum: the inner prodigy runs with b1=0 (no
            # EMA of gradients — schedule-free owns the averaging), the
            # wrapper interpolates y/z iterates with the same LR schedule
            # (reference: prodigyplus package, create.py:886-916)
            inner = optax.contrib.prodigy(
                learning_rate=lr, betas=(0.0, _d(cfg.beta2, 0.99)),
                beta3=cfg.beta3,
                eps=_d(cfg.eps, 1e-8),
                estim_lr0=_d(cfg.d0, 1e-6),
                estim_lr_coef=_d(cfg.d_coef, 1.0),
                weight_decay=_d(cfg.weight_decay, 0.0),
                safeguard_warmup=cfg.safeguard_warmup)
            return optax.contrib.schedule_free(
                inner, learning_rate=lr, b1=_d(cfg.beta1, 0.9),
                weight_lr_power=_d(cfg.weight_lr_power, 2.0))
        case _:
            hint = _UNIMPLEMENTED.get(optimizer, "")
            raise NotImplementedError(
                f"Optimizer {optimizer} is not yet implemented on the TPU "
                f"backend{'; ' + hint if hint else ''}")


def create_group_optimizer(
        group_schedules: dict[str, ScheduleOrFloat],
        optimizer: Optimizer,
        cfg: TrainOptimizerConfig,
        labels,
) -> optax.GradientTransformation:
    """Per-group optimizer: one transformation per named param group, each
    with its own LR schedule (reference: NamedParameterGroupCollection,
    modules/util/NamedParameterGroup.py:10-69). `labels` is a pytree (or
    fn) mapping each leaf to its group name."""
    transforms = {
        name: create_optimizer(optimizer, cfg, schedule)
        for name, schedule in group_schedules.items()
    }
    return optax.multi_transform(transforms, labels)


def schedule_free_eval_params(opt_state, params):
    """Swap to the schedule-free eval params for sampling/saving
    (reference: GenericTrainer.py:268-271 eval/train mode switching)."""
    try:
        return optax.contrib.schedule_free_eval_params(opt_state, params)
    except Exception:
        return params
