"""D-Adaptation optimizers (Defazio & Mishchenko, ICML 2023) + Aida.

The reference exposes the dadaptation package's DAdaptSGD / DAdaptLion /
DAdaptAdaGrad / DAdaptAdan and pytorch_optimizer's Aida
(reference: modules/util/create.py DADAPT_* / AIDA branches,
modules/util/optimizer_util.py defaults). TPU-native re-derivations:

- `d_adaptation(base, lr, ...)` wraps any direction-producing optax
  transform with the dual-averaging D estimator from the paper's SGD
  algorithm (Alg. 3): s accumulates d·γ-weighted gradients, the lower
  bound d̂ = 2·(Σ d·γ·⟨g,s⟩) / ||s|| only ever grows, and the step is
  direction · d·γ. For SGD this is the paper's exact algorithm; for
  Lion / AdaGrad / Adan it pairs the same estimator with the base
  direction (the dadaptation package re-derives per-variant
  numerators; the growth dynamics match, constants differ — documented
  rather than hidden behind an alias).
- `scale_by_adan` implements Adan's Nesterov-style moments (Xie et al.
  2022) for the DADAPT_ADAN base direction.
- `aida` is Adam with the second moment tracked on the gradient's
  k-fold projection onto the momentum direction (layerwise), per
  pytorch_optimizer's Aida.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class DAdaptState(NamedTuple):
    base_state: optax.OptState
    s: optax.Updates          # Σ d·γ·g
    numerator: jnp.ndarray    # Σ d·γ·⟨g, s⟩
    d: jnp.ndarray
    g0_norm: jnp.ndarray      # ‖g₀‖, normalizes the effective step
    step: jnp.ndarray


def _tree_vdot(a, b) -> jnp.ndarray:
    leaves = jax.tree.leaves(jax.tree.map(
        lambda x, y: jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32)),
        a, b))
    return sum(leaves, jnp.asarray(0.0, jnp.float32))


def d_adaptation(base: optax.GradientTransformation,
                 learning_rate,
                 d0: float = 1e-6,
                 growth_rate: float = float("inf"),
                 ) -> optax.GradientTransformation:
    """Wrap `base` (which must emit an un-scaled descent direction) with
    the D-Adaptation step-size estimator; emits direction · (-d·γ)."""

    def _gamma(step):
        return learning_rate(step) if callable(learning_rate) \
            else jnp.asarray(learning_rate, jnp.float32)

    def init_fn(params):
        return DAdaptState(
            base_state=base.init(params),
            s=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            numerator=jnp.asarray(0.0, jnp.float32),
            d=jnp.asarray(d0, jnp.float32),
            g0_norm=jnp.asarray(0.0, jnp.float32),
            step=jnp.asarray(0, jnp.int32))

    def update_fn(grads, state, params=None):
        gamma = _gamma(state.step).astype(jnp.float32)
        # first-step gradient norm normalizes the effective step (the
        # dadaptation package's g0_norm), making d's growth rate
        # scale-free in the gradients
        g0_norm = jnp.where(state.step == 0, optax.global_norm(grads),
                            state.g0_norm)
        dlr = state.d * gamma / jnp.maximum(g0_norm, 1e-30)

        numerator = state.numerator + dlr * _tree_vdot(grads, state.s)
        s = jax.tree.map(
            lambda sk, g: sk + dlr * g.astype(jnp.float32), state.s, grads)
        s_norm = optax.global_norm(s)
        d_hat = 2.0 * numerator / jnp.maximum(s_norm, 1e-30)
        d_new = jnp.maximum(state.d,
                            jnp.minimum(d_hat, state.d * growth_rate))

        directions, base_state = base.update(grads, state.base_state, params)
        updates = jax.tree.map(lambda u: -dlr * u.astype(jnp.float32),
                               directions)
        return updates, DAdaptState(base_state, s, numerator, d_new,
                                    g0_norm, state.step + 1)

    return optax.GradientTransformation(init_fn, update_fn)


# -- base directions (un-scaled; sign convention: positive = descent) ----------------

def _sgd_direction(momentum: float = 0.9) -> optax.GradientTransformation:
    return optax.trace(decay=momentum) if momentum else optax.identity()


def _lion_direction(b1: float = 0.9,
                    b2: float = 0.99) -> optax.GradientTransformation:
    inner = optax.scale_by_lion(b1=b1, b2=b2)

    def update_fn(grads, state, params=None):
        updates, state = inner.update(grads, state, params)
        return updates, state
    return optax.GradientTransformation(inner.init, update_fn)


def _adagrad_direction(eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.scale_by_rss(initial_accumulator_value=0.0, eps=eps)


class AdanState(NamedTuple):
    m: optax.Updates          # EMA of g
    v: optax.Updates          # EMA of g_k - g_{k-1}
    n: optax.Updates          # EMA of (g + (1-b2)(g_k - g_{k-1}))^2
    prev_grad: optax.Updates
    step: jnp.ndarray


def scale_by_adan(b1: float = 0.98, b2: float = 0.92, b3: float = 0.99,
                  eps: float = 1e-8) -> optax.GradientTransformation:
    """Adan (Adaptive Nesterov Momentum, Xie et al. 2022) direction."""

    def init_fn(params):
        zeros = lambda: jax.tree.map(
            lambda p: jnp.zeros_like(p, jnp.float32), params)
        return AdanState(zeros(), zeros(), zeros(), zeros(),
                         jnp.asarray(0, jnp.int32))

    def update_fn(grads, state, params=None):
        step = state.step + 1
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        is_first = (step == 1)
        diff = jax.tree.map(
            lambda g, pg: jnp.where(is_first, jnp.zeros_like(g), g - pg),
            grads, state.prev_grad)
        m = jax.tree.map(lambda mk, g: b1 * mk + (1 - b1) * g,
                         state.m, grads)
        v = jax.tree.map(lambda vk, dg: b2 * vk + (1 - b2) * dg,
                         state.v, diff)
        n = jax.tree.map(
            lambda nk, g, dg: b3 * nk + (1 - b3) * (g + (1 - b2) * dg) ** 2,
            state.n, grads, diff)
        bc1 = 1 - b1 ** step
        bc2 = 1 - b2 ** step
        bc3 = 1 - b3 ** step
        direction = jax.tree.map(
            lambda mk, vk, nk: (mk / bc1 + (1 - b2) * vk / bc2)
            / (jnp.sqrt(nk / bc3) + eps),
            m, v, n)
        return direction, AdanState(m, v, n, grads, step)

    return optax.GradientTransformation(init_fn, update_fn)


def dadapt_sgd(learning_rate, momentum: float = 0.9, d0: float = 1e-6,
               weight_decay: float = 0.0,
               growth_rate: float = float("inf")):
    tx = d_adaptation(_sgd_direction(momentum), learning_rate, d0,
                      growth_rate)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def dadapt_lion(learning_rate, b1: float = 0.9, b2: float = 0.99,
                d0: float = 1e-6, weight_decay: float = 0.0):
    tx = d_adaptation(_lion_direction(b1, b2), learning_rate, d0)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def dadapt_adagrad(learning_rate, eps: float = 0.0, d0: float = 1e-6,
                   weight_decay: float = 0.0):
    tx = d_adaptation(_adagrad_direction(eps=max(eps, 1e-8)), learning_rate,
                      d0)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def dadapt_adan(learning_rate, b1: float = 0.98, b2: float = 0.92,
                b3: float = 0.99, eps: float = 1e-8, d0: float = 1e-6,
                weight_decay: float = 0.0):
    tx = d_adaptation(scale_by_adan(b1, b2, b3, eps), learning_rate, d0)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


# -- Aida ----------------------------------------------------------------------------

class AidaState(NamedTuple):
    m: optax.Updates
    v: optax.Updates
    step: jnp.ndarray


def scale_by_aida(b1: float = 0.9, b2: float = 0.999, k: int = 2,
                  xi: float = 1e-20,
                  eps: float = 1e-8) -> optax.GradientTransformation:
    """Aida (pytorch_optimizer): Adam whose second moment tracks the
    gradient projected k times onto the momentum direction, layerwise —
    suppressing the adaptive step along directions orthogonal to the
    momentum."""

    def init_fn(params):
        zeros = lambda: jax.tree.map(
            lambda p: jnp.zeros_like(p, jnp.float32), params)
        return AidaState(zeros(), zeros(), jnp.asarray(0, jnp.int32))

    def update_fn(grads, state, params=None):
        step = state.step + 1
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        m = jax.tree.map(lambda mk, g: b1 * mk + (1 - b1) * g,
                         state.m, grads)

        def project(mk, g):
            proj = g
            for _ in range(k):
                scale = jnp.vdot(mk, proj) / (jnp.vdot(mk, mk) + xi)
                proj = mk * scale
            return proj

        projected = jax.tree.map(project, m, grads)
        v = jax.tree.map(lambda vk, p: b2 * vk + (1 - b2) * p * p,
                         state.v, projected)
        bc1 = 1 - b1 ** step
        bc2 = 1 - b2 ** step
        updates = jax.tree.map(
            lambda mk, vk: (mk / bc1) / (jnp.sqrt(vk / bc2) + eps), m, v)
        return updates, AidaState(m, v, step)

    return optax.GradientTransformation(init_fn, update_fn)


def aida(learning_rate, b1: float = 0.9, b2: float = 0.999, k: int = 2,
         xi: float = 1e-20, eps: float = 1e-8, weight_decay: float = 0.0):
    parts = [scale_by_aida(b1, b2, k, xi, eps)]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)
