"""Timestep sampling: distributions, noising-strength window, static and
dynamic (FLUX µ) timestep shifting.

Re-derivation of the reference semantics
(reference: modules/modelSetup/mixin/ModelSetupNoiseMixin.py:51-181).
The distribution choice and all scalar hyperparams are static config, so
each configuration traces to a fixed XLA program; only the RNG key and
batch vary at runtime. Distributions are matched (same pdfs), not
bit-identical — RNG discipline differs from torch by design.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from onetrainer_tpu.util.enums import TimestepDistribution


@dataclass(frozen=True)
class TimestepConfig:
    distribution: TimestepDistribution = TimestepDistribution.UNIFORM
    min_noising_strength: float = 0.0
    max_noising_strength: float = 1.0
    noising_weight: float = 0.0
    noising_bias: float = 0.0
    timestep_shift: float = 1.0
    dynamic_timestep_shifting: bool = False

    @staticmethod
    def from_train_config(config) -> "TimestepConfig":
        return TimestepConfig(
            distribution=config.timestep_distribution,
            min_noising_strength=config.min_noising_strength,
            max_noising_strength=config.max_noising_strength,
            noising_weight=config.noising_weight,
            noising_bias=config.noising_bias,
            timestep_shift=config.timestep_shift,
            dynamic_timestep_shifting=config.dynamic_timestep_shifting,
        )


def flux_mu_shift(latent_width: int, latent_height: int) -> float:
    """Dynamic µ-shift from image sequence length (FLUX recipe)
    (reference: ModelSetupNoiseMixin.py:73-89)."""
    base_seq_len, max_seq_len = 256, 4096
    base_shift, max_shift = 0.5, 1.15
    patch_size = 2
    image_seq_len = (latent_width // patch_size) * (latent_height // patch_size)
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    mu = image_seq_len * m + b
    return math.exp(mu)


def _discrete_weights(cfg: TimestepConfig, num_timestep: int, shift: float) -> jnp.ndarray:
    """Sampling weights for the discrete (multinomial) distributions.

    Shifting a discrete distribution: sample the pdf at inverse-shifted
    points, multiplied by the derivative of the inverse shift (bucket size)
    (reference: ModelSetupNoiseMixin.py:118-152)."""
    linspace = jnp.linspace(0.0, 1.0, num_timestep)
    shifted = linspace / (shift - shift * linspace + linspace)
    derivative = shift / (shift + linspace - linspace * shift) ** 2

    if cfg.distribution == TimestepDistribution.COS_MAP:
        weights = 2.0 / (math.pi - 2.0 * math.pi * shifted + 2.0 * math.pi * shifted ** 2)
        return weights * derivative
    if cfg.distribution == TimestepDistribution.SIGMOID:
        bias = cfg.noising_bias + 0.5
        weight = cfg.noising_weight
        # the reference applies the shift map a SECOND time here: its
        # line 147 reuses the linspace variable already reassigned to the
        # shifted values at line 127 (ModelSetupNoiseMixin.py:126-148) —
        # matched exactly, divergence is ~11% of peak weight at shift=3
        # (tests/test_reference_goldens_timesteps.py)
        shifted2 = shifted / (shift - shift * shifted + shifted)
        weights = 1.0 / (1.0 + jnp.exp(-weight * (shifted2 - bias)))
        return weights * derivative
    raise ValueError(f"not a discrete distribution: {cfg.distribution}")


def sample_timesteps_discrete(
        rng: jax.Array,
        batch_size: int,
        cfg: TimestepConfig,
        num_train_timesteps: int = 1000,
        deterministic: bool = False,
        latent_width: int | None = None,
        latent_height: int | None = None,
) -> jnp.ndarray:
    """Sample integer timesteps in [0, num_train_timesteps).

    (reference: ModelSetupNoiseMixin.py:51-155)"""
    if deterministic:
        return jnp.full((batch_size,), int(num_train_timesteps * 0.5) - 1, dtype=jnp.int32)

    min_timestep = int(num_train_timesteps * cfg.min_noising_strength)
    max_timestep = int(num_train_timesteps * cfg.max_noising_strength)
    num_timestep = max_timestep - min_timestep

    shift = cfg.timestep_shift
    if cfg.dynamic_timestep_shifting:
        if not latent_width or not latent_height:
            raise NotImplementedError("dynamic timestep shifting needs latent dims")
        shift = flux_mu_shift(latent_width, latent_height)

    if cfg.distribution.is_continuous():
        if cfg.distribution == TimestepDistribution.UNIFORM:
            u = jax.random.uniform(rng, (batch_size,))
            timestep = min_timestep + (max_timestep - min_timestep) * u
        elif cfg.distribution == TimestepDistribution.LOGIT_NORMAL:
            bias = cfg.noising_bias
            scale = cfg.noising_weight + 1.0
            normal = bias + scale * jax.random.normal(rng, (batch_size,))
            timestep = jax.nn.sigmoid(normal) * num_timestep + min_timestep
        elif cfg.distribution == TimestepDistribution.HEAVY_TAIL:
            scale = cfg.noising_weight
            u = jax.random.uniform(rng, (batch_size,))
            u = 1.0 - u - scale * (jnp.cos(math.pi / 2.0 * u) ** 2.0 - 1.0 + u)
            timestep = u * num_timestep + min_timestep
        else:
            raise ValueError(cfg.distribution)
        # static shift applied in continuous space
        timestep = (num_train_timesteps * shift * timestep
                    / ((shift - 1) * timestep + num_train_timesteps))
        return timestep.astype(jnp.int32)

    # discrete multinomial distributions — weights are trace-time constants
    weights = _discrete_weights(cfg, num_timestep, shift)
    logits = jnp.log(jnp.clip(weights, min=1e-30))
    samples = jax.random.categorical(rng, logits, shape=(batch_size,))
    return (samples + min_timestep).astype(jnp.int32)


def sample_timesteps_continuous(
        rng: jax.Array,
        batch_size: int,
        cfg: TimestepConfig,
        deterministic: bool = False,
) -> jnp.ndarray:
    """Continuous timesteps in (0, 1] — discretized to 10000 buckets like the
    reference so distributions match exactly
    (reference: ModelSetupNoiseMixin.py:157-181)."""
    if deterministic:
        return jnp.full((batch_size,), 0.5, dtype=jnp.float32)
    discrete_timesteps = 10000
    discrete = sample_timesteps_discrete(
        rng, batch_size, cfg, num_train_timesteps=discrete_timesteps) + 1
    return discrete.astype(jnp.float32) / discrete_timesteps
