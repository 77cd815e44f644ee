"""Noise generation and forward-noising.

(reference: modules/modelSetup/mixin/ModelSetupNoiseMixin.py:18-49,
ModelSetupDiffusionMixin.py:15-57, ModelSetupFlowMatchingMixin.py:14-39)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_noise(
        rng: jax.Array,
        shape: tuple[int, ...],
        dtype,
        offset_noise_weight: float = 0.0,
        perturbation_noise_weight: float = 0.0,
) -> jnp.ndarray:
    """Gaussian noise with optional offset (per-channel constant) and
    perturbation components. Computed in fp32 then cast."""
    k_base, k_offset, k_perturb = jax.random.split(rng, 3)
    noise = jax.random.normal(k_base, shape, dtype=jnp.float32)

    if offset_noise_weight > 0:
        offset_shape = shape[:2] + (1,) * (len(shape) - 2)
        offset_noise = jax.random.normal(k_offset, offset_shape, dtype=jnp.float32)
        noise = noise + offset_noise_weight * offset_noise

    if perturbation_noise_weight > 0:
        perturbation = jax.random.normal(k_perturb, shape, dtype=jnp.float32)
        noise = noise + perturbation_noise_weight * perturbation

    return noise.astype(dtype)


def _broadcast_to(coeff: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return coeff.reshape(coeff.shape + (1,) * (ndim - coeff.ndim))


def add_noise_discrete(
        scaled_latent: jnp.ndarray,
        noise: jnp.ndarray,
        timestep: jnp.ndarray,
        sqrt_alphas_cumprod: jnp.ndarray,
        sqrt_one_minus_alphas_cumprod: jnp.ndarray,
) -> jnp.ndarray:
    """x_t = sqrt(ᾱ_t)·x_0 + sqrt(1-ᾱ_t)·ε (computed fp32, cast back)."""
    sac = _broadcast_to(sqrt_alphas_cumprod[timestep], scaled_latent.ndim)
    somac = _broadcast_to(sqrt_one_minus_alphas_cumprod[timestep], scaled_latent.ndim)
    noisy = scaled_latent.astype(jnp.float32) * sac + noise.astype(jnp.float32) * somac
    return noisy.astype(scaled_latent.dtype)


def add_noise_continuous(
        scaled_latent: jnp.ndarray,
        noise: jnp.ndarray,
        alphas_cumprod: jnp.ndarray,
) -> jnp.ndarray:
    """Continuous-time forward noising given per-sample ᾱ(t) values."""
    ac = _broadcast_to(alphas_cumprod, scaled_latent.ndim).astype(jnp.float32)
    noisy = (scaled_latent.astype(jnp.float32) * jnp.sqrt(ac)
             + noise.astype(jnp.float32) * jnp.sqrt(1.0 - ac))
    return noisy.astype(scaled_latent.dtype)


def add_noise_flow_matching(
        scaled_latent: jnp.ndarray,
        noise: jnp.ndarray,
        timestep: jnp.ndarray,
        num_train_timesteps: int = 1000,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rectified-flow interpolation x_t = σ·ε + (1-σ)·x_0 with
    σ = (t+1)/T for integer t (reference: ModelSetupFlowMatchingMixin.py:14-39
    — the reference's sigma table is arange(1, T+1)/T indexed at t).
    Returns (noisy, sigmas broadcast to latent rank)."""
    sigma = (timestep.astype(jnp.float32) + 1.0) / num_train_timesteps
    sigmas = _broadcast_to(sigma, scaled_latent.ndim)
    noisy = (noise.astype(jnp.float32) * sigmas
             + scaled_latent.astype(jnp.float32) * (1.0 - sigmas))
    return noisy.astype(scaled_latent.dtype), sigmas
