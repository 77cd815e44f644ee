"""Diffusion schedule coefficients and beta schedules.

Pure-jnp re-derivation of the reference math
(reference: modules/util/DiffusionScheduleCoefficients.py:5-62,
modules/util/convert/rescale_noise_scheduler_to_zero_terminal_snr.py).
All tables are static (1000,) fp32 arrays computed once at trace time;
indexing them inside jit is a gather, which XLA fuses into the loss.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiffusionScheduleCoefficients(NamedTuple):
    """All alpha-bar derived constants, including posterior coefficients."""
    num_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @staticmethod
    def from_betas(betas: jnp.ndarray) -> "DiffusionScheduleCoefficients":
        betas = jnp.asarray(betas, dtype=jnp.float32)
        alphas = 1.0 - betas
        alphas_cumprod = jnp.cumprod(alphas, axis=0)
        alphas_cumprod_prev = jnp.concatenate(
            [jnp.ones((1,), dtype=alphas_cumprod.dtype), alphas_cumprod[:-1]])
        posterior_variance = betas * (1 - alphas_cumprod_prev) / (1 - alphas_cumprod)
        posterior_log_variance_clipped = jnp.log(
            jnp.clip(jnp.concatenate([posterior_variance[1:2], posterior_variance[1:]]), min=1e-20))

        return DiffusionScheduleCoefficients(
            num_timesteps=int(betas.shape[0]),
            betas=betas,
            alphas_cumprod=alphas_cumprod,
            alphas_cumprod_prev=alphas_cumprod_prev,
            sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
            sqrt_one_minus_alphas_cumprod=jnp.sqrt(1 - alphas_cumprod),
            log_one_minus_alphas_cumprod=jnp.log(1 - alphas_cumprod),
            sqrt_recip_alphas_cumprod=jax_rsqrt(alphas_cumprod),
            sqrt_recipm1_alphas_cumprod=jnp.sqrt(1 / alphas_cumprod - 1),
            posterior_variance=posterior_variance,
            posterior_log_variance_clipped=posterior_log_variance_clipped,
            posterior_mean_coef1=betas * jnp.sqrt(alphas_cumprod_prev) / (1 - alphas_cumprod),
            posterior_mean_coef2=(1 - alphas_cumprod_prev) * jnp.sqrt(alphas) / (1 - alphas_cumprod),
        )

    def snr(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        all_snr = (self.sqrt_alphas_cumprod / self.sqrt_one_minus_alphas_cumprod) ** 2
        return all_snr[timesteps]


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def make_betas(
        schedule: str = "scaled_linear",
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        num_train_timesteps: int = 1000,
) -> jnp.ndarray:
    """Beta schedule used by SD-family checkpoints (diffusers `scheduler_config`).
    `scaled_linear`: linspace over sqrt(beta), then squared."""
    if schedule == "scaled_linear":
        return jnp.linspace(
            beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps,
            dtype=jnp.float32) ** 2
    if schedule == "linear":
        return jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)
    if schedule == "squaredcos_cap_v2":
        # glide cosine schedule
        t = np.arange(num_train_timesteps, dtype=np.float64)
        f = lambda x: np.cos((x / num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.minimum(1 - f(t + 1) / f(t), 0.999)
        return jnp.asarray(betas, dtype=jnp.float32)
    raise ValueError(f"unknown beta schedule {schedule}")


def rescale_betas_zero_terminal_snr(betas: jnp.ndarray) -> jnp.ndarray:
    """Zero-terminal-SNR rescale from "Common Diffusion Noise Schedules and
    Sample Steps are Flawed" (arXiv:2305.08891)
    (reference: modules/util/convert/rescale_noise_scheduler_to_zero_terminal_snr.py)."""
    alphas = 1.0 - betas
    alphas_cumprod = jnp.cumprod(alphas, axis=0)
    sqrt_ac = jnp.sqrt(alphas_cumprod)

    sqrt_ac_0 = sqrt_ac[0]
    sqrt_ac_T = sqrt_ac[-1]
    sqrt_ac = sqrt_ac - sqrt_ac_T
    sqrt_ac = sqrt_ac * (sqrt_ac_0 / (sqrt_ac_0 - sqrt_ac_T))

    alphas_cumprod = sqrt_ac ** 2
    alphas = alphas_cumprod[1:] / alphas_cumprod[:-1]
    alphas = jnp.concatenate([alphas_cumprod[0:1], alphas])
    return 1.0 - alphas
