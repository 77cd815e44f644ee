"""The training loss stack.

Composes MSE + MAE + log-cosh + variational-bound losses, masked or
unmasked, with prior preservation, per-sample loss weights, batch/accum
scaling, and timestep-based weighting (min-SNR-γ, debiased estimation,
P2, sigma).

Re-derivation of the reference semantics
(reference: modules/modelSetup/mixin/ModelSetupDiffusionLossMixin.py,
modules/util/loss/masked_loss.py, modules/util/loss/vb_loss.py).
Everything is a pure fp32 jnp function of (data, static LossConfig) so
the whole stack fuses into the backward pass under jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from onetrainer_tpu.math.schedules import DiffusionScheduleCoefficients
from onetrainer_tpu.util.enums import LossScaler, LossWeight


@dataclass(frozen=True)
class LossConfig:
    mse_strength: float = 1.0
    mae_strength: float = 0.0
    log_cosh_strength: float = 0.0
    vb_loss_strength: float = 1.0
    loss_weight_fn: LossWeight = LossWeight.CONSTANT
    loss_weight_strength: float = 5.0
    loss_scaler: LossScaler = LossScaler.NONE
    batch_size: int = 1
    gradient_accumulation_steps: int = 1
    masked_training: bool = False       # effective: apply the mask to the loss
    # the raw config flag, before the conditioning-image fold: inpaint-type
    # models don't mask the loss but still normalize by mask area
    # (reference: ModelSetupDiffusionLossMixin.__unmasked_losses)
    raw_masked_training: bool = False
    unmasked_weight: float = 0.1
    normalize_masked_area_loss: bool = False
    masked_prior_preservation_weight: float = 0.0
    v_prediction: bool = False

    @staticmethod
    def from_train_config(config, v_prediction: bool = False) -> "LossConfig":
        return LossConfig(
            mse_strength=config.mse_strength,
            mae_strength=config.mae_strength,
            log_cosh_strength=config.log_cosh_strength,
            vb_loss_strength=config.vb_loss_strength,
            loss_weight_fn=config.loss_weight_fn,
            loss_weight_strength=config.loss_weight_strength,
            loss_scaler=config.loss_scaler,
            batch_size=config.batch_size,
            gradient_accumulation_steps=config.gradient_accumulation_steps,
            masked_training=config.masked_training and not config.model_type.has_conditioning_image_input(),
            raw_masked_training=config.masked_training,
            unmasked_weight=config.unmasked_weight,
            normalize_masked_area_loss=config.normalize_masked_area_loss,
            masked_prior_preservation_weight=config.masked_prior_preservation_weight,
            v_prediction=v_prediction,
        )


# -- elementwise losses -------------------------------------------------------

def log_cosh_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable log(cosh(x)) = x + softplus(-2x) - log(2)."""
    diff = pred - target
    return diff + jax.nn.softplus(-2.0 * diff) - math.log(2.0)


# -- masking ------------------------------------------------------------------

def _spatial_mean(x: jnp.ndarray) -> jnp.ndarray:
    return x.mean(axis=tuple(range(1, x.ndim)))


def masked_losses(
        losses: jnp.ndarray,
        mask: jnp.ndarray,
        unmasked_weight: float,
        normalize_masked_area_loss: bool,
) -> jnp.ndarray:
    """(reference: modules/util/loss/masked_loss.py:5-19)"""
    clamped_mask = jnp.clip(mask, unmasked_weight, 1.0)
    losses = losses * clamped_mask
    if normalize_masked_area_loss:
        mean = clamped_mask.mean(axis=tuple(range(1, clamped_mask.ndim)), keepdims=True)
        losses = losses / mean
    return losses


def masked_losses_with_prior(
        losses: jnp.ndarray,
        prior_losses: jnp.ndarray | None,
        mask: jnp.ndarray,
        unmasked_weight: float,
        normalize_masked_area_loss: bool,
        masked_prior_preservation_weight: float,
) -> jnp.ndarray:
    """(reference: modules/util/loss/masked_loss.py:22-45)"""
    clamped_mask = jnp.clip(mask, unmasked_weight, 1.0)
    out = losses * clamped_mask
    if normalize_masked_area_loss:
        mean = clamped_mask.mean(axis=tuple(range(1, clamped_mask.ndim)), keepdims=True)
        out = out / mean
    if masked_prior_preservation_weight == 0 or prior_losses is None:
        return out
    inverted = 1.0 - clamped_mask
    prior = prior_losses * inverted * masked_prior_preservation_weight
    if normalize_masked_area_loss:
        mean = inverted.mean(axis=tuple(range(1, inverted.ndim)), keepdims=True)
        prior = prior / mean
    return out + prior


# -- variational bound (IDDPM learned variance) -------------------------------

def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    res = table[t]
    return res.reshape(res.shape + (1,) * (ndim - res.ndim))


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0 + logvar2 - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )


def vb_losses(
        coefficients: DiffusionScheduleCoefficients,
        x_0: jnp.ndarray,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        predicted_eps: jnp.ndarray,
        predicted_var_values: jnp.ndarray,
) -> jnp.ndarray:
    """IDDPM variational bound for learned variance, in bits. The eps
    prediction is detached so the VB term only trains the variance head
    (reference: modules/util/loss/vb_loss.py)."""
    ndim = x_t.ndim
    frozen_eps = jax.lax.stop_gradient(predicted_eps)

    # true posterior q(x_{t-1} | x_t, x_0)
    true_mean = (_extract(coefficients.posterior_mean_coef1, t, ndim) * x_0
                 + _extract(coefficients.posterior_mean_coef2, t, ndim) * x_t)
    true_log_var = _extract(coefficients.posterior_log_variance_clipped, t, ndim)

    # predicted p(x_{t-1} | x_t)
    min_log = true_log_var
    max_log = _extract(jnp.log(coefficients.betas), t, ndim)
    frac = (predicted_var_values + 1.0) / 2.0
    predicted_log_var = frac * max_log + (1.0 - frac) * min_log

    predicted_x0 = (_extract(coefficients.sqrt_recip_alphas_cumprod, t, ndim) * x_t
                    - _extract(coefficients.sqrt_recipm1_alphas_cumprod, t, ndim) * frozen_eps)
    predicted_mean = (_extract(coefficients.posterior_mean_coef1, t, ndim) * predicted_x0
                      + _extract(coefficients.posterior_mean_coef2, t, ndim) * x_t)

    kl = normal_kl(true_mean, true_log_var, predicted_mean, predicted_log_var) / math.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_0, predicted_mean, 0.5 * predicted_log_var) / math.log(2.0)

    t_b = t.reshape(t.shape + (1,) * (ndim - t.ndim))
    return jnp.where(t_b == 0, decoder_nll, kl)


# -- timestep weighting --------------------------------------------------------

def min_snr_weight(snr: jnp.ndarray, gamma: float, v_prediction: bool) -> jnp.ndarray:
    min_snr_gamma = jnp.minimum(snr, gamma)
    denom = snr + 1.0 if v_prediction else snr
    return min_snr_gamma / denom


def debiased_estimation_weight(snr: jnp.ndarray, v_prediction: bool) -> jnp.ndarray:
    # clip matches kohya (sd-scripts#889) and avoids numerical instability
    weight = jnp.clip(snr, max=1.0e3)
    if v_prediction:
        weight = weight + 1.0
    return 1.0 / jnp.sqrt(weight)


def p2_loss_weight(snr: jnp.ndarray, gamma: float, v_prediction: bool) -> jnp.ndarray:
    if v_prediction:
        snr = snr + 1.0
    return (1.0 + snr) ** -gamma


# -- the composed stacks ---------------------------------------------------------

def _elementwise_stack(data: dict, cfg: LossConfig, coefficients, mask: jnp.ndarray | None):
    """Per-sample loss from the enabled elementwise losses."""
    predicted = data['predicted'].astype(jnp.float32)
    target = data['target'].astype(jnp.float32)
    prior_target = data.get('prior_target')
    if prior_target is not None:
        prior_target = prior_target.astype(jnp.float32)

    losses = jnp.zeros((predicted.shape[0],), dtype=jnp.float32)

    def accumulate(fn, strength):
        value = fn(predicted, target)
        if mask is not None:
            prior = fn(predicted, prior_target) if prior_target is not None else None
            value = masked_losses_with_prior(
                value, prior, mask, cfg.unmasked_weight,
                cfg.normalize_masked_area_loss, cfg.masked_prior_preservation_weight)
        return _spatial_mean(value) * strength

    if cfg.mse_strength != 0:
        losses += accumulate(lambda p, x: (p - x) ** 2, cfg.mse_strength)
    if cfg.mae_strength != 0:
        losses += accumulate(lambda p, x: jnp.abs(p - x), cfg.mae_strength)
    if cfg.log_cosh_strength != 0:
        losses += accumulate(log_cosh_loss, cfg.log_cosh_strength)

    if (cfg.vb_loss_strength != 0 and 'predicted_var_values' in data
            and coefficients is not None):
        vb = vb_losses(
            coefficients,
            data['scaled_latent_image'].astype(jnp.float32),
            data['noisy_latent_image'].astype(jnp.float32),
            data['timestep'],
            predicted,
            data['predicted_var_values'].astype(jnp.float32),
        )
        if mask is not None:
            vb = masked_losses(vb, mask, cfg.unmasked_weight, cfg.normalize_masked_area_loss)
        losses += _spatial_mean(vb) * cfg.vb_loss_strength

    return losses


def _scale(cfg: LossConfig) -> float:
    batch_scale = 1 if cfg.loss_scaler in (LossScaler.NONE, LossScaler.GRADIENT_ACCUMULATION) else cfg.batch_size
    accum_scale = 1 if cfg.loss_scaler in (LossScaler.NONE, LossScaler.BATCH) else cfg.gradient_accumulation_steps
    return float(batch_scale * accum_scale)


def diffusion_losses(
        batch: dict,
        data: dict,
        cfg: LossConfig,
        coefficients: DiffusionScheduleCoefficients | None,
) -> jnp.ndarray:
    """Per-sample loss vector for epsilon/v-prediction models
    (reference: ModelSetupDiffusionLossMixin._diffusion_losses:233-321)."""
    mask = None
    if cfg.masked_training and 'latent_mask' in batch:
        mask = batch['latent_mask'].astype(jnp.float32)

    losses = _elementwise_stack(data, cfg, coefficients, mask)

    if mask is None and cfg.raw_masked_training and cfg.normalize_masked_area_loss and 'latent_mask' in batch:
        # unmasked path (e.g. inpaint models) with area normalization
        # (reference: __unmasked_losses 1/mask-mean scaling)
        clamped_mask = jnp.clip(batch['latent_mask'], cfg.unmasked_weight, 1.0)
        losses = losses / _spatial_mean(clamped_mask)

    losses = losses * _scale(cfg)
    losses = losses * batch['loss_weight'].astype(losses.dtype)

    if 'timestep' in data and coefficients is not None:
        snr = coefficients.snr(data['timestep'])
        if cfg.loss_weight_fn == LossWeight.MIN_SNR_GAMMA:
            losses = losses * min_snr_weight(snr, cfg.loss_weight_strength, cfg.v_prediction)
        elif cfg.loss_weight_fn == LossWeight.DEBIASED_ESTIMATION:
            losses = losses * debiased_estimation_weight(snr, cfg.v_prediction)
        elif cfg.loss_weight_fn == LossWeight.P2:
            losses = losses * p2_loss_weight(snr, cfg.loss_weight_strength, cfg.v_prediction)

    return losses


def flow_matching_losses(
        batch: dict,
        data: dict,
        cfg: LossConfig,
        num_train_timesteps: int = 1000,
) -> jnp.ndarray:
    """Per-sample loss vector for rectified-flow models
    (reference: ModelSetupDiffusionLossMixin._flow_matching_losses)."""
    mask = None
    if cfg.masked_training and 'latent_mask' in batch:
        mask = batch['latent_mask'].astype(jnp.float32)

    losses = _elementwise_stack(data, cfg, None, mask)

    if mask is None and cfg.raw_masked_training and cfg.normalize_masked_area_loss and 'latent_mask' in batch:
        clamped_mask = jnp.clip(batch['latent_mask'], cfg.unmasked_weight, 1.0)
        losses = losses / _spatial_mean(clamped_mask)

    losses = losses * _scale(cfg)
    losses = losses * batch['loss_weight'].astype(losses.dtype)

    if 'timestep' in data and cfg.loss_weight_fn == LossWeight.SIGMA:
        sigmas = (data['timestep'].astype(jnp.float32) + 1.0) / num_train_timesteps
        losses = losses * sigmas

    return losses
